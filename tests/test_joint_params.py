"""Joint (k, l, alpha) planner parity vs the reference imported as oracle
(round-1 verdict item 6): get_k_l_alpha_minhash end-to-end, and the per-ball
alpha search of get_r_k_l_alpha_pstable (its full grid crawl is minutes-slow
and its argwhere returns the r INDEX as the r value — see
params.plan_pstable_joint docstring — so the end-to-end pstable check pins
our own invariants instead)."""

import numpy as np
import pytest

from lsh_qd_spark.params import (
    JointPlan,
    greatest_valid_alpha,
    greatest_valid_alpha_pstable,
    plan_minhash_joint,
    plan_pstable_joint,
    valid_kl_minhash,
)

# reference_module fixture (module loader with scipy/matplotlib stubs)
from test_parity_reference import reference_module  # noqa: F401

POSI_DISTS = [0.10, 0.20, 0.30]
FALSE_DISTS = [0.35, 0.45, 0.55]


def _simpson_quad(f, a, b):
    """scipy.integrate.quad stand-in: Simpson n=512, the same rule as
    params._pstable_base_prob."""
    n = 512
    t = np.linspace(a, b, n + 1)
    y = f(t)
    h = (b - a) / n
    return (
        (h / 3.0) * (y[0] + y[-1] + 4.0 * y[1:-1:2].sum() + 2.0 * y[2:-1:2].sum()),
        0.0,
    )


def test_minhash_joint_matches_reference(reference_module):
    ref_k, ref_l, ref_alphas = reference_module.get_k_l_alpha_minhash(
        POSI_DISTS, FALSE_DISTS, posi_rate=0.90, false_rate=0.10
    )
    got = plan_minhash_joint(POSI_DISTS, FALSE_DISTS, 0.90, 0.10)
    assert (got.k, got.l) == (int(ref_k), int(ref_l))
    assert list(got.alphas) == [int(np.asarray(a).item()) for a in ref_alphas]


def test_valid_kl_grid_matches_reference(reference_module):
    ref = reference_module.get_k_l_minhash(0.30, 0.55, posi_rate=0.90, false_rate=0.10)
    got = valid_kl_minhash(1 - 0.30, 1 - 0.55, 0.90, 0.10)
    assert got.shape == ref.shape
    assert (got == ref).all()


def test_alpha_search_matches_reference(reference_module):
    # (k, l) points where a valid alpha exists — the reference raises a
    # latent IndexError on the empty case (lsh-qd.py:908), which
    # greatest_valid_alpha fixes by returning None (asserted separately).
    for k, l in [(3, 24), (4, 60), (7, 27)]:
        ref_a = reference_module.get_alpha_minhash(
            k, l, 0.10, 0.35, posi_rate=0.90, false_rate=0.10
        )
        got = greatest_valid_alpha(k, l, 0.90, 0.65, 0.90, 0.10)
        assert got == int(np.asarray(ref_a).item())
    assert greatest_valid_alpha(2, 10, 0.90, 0.65, 0.90, 0.10) is None


def test_pstable_alpha_matches_reference(reference_module):
    reference_module.integrate.quad = _simpson_quad
    plan = plan_pstable_joint([0.1, 0.25], [0.75, 1.0], 0.90, 0.10)
    assert plan.r == 0.5  # the actual r, not the reference's index bug
    for pd, fd, mine in zip([0.1, 0.25], [0.75, 1.0], plan.alphas):
        ref_a = reference_module.get_alpha_pstable(
            plan.r, plan.k, plan.l, pd, fd, posi_rate=0.90, false_rate=0.10
        )
        assert mine == int(np.asarray(ref_a).item())


def test_joint_alphas_monotone_tighter_ball_larger_alpha():
    got = plan_minhash_joint(POSI_DISTS, FALSE_DISTS, 0.90, 0.10)
    assert list(got.alphas) == sorted(got.alphas, reverse=True)
    assert got.alphas[-1] >= 1


def test_joint_requires_largest_ball_last():
    with pytest.raises(ValueError):
        plan_minhash_joint([0.3, 0.1], [0.55, 0.35])


def test_min_space_minhash_matches_reference(reference_module):
    from lsh_qd_spark.params import plan_min_space_minhash

    ref_k, ref_l = reference_module.get_min_k_l_minhash(
        0.30, 0.55, posi_rate=0.90, false_rate=0.10
    )
    got = plan_min_space_minhash(0.30, 0.55, 0.90, 0.10)
    assert got == (int(ref_k), int(ref_l))


def test_min_space_pstable_first_valid():
    """get_min_r_k_l_pstable's full grid crawl is minutes-slow (and its r is
    an index, not a value) — pin our own invariants instead: the returned
    point is valid and no smaller l works at that (r, k)."""
    from lsh_qd_spark.params import (
        _pstable_base_prob,
        plan_min_space_pstable,
        valid_kl_minhash,
    )

    r, k, l = plan_min_space_pstable(0.20, 1.2, 0.90, 0.10)
    assert r == 0.5
    p1 = _pstable_base_prob(0.20, r)
    p2 = _pstable_base_prob(1.2, r)
    valid = valid_kl_minhash(p1, p2, 0.90, 0.10, 1000, 400)
    assert [k, l] == valid[0].tolist()
    assert not any(
        (vk == k and vl < l) for vk, vl in valid.tolist()
    )
