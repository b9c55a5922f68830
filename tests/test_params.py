"""Parameter-planner math vs closed forms and reference semantics
(/root/reference/lsh-qd.py:442-523, 876-1101)."""

import math

import numpy as np
import pytest

from lsh_qd_spark.params import (
    collision_prob,
    collision_prob_alpha,
    collision_prob_pstable,
    gaussian_pdf,
    plan_alpha,
    plan_minhash,
    plan_pstable,
    ranked_tiers,
)


def test_collision_prob_closed_form():
    # reference curve 1-(1-s^k)^l at lsh-qd.py:453
    assert collision_prob(0.8, 2, 8) == pytest.approx(1 - (1 - 0.64) ** 8)
    assert collision_prob(0.0, 3, 10) == 0.0
    assert collision_prob(1.0, 3, 10) == 1.0


def test_alpha_one_equals_vanilla():
    """alpha=1 binomial tail must equal the vanilla S-curve — the
    reference's own consistency check (lsh-qd.py:470-477)."""
    sims = np.linspace(0.01, 0.99, 25)
    a = collision_prob_alpha(sims, 3, 12, alpha=1)
    v = collision_prob(sims, 3, 12)
    assert np.allclose(a, v, atol=1e-12)


def test_alpha_tail_monotone_in_alpha():
    for alpha in range(1, 8):
        hi = collision_prob_alpha(0.7, 2, 8, alpha)
        lo = collision_prob_alpha(0.7, 2, 8, alpha + 1)
        assert lo <= hi + 1e-12


def test_binomial_tail_sums_to_one():
    # alpha=0 tail would be 1; alpha=1 tail + P(0 collisions) == 1
    s, k, l = 0.6, 2, 10
    p0 = (1 - s**k) ** l
    assert collision_prob_alpha(s, k, l, 1) + p0 == pytest.approx(1.0)


def test_gaussian_pdf():
    assert gaussian_pdf(0.0) == pytest.approx(1 / math.sqrt(2 * math.pi))


def test_pstable_prob_properties():
    # monotone decreasing in distance; in [0,1]
    ps = collision_prob_pstable([0.1, 0.5, 1.0, 2.0, 4.0], r=4.0, k=1, l=1)
    assert np.all(np.diff(ps) < 0)
    assert np.all((ps >= 0) & (ps <= 1))


def test_pstable_matches_montecarlo():
    """Simpson integral vs direct Monte-Carlo of floor((a·x+b)/r) collisions."""
    rng = np.random.default_rng(0)
    d, r = 1.5, 4.0
    n = 200_000
    a = rng.standard_normal(n)
    b = rng.uniform(0, r, n)
    x0 = 0.0
    x1 = d
    h0 = np.floor((a * x0 + b) / r)
    h1 = np.floor((a * x1 + b) / r)
    mc = float(np.mean(h0 == h1))
    analytic = float(collision_prob_pstable([d], r=r, k=1, l=1)[0])
    assert analytic == pytest.approx(mc, abs=0.01)


def test_plan_minhash_meets_targets():
    plan = plan_minhash(s1=0.8, s2=0.4, min_recall=0.99, max_fp=0.05)
    assert plan.p_near >= 0.99
    assert plan.p_far <= 0.05
    assert float(collision_prob(0.8, plan.k, plan.l)) >= 0.99


def test_plan_minhash_impossible_raises():
    with pytest.raises(ValueError):
        plan_minhash(s1=0.5, s2=0.5, min_recall=0.999, max_fp=0.001)


def test_plan_alpha_keeps_recall():
    plan = plan_minhash(0.8, 0.4, 0.995, 0.1)
    alpha = plan_alpha(plan.k, plan.l, 0.8, 0.4, min_recall=0.99)
    assert alpha >= 1
    assert float(
        collision_prob_alpha(0.8, plan.k, plan.l, alpha)
    ) >= 0.99
    # the reference enforces BOTH bounds (get_alpha_minhash:
    # (p_ts >= posi_rate) & (p_fs <= false_rate)) — the returned alpha
    # must also meet the false-positive cap at s2
    assert float(
        collision_prob_alpha(0.4, plan.k, plan.l, alpha)
    ) <= 0.10


def test_plan_alpha_false_bound_unmeetable_raises():
    """(k=1, l=1) at s1=s2: a single table collides with prob s for both
    balls, so no alpha can separate them — the reference's empty argwhere
    (an IndexError there) is a loud ValueError here."""
    with pytest.raises(ValueError, match="no alpha"):
        plan_alpha(1, 1, 0.9, 0.9, min_recall=0.5, max_fp=0.1)


def test_plan_min_recall_one_raises_actionably():
    """min_recall=1.0 used to surface as a bare math-domain error from
    log(1 - min_recall); both grid planners now state the contract."""
    with pytest.raises(ValueError, match="min_recall"):
        plan_minhash(0.9, 0.5, min_recall=1.0)
    with pytest.raises(ValueError, match="min_recall"):
        plan_pstable(d1=0.5, d2=4.0, min_recall=1.0)


def test_plan_pstable_return_first():
    plan = plan_pstable(d1=0.5, d2=4.0, min_recall=0.9, max_fp=0.2)
    assert plan.r is not None
    assert plan.p_near >= 0.9
    assert plan.p_far <= 0.2


def test_ranked_tiers_descending():
    tiers = ranked_tiers([0.95, 0.85, 0.75])
    assert len(tiers) == 3
    for t in tiers:
        assert t.p_near >= 0.99
