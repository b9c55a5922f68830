"""Driver-side LSH parameter planning (SURVEY.md §2.8, M1–M9).

Re-derivation of the reference's collision-probability math and grid
searches — pure NumPy, runs on the driver, no cluster work. Semantics match
the reference (cited per function); implementation is fresh and fixes its
latent empty-grid IndexError (``/root/reference/lsh-qd.py:907-910``).

Terminology (reference convention, lsh-qd.py:20-27): ``k`` = hashes AND-ed
per band/table ("rows"), ``l`` = number of bands/tables OR-ed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

import numpy as np


def collision_prob(sim, k: int, l: int):
    """P(collide in ≥1 of l bands) = 1 - (1 - s^k)^l — the S-curve of
    /root/reference/lsh-qd.py:442-455."""
    sim = np.asarray(sim, dtype=np.float64)
    return 1.0 - (1.0 - sim**k) ** l


def collision_prob_alpha(sim, k: int, l: int, alpha: int):
    """P(collide in ≥ alpha of l bands): binomial upper tail
    Σ_{i≥α} C(l,i) (s^k)^i (1-s^k)^(l-i) — lsh-qd.py:458-488.
    alpha=1 reduces exactly to collision_prob (consistency check at
    lsh-qd.py:470-477)."""
    sim = np.asarray(sim, dtype=np.float64)
    p = sim**k
    out = np.zeros_like(p)
    for i in range(alpha, l + 1):
        # float(): C(l,i) can exceed int64 (l>~60) — a raw bigint turns the
        # ndarray product into dtype=object
        out += float(math.comb(l, i)) * p**i * (1.0 - p) ** (l - i)
    return out


def gaussian_pdf(x):
    """Standard normal pdf — lsh-qd.py:491-498 / lsh.py:583-590."""
    x = np.asarray(x, dtype=np.float64)
    return np.exp(-(x**2) / 2.0) / math.sqrt(2.0 * math.pi)


@lru_cache(maxsize=4096)
def _pstable_base_prob(dist: float, r: float) -> float:
    """Single-projection collision probability for p-stable LSH:
    p(d) = 2∫₀ʳ (1/d)·f_G(t/d)·(1 - t/r) dt — lsh-qd.py:501-523.
    Numerical integration via Simpson's rule (scipy-free; the reference
    hoists the same integral out of its grid loop, lsh-qd.py:1010-1017)."""
    if dist <= 0:
        return 1.0
    n = 512  # even
    t = np.linspace(0.0, r, n + 1)
    y = (1.0 / dist) * gaussian_pdf(t / dist) * (1.0 - t / r)
    h = r / n
    simpson = (h / 3.0) * (
        y[0] + y[-1] + 4.0 * y[1:-1:2].sum() + 2.0 * y[2:-1:2].sum()
    )
    return float(2.0 * simpson)


def collision_prob_pstable(dists, r: float, k: int, l: int, alpha: int = 1):
    """alpha-LSH collision curve over Euclidean distances for p-stable
    hashing — lsh-qd.py:501-523 composed with the binomial tail."""
    dists = np.atleast_1d(np.asarray(dists, dtype=np.float64))
    base = np.array([_pstable_base_prob(float(d), r) for d in dists])
    p = base**k
    out = np.zeros_like(p)
    for i in range(alpha, l + 1):
        out += float(math.comb(l, i)) * p**i * (1.0 - p) ** (l - i)
    return out


def binom_tail_all_alphas(p: float, l: int) -> np.ndarray:
    """tail[a-1] = P(Binom(l, p) ≥ a) for a = 1..l, in one pmf pass +
    reverse cumsum — O(l) instead of the O(l²) of calling the tail sum per
    alpha. Used by the joint planners where l reaches the grid bound."""
    if p <= 0.0:
        return np.zeros(l)
    if p >= 1.0:
        return np.ones(l)
    i = np.arange(0, l + 1, dtype=np.float64)
    logc = np.array(
        [
            math.lgamma(l + 1) - math.lgamma(j + 1) - math.lgamma(l - j + 1)
            for j in range(l + 1)
        ]
    )
    pmf = np.exp(logc + i * math.log(p) + (l - i) * math.log1p(-p))
    tails = np.cumsum(pmf[::-1])[::-1]  # tails[a] = P(X >= a)
    return np.minimum(tails[1:], 1.0)


@dataclass(frozen=True)
class PlanResult:
    k: int
    l: int
    alpha: int = 1
    r: float | None = None
    p_near: float = 0.0  # P(collide | sim >= s1)
    p_far: float = 0.0  # P(collide | sim <= s2)


def plan_minhash(
    s1: float,
    s2: float,
    min_recall: float = 0.99,
    max_fp: float = 0.10,
    max_k: int = 12,
    max_l: int = 256,
) -> PlanResult:
    """Smallest (k, l) meeting P(collide|s1) ≥ min_recall and
    P(collide|s2) ≤ max_fp — the grid search of get_k_l_minhash
    (lsh-qd.py:944-979) with a minimal-work ordering: for each k choose the
    smallest l satisfying recall, then test the fp bound; prefer minimal
    k·l (hash budget), mirroring get_min_k_l_minhash (lsh-qd.py:1046-1063).
    """
    # upfront, not mid-grid: min_recall=1.0 would otherwise surface as a
    # bare math-domain error from log(1 - min_recall) on the first viable
    # k, bypassing the planners' actionable-ValueError contract
    if not 0.0 < min_recall < 1.0:
        raise ValueError(
            f"min_recall must be in (0, 1), got {min_recall} — recall 1.0 "
            f"is unreachable on a finite (k, l) grid"
        )
    best: PlanResult | None = None
    for k in range(1, max_k + 1):
        pk = s1**k
        if pk >= 1.0:
            l_needed = 1
        elif pk <= 0.0:
            continue
        else:
            l_needed = math.ceil(
                math.log(1.0 - min_recall) / math.log(1.0 - pk)
            )
        if l_needed > max_l:
            continue
        p_far = float(collision_prob(s2, k, l_needed))
        if p_far > max_fp:
            continue
        cand = PlanResult(
            k=k,
            l=l_needed,
            p_near=float(collision_prob(s1, k, l_needed)),
            p_far=p_far,
        )
        if best is None or cand.k * cand.l < best.k * best.l:
            best = cand
    if best is None:
        raise ValueError(
            f"no (k,l) grid point meets recall>={min_recall} and fp<={max_fp} "
            f"for s1={s1}, s2={s2} — widen the thresholds"
        )
    return best


def plan_alpha(
    k: int,
    l: int,
    s1: float,
    s2: float,
    min_recall: float = 0.99,
    max_fp: float = 0.10,
) -> int:
    """Largest alpha with P_alpha(s1) ≥ min_recall AND P_alpha(s2) ≤
    max_fp — get_alpha_minhash (lsh-qd.py:876-910), which enforces BOTH
    bounds (``(p_ts >= posi_rate) & (p_fs <= false_rate)``). Since
    P_alpha is monotone decreasing in alpha, the recall-valid alphas are
    a prefix and the fp-valid ones a suffix: the greatest recall-valid
    alpha is automatically the least-false-positive one, so the bounds
    can only jointly fail, never trade off. Raises the sibling planners'
    loud ValueError where the reference would hit its empty-argwhere
    IndexError (``valid_alphas[-1]``) — documented divergence, not a
    copy."""
    a = greatest_valid_alpha(k, l, s1, s2, min_recall, max_fp)
    if a is None:
        raise ValueError(
            f"no alpha in [1, {l}] meets recall>={min_recall} at s1={s1} "
            f"and fp<={max_fp} at s2={s2} for (k={k}, l={l}) — widen the "
            f"rates or re-plan (k, l)"
        )
    return a


def plan_pstable(
    d1: float,
    d2: float,
    min_recall: float = 0.95,
    max_fp: float = 0.10,
    rs=(1.0, 2.0, 4.0, 8.0),
    max_k: int = 8,
    max_l: int = 128,
    return_first: bool = True,
) -> PlanResult:
    """(r, k, l) grid for p-stable hashing — get_r_k_l_pstable
    (lsh-qd.py:982-1043), including its RETURN_FIRST early exit and the
    hoisted/cached base integral."""
    if not 0.0 < min_recall < 1.0:  # same contract as plan_minhash
        raise ValueError(
            f"min_recall must be in (0, 1), got {min_recall} — recall 1.0 "
            f"is unreachable on a finite (r, k, l) grid"
        )
    best: PlanResult | None = None
    for r in rs:
        p1 = _pstable_base_prob(d1, r)
        p2 = _pstable_base_prob(d2, r)
        for k in range(1, max_k + 1):
            pk1 = p1**k
            if pk1 <= 0:
                continue
            l_needed = (
                1
                if pk1 >= 1
                else math.ceil(math.log(1 - min_recall) / math.log(1 - pk1))
            )
            if l_needed > max_l:
                continue
            p_far = 1.0 - (1.0 - p2**k) ** l_needed
            if p_far > max_fp:
                continue
            cand = PlanResult(
                k=k,
                l=l_needed,
                r=r,
                p_near=1.0 - (1.0 - pk1) ** l_needed,
                p_far=p_far,
            )
            if return_first:
                return cand
            if best is None or cand.k * cand.l < best.k * best.l:
                best = cand
    if best is None:
        raise ValueError("no (r,k,l) meets the constraints")
    return best


@dataclass(frozen=True)
class JointPlan:
    """One LSH structure, one alpha per neighborhood ball (AlphaLSH)."""

    k: int
    l: int
    alphas: tuple[int, ...]
    r: float | None = None


def valid_kl_minhash(
    s1: float,
    s2: float,
    posi_rate: float = 0.90,
    false_rate: float = 0.10,
    max_k: int = 1000,
    max_l: int = 1000,
) -> np.ndarray:
    """Vectorized twin of get_k_l_minhash (/root/reference/lsh-qd.py:944-979):
    all (k, l) grid points with P(collide|s1) ≥ posi_rate and
    P(collide|s2) ≤ false_rate, in the reference's row-major order
    (k ascending, l ascending within k). Whole grid in four NumPy
    broadcasts instead of the reference's meshgrid + same argwhere."""
    ks = np.arange(1, max_k + 1, dtype=np.float64)
    ls = np.arange(1, max_l + 1, dtype=np.float64)
    pk1 = s1**ks
    pk2 = s2**ks
    p_tp = 1.0 - (1.0 - pk1[:, None]) ** ls[None, :]
    p_fp = 1.0 - (1.0 - pk2[:, None]) ** ls[None, :]
    return np.argwhere((p_tp >= posi_rate) & (p_fp <= false_rate)) + 1


def greatest_valid_alpha(
    k: int,
    l: int,
    s1: float,
    s2: float,
    posi_rate: float = 0.90,
    false_rate: float = 0.10,
) -> int | None:
    """Greatest alpha with P_alpha(s1) ≥ posi_rate and P_alpha(s2) ≤
    false_rate — get_alpha_minhash (lsh-qd.py:876-910) without its
    empty-grid IndexError (``valid_alphas[-1]`` on an empty argwhere):
    returns None when no alpha qualifies. O(l) via the cumsum tail (the
    per-alpha values are the Binomial(l, s^k) tails, same identity the
    p-stable twin uses); the reference's per-alpha re-summation is O(l²)
    and dominates the joint grid search at its l≤1000 bound."""
    t1 = binom_tail_all_alphas(s1**k, l)
    t2 = binom_tail_all_alphas(s2**k, l)
    valid = np.flatnonzero((t1 >= posi_rate) & (t2 <= false_rate))
    return int(valid[-1]) + 1 if valid.size else None


def greatest_valid_alpha_pstable(
    r: float,
    k: int,
    l: int,
    d1: float,
    d2: float,
    posi_rate: float = 0.90,
    false_rate: float = 0.10,
) -> int | None:
    """p-stable analog — get_alpha_pstable (lsh-qd.py:913-941), same
    empty-grid fix; O(l) via the cumsum tail (values match the reference's
    per-alpha sums to float precision)."""
    p1 = _pstable_base_prob(d1, r) ** k
    p2 = _pstable_base_prob(d2, r) ** k
    t1 = binom_tail_all_alphas(p1, l)
    t2 = binom_tail_all_alphas(p2, l)
    valid = np.flatnonzero((t1 >= posi_rate) & (t2 <= false_rate))
    return int(valid[-1]) + 1 if valid.size else None


def plan_min_space_minhash(
    posi_dist: float,
    false_dist: float,
    posi_rate: float = 0.90,
    false_rate: float = 0.10,
    max_k: int = 1000,
    max_l: int = 1000,
) -> tuple[int, int]:
    """Least-space (k, l) — get_min_k_l_minhash
    (/root/reference/lsh-qd.py:1046-1063): the lexicographically first
    valid grid point. Inputs are Jaccard DISTANCES, as in the reference.

    The reference asserts that this point is also the per-axis minimum of
    the valid set; that holds on every feasible input we've found (the
    valid set is upward-closed in l for fixed k), so we return the same
    point without re-asserting — and without the reference's crash path.
    """
    valid = valid_kl_minhash(
        1.0 - posi_dist, 1.0 - false_dist, posi_rate, false_rate, max_k, max_l
    )
    if valid.size == 0:
        raise ValueError(
            f"no (k, l) grid point meets posi_rate>={posi_rate} and "
            f"false_rate<={false_rate} for dists ({posi_dist}, {false_dist})"
        )
    return int(valid[0, 0]), int(valid[0, 1])


def plan_min_space_pstable(
    posi_dist: float,
    false_dist: float,
    posi_rate: float = 0.90,
    false_rate: float = 0.10,
    rs=(0.5,),
    max_k: int = 1000,
    max_l: int = 400,
) -> tuple[float, int, int]:
    """Least-space (r, k, l) — get_min_r_k_l_pstable
    (/root/reference/lsh-qd.py:1066-1083): the first valid point of the
    get_r_k_l_pstable grid (rs=[0.5], k≤1000, l≤400 hardcoded there).
    Returns the actual r value, not its grid index+1 (a reference bug
    documented at plan_pstable_joint)."""
    for r in rs:
        p1 = _pstable_base_prob(float(posi_dist), r)
        p2 = _pstable_base_prob(float(false_dist), r)
        valid = valid_kl_minhash(p1, p2, posi_rate, false_rate, max_k, max_l)
        if valid.size:
            return float(r), int(valid[0, 0]), int(valid[0, 1])
    raise ValueError(
        f"no (r, k, l) grid point meets posi_rate>={posi_rate} and "
        f"false_rate<={false_rate} for dists ({posi_dist}, {false_dist})"
    )


def _check_balls(posi_dists, false_dists) -> None:
    if not (
        posi_dists[-1] == max(posi_dists) and false_dists[-1] == max(false_dists)
    ):
        raise ValueError("largest neighborhood ball must come last")


def plan_minhash_joint(
    posi_dists,
    false_dists,
    posi_rate: float = 0.90,
    false_rate: float = 0.10,
    max_k: int = 1000,
    max_l: int = 1000,
) -> JointPlan:
    """Joint (k, l, alphas) search — get_k_l_alpha_minhash
    (/root/reference/lsh-qd.py:821-846). Inputs are Jaccard DISTANCES
    (1 - sim), one (posi, false) pair per neighborhood ball, largest ball
    LAST (asserted, as the reference does): alpha=1 must satisfy the most
    permissive ball, so the (k, l) grid is seeded from it, then one alpha
    is tuned per ball.

    Deliberate divergence (documented, not copied): the reference raises on
    the FIRST grid point whose alpha search fails (its loop body can never
    reach a second iteration); we keep scanning grid points and raise only
    when the grid is exhausted — identical output wherever the reference
    succeeds, defined output on a strict superset of inputs."""
    _check_balls(posi_dists, false_dists)
    s1 = 1.0 - float(posi_dists[-1])
    s2 = 1.0 - float(false_dists[-1])
    for k, l in valid_kl_minhash(s1, s2, posi_rate, false_rate, max_k, max_l):
        k, l = int(k), int(l)
        alphas = []
        for pd, fd in zip(posi_dists, false_dists):
            a = greatest_valid_alpha(k, l, 1.0 - pd, 1.0 - fd, posi_rate, false_rate)
            if a is None:
                break
            alphas.append(a)
        if len(alphas) == len(posi_dists):
            return JointPlan(k=k, l=l, alphas=tuple(alphas))
    raise ValueError(
        "no (k, l) admits alpha-tuned neighborhoods for every ball — "
        "widen the rates or the grid"
    )


def plan_pstable_joint(
    posi_dists,
    false_dists,
    posi_rate: float = 0.90,
    false_rate: float = 0.10,
    rs=(0.5,),
    max_k: int = 1000,
    max_l: int = 400,
) -> JointPlan:
    """Joint (r, k, l, alphas) search — get_r_k_l_alpha_pstable
    (/root/reference/lsh-qd.py:849-873) over get_r_k_l_pstable's grid
    (lsh-qd.py:985-1043; rs=[0.5], k≤1000, l≤400 are its hardcoded ranges).
    Inputs are Euclidean distances, largest ball last.

    Two reference bugs deliberately not copied: (1) its argwhere+1 over the
    3D grid returns the r INDEX+1 as the r value (so rs=[0.5] yields r=1);
    we return the actual r. (2) the first-failure raise, as in
    plan_minhash_joint."""
    _check_balls(posi_dists, false_dists)
    for r in rs:
        p1 = _pstable_base_prob(float(posi_dists[-1]), r)
        p2 = _pstable_base_prob(float(false_dists[-1]), r)
        # the reference evaluates 1-(1-p^k)^l on the cached base probs —
        # the same grid as the MinHash search with s := p_proj
        for k, l in valid_kl_minhash(p1, p2, posi_rate, false_rate, max_k, max_l):
            k, l = int(k), int(l)
            alphas = []
            for pd, fd in zip(posi_dists, false_dists):
                a = greatest_valid_alpha_pstable(
                    r, k, l, float(pd), float(fd), posi_rate, false_rate
                )
                if a is None:
                    break
                alphas.append(a)
            if len(alphas) == len(posi_dists):
                return JointPlan(k=k, l=l, alphas=tuple(alphas), r=r)
    raise ValueError(
        "no (r, k, l) admits alpha-tuned neighborhoods for every ball"
    )


def ranked_tiers(
    sims: list[float],
    min_recall: float = 0.99,
    max_fp: float = 0.10,
) -> list[PlanResult]:
    """One plan per similarity tier (multi-radius dedup levels) —
    get_ranked_neighb_params, lsh-qd.py:1086-1101. Tiers share the
    signature stage; each adds only a banding pass (SURVEY.md §2.9 C3)."""
    out = []
    for s in sorted(sims, reverse=True):
        s2 = max(0.05, s - 0.25)
        out.append(plan_minhash(s, s2, min_recall, max_fp))
    return out
