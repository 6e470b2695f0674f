"""Driver-side distribution-test math over histogram counts.

The cluster computes only histogram/value counts (inside the suite's single
bundled aggregate pass); these pure-Python/numpy functions turn them into test
statistics. This mirrors the reference's KL pipeline shape
(partition object → histogram → tail holdouts → scipy.stats.entropy at
expect_column_kl_divergence_to_be_less_than.py:334-693) but with the math
implemented locally (no scipy in this environment) and extended with PSI and
a histogram-based KS (the reference's KS/chi-square are pandas-only —
self_check/util.py:1903-1906).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence


def _norm(xs: Sequence[float]) -> list[float]:
    t = float(sum(xs))
    if t <= 0:
        return [0.0 for _ in xs]
    return [x / t for x in xs]


def kl_divergence(pk: Sequence[float], qk: Sequence[float]) -> float:
    """sum pk*ln(pk/qk); 0*ln0 = 0; pk>0 with qk==0 → inf.

    Same definition as scipy.stats.entropy(pk, qk) used by the reference.
    """
    pk = _norm(pk)
    qk = _norm(qk)
    total = 0.0
    for p, q in zip(pk, qk):
        if p == 0:
            continue
        if q == 0:
            return math.inf
        total += p * math.log(p / q)
    return total


def adjust_expected_weights(
    weights: Sequence[float],
    tail_weight_holdout: float = 0.0,
    internal_weight_holdout: float = 0.0,
    tail_weights: Optional[Sequence[float]] = None,
) -> tuple[list[float], float, float]:
    """Apply the reference's holdout semantics to an expected partition.

    Returns (bin_weights, below_weight, above_weight). Explicit
    ``tail_weights`` in the partition object win over ``tail_weight_holdout``.
    Internal holdout is distributed evenly over zero-weight bins
    (reference: expect_column_kl_divergence_to_be_less_than.py:334-693).
    """
    w = [float(x) for x in weights]
    if tail_weights is not None:
        below, above = float(tail_weights[0]), float(tail_weights[1])
    else:
        below = above = tail_weight_holdout / 2.0
    scale = 1.0 - below - above - internal_weight_holdout
    w = [x * scale / sum(w) for x in w] if sum(w) > 0 else w
    if internal_weight_holdout > 0:
        zero_bins = [i for i, x in enumerate(w) if x == 0]
        if zero_bins:
            add = internal_weight_holdout / len(zero_bins)
            for i in zero_bins:
                w[i] += add
    return w, below, above


def psi(
    observed: Sequence[float], expected: Sequence[float], eps: float = 1e-6
) -> float:
    """Population Stability Index: sum (p-q)*ln(p/q) with epsilon floors."""
    p = [max(x, eps) for x in _norm(observed)]
    q = [max(x, eps) for x in _norm(expected)]
    p = _norm(p)
    q = _norm(q)
    return sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))


def ks_from_histograms(
    observed: Sequence[float], expected: Sequence[float]
) -> float:
    """KS statistic D = max |CDF_p - CDF_q| evaluated at shared bin edges.

    Histogram-based (sketch) KS — the 10^12-scale replacement for the
    reference's sample-based bootstrapped KS (pandas-only)."""
    p = _norm(observed)
    q = _norm(expected)
    d = 0.0
    cp = cq = 0.0
    for pi, qi in zip(p, q):
        cp += pi
        cq += qi
        d = max(d, abs(cp - cq))
    return d


def kolmogorov_sf(lam: float, terms: int = 101) -> float:
    """Asymptotic Kolmogorov distribution survival fn Q(λ)=2Σ(-1)^{k-1}e^{-2k²λ²}."""
    if lam <= 0:
        return 1.0
    total = 0.0
    for k in range(1, terms):
        total += (-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
    return max(0.0, min(1.0, 2.0 * total))


def ks_pvalue(d: float, n_obs: float, n_exp: Optional[float] = None) -> float:
    """Two-sample (or one-sample if n_exp None) asymptotic KS p-value."""
    if n_exp:
        en = n_obs * n_exp / (n_obs + n_exp)
    else:
        en = n_obs
    if en <= 0:
        return 1.0
    lam = (math.sqrt(en) + 0.12 + 0.11 / math.sqrt(en)) * d
    return kolmogorov_sf(lam)


# ---- regularized incomplete gamma (for chi-square p-value; no scipy) ----


def _gamma_series(a: float, x: float, itmax: int = 500, eps: float = 3e-12) -> float:
    """P(a,x) by series expansion (x < a+1)."""
    ap = a
    s = 1.0 / a
    delta = s
    for _ in range(itmax):
        ap += 1.0
        delta *= x / ap
        s += delta
        if abs(delta) < abs(s) * eps:
            break
    return s * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_cf(a: float, x: float, itmax: int = 500, eps: float = 3e-12) -> float:
    """Q(a,x) by continued fraction (x >= a+1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, itmax):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def gammainc_upper_reg(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("bad args to gammainc_upper_reg")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_series(a, x)
    return _gamma_cf(a, x)


def chi2_sf(stat: float, df: int) -> float:
    """Chi-square survival function P(X >= stat)."""
    if df <= 0:
        return 1.0
    return gammainc_upper_reg(df / 2.0, stat / 2.0)


def chi_square_test(
    observed: Sequence[float], expected_weights: Sequence[float]
) -> tuple[float, float]:
    """Pearson chi-square of observed counts vs expected weights.

    Returns (statistic, p_value); df = k-1."""
    n = float(sum(observed))
    stat = 0.0
    w = _norm(expected_weights)
    for o, wi in zip(observed, w):
        e = n * wi
        if e == 0:
            if o > 0:
                return math.inf, 0.0
            continue
        stat += (o - e) ** 2 / e
    return stat, chi2_sf(stat, len(observed) - 1)


# ---- parameterized distribution CDFs (for one-sample KS; no scipy) ------


def norm_cdf(x: float, mean: float = 0.0, std: float = 1.0) -> float:
    return 0.5 * (1.0 + math.erf((x - mean) / (std * math.sqrt(2.0))))


def uniform_cdf(x: float, lo: float = 0.0, scale: float = 1.0) -> float:
    if scale <= 0:
        return 1.0 if x >= lo else 0.0
    return min(1.0, max(0.0, (x - lo) / scale))


def expon_cdf(x: float, loc: float = 0.0, scale: float = 1.0) -> float:
    if x < loc:
        return 0.0
    return 1.0 - math.exp(-(x - loc) / scale)


def parameterized_cdf(distribution: str, params) -> "Callable[[float], float]":
    """CDF factory for the distributions the reference's parameterized KS
    supports on our sketch path. ``params``: dict (named keys) or sequence
    (positional loc/scale-style)."""
    if isinstance(params, dict):
        if distribution == "norm":
            m = float(params.get("mean", params.get("loc", 0.0)))
            s = float(params.get("std_dev", params.get("scale", 1.0)))
            return lambda x: norm_cdf(x, m, s)
        if distribution == "uniform":
            lo = float(params.get("min", params.get("loc", 0.0)))
            sc = float(params.get("range", params.get("scale", 1.0)))
            return lambda x: uniform_cdf(x, lo, sc)
        if distribution in ("expon", "exponential"):
            lo = float(params.get("loc", 0.0))
            sc = float(params.get("scale", 1.0))
            return lambda x: expon_cdf(x, lo, sc)
    else:
        p = [float(v) for v in (params or [])]
        if distribution == "norm":
            return lambda x: norm_cdf(x, p[0] if p else 0.0, p[1] if len(p) > 1 else 1.0)
        if distribution == "uniform":
            return lambda x: uniform_cdf(x, p[0] if p else 0.0, p[1] if len(p) > 1 else 1.0)
        if distribution in ("expon", "exponential"):
            return lambda x: expon_cdf(x, p[0] if p else 0.0, p[1] if len(p) > 1 else 1.0)
    raise ValueError(f"unsupported distribution: {distribution}")


def cramers_phi(contingency: dict, n_rows: int, n_cols: int) -> tuple[float, float]:
    """Cramér's V (phi_c) from a contingency table {(a_val, b_val): count}.

    Returns (phi, chi2). phi = sqrt(chi2 / (N * min(r-1, c-1)))."""
    total = float(sum(contingency.values()))
    if total == 0 or n_rows < 2 or n_cols < 2:
        return 0.0, 0.0
    row_m: dict = {}
    col_m: dict = {}
    for (a, b), c in contingency.items():
        row_m[a] = row_m.get(a, 0) + c
        col_m[b] = col_m.get(b, 0) + c
    chi2 = 0.0
    for a, ra in row_m.items():
        for b, cb in col_m.items():
            exp = ra * cb / total
            obs = contingency.get((a, b), 0)
            if exp > 0:
                chi2 += (obs - exp) ** 2 / exp
    denom = total * min(len(row_m) - 1, len(col_m) - 1)
    return (math.sqrt(chi2 / denom) if denom > 0 else 0.0), chi2
