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


def ks_cdf_exact(d: float, n: int) -> float:
    """Exact P(D_n < d) for the one-sample KS statistic at sample size n —
    Marsaglia–Tsang–Wang matrix method (J. Statistical Software 8(18), 2003;
    public textbook numerics, same algorithm scipy uses for small n). The
    asymptotic Kolmogorov distribution is badly biased at the tiny bootstrap
    sample sizes (~2×n_bins) the bootstrapped-KS expectation draws."""
    if n <= 0 or d <= 0.0:
        return 0.0
    if d >= 1.0:
        return 1.0
    k = int(math.ceil(n * d))
    h = k - n * d
    m = 2 * k - 1
    H = [[0.0] * m for _ in range(m)]
    for i in range(m):
        for j in range(m):
            H[i][j] = 0.0 if i - j + 1 < 0 else 1.0
    for i in range(m):
        H[i][0] -= h ** (i + 1)
        H[m - 1][i] -= h ** (m - i)
    if 2 * h - 1 > 0:
        H[m - 1][0] += (2 * h - 1) ** m
    for i in range(m):
        for j in range(m):
            if i - j + 1 > 0:
                for g in range(1, i - j + 2):
                    H[i][j] /= g
    # Q = H^n with overflow rescaling; track the power-of-1e140 exponent
    eH = 0
    Q = [row[:] for row in H]
    eQ = 0
    # binary exponentiation keeps this O(log n) matrix products
    def matmul(A, B):
        size = len(A)
        out = [[0.0] * size for _ in range(size)]
        for i in range(size):
            Ai = A[i]
            for g in range(size):
                a = Ai[g]
                if a == 0.0:
                    continue
                Bg = B[g]
                Oi = out[i]
                for j in range(size):
                    Oi[j] += a * Bg[j]
        return out

    power = n - 1
    base, eBase = H, eH
    while power > 0:
        if power & 1:
            Q = matmul(Q, base)
            eQ += eBase
            if Q[k - 1][k - 1] > 1e140:
                Q = [[v * 1e-140 for v in row] for row in Q]
                eQ += 140
        base = matmul(base, base)
        eBase *= 2
        if base[k - 1][k - 1] > 1e140:
            base = [[v * 1e-140 for v in row] for row in base]
            eBase += 140
        power >>= 1
    s = Q[k - 1][k - 1]
    for i in range(1, n + 1):
        s = s * i / n
        if s < 1e-140:
            s *= 1e140
            eQ -= 140
    out = s if eQ == 0 else s * math.pow(10.0, eQ)
    return max(0.0, min(1.0, out))


def ks_critical_value(n: int, alpha: float, exact_max_n: int = 140) -> float:
    """d_crit with P(D_n ≥ d_crit) = alpha — bisection over the exact (or
    asymptotic for large n) distribution. p-value(D) is strictly decreasing
    in D, so ``p-value ≥ alpha ⇔ D ≤ d_crit``: one solve replaces a
    per-draw distribution evaluation in bootstrap loops."""
    def sf(d: float) -> float:
        if n <= exact_max_n:
            return 1.0 - ks_cdf_exact(d, n)
        return ks_pvalue(d, n)

    lo, hi = 0.0, 1.0
    for _ in range(60):
        mid = (lo + hi) / 2
        if sf(mid) >= alpha:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def ks_test_sample(values, cdf, exact_max_n: int = 140) -> tuple[float, float]:
    """One-sample two-sided KS test of ``values`` against ``cdf`` (callable
    over a numpy array). Returns (D, p_value); exact small-n distribution,
    asymptotic beyond ``exact_max_n`` (scipy's auto-mode split)."""
    import numpy as np

    xs = np.sort(np.asarray(values, dtype=np.float64))
    n = len(xs)
    if n == 0:
        return 0.0, 1.0
    F = np.asarray(cdf(xs), dtype=np.float64)
    d_plus = float((np.arange(1, n + 1) / n - F).max())
    d_minus = float((F - np.arange(0, n) / n).max())
    d = max(d_plus, d_minus, 0.0)
    if n <= exact_max_n:
        return d, 1.0 - ks_cdf_exact(d, n)
    return d, ks_pvalue(d, n)


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
    """CDF factory matching the reference's parameterized-KS distributions
    (norm/uniform/expon/beta/gamma/chi2 — scipy-style loc/scale params, plus
    the golden corpus's named keys). ``params``: dict or positional
    sequence."""
    if isinstance(params, dict):
        g = params.get
        if distribution == "norm":
            return lambda x, m=float(g("mean", g("loc", 0.0))), s=float(
                g("std_dev", g("scale", 1.0))
            ): norm_cdf(x, m, s)
        if distribution == "uniform":
            lo = float(g("min", g("loc", 0.0)))
            # reference maps 'max' POSITIONALLY to scipy's scale
            # (dataset/util.py:404-405): support is [min, min+max]
            sc = float(g("max", g("range", g("scale", 1.0))))
            return lambda x, lo=lo, sc=sc: uniform_cdf(x, lo, sc)
        if distribution in ("expon", "exponential"):
            return lambda x, lo=float(g("loc", 0.0)), sc=float(
                g("scale", 1.0)
            ): expon_cdf(x, lo, sc)
        if distribution == "gamma":
            return lambda x, a=float(g("alpha", g("a", 1.0))), lo=float(
                g("loc", 0.0)
            ), sc=float(g("scale", 1.0)): gamma_cdf(x, a, lo, sc)
        if distribution == "chi2":
            return lambda x, df=float(g("df", 1.0)), lo=float(g("loc", 0.0)), sc=float(
                g("scale", 1.0)
            ): chi2_cdf(x, df, lo, sc)
        if distribution == "beta":
            return lambda x, a=float(g("alpha", g("a", 1.0))), b=float(
                g("beta", g("b", 1.0))
            ), lo=float(g("loc", 0.0)), sc=float(g("scale", 1.0)): beta_cdf(
                x, a, b, lo, sc
            )
    else:
        p = [float(v) for v in (params or [])]

        def at(i, default):
            return p[i] if len(p) > i else default

        if distribution == "norm":
            return lambda x: norm_cdf(x, at(0, 0.0), at(1, 1.0))
        if distribution == "uniform":
            # positional (min, max) where max is scipy's scale (util.py:404)
            return lambda x: uniform_cdf(x, at(0, 0.0), at(1, 1.0))
        if distribution in ("expon", "exponential"):
            return lambda x: expon_cdf(x, at(0, 0.0), at(1, 1.0))
        if distribution == "gamma":
            return lambda x: gamma_cdf(x, at(0, 1.0), at(1, 0.0), at(2, 1.0))
        if distribution == "chi2":
            return lambda x: chi2_cdf(x, at(0, 1.0), at(1, 0.0), at(2, 1.0))
        if distribution == "beta":
            return lambda x: beta_cdf(x, at(0, 1.0), at(1, 1.0), at(2, 0.0), at(3, 1.0))
    raise ValueError(f"unsupported distribution: {distribution}")


CROSSTAB_MISSING = "(missing)"  # the reference's literal category labels —
CROSSTAB_OTHER = "(other)"  # raw values equal to them merge, as in pandas
_CROSSTAB_DEFAULT_BINS = 10


def _is_nanish(v) -> bool:
    return v is None or (isinstance(v, float) and v != v)


def crosstab_bin_edges(mn: float, mx: float, bins=None, n_bins=None):
    """Numeric crosstab bin edges, replicating the reference's
    get_binned_values (pandas_dataset.py:584-599): explicit ``bins`` are
    deduped/sorted and extended with the observed min/max when the data
    overflows them; otherwise np.histogram_bin_edges equal-width edges over
    [mn, mx] (the reference passes the full series, but for an integer bin
    count the edges depend only on its range). The last edge is nudged up by
    one ulp so the max lands in the rightmost bin. Returns a float ndarray."""
    import numpy as np

    if n_bins is None:
        n_bins = _CROSSTAB_DEFAULT_BINS
    if bins is not None:
        edges = sorted({float(x) for x in bins})
        if mn < edges[0]:
            edges = [mn] + edges
        if mx > edges[-1]:
            edges = edges + [mx]
        edges = np.asarray(edges, dtype=float)
    else:
        edges = np.histogram_bin_edges(np.asarray([mn, mx], dtype=float), bins=n_bins)
    edges[-1] = np.nextafter(edges[-1], edges[-1] + 1)
    return edges


def crosstab_binner(counts: dict, numeric: bool, bins=None, n_bins=None):
    """Category mapper for one crosstab column, replicating the reference's
    get_binned_values (pandas_dataset.py:573-634) over a bounded value-count
    marginal instead of the raw series. Returns f(value) -> category, where
    None means the row leaves the crosstab (the pandas categorical code -1
    for values below the first explicit bin edge).

    Numeric columns: equal-width n_bins (default 10) or explicit edges;
    null/NaN -> "(missing)". Non-numeric: explicit bins are lists of value
    groups joined into one label; otherwise identity below n_bins+1 distinct
    values, else the top-n_bins values by count with the rest collapsed to
    "(other)". Tie-break among equal counts is (count desc, str(value) asc) —
    deterministic for a distributed engine, where pandas value_counts keeps
    insertion order; phi is tie-invariant whenever the tied values have
    isomorphic joint rows (every corpus case)."""
    import numpy as np

    if n_bins is None:
        n_bins = _CROSSTAB_DEFAULT_BINS
    if numeric:
        nonnull = [float(v) for v in counts if not _is_nanish(v)]
        if not nonnull:
            return lambda v: CROSSTAB_MISSING
        edges = crosstab_bin_edges(min(nonnull), max(nonnull), bins, n_bins)

        def code(v):
            if _is_nanish(v):
                return CROSSTAB_MISSING
            i = int(np.digitize([float(v)], edges)[0])
            if i == 0:
                return None  # below the first explicit edge: dropped
            if i == len(edges):
                return CROSSTAB_MISSING  # beyond the last explicit edge
            return i - 1

        return code
    if bins is not None:
        repl = {}
        for group in bins:
            label = ", ".join(group)
            for v in group:
                repl[v] = label
        return lambda v: CROSSTAB_MISSING if _is_nanish(v) else repl.get(v, v)
    if len(counts) < n_bins + 1:
        return lambda v: CROSSTAB_MISSING if _is_nanish(v) else v
    top = {
        v
        for v, _ in sorted(counts.items(), key=lambda kv: (-kv[1], str(kv[0])))[
            :n_bins
        ]
    }
    return lambda v: (
        CROSSTAB_MISSING
        if _is_nanish(v)
        else (v if v in top else CROSSTAB_OTHER)
    )


def crosstab_phi(
    cells: dict, row_count: int, bin_a, bin_b
) -> tuple[float, float, int, int]:
    """Cramér's phi over binned pair cells {(a_val, b_val): count}, matching
    the reference end to end (dataset.py:4428-4441 + scipy.chi2_contingency):
    chi-square from the crosstab margins with the Yates continuity
    correction when dof == 1, then phi = clip(sqrt(chi2 / row_count /
    (min(r, c) - 1)), 0, 1) where row_count is the FULL domain row count
    (nulls included — they sit in the "(missing)" category) and r, c count
    OBSERVED categories only (pd.crosstab keeps no empty bins).

    Returns (phi, chi2, r, c). Degenerate shapes (min(r, c) < 2, i.e.
    dof 0) return (nan, 0.0, r, c): scipy's dof-0 special case yields
    chi2 = 0, the reference's sqrt(0 / N / 0) is then nan, and
    ``nan <= threshold`` makes the expectation FAIL — same verdict here,
    with the nan surfaced as the observed value.

    Yates note: ``max(|o-e| - 0.5, 0)`` equals scipy >= 1.7's correction
    (gh-13875 capped the adjustment at |o-e|, so cells closer than 0.5 to
    expected contribute exactly 0); the pre-1.7 uncapped form could
    overshoot and differs. The reference's corpus values replay exactly
    under the capped form (tests/test_drift_extras.py golden cases)."""
    ct: dict = {}
    for (va, vb), cnt in cells.items():
        ca, cb = bin_a(va), bin_b(vb)
        if ca is None or cb is None:
            continue
        ct[(ca, cb)] = ct.get((ca, cb), 0) + cnt
    row_m: dict = {}
    col_m: dict = {}
    for (ca, cb), cnt in ct.items():
        row_m[ca] = row_m.get(ca, 0) + cnt
        col_m[cb] = col_m.get(cb, 0) + cnt
    r, c = len(row_m), len(col_m)
    if row_count <= 0 or r < 2 or c < 2:
        return float("nan"), 0.0, r, c
    total = float(sum(ct.values()))
    dof = (r - 1) * (c - 1)
    chi2 = 0.0
    for ca, ra in row_m.items():
        for cb, cm in col_m.items():
            exp = ra * cm / total
            obs = ct.get((ca, cb), 0)
            d = abs(obs - exp)
            if dof == 1:
                d = max(d - 0.5, 0.0)  # Yates, scipy's default for 2x2
            chi2 += d * d / exp
    phi = max(min(math.sqrt(chi2 / row_count / (min(r, c) - 1)), 1.0), 0.0)
    return phi, chi2, r, c


def gammainc_lower_reg(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) = 1 - Q(a, x)."""
    return 1.0 - gammainc_upper_reg(a, x)


def _betacf(a: float, b: float, x: float, itmax: int = 300, eps: float = 3e-12) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, itmax):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def gamma_cdf(x: float, alpha: float, loc: float = 0.0, scale: float = 1.0) -> float:
    if x <= loc:
        return 0.0
    return gammainc_lower_reg(alpha, (x - loc) / scale)


def chi2_cdf(x: float, df: float, loc: float = 0.0, scale: float = 1.0) -> float:
    if x <= loc:
        return 0.0
    return 1.0 - chi2_sf((x - loc) / scale, int(df))


def beta_cdf(x: float, a: float, b: float, loc: float = 0.0, scale: float = 1.0) -> float:
    t = (x - loc) / scale
    return betainc_reg(a, b, min(1.0, max(0.0, t)))


def bootstrap_range_estimate(
    values: Sequence[float],
    false_positive_rate: float = 0.05,
    n_resamples: int = 9999,
    seed: Optional[int] = None,
    quantile_bias_correction: bool = False,
    quantile_bias_std_error_ratio_threshold: float = 0.25,
) -> tuple[float, float]:
    """Bootstrapped [lower, upper] range for a metric observed across
    batches — the reference's multi-batch numeric-range estimator
    (rule_based_profiler/helpers/util.py:702-835
    compute_bootstrap_quantiles_point_estimate +
    estimators/bootstrap_numeric_range_estimator.py, defaults
    n_resamples=9999, false_positive_rate=0.05), clean-room on numpy.

    Per Efron & Tibshirani (1993, pp. 124-130): sample quantiles at
    fpr/2 and 1-fpr/2 (linear interpolation); draw ``n_resamples``
    bootstrap resamples of the history; the point estimate per bound is
    the mean of the per-resample quantiles, bias-corrected
    (estimate - (estimate - sample_quantile)) when the bias /
    standard-error ratio exceeds the 0.25 rule-of-thumb threshold or
    correction is forced."""
    import numpy as np

    vals = np.asarray(list(values), dtype="float64")
    if vals.size < 2:
        raise ValueError("bootstrap_range_estimate needs >= 2 batch values")
    if not (0.0 < false_positive_rate < 1.0):
        raise ValueError("false_positive_rate must be in (0, 1)")
    lo_q = false_positive_rate / 2.0
    hi_q = 1.0 - false_positive_rate / 2.0
    sample_lo = float(np.quantile(vals, lo_q, method="linear"))
    sample_hi = float(np.quantile(vals, hi_q, method="linear"))
    rng = np.random.default_rng(seed)
    boots = rng.choice(vals, size=(n_resamples, vals.size), replace=True)

    def point(q: float, sample_q: float) -> float:
        bq = np.quantile(boots, q, axis=1, method="linear")
        est = float(np.mean(bq))
        se = float(np.std(bq))
        bias = est - sample_q
        if not quantile_bias_correction and se > 0.0 and bias / se <= (
            quantile_bias_std_error_ratio_threshold
        ):
            return est
        return est - bias

    lo, hi = point(lo_q, sample_lo), point(hi_q, sample_hi)
    # the two bounds are bias-corrected INDEPENDENTLY, which can invert them
    # on near-degenerate histories (e.g. [0,0,0,0,1] at fpr 0.5: corrected
    # lower 0.0075 > corrected upper 0.0) — an inverted range would emit an
    # unsatisfiable expectation, so order before returning
    return min(lo, hi), max(lo, hi)
