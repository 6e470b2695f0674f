"""Property-based tests (hypothesis) for the pure-Python result contract —
beyond the reference's test strategy (SURVEY.md §5: it has no randomized
testing). No SparkSession needed; these run in milliseconds."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from great_expectations_spark.core.result import (
    format_map_output,
    mostly_success,
    parse_result_format,
    validate_metric_value_between,
)
from great_expectations_spark.functions.stats import (
    kl_divergence,
    ks_from_histograms,
    norm_cdf,
    psi,
)

counts = st.integers(min_value=0, max_value=10**9)


@given(elem=counts, nonnull=counts, unexpected=counts)
@settings(max_examples=200)
def test_format_map_output_invariants(elem, nonnull, unexpected):
    nonnull = min(nonnull, elem)
    unexpected = min(unexpected, nonnull)
    rf = parse_result_format("BASIC")
    out = format_map_output(rf, True, elem, nonnull, unexpected)
    r = out["result"]
    assert r["missing_count"] == elem - nonnull
    if elem:
        assert 0 <= r["missing_percent"] <= 100
        assert 0 <= r["unexpected_percent_total"] <= 100
    if nonnull:
        assert 0 <= r["unexpected_percent"] <= 100
        # percent identities
        assert math.isclose(
            r["unexpected_percent_total"],
            r["unexpected_percent"] * nonnull / elem,
            rel_tol=1e-9,
        )


@given(considered=counts, unexpected=counts, mostly=st.floats(0, 1))
@settings(max_examples=200)
def test_mostly_monotone(considered, unexpected, mostly):
    unexpected = min(unexpected, considered)
    ok = mostly_success(considered, unexpected, mostly)
    # fewer unexpected can never flip success → failure
    if unexpected > 0:
        assert mostly_success(considered, unexpected - 1, mostly) >= ok
    # zero unexpected always succeeds
    assert mostly_success(considered, 0, mostly) is True


@given(
    v=st.floats(allow_nan=False, allow_infinity=False, width=32),
    lo=st.floats(allow_nan=False, allow_infinity=False, width=32),
    hi=st.floats(allow_nan=False, allow_infinity=False, width=32),
)
@settings(max_examples=200)
def test_value_between_consistency(v, lo, hi):
    ok, out = validate_metric_value_between(v, min_value=lo, max_value=hi)
    assert out["observed_value"] == v
    assert ok == (lo <= v <= hi)
    # strict bounds are never more permissive
    strict, _ = validate_metric_value_between(
        v, min_value=lo, max_value=hi, strict_min=True, strict_max=True
    )
    assert strict <= ok


weights = st.lists(st.floats(0.0001, 1.0), min_size=2, max_size=12)


@given(w=weights)
@settings(max_examples=200)
def test_kl_self_is_zero_and_nonnegative(w):
    assert abs(kl_divergence(w, list(w))) < 1e-9
    shifted = w[1:] + w[:1]
    assert kl_divergence(w, shifted) >= -1e-12


@given(w=weights)
@settings(max_examples=200)
def test_ks_psi_self_zero(w):
    assert ks_from_histograms(w, list(w)) < 1e-12
    assert abs(psi(w, list(w))) < 1e-12


@given(x=st.floats(-30, 30), m=st.floats(-5, 5), s=st.floats(0.1, 10))
@settings(max_examples=200)
def test_norm_cdf_monotone_bounded(x, m, s):
    c = norm_cdf(x, m, s)
    assert 0.0 <= c <= 1.0
    assert norm_cdf(x + 0.5, m, s) >= c


# ---- rule_profiler pure-Python machinery -----------------------------------

hist_values = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=2,
    max_size=40,
)


@given(vals=hist_values, fpr=st.floats(0.01, 0.5))
@settings(max_examples=100, deadline=None)
def test_range_estimators_bounded_by_observations(vals, fpr):
    """exact/quantiles ranges always sit inside [min, max] of the history
    and are ordered; bootstrap/kde are ordered and deterministic by seed."""
    from great_expectations_spark.rule_profiler import estimate_numeric_range

    lo, hi = estimate_numeric_range(vals, "exact")
    assert lo == min(vals) and hi == max(vals)
    qlo, qhi = estimate_numeric_range(vals, "quantiles", false_positive_rate=fpr)
    assert lo <= qlo <= qhi <= hi
    b1 = estimate_numeric_range(vals, "bootstrap", false_positive_rate=fpr, seed=3)
    b2 = estimate_numeric_range(vals, "bootstrap", false_positive_rate=fpr, seed=3)
    assert b1 == b2 and b1[0] <= b1[1]
    k1 = estimate_numeric_range(vals, "kde", false_positive_rate=fpr, seed=3)
    assert k1 == estimate_numeric_range(vals, "kde", false_positive_rate=fpr, seed=3)
    assert k1[0] <= k1[1]


@given(
    idx=st.integers(-3, 2),
    leaf=st.one_of(st.integers(-5, 5), st.text(max_size=5), st.none()),
)
@settings(max_examples=100, deadline=None)
def test_parameter_reference_resolution_roundtrip(idx, leaf):
    """$parameter dotted-path + [idx] resolution reaches any nested leaf;
    non-reference strings pass through untouched; None mid-path resolves
    the whole reference to None (skip semantics, not a crash)."""
    from great_expectations_spark.rule_profiler import _resolve_ref

    params = {"p": {"value": [[leaf, 1], [2, leaf], [leaf, leaf]], "details": {"d": leaf}}}
    got = _resolve_ref(f"$parameter.p.value[{idx}][0]", params, {})
    assert got == params["p"]["value"][idx][0]
    assert _resolve_ref("$parameter.p.details.d", params, {}) == leaf
    assert _resolve_ref("plain-string", params, {}) == "plain-string"
    assert _resolve_ref("$variables.v", params, {"v": leaf}) == leaf
    assert _resolve_ref("$parameter.p.value[0][0].nope", {"p": {"value": [[None]]}}, {}) is None
