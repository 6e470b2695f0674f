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
