"""Golden tests for the pure-Python result contract (no Spark).

Asserts the reference's observable output semantics: result_format levels,
unexpected_percent denominators, partial_unexpected_counts ordering, vacuous
truth, mostly, and aggregate between-logic (SURVEY.md §1.4).
"""

import math

import pytest

from great_expectations_spark.core.result import (
    format_map_output,
    mostly_success,
    parse_result_format,
    validate_metric_value_between,
    validate_mostly,
)


def test_parse_result_format_defaults():
    rf = parse_result_format("BASIC")
    assert rf["result_format"] == "BASIC"
    assert rf["partial_unexpected_count"] == 20

    rf2 = parse_result_format({"result_format": "SUMMARY", "partial_unexpected_count": 5})
    assert rf2["partial_unexpected_count"] == 5

    with pytest.raises(ValueError):
        parse_result_format("WRONG")


def test_mostly_validation():
    assert validate_mostly(None) == 1.0
    assert validate_mostly(0.5) == 0.5
    with pytest.raises(ValueError):
        validate_mostly(1.5)


def test_mostly_success():
    assert mostly_success(0, 0, 1.0) is True  # vacuous
    assert mostly_success(10, 0, 1.0) is True
    assert mostly_success(10, 1, 1.0) is False
    assert mostly_success(10, 1, 0.9) is True
    assert mostly_success(10, 2, 0.9) is False


def test_boolean_only():
    out = format_map_output(
        parse_result_format("BOOLEAN_ONLY"), True, 10, 9, 0
    )
    assert out == {"success": True}


def test_basic_payload_percents():
    # 10 rows, 2 null, 8 nonnull, 2 unexpected
    out = format_map_output(
        parse_result_format("BASIC"), False, 10, 8, 2, unexpected_list=[5, 6]
    )
    r = out["result"]
    assert r["element_count"] == 10
    assert r["missing_count"] == 2
    assert r["missing_percent"] == 20.0
    assert r["unexpected_count"] == 2
    # unexpected_percent uses the NONNULL denominator
    assert r["unexpected_percent"] == 25.0
    assert r["unexpected_percent_total"] == 20.0
    assert r["unexpected_percent_nonmissing"] == 25.0
    assert r["partial_unexpected_list"] == [5, 6]
    assert "partial_unexpected_counts" not in r


def test_empty_table_percents_none():
    out = format_map_output(parse_result_format("BASIC"), True, 0, 0, 0)
    r = out["result"]
    assert r["missing_percent"] is None
    assert r["unexpected_percent"] is None
    assert r["unexpected_percent_total"] is None


def test_summary_counts_sorted_by_count_desc_then_value():
    lst = ["b", "a", "a", "c", "b", "a", "c"]
    out = format_map_output(
        parse_result_format("SUMMARY"), False, 10, 10, 7, unexpected_list=lst
    )
    counts = out["result"]["partial_unexpected_counts"]
    assert counts == [
        {"value": "a", "count": 3},
        {"value": "b", "count": 2},
        {"value": "c", "count": 2},
    ]


def test_complete_includes_full_list():
    lst = list(range(30))
    out = format_map_output(
        parse_result_format("COMPLETE"), False, 40, 40, 30, unexpected_list=lst
    )
    r = out["result"]
    assert r["partial_unexpected_list"] == lst[:20]
    assert r["unexpected_list"] == lst


def test_validate_metric_value_between():
    ok, res = validate_metric_value_between(5, 1, 10)
    assert ok and res["observed_value"] == 5
    assert validate_metric_value_between(5, 5, None)[0] is True
    assert validate_metric_value_between(5, 5, None, strict_min=True)[0] is False
    assert validate_metric_value_between(5, None, 5, strict_max=True)[0] is False
    assert validate_metric_value_between(5, None, None)[0] is True
    ok, res = validate_metric_value_between(None, 1, 2)
    assert not ok and res["observed_value"] is None
    ok, _ = validate_metric_value_between(float("nan"), 1, 2)
    assert not ok
