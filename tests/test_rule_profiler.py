"""Rule-based profiler framework: domain builders, multi-batch parameter
builders + range estimators, $parameter templates/conditions, declarative
config, and the onboarding assistant (reference rule_based_profiler/ +
data_assistant/onboarding_data_assistant.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.rule_profiler import (
    CategoricalColumnDomainBuilder,
    ColumnDomainBuilder,
    ColumnPairDomainBuilder,
    DefaultExpectationConfigurationBuilder,
    Domain,
    MapMetricColumnDomainBuilder,
    MeanUnexpectedMapMetricMultiBatchParameterBuilder,
    MetricMultiBatchParameterBuilder,
    MultiColumnDomainBuilder,
    NumericMetricRangeMultiBatchParameterBuilder,
    RegexPatternStringParameterBuilder,
    Rule,
    RuleBasedProfiler,
    SimpleDateFormatStringParameterBuilder,
    TableDomainBuilder,
    ValueSetMultiBatchParameterBuilder,
    estimate_numeric_range,
    onboarding_assistant,
)


@pytest.fixture(scope="module")
def batches(spark):
    """Three seeded batches: id unique, score drifts upward batch-to-batch,
    category low-cardinality, day an ISO date string, always_null null."""
    out = []
    for b in range(3):
        rows = [
            (
                b * 100 + i,
                float(10 * b + i % 7),
                ["red", "green", "blue"][i % 3],
                f"2024-0{b + 1}-{(i % 9) + 1:02d}",
                None,
                ("x" * ((i % 5) + 1)) if i % 10 else None,
                datetime.datetime(2024, b + 1, (i % 27) + 1),
            )
            for i in range(60)
        ]
        out.append(
            spark.createDataFrame(
                rows,
                "id bigint, score double, category string, day string, "
                "always_null string, comment string, created timestamp",
            )
        )
    return out


# ---- domain builders -------------------------------------------------------


def test_column_domain_builder_filters(batches):
    cols = [
        d.kwargs["column"]
        for d in ColumnDomainBuilder(include_semantic_types=["numeric"]).domains(batches)
    ]
    assert cols == ["id", "score"]
    cols = [
        d.kwargs["column"]
        for d in ColumnDomainBuilder(
            include_semantic_types=["text"], exclude_column_names=["always_null"]
        ).domains(batches)
    ]
    assert cols == ["category", "day", "comment"]
    cols = [
        d.kwargs["column"]
        for d in ColumnDomainBuilder(include_column_name_suffixes=["_null"]).domains(
            batches
        )
    ]
    assert cols == ["always_null"]
    with pytest.raises(ValueError, match="semantic"):
        ColumnDomainBuilder(include_semantic_types=["bogus"])


def test_categorical_domain_builder_cardinality(batches):
    cols = [
        d.kwargs["column"]
        for d in CategoricalColumnDomainBuilder(cardinality_limit_mode="VERY_FEW").domains(
            batches
        )
    ]
    # category (3), day (9 distinct in latest batch), score (7) fit <=10;
    # id (60) and comment (5 lengths -> 5 distinct) — comment fits too
    assert "category" in cols and "id" not in cols
    with pytest.raises(ValueError, match="cardinality_limit_mode"):
        CategoricalColumnDomainBuilder(cardinality_limit_mode="NOPE")


def test_categorical_admission_exact_at_the_cap_boundary(spark):
    """A column whose cardinality sits AT the cap must admit/reject by the
    EXACT count, not the HLL sketch — the driver-contract oracle recomputes
    admission with count(DISTINCT), so a ±1% sketch wobble at the boundary
    would flip the emission decision (ADVICE r3). VERY_FEW cap=10: exactly
    10 distinct admits, 11 rejects, deterministically."""
    ten = spark.createDataFrame([(f"v{i % 10}",) for i in range(200)], ["c10"])
    eleven = spark.createDataFrame([(f"v{i % 11}",) for i in range(200)], ["c11"])
    b = CategoricalColumnDomainBuilder(cardinality_limit_mode="VERY_FEW")
    assert [d.kwargs["column"] for d in b.domains([ten])] == ["c10"]
    assert [d.kwargs["column"] for d in b.domains([eleven])] == []


def test_map_metric_domain_builders(batches):
    unique_cols = [
        d.kwargs["column"]
        for d in MapMetricColumnDomainBuilder("column_values.unique").domains(batches)
    ]
    assert "id" in unique_cols and "category" not in unique_cols
    null_cols = [
        d.kwargs["column"]
        for d in MapMetricColumnDomainBuilder("column_values.null").domains(batches)
    ]
    assert null_cols == ["always_null"]
    nonnull_cols = [
        d.kwargs["column"]
        for d in MapMetricColumnDomainBuilder("column_values.nonnull").domains(batches)
    ]
    assert "id" in nonnull_cols and "comment" not in nonnull_cols
    # ratio cap admits the 10%-null comment column
    loose = [
        d.kwargs["column"]
        for d in MapMetricColumnDomainBuilder(
            "column_values.nonnull", max_unexpected_ratio=0.2
        ).domains(batches)
    ]
    assert "comment" in loose


def test_pair_and_multicolumn_domains(batches):
    (d,) = ColumnPairDomainBuilder(["id", "score"]).domains(batches)
    assert d.kwargs == {"column_A": "id", "column_B": "score"}
    (d,) = MultiColumnDomainBuilder(["id", "category"]).domains(batches)
    assert d.kwargs == {"column_list": ["id", "category"]}


# ---- estimators ------------------------------------------------------------


def test_estimate_numeric_range_estimators():
    hist = [10.0, 12.0, 11.0, 13.0, 9.5]
    assert estimate_numeric_range(hist, "exact") == (9.5, 13.0)
    lo, hi = estimate_numeric_range(hist, "quantiles", false_positive_rate=0.5)
    assert 9.5 <= lo <= hi <= 13.0
    lo, hi = estimate_numeric_range(hist, "bootstrap", seed=7)
    assert 9.0 <= lo <= hi <= 13.5
    lo, hi = estimate_numeric_range(hist, "kde", seed=7)
    assert lo < hi
    # deterministic given the seed
    assert (lo, hi) == estimate_numeric_range(hist, "kde", seed=7)
    with pytest.raises(ValueError, match="estimator"):
        estimate_numeric_range(hist, "magic")
    with pytest.raises(ValueError, match="history"):
        estimate_numeric_range([None], "exact")


def test_numeric_range_builder_round_truncate(batches):
    from great_expectations_spark.rule_profiler import _RuleMetricEngine

    d = Domain("column", (("column", "score"),))
    pb = NumericMetricRangeMultiBatchParameterBuilder(
        "r", "column.mean", estimator="exact", round_decimals=1,
        truncate_values={"lower_bound": 0},
    )
    eng = _RuleMetricEngine(batches)
    pb.register(eng, [d])
    eng.resolve()
    out = pb.build(eng, d, {})
    # batch means: 2.9 + 10b for b in 0..2 -> exact range [2.9, 22.9]
    assert out["value"] == [2.9, 22.9]
    assert out["details"]["num_batches"] == 3
    # integer metric forces round_decimals=0 (floor/ceil)
    pb2 = NumericMetricRangeMultiBatchParameterBuilder(
        "r2", "table.row_count", estimator="exact"
    )
    eng2 = _RuleMetricEngine(batches)
    pb2.register(eng2, [Domain("table")])
    eng2.resolve()
    assert pb2.build(eng2, Domain("table"), {})["value"] == [60, 60]
    with pytest.raises(ValueError, match="truncate_values"):
        NumericMetricRangeMultiBatchParameterBuilder(
            "x", "column.mean", truncate_values={"mid": 1}
        )


def test_median_scale_routes_to_sketch(batches, monkeypatch):
    """The metric engine owns the median scale decision (VERDICT r3): above
    MEDIAN_EXACT_MAX_ROWS rows a requested exact median resolves via the
    mergeable GK sketch instead of buffer-every-value percentile, and the
    parameter details surface the per-batch method. Small batches keep
    exact semantics with NO method annotation (profiler oracle unchanged)."""
    from great_expectations_spark import rule_profiler as rp

    d = Domain("column", (("column", "score"),))
    pb = MetricMultiBatchParameterBuilder("m", "column.median")

    eng = rp._RuleMetricEngine(batches)
    pb.register(eng, [d])
    eng.resolve()
    exact = pb.build(eng, d, {})
    assert "method" not in exact["details"]

    monkeypatch.setattr(rp, "MEDIAN_EXACT_MAX_ROWS", 10)
    eng2 = rp._RuleMetricEngine(batches)
    pb.register(eng2, [d])
    eng2.resolve()
    routed = pb.build(eng2, d, {})
    assert routed["details"]["method"] == [
        "approx_percentile(accuracy=10000)"
    ] * 3
    # at accuracy 10000 over 60 rows the sketch answer is an observed value
    # within one element of the exact interpolated median
    for approx, ex in zip(routed["value"], exact["value"]):
        assert abs(approx - ex) <= 1.0


# ---- parameter builders ----------------------------------------------------


def test_value_set_union_and_cap(batches):
    from great_expectations_spark.rule_profiler import _RuleMetricEngine

    d = Domain("column", (("column", "category"),))
    eng = _RuleMetricEngine(batches)
    out = ValueSetMultiBatchParameterBuilder("vs").build(eng, d, {})
    assert out["value"] == ["blue", "green", "red"]
    with pytest.raises(ValueError, match="max_cardinality"):
        ValueSetMultiBatchParameterBuilder("vs", max_cardinality=2).build(
            eng, Domain("column", (("column", "id"),)), {}
        )


def test_regex_and_dateformat_builders(batches):
    from great_expectations_spark.rule_profiler import _RuleMetricEngine

    d_day = Domain("column", (("column", "day"),))
    d_cat = Domain("column", (("column", "category"),))
    rx = RegexPatternStringParameterBuilder("rx", candidate_regexes=[r"\d{4}-\d{2}-\d{2}", r"\d+"])
    fmt = SimpleDateFormatStringParameterBuilder("fmt")
    eng = _RuleMetricEngine(batches)
    rx.register(eng, [d_day, d_cat])
    fmt.register(eng, [d_day])
    eng.resolve()
    assert rx.build(eng, d_day, {})["value"] == r"\d{4}-\d{2}-\d{2}"
    assert rx.build(eng, d_cat, {})["value"] is None  # words match no candidate
    assert fmt.build(eng, d_day, {})["value"] == "%Y-%m-%d"


def test_mean_unexpected_ratio(batches):
    from great_expectations_spark.rule_profiler import _RuleMetricEngine

    d = Domain("column", (("column", "comment"),))
    pb = MeanUnexpectedMapMetricMultiBatchParameterBuilder("nr", "column_values.nonnull")
    eng = _RuleMetricEngine(batches)
    pb.register(eng, [d])
    eng.resolve()
    assert pb.build(eng, d, {})["value"] == pytest.approx(0.1)


# ---- templates, conditions, rules -----------------------------------------


def test_template_substitution_and_conditions():
    params = {
        "rng": {"value": [1, 9], "lower_bound": 1, "upper_bound": 9},
        "ratio": {"value": 0.0},
        "maybe": {"value": None},
    }
    ecb = DefaultExpectationConfigurationBuilder(
        "expect_column_values_to_be_between",
        min_value="$parameter.rng.value[0]",
        max_value="$parameter.rng.value[1]",
        mostly="$variables.mostly",
    )
    cfg = ecb.build(Domain("column", (("column", "x"),)), params, {"mostly": 0.95})
    assert cfg.kwargs == {"column": "x", "min_value": 1, "max_value": 9, "mostly": 0.95}

    gated = DefaultExpectationConfigurationBuilder(
        "expect_column_values_to_not_be_null",
        condition="$parameter.ratio.value == 0",
    )
    assert gated.build(Domain("column", (("column", "x"),)), params, {}) is not None
    gated_off = DefaultExpectationConfigurationBuilder(
        "expect_column_values_to_not_be_null",
        condition="$parameter.ratio.value > 0",
    )
    assert gated_off.build(Domain("column", (("column", "x"),)), params, {}) is None
    # a None-estimated required parameter skips the whole config
    skipped = DefaultExpectationConfigurationBuilder(
        "expect_column_values_to_match_regex", regex="$parameter.maybe.value"
    )
    assert skipped.build(Domain("column", (("column", "x"),)), params, {}) is None
    # unknown parameter name is an error, not a silent skip
    with pytest.raises(KeyError, match="unknown parameter"):
        DefaultExpectationConfigurationBuilder(
            "expect_column_values_to_be_unique", mostly="$parameter.nope.value"
        ).build(Domain("table"), params, {})
    # None ordering comparisons are False (config skipped, no crash)
    assert (
        DefaultExpectationConfigurationBuilder(
            "expect_column_values_to_be_unique",
            condition="$parameter.maybe.value > 0",
        ).build(Domain("table"), params, {})
        is None
    )


def test_rule_based_profiler_from_config(batches):
    config = {
        "name": "my_profiler",
        "variables": {"fpr": 0.05},
        "rules": {
            "row_count_rule": {
                "domain_builder": {"class_name": "TableDomainBuilder"},
                "parameter_builders": [
                    {
                        "class_name": "NumericMetricRangeMultiBatchParameterBuilder",
                        "module_name": "ignored.by.this.engine",
                        "name": "rc",
                        "metric_name": "table.row_count",
                        "estimator": "exact",
                        # reference configs pass variables refs as builder
                        # args — resolved at construction
                        "false_positive_rate": "$variables.fpr",
                    }
                ],
                "expectation_configuration_builders": [
                    {
                        "class_name": "DefaultExpectationConfigurationBuilder",
                        "expectation_type": "expect_table_row_count_to_be_between",
                        "min_value": "$parameter.rc.value[0]",
                        "max_value": "$parameter.rc.value[1]",
                    }
                ],
            },
            "category_rule": {
                "domain_builder": {
                    "class_name": "CategoricalColumnDomainBuilder",
                    "cardinality_limit_mode": "VERY_FEW",
                    "include_column_names": ["category"],
                },
                "parameter_builders": [
                    {"class_name": "ValueSetMultiBatchParameterBuilder", "name": "vs"}
                ],
                "expectation_configuration_builders": [
                    {
                        "expectation_type": "expect_column_values_to_be_in_set",
                        "value_set": "$parameter.vs.value",
                    }
                ],
            },
        },
    }
    suite = RuleBasedProfiler.from_config(config).run(batches)
    by_type = {c.expectation_type: c for c in suite.expectations}
    assert by_type["expect_table_row_count_to_be_between"].kwargs == {
        "min_value": 60, "max_value": 60,
    }
    assert by_type["expect_column_values_to_be_in_set"].kwargs == {
        "column": "category", "value_set": ["blue", "green", "red"],
    }
    assert suite.meta["rules"] == ["row_count_rule", "category_rule"]
    with pytest.raises(ValueError, match="domain_builder"):
        RuleBasedProfiler.from_config(
            {"rules": {"r": {"domain_builder": {"class_name": "Bogus"}}}}
        )


def test_rule_single_agg_per_batch(batches):
    """The whole rule resolves through ONE bundled agg per batch — the
    engine rejects late registration after resolve (two-phase contract)."""
    from great_expectations_spark.rule_profiler import _RuleMetricEngine

    from great_expectations_spark.rule_profiler import _metric_alias

    d = Domain("column", (("column", "score"),))
    eng = _RuleMetricEngine(batches)
    MetricMultiBatchParameterBuilder("m", "column.min").register(eng, [d])
    eng.resolve()
    assert eng.history(_metric_alias("m", "column.min", d)) == [0.0, 10.0, 20.0]
    with pytest.raises(RuntimeError, match="resolved"):
        eng.request("late", F.count(F.lit(1)))


def test_domain_key_no_sanitization_collisions(spark):
    """Columns that sanitize to the same identifier ('a b' vs 'a_b') must
    NOT share an agg alias — each gets its own correct statistics."""
    from great_expectations_spark.rule_profiler import _RuleMetricEngine

    df = spark.createDataFrame([(1.0, 100.0), (2.0, 200.0)], ["a b", "a_b"])
    d1 = Domain("column", (("column", "a b"),))
    d2 = Domain("column", (("column", "a_b"),))
    assert d1.key != d2.key
    eng = _RuleMetricEngine([df])
    pb = MetricMultiBatchParameterBuilder("m", "column.max")
    pb.register(eng, [d1, d2])
    eng.resolve()
    assert pb.build(eng, d1, {})["value"] == [2.0]
    assert pb.build(eng, d2, {})["value"] == [200.0]


# ---- onboarding assistant --------------------------------------------------


def test_onboarding_assistant_suite_shape_and_self_validation(spark, batches):
    suite = onboarding_assistant(
        batches, estimator="exact", exclude_column_names=["created"]
    )
    types = {c.expectation_type for c in suite.expectations}
    assert {
        "expect_table_columns_to_match_set",
        "expect_table_row_count_to_be_between",
        "expect_column_values_to_be_unique",
        "expect_column_values_to_be_null",
        "expect_column_values_to_not_be_null",
        "expect_column_min_to_be_between",
        "expect_column_max_to_be_between",
        "expect_column_mean_to_be_between",
        "expect_column_median_to_be_between",
        "expect_column_quantile_values_to_be_between",
        "expect_column_value_lengths_to_be_between",
        "expect_column_values_to_be_in_set",
        "expect_column_unique_value_count_to_be_between",
    } <= types

    uniq = [
        c.kwargs["column"]
        for c in suite.expectations
        if c.expectation_type == "expect_column_values_to_be_unique"
    ]
    # always_null is VACUOUSLY unique (0 duplicated among 0 non-null values)
    # — the reference's ratio math admits it the same way, and the emitted
    # expectation passes vacuously
    assert uniq == ["id", "always_null"]
    nullity = [
        c.kwargs["column"]
        for c in suite.expectations
        if c.expectation_type == "expect_column_values_to_be_null"
    ]
    assert nullity == ["always_null"]
    mostly = {
        c.kwargs["column"]: c.kwargs.get("mostly")
        for c in suite.expectations
        if c.expectation_type == "expect_column_values_to_not_be_null"
    }
    assert mostly["id"] is None and mostly["comment"] == 0.9

    # with the exact estimator every bound is the min/max of TRAINING-batch
    # history, so validating any training batch must pass every expectation
    from great_expectations_spark.engine import SparkValidationEngine

    res = SparkValidationEngine(spark).validate(batches[-1], suite)
    failed = [r.expectation_config.expectation_type for r in res.results if not r.success]
    assert res.success, f"onboarding suite failed on its own batch: {failed}"


def test_onboarding_assistant_datetime_rule(spark, batches):
    suite = onboarding_assistant(batches, estimator="exact")
    dt_mins = [
        c
        for c in suite.expectations
        if c.expectation_type == "expect_column_min_to_be_between"
        and c.kwargs["column"] == "created"
    ]
    assert len(dt_mins) == 1
    # min of the per-batch minima = batch 0's minimum (2024-01-01)
    assert dt_mins[0].kwargs["min_value"] == datetime.datetime(2024, 1, 1)


def test_partition_parameter_builder_drift_rule(spark, batches):
    """A drift rule: histogram partition objects from the latest batch feed
    expect_column_kl_divergence_to_be_less_than, and the emitted suite
    scores ~0 KL against the batch it was built from."""
    from great_expectations_spark.rule_profiler import PartitionParameterBuilder

    rule = Rule(
        "drift_rule",
        ColumnDomainBuilder(include_column_names=["score", "category"]),
        [PartitionParameterBuilder("po")],
        [
            DefaultExpectationConfigurationBuilder(
                "expect_column_kl_divergence_to_be_less_than",
                partition_object="$parameter.po.value",
                threshold="$variables.kl_threshold",
            )
        ],
    )
    suite = RuleBasedProfiler("drift", [rule], {"kl_threshold": 0.1}).run(batches)
    assert len(suite.expectations) == 2
    cat_po = next(
        c.kwargs["partition_object"]
        for c in suite.expectations
        if c.kwargs["column"] == "category"
    )
    assert sorted(cat_po["values"]) == ["blue", "green", "red"]

    from great_expectations_spark.engine import SparkValidationEngine

    res = SparkValidationEngine(spark).validate(batches[-1], suite)
    assert res.success


def test_onboarding_with_an_empty_batch(spark, batches):
    """A batch with zero rows (real mod/date splits produce these) must not
    crash any rule: aggregate history entries are None (dropped), map-metric
    stats are (0, 0), and the emitted suite still validates."""
    empty = batches[0].limit(0)
    suite = onboarding_assistant([*batches, empty], estimator="exact")
    types = {c.expectation_type for c in suite.expectations}
    assert "expect_table_row_count_to_be_between" in types
    rc = next(
        c for c in suite.expectations
        if c.expectation_type == "expect_table_row_count_to_be_between"
    )
    # the empty batch drags the exact lower bound to 0
    assert rc.kwargs["min_value"] == 0 and rc.kwargs["max_value"] == 60
    from great_expectations_spark.engine import SparkValidationEngine

    assert SparkValidationEngine(spark).validate(batches[-1], suite).success


def test_image_onboarding_assistant(spark):
    """The graft-cell composition: multi-batch metadata rules (fmt set,
    image_id uniqueness, w/h ranges) + the payload expectation roster wired
    to the table's columns — and the emitted suite validates green against
    its own latest training batch."""
    from great_expectations_spark.rule_profiler import image_onboarding_assistant
    from great_expectations_spark.testing.images import images_df

    clean = dict(
        dup_frac=0, corrupt_frac=0, dim_mismatch_frac=0, fmt_mismatch_frac=0,
        phash_perturb_frac=0, null_caption_frac=0,
    )
    imgs = []
    for s in (1, 2, 3):
        df, _, _ = images_df(spark, n=120, seed=s, **clean)
        imgs.append(df)
    suite = image_onboarding_assistant(imgs, estimator="exact")
    by_type = {}
    for c in suite.expectations:
        by_type.setdefault(c.expectation_type, []).append(c.kwargs)

    # payload roster present and wired
    assert by_type["expect_image_bytes_to_be_decodable"] == [{"column": "bytes"}]
    assert by_type["expect_image_dims_to_match_metadata"][0]["w_column"] == "w"
    assert by_type["expect_image_phash_to_match"][0]["max_hamming_distance"] == 0
    # metadata rules: observed fmt set, image_id uniqueness, w/h ranges
    fmt_sets = [
        k for k in by_type.get("expect_column_values_to_be_in_set", [])
        if k["column"] == "fmt"
    ]
    assert fmt_sets and set(fmt_sets[0]["value_set"]) <= {"png", "jpeg", "webp"}
    uniq = {k["column"] for k in by_type.get("expect_column_values_to_be_unique", [])}
    assert "image_id" in uniq
    w_ranges = [
        k for k in by_type.get("expect_column_min_to_be_between", [])
        if k["column"] == "w"
    ]
    assert w_ranges and w_ranges[0]["min_value"] <= w_ranges[0]["max_value"]
    # bytes never leaks into metadata rules
    for t, kws in by_type.items():
        if not t.startswith("expect_image"):
            assert all(k.get("column") != "bytes" for k in kws), t

    from great_expectations_spark.engine import SparkValidationEngine

    res = SparkValidationEngine(spark).validate(imgs[-1], suite)
    failed = [
        (r.expectation_config["expectation_type"], r.expectation_config["kwargs"])
        for r in res.results
        if not r.success
    ]
    assert res.success, failed


def test_image_onboarding_defect_batches_exclude_dirty_rules(spark):
    """With the generator's default defect injection, the uniqueness rule
    correctly REFUSES image_id (a duplicate id exists in the history) — the
    multi-batch admission sees real data, not wishful schema assumptions."""
    from great_expectations_spark.rule_profiler import image_onboarding_assistant
    from great_expectations_spark.testing.images import images_df

    imgs = [images_df(spark, n=120, seed=s)[0] for s in (1, 2, 3)]
    suite = image_onboarding_assistant(imgs, estimator="exact")
    uniq = {
        c.kwargs["column"]
        for c in suite.expectations
        if c.expectation_type == "expect_column_values_to_be_unique"
    }
    assert "image_id" not in uniq  # seed 1 injects img-000000000025 twice
