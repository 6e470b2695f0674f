"""Per-partition drift verdicts (north rule: "KS/PSI tests per partition").

Every drift decider — continuous (KL / KS / PSI / parameterized-KS ride the
rollup histogram aggregates) AND categorical (chi-square / categorical KL /
categorical PSI from the partition-local value-count tops) AND bootstrapped-KS
(one partition-keyed population collect split driver-side) AND Cramér's phi
(partition-local contingency) — emits a verdict per data partition when the
suite runs with partition_by, alongside the unchanged global verdict.
"""

import pytest

from great_expectations_spark import ExpectationSuite, validate


@pytest.fixture(scope="module")
def drift_df(spark):
    """fmt='ok' matches the expected partitions; fmt='bad' drifts hard."""
    rows = []
    # categorical column `cat`: ok = 50/50 over {1,2}; bad = all 1s
    # continuous column `x`: ok ~ uniform over [0,1); bad = clumped near 0
    # pair (a, b): ok = independent; bad = identical (max association)
    for i in range(400):
        cat = 1 if i % 2 == 0 else 2
        x = (i % 100) / 100.0 + 0.005
        a, b = i % 2, (i // 2) % 2  # independent
        rows.append(("ok", cat, x, a, b))
    for i in range(400):
        x = (i % 10) / 100.0 + 0.001  # all in [0, 0.1)
        a = i % 2
        rows.append(("bad", 1, x, a, a))  # cat always 1; b == a
    return spark.createDataFrame(rows, ["fmt", "cat", "x", "a", "b"])


CAT_PO = {"values": [1, 2], "weights": [0.5, 0.5]}
CONT_PO = {"bins": [0.0, 0.25, 0.5, 0.75, 1.0], "weights": [0.25, 0.25, 0.25, 0.25]}


def _by_partition(res, expectation_type):
    out = {}
    for r in res.partition_results:
        if r.expectation_config["expectation_type"] == expectation_type:
            out[r.partition["fmt"]] = r
    return out


@pytest.fixture(scope="module")
def drift_res(drift_df):
    s = ExpectationSuite("partition_drift")
    s.add(
        "expect_column_chi_square_test_p_value_to_be_greater_than",
        column="cat", partition_object=CAT_PO, p=0.05,
    )
    s.add(
        "expect_column_kl_divergence_to_be_less_than",
        column="cat", partition_object=CAT_PO, threshold=0.1,
    )
    s.add(
        "expect_column_psi_to_be_less_than",
        column="cat", partition_object=CAT_PO, threshold=0.2,
    )
    s.add(
        "expect_column_kstest_p_value_to_be_greater_than",
        column="x", partition_object=CONT_PO, p=0.05,
    )
    s.add(
        "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
        column="x", partition_object=CONT_PO, p=0.05,
    )
    s.add(
        "expect_column_pair_cramers_phi_value_to_be_less_than",
        column_A="a", column_B="b", threshold=0.5,
    )
    return validate(drift_df, s, result_format="BASIC", partition_by=["fmt"])


@pytest.mark.parametrize(
    "etype",
    [
        "expect_column_chi_square_test_p_value_to_be_greater_than",
        "expect_column_kl_divergence_to_be_less_than",
        "expect_column_psi_to_be_less_than",
        "expect_column_kstest_p_value_to_be_greater_than",
        "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
        "expect_column_pair_cramers_phi_value_to_be_less_than",
    ],
)
def test_per_partition_drift_verdicts(drift_res, etype):
    parts = _by_partition(drift_res, etype)
    assert set(parts) == {"ok", "bad"}, f"{etype}: missing partition verdicts"
    assert parts["ok"].success is True, (etype, parts["ok"].result)
    assert parts["bad"].success is False, (etype, parts["bad"].result)


def test_global_verdicts_reflect_mixture(drift_res):
    """The global verdict is over the union (half drifted) — every drift
    expectation fails globally on this mixture, matching the pre-partition
    behavior (no semantic change from adding partition capability)."""
    by_type = {
        r.expectation_config["expectation_type"]: r for r in drift_res.results
    }
    assert by_type[
        "expect_column_chi_square_test_p_value_to_be_greater_than"
    ].success is False
    assert by_type["expect_column_kstest_p_value_to_be_greater_than"].success is False


def test_partition_observed_values_are_partition_local(drift_res):
    """The 'bad' chi-square partition verdict must be computed from ONLY the
    bad partition's counts (400 rows of cat=1), not the global counts."""
    parts = _by_partition(
        drift_res, "expect_column_chi_square_test_p_value_to_be_greater_than"
    )
    assert parts["bad"].result["details"]["observed_counts"] == [400, 0]
    assert parts["ok"].result["details"]["observed_counts"] == [200, 200]


def test_cramers_phi_partition_values(drift_res):
    parts = _by_partition(
        drift_res, "expect_column_pair_cramers_phi_value_to_be_less_than"
    )
    # identical columns over a 2x2 table: the Yates continuity correction
    # (reference semantics — scipy chi2_contingency's default at dof 1)
    # gives chi2 = 4*(100-0.5)^2/100 = 396.01 over 400 rows -> phi 0.995
    # exactly, not 1.0; independent -> phi = 0 exactly
    assert parts["bad"].result["observed_value"] == pytest.approx(0.995)
    assert parts["ok"].result["observed_value"] == pytest.approx(0.0, abs=1e-12)


def test_partition_top_budget_fallback(spark, monkeypatch):
    """When the driver-rows budget shrinks the per-partition top cap below a
    partition's cardinality, the decider falls back to the exact bounded
    aggregate for that partition (lumped tail surfaced in details) instead
    of silently computing on a clipped table."""
    from great_expectations_spark.plans import planner as planner_mod

    monkeypatch.setattr(planner_mod, "PARTITION_TOP_BUDGET", 1)  # cap -> 64
    rows = [("p", i % 200, ) for i in range(2000)] + [("q", 1) for _ in range(500)]
    df = spark.createDataFrame(rows, ["fmt", "cat"])
    s = ExpectationSuite("budget")
    s.add(
        "expect_column_psi_to_be_less_than",
        column="cat",
        partition_object={"values": [1, 2], "weights": [0.5, 0.5]},
        threshold=0.2,
    )
    res = validate(df, s, result_format="BASIC", partition_by=["fmt"])
    parts = {r.partition["fmt"]: r for r in res.partition_results}
    # p has 200 distinct values > cap 64 -> exact fallback, lumped tail
    assert parts["p"].result["details"]["observed_truncated"] is True
    assert parts["p"].result["details"]["tail_lumped_rows"] == 2000 - 10 - 10
    assert parts["p"].success is False  # mass far outside {1,2}
    # q fits in the cap -> partition-local top, all mass on value 1
    assert parts["q"].success is False
    assert "details" not in parts["q"].result or not parts["q"].result.get(
        "details", {}
    ).get("observed_truncated")


def test_distinct_set_and_mode_per_partition(spark):
    """distinct-set and most-common-value verdicts per data partition: each
    partition is judged on ITS value domain and ITS mode, not the union."""
    rows = (
        [("p", "a")] * 5 + [("p", "b")] * 3
        + [("q", "a")] * 2 + [("q", "z")] * 6
    )
    df = spark.createDataFrame(rows, ["fmt", "v"])
    s = ExpectationSuite("gbpart")
    s.add("expect_column_distinct_values_to_be_in_set", column="v",
          value_set=["a", "b"])
    s.add("expect_column_most_common_value_to_be_in_set", column="v",
          value_set=["a"])
    res = validate(df, s, result_format="BASIC", partition_by=["fmt"])
    parts = {
        (r.partition["fmt"], r.expectation_config["expectation_type"]): r
        for r in res.partition_results
    }
    dset = "expect_column_distinct_values_to_be_in_set"
    mode = "expect_column_most_common_value_to_be_in_set"
    assert parts[("p", dset)].success is True
    assert parts[("p", dset)].result["observed_value"] == ["a", "b"]
    assert parts[("q", dset)].success is False  # 'z' outside the set
    assert parts[("p", mode)].success is True   # mode of p is 'a'
    assert parts[("q", mode)].success is False  # mode of q is 'z'
    assert parts[("q", mode)].result["observed_value"] == ["z"]
    # global verdicts unchanged in shape: union domain fails, global mode 'z'... 
    by_type = {r.expectation_config["expectation_type"]: r for r in res.results}
    assert by_type[dset].success is False
    assert by_type[dset].result["observed_value"] == ["a", "b", "z"]


def test_partition_verdict_equals_filtered_global(spark, drift_df):
    """INVARIANT: a per-partition drift verdict (and its observed statistic)
    must equal the GLOBAL verdict of validating that partition's rows alone —
    the partitioned machinery is an optimization, never a semantic change."""
    from pyspark.sql import functions as F

    s = ExpectationSuite("equiv")
    s.add("expect_column_chi_square_test_p_value_to_be_greater_than",
          column="cat", partition_object=CAT_PO, p=0.05)
    s.add("expect_column_kl_divergence_to_be_less_than",
          column="cat", partition_object=CAT_PO, threshold=0.1)
    s.add("expect_column_psi_to_be_less_than",
          column="cat", partition_object=CAT_PO, threshold=0.2)
    s.add("expect_column_kstest_p_value_to_be_greater_than",
          column="x", partition_object=CONT_PO, p=0.05)
    s.add("expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
          column="x", partition_object=CONT_PO, p=0.05)
    s.add("expect_column_pair_cramers_phi_value_to_be_less_than",
          column_A="a", column_B="b", threshold=0.5)

    partitioned = validate(drift_df, s, result_format="BASIC", partition_by=["fmt"])
    by_part = {}
    for r in partitioned.partition_results:
        by_part.setdefault(r.partition["fmt"], {})[
            r.expectation_config["expectation_type"]
        ] = r

    for fmt in ("ok", "bad"):
        solo = validate(drift_df.filter(F.col("fmt") == fmt), s, result_format="BASIC")
        for solo_r in solo.results:
            etype = solo_r.expectation_config["expectation_type"]
            part_r = by_part[fmt][etype]
            assert part_r.success == solo_r.success, (fmt, etype)
            pv, sv = part_r.result.get("observed_value"), solo_r.result.get("observed_value")
            if isinstance(sv, float):
                assert pv == pytest.approx(sv, rel=1e-9), (fmt, etype, pv, sv)
            else:
                assert pv == sv, (fmt, etype)


def test_partition_verdict_equals_filtered_global_map_and_agg(spark, drift_df):
    """Same equivalence invariant for map + aggregate + uniqueness families:
    the rollup/groupBy partition machinery must match per-partition
    revalidation exactly. (Uniqueness is equivalent here because no x value
    spans partitions in this fixture — its per-partition verdict counts
    GLOBAL duplicates by design, the documented cross-partition semantics.)"""
    from pyspark.sql import functions as F

    s = ExpectationSuite("equiv_ma")
    s.add("expect_column_values_to_be_between", column="x", min_value=0.0,
          max_value=0.5, mostly=0.4)
    s.add("expect_column_values_to_be_in_set", column="cat", value_set=[1])
    s.add("expect_column_mean_to_be_between", column="x", min_value=0.0, max_value=0.3)
    s.add("expect_column_max_to_be_between", column="x", min_value=0.0, max_value=2.0)
    s.add("expect_column_values_to_be_unique", column="x")
    s.add("expect_column_distinct_values_to_be_in_set", column="cat", value_set=[1, 2])
    s.add("expect_column_most_common_value_to_be_in_set", column="cat", value_set=[1])

    partitioned = validate(drift_df, s, result_format="BASIC", partition_by=["fmt"])
    by_part = {}
    for r in partitioned.partition_results:
        by_part.setdefault(r.partition["fmt"], {})[
            r.expectation_config["expectation_type"]
        ] = r

    for fmt in ("ok", "bad"):
        solo = validate(drift_df.filter(F.col("fmt") == fmt), s, result_format="BASIC")
        for solo_r in solo.results:
            etype = solo_r.expectation_config["expectation_type"]
            part_r = by_part[fmt][etype]
            assert part_r.success == solo_r.success, (fmt, etype)
            for fld in ("element_count", "unexpected_count"):
                if fld in solo_r.result:
                    assert part_r.result.get(fld) == solo_r.result[fld], (
                        fmt, etype, fld, part_r.result, solo_r.result,
                    )
            sv = solo_r.result.get("observed_value")
            if isinstance(sv, float):
                assert part_r.result.get("observed_value") == pytest.approx(sv)
            elif sv is not None:
                assert part_r.result.get("observed_value") == sv, (fmt, etype)


def test_multi_column_partition_key_with_nulls(spark, drift_df):
    """Multi-column partition_by exercises the GROUPING SETS main pass where
    it differs most from rollup (intermediate prefix levels exist but must
    not surface), and a NULL in a key column must form its own partition,
    distinguished from the global grouping level by grouping_id — not
    absorbed into it or dropped."""
    from pyspark.sql import functions as F

    # src: alternating 'a'/'b', with NULL for one slice of the ok rows
    df = drift_df.withColumn(
        "src",
        F.when((F.col("fmt") == "ok") & (F.col("cat") == 2), F.lit(None).cast("string"))
        .when(F.col("b") == 0, F.lit("a"))
        .otherwise(F.lit("b")),
    )

    s = ExpectationSuite("equiv_multi")
    s.add("expect_column_values_to_be_between", column="x", min_value=0.0,
          max_value=0.5, mostly=0.4)
    s.add("expect_column_mean_to_be_between", column="x", min_value=0.0, max_value=0.3)
    s.add("expect_column_kl_divergence_to_be_less_than",
          column="cat", partition_object=CAT_PO, threshold=0.1)

    partitioned = validate(df, s, result_format="BASIC", partition_by=["fmt", "src"])

    keys = {
        (r.partition["fmt"], r.partition["src"])
        for r in partitioned.partition_results
    }
    # expected data partitions: ok×{a,b,NULL}, bad×{a,b} — and NO prefix
    # levels like ('ok', <all src>) leaking out of the grouping sets pass
    assert keys == {("ok", "a"), ("ok", "b"), ("ok", None), ("bad", "a"), ("bad", "b")}

    by_part = {}
    for r in partitioned.partition_results:
        by_part.setdefault(
            (r.partition["fmt"], r.partition["src"]),
            {},
        )[r.expectation_config["expectation_type"]] = r

    # equivalence invariant incl. the NULL-key partition
    for fmt, src in sorted(keys, key=str):
        cond = (F.col("fmt") == fmt) & (
            F.col("src").isNull() if src is None else (F.col("src") == src)
        )
        solo = validate(df.filter(cond), s, result_format="BASIC")
        for solo_r in solo.results:
            etype = solo_r.expectation_config["expectation_type"]
            part_r = by_part[(fmt, src)][etype]
            assert part_r.success == solo_r.success, (fmt, src, etype)
            for fld in ("element_count", "unexpected_count"):
                if fld in solo_r.result:
                    assert part_r.result.get(fld) == solo_r.result[fld], (
                        fmt, src, etype, fld,
                    )
            sv = solo_r.result.get("observed_value")
            if isinstance(sv, float):
                assert part_r.result.get("observed_value") == pytest.approx(sv), (
                    fmt, src, etype,
                )

    # global verdicts must be identical to an unpartitioned run
    plain = validate(df, s, result_format="BASIC")
    for pr, gr in zip(partitioned.results, plain.results):
        assert pr.expectation_config == gr.expectation_config
        assert pr.success == gr.success
        assert pr.result.get("element_count") == gr.result.get("element_count")
        assert pr.result.get("unexpected_count") == gr.result.get("unexpected_count")
