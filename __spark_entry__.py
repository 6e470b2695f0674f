"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``      — flagship: validation suite over the synthesized
                        image+caption table (BASELINE.json input_hint) plus a
                        TPC-H-ish suite on sf0.001 lineitem; returns the
                        validation-results DataFrame.
``queries()``         — one entry per implemented operator from SURVEY.md §2
                        (plus the training-data pipeline operators).
``oracle_sql()``      — DuckDB-equivalent SQL for every SQL-expressible query.

Column names are aligned between the Spark result and the oracle SQL (the
driver sorts columns by name before value-hashing). Integer metrics are cast
to BIGINT on both sides; floats are rounded identically on both sides.
"""

from __future__ import annotations

import math
import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from great_expectations_spark.core.config import ExpectationSuite
from great_expectations_spark.engine import SparkValidationEngine
from great_expectations_spark.operators import dedup as dd
from great_expectations_spark.operators import images as img
from great_expectations_spark.operators import similarity as sim
from great_expectations_spark.operators import text as tx

METRICS_SCHEMA = "expectation string, element_count long, unexpected_count long, success long"
OBS_SCHEMA = "expectation string, observed double, success long"

SF0001 = "/root/testdata/sf0.001"


def _load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _run_suite(spark, df, specs, **kw):
    suite = ExpectationSuite(name="entry")
    for label, t, kwargs in specs:
        cfg = suite.add(t, **kwargs)
        cfg.meta["label"] = label
    return SparkValidationEngine(spark).validate(df, suite, result_format="BASIC", **kw)


def _map_metrics_df(spark, df, specs) -> DataFrame:
    """Run map-style expectations; emit (expectation, element_count,
    unexpected_count, success) — the ExpectationValidationResult metric core."""
    res = _run_suite(spark, df, specs)
    rows = []
    for evr in res.results:
        label = evr.expectation_config["meta"]["label"]
        r = evr.result or {}
        rows.append(
            (
                label,
                int(r["element_count"]) if r.get("element_count") is not None else None,
                int(r["unexpected_count"]) if r.get("unexpected_count") is not None else None,
                1 if evr.success else 0,
            )
        )
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def _obs_df(spark, df, specs, digits: int = 4, **kw) -> DataFrame:
    """Run aggregate expectations; emit (expectation, observed, success)."""
    res = _run_suite(spark, df, specs, **kw)
    rows = []
    for evr in res.results:
        label = evr.expectation_config["meta"]["label"]
        obs = (evr.result or {}).get("observed_value")
        rows.append(
            (label, float(obs) if obs is not None else None, 1 if evr.success else 0)
        )
    out = spark.createDataFrame(rows, OBS_SCHEMA)
    return out.select(
        "expectation", F.round("observed", digits).alias("observed"), "success"
    )


# ---------------------------------------------------------------------------
# map-expectation queries (engine end-to-end; oracle = SQL over same tables)
# ---------------------------------------------------------------------------


def q_nullness(spark, sf_dir):
    ev = _load(spark, sf_dir, "events")
    return _map_metrics_df(
        spark,
        ev,
        [
            ("not_null", "expect_column_values_to_not_be_null", {"column": "props"}),
            ("be_null", "expect_column_values_to_be_null", {"column": "props"}),
        ],
    )


SQL_NULLNESS = """
SELECT 'not_null' AS expectation, CAST(count(*) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count,
       CAST(CASE WHEN sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM events
UNION ALL
SELECT 'be_null', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(CASE WHEN sum(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT)
FROM events
"""


def _one_map_sql(label: str, table: str, unexpected_pred: str, considered: str = "TRUE") -> str:
    """count/sum/mostly-success template shared by the map-expectation oracles
    (mostly = 1.0 → success ⇔ unexpected_count = 0)."""
    return f"""
SELECT '{label}' AS expectation,
       CAST(count(*) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN ({considered}) AND ({unexpected_pred}) THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count,
       CAST(CASE WHEN sum(CASE WHEN ({considered}) AND ({unexpected_pred}) THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM {table}
"""


def q_between(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return _map_metrics_df(
        spark,
        li,
        [
            (
                "between",
                "expect_column_values_to_be_between",
                {"column": "l_quantity", "min_value": 10, "max_value": 40},
            )
        ],
    )


SQL_BETWEEN = _one_map_sql(
    "between", "lineitem", "NOT (l_quantity >= 10 AND l_quantity <= 40)"
)


def q_in_set(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return _map_metrics_df(
        spark,
        li,
        [
            (
                "in_set",
                "expect_column_values_to_be_in_set",
                {"column": "l_returnflag", "value_set": ["A", "N"]},
            )
        ],
    )


SQL_IN_SET = _one_map_sql("in_set", "lineitem", "l_returnflag NOT IN ('A','N')")


def q_not_in_set(spark, sf_dir):
    o = _load(spark, sf_dir, "orders")
    return _map_metrics_df(
        spark,
        o,
        [
            (
                "not_in_set",
                "expect_column_values_to_not_be_in_set",
                {"column": "o_orderpriority", "value_set": ["1-URGENT"]},
            )
        ],
    )


SQL_NOT_IN_SET = _one_map_sql("not_in_set", "orders", "o_orderpriority IN ('1-URGENT')")


def q_value_lengths(spark, sf_dir):
    p = _load(spark, sf_dir, "part")
    return _map_metrics_df(
        spark,
        p,
        [
            (
                "value_lengths",
                "expect_column_value_lengths_to_be_between",
                {"column": "p_name", "min_value": 5, "max_value": 10},
            )
        ],
    )


SQL_VALUE_LENGTHS = _one_map_sql(
    "value_lengths", "part", "NOT (length(p_name) >= 5 AND length(p_name) <= 10)"
)


def q_regex(spark, sf_dir):
    c = _load(spark, sf_dir, "customer")
    return _map_metrics_df(
        spark,
        c,
        [
            (
                "match_regex",
                "expect_column_values_to_match_regex",
                {"column": "c_name", "regex": "^Customer#0000000[0-9]{2}$"},
            ),
            (
                "not_match_regex",
                "expect_column_values_to_not_match_regex",
                {"column": "c_name", "regex": "9$"},
            ),
        ],
    )


SQL_REGEX = (
    _one_map_sql(
        "match_regex", "customer", "NOT regexp_matches(c_name, '^Customer#0000000[0-9]{2}$')"
    )
    + " UNION ALL "
    + _one_map_sql("not_match_regex", "customer", "regexp_matches(c_name, '9$')")
)


def q_regex_list(spark, sf_dir):
    p = _load(spark, sf_dir, "part")
    return _map_metrics_df(
        spark,
        p,
        [
            (
                "regex_list_any",
                "expect_column_values_to_match_regex_list",
                {"column": "p_type", "regex_list": ["^PROMO$", "^ECONOMY$"], "match_on": "any"},
            )
        ],
    )


SQL_REGEX_LIST = _one_map_sql(
    "regex_list_any",
    "part",
    "NOT (regexp_matches(p_type, '^PROMO$') OR regexp_matches(p_type, '^ECONOMY$'))",
)


def q_like(spark, sf_dir):
    p = _load(spark, sf_dir, "part")
    return _map_metrics_df(
        spark,
        p,
        [
            (
                "like",
                "expect_column_values_to_match_like_pattern",
                {"column": "p_name", "like_pattern": "%widget%"},
            ),
            (
                "like_list_any",
                "expect_column_values_to_match_like_pattern_list",
                {
                    "column": "p_brand",
                    "like_pattern_list": ["Brand#1%", "Brand#2%"],
                    "match_on": "any",
                },
            ),
        ],
    )


SQL_LIKE = (
    _one_map_sql("like", "part", "p_name NOT LIKE '%widget%'")
    + " UNION ALL "
    + _one_map_sql(
        "like_list_any",
        "part",
        "NOT (p_brand LIKE 'Brand#1%' OR p_brand LIKE 'Brand#2%')",
    )
)


def q_json(spark, sf_dir):
    ev = _load(spark, sf_dir, "events")
    return _map_metrics_df(
        spark,
        ev,
        [
            ("json_parseable", "expect_column_values_to_be_json_parseable", {"column": "props"}),
            (
                "json_regex",
                "expect_column_values_to_match_regex",
                {"column": "props", "regex": '"k": [0-9]+'},
            ),
        ],
    )


SQL_JSON = (
    _one_map_sql("json_parseable", "events", "NOT json_valid(props)")
    + " UNION ALL "
    + _one_map_sql("json_regex", "events", "NOT regexp_matches(props, '\"k\": [0-9]+')")
)


def q_pair(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return _map_metrics_df(
        spark,
        li,
        [
            (
                "pair_equal",
                "expect_column_pair_values_to_be_equal",
                {"column_A": "l_returnflag", "column_B": "l_linestatus"},
            ),
            (
                "pair_greater",
                "expect_column_pair_values_a_to_be_greater_than_b",
                {"column_A": "l_discount", "column_B": "l_tax"},
            ),
            (
                "pair_in_set",
                "expect_column_pair_values_to_be_in_set",
                {
                    "column_A": "l_returnflag",
                    "column_B": "l_linestatus",
                    "value_pairs_set": [["A", "F"], ["N", "O"], ["R", "F"]],
                },
            ),
        ],
    )


SQL_PAIR = (
    _one_map_sql("pair_equal", "lineitem", "NOT (l_returnflag = l_linestatus)")
    + " UNION ALL "
    + _one_map_sql("pair_greater", "lineitem", "NOT (l_discount > l_tax)")
    + " UNION ALL "
    + _one_map_sql(
        "pair_in_set",
        "lineitem",
        "NOT ((l_returnflag='A' AND l_linestatus='F') OR (l_returnflag='N' AND l_linestatus='O') OR (l_returnflag='R' AND l_linestatus='F'))",
    )
)


def q_multicolumn(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return _map_metrics_df(
        spark,
        li,
        [
            (
                "multicolumn_sum",
                "expect_multicolumn_sum_to_equal",
                {"column_list": ["l_quantity", "l_linenumber"], "sum_total": 30},
            ),
            (
                "unique_within_record",
                "expect_select_column_values_to_be_unique_within_record",
                {"column_list": ["l_partkey", "l_suppkey"]},
            ),
        ],
    )


SQL_MULTICOLUMN = (
    _one_map_sql(
        "multicolumn_sum",
        "lineitem",
        "NOT (coalesce(l_quantity,0) + coalesce(l_linenumber,0) = 30)",
    )
    + " UNION ALL "
    + _one_map_sql("unique_within_record", "lineitem", "l_partkey = l_suppkey")
)


def q_zscore(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return _map_metrics_df(
        spark,
        li,
        [
            (
                "zscore",
                "expect_column_value_z_scores_to_be_less_than",
                {"column": "l_extendedprice", "threshold": 2.0, "double_sided": True},
            )
        ],
    )


SQL_ZSCORE = """
WITH s AS (SELECT avg(l_extendedprice) AS m, stddev_samp(l_extendedprice) AS sd FROM lineitem)
SELECT 'zscore' AS expectation,
       CAST(count(*) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN NOT (abs((l_extendedprice - s.m)/s.sd) < 2.0) THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count,
       CAST(CASE WHEN sum(CASE WHEN NOT (abs((l_extendedprice - s.m)/s.sd) < 2.0) THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM lineitem, s
"""


def q_row_condition(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return _map_metrics_df(
        spark,
        li,
        [
            (
                "row_condition",
                "expect_column_values_to_be_between",
                {
                    "column": "l_quantity",
                    "min_value": 5,
                    "max_value": 45,
                    "row_condition": "l_returnflag = 'A'",
                    "condition_parser": "spark",
                },
            )
        ],
    )


SQL_ROW_CONDITION = """
SELECT 'row_condition' AS expectation,
       CAST(count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN l_returnflag = 'A' AND NOT (l_quantity >= 5 AND l_quantity <= 45) THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count,
       CAST(CASE WHEN sum(CASE WHEN l_returnflag = 'A' AND NOT (l_quantity >= 5 AND l_quantity <= 45) THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM lineitem
"""


def q_mostly(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return _map_metrics_df(
        spark,
        li,
        [
            (
                "mostly",
                "expect_column_values_to_be_in_set",
                {"column": "l_returnflag", "value_set": ["N", "A"], "mostly": 0.6},
            )
        ],
    )


SQL_MOSTLY = """
SELECT 'mostly' AS expectation,
       CAST(count(*) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN l_returnflag NOT IN ('N','A') THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count,
       CAST(CASE WHEN (count(*) - sum(CASE WHEN l_returnflag NOT IN ('N','A') THEN 1 ELSE 0 END)) * 1.0 / count(*) >= 0.6 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM lineitem
"""


def q_strftime(spark, sf_dir):
    ev = _load(spark, sf_dir, "events").withColumn(
        "ts_str", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    return _map_metrics_df(
        spark,
        ev,
        [
            (
                "strftime",
                "expect_column_values_to_match_strftime_format",
                {"column": "ts_str", "strftime_format": "%Y-%m-%d %H:%M:%S"},
            )
        ],
    )


SQL_STRFTIME = _one_map_sql(
    "strftime",
    "events",
    "try_strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') IS NULL",
)


# ---------------------------------------------------------------------------
# aggregate-expectation queries
# ---------------------------------------------------------------------------


def q_agg_stats(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return _obs_df(
        spark,
        li,
        [
            ("min", "expect_column_min_to_be_between", {"column": "l_quantity", "min_value": 0, "max_value": 5}),
            ("max", "expect_column_max_to_be_between", {"column": "l_quantity", "min_value": 45, "max_value": 55}),
            ("mean", "expect_column_mean_to_be_between", {"column": "l_quantity", "min_value": 20, "max_value": 30}),
            ("sum", "expect_column_sum_to_be_between", {"column": "l_quantity", "min_value": 0, "max_value": 1e12}),
            ("stdev", "expect_column_stdev_to_be_between", {"column": "l_quantity", "min_value": 5, "max_value": 25}),
            ("median", "expect_column_median_to_be_between", {"column": "l_quantity", "min_value": 20, "max_value": 30}),
            ("row_count", "expect_table_row_count_to_be_between", {"min_value": 1, "max_value": 10**12}),
        ],
        digits=4,
    )


SQL_AGG_STATS = """
SELECT 'min' AS expectation, round(CAST(min(l_quantity) AS DOUBLE), 4) AS observed,
       CAST(CASE WHEN min(l_quantity) >= 0 AND min(l_quantity) <= 5 THEN 1 ELSE 0 END AS BIGINT) AS success FROM lineitem
UNION ALL SELECT 'max', round(CAST(max(l_quantity) AS DOUBLE), 4),
       CAST(CASE WHEN max(l_quantity) >= 45 AND max(l_quantity) <= 55 THEN 1 ELSE 0 END AS BIGINT) FROM lineitem
UNION ALL SELECT 'mean', round(avg(l_quantity), 4),
       CAST(CASE WHEN avg(l_quantity) >= 20 AND avg(l_quantity) <= 30 THEN 1 ELSE 0 END AS BIGINT) FROM lineitem
UNION ALL SELECT 'sum', round(CAST(sum(l_quantity) AS DOUBLE), 4),
       CAST(CASE WHEN sum(l_quantity) >= 0 AND sum(l_quantity) <= 1e12 THEN 1 ELSE 0 END AS BIGINT) FROM lineitem
UNION ALL SELECT 'stdev', round(stddev_samp(l_quantity), 4),
       CAST(CASE WHEN stddev_samp(l_quantity) >= 5 AND stddev_samp(l_quantity) <= 25 THEN 1 ELSE 0 END AS BIGINT) FROM lineitem
UNION ALL SELECT 'median', round(quantile_cont(l_quantity, 0.5), 4),
       CAST(CASE WHEN quantile_cont(l_quantity, 0.5) >= 20 AND quantile_cont(l_quantity, 0.5) <= 30 THEN 1 ELSE 0 END AS BIGINT) FROM lineitem
UNION ALL SELECT 'row_count', round(CAST(count(*) AS DOUBLE), 4),
       CAST(1 AS BIGINT) FROM lineitem
"""


def q_agg_quantiles(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    res = _run_suite(
        spark,
        li,
        [
            (
                "quantiles",
                "expect_column_quantile_values_to_be_between",
                {
                    "column": "l_extendedprice",
                    "quantile_ranges": {
                        "quantiles": qs,
                        "value_ranges": [[None, None]] * len(qs),
                    },
                },
            )
        ],
    )
    obs = res.results[0].result["observed_value"]
    rows = list(zip([float(q) for q in obs["quantiles"]], [float(v) for v in obs["values"]]))
    out = spark.createDataFrame(rows, "quantile double, value double")
    return out.select("quantile", F.round("value", 2).alias("value"))


SQL_AGG_QUANTILES = " UNION ALL ".join(
    f"SELECT CAST({q} AS DOUBLE) AS quantile,"
    f" round(quantile_cont(l_extendedprice, {q}), 2) AS value FROM lineitem"
    for q in [0.1, 0.25, 0.5, 0.75, 0.9]
)


def q_agg_distinct(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return _obs_df(
        spark,
        li,
        [
            (
                "unique_value_count",
                "expect_column_unique_value_count_to_be_between",
                {"column": "l_partkey", "min_value": 1, "max_value": 10**9},
            ),
            (
                "proportion_unique",
                "expect_column_proportion_of_unique_values_to_be_between",
                {"column": "l_partkey", "min_value": 0, "max_value": 0.5},
            ),
        ],
        digits=6,
    )


SQL_AGG_DISTINCT = """
SELECT 'unique_value_count' AS expectation,
       round(CAST(count(DISTINCT l_partkey) AS DOUBLE), 6) AS observed,
       CAST(1 AS BIGINT) AS success FROM lineitem
UNION ALL
SELECT 'proportion_unique',
       round(CAST(count(DISTINCT l_partkey) AS DOUBLE) / count(l_partkey), 6),
       CAST(CASE WHEN CAST(count(DISTINCT l_partkey) AS DOUBLE) / count(l_partkey) <= 0.5 THEN 1 ELSE 0 END AS BIGINT) FROM lineitem
"""


def q_value_counts(spark, sf_dir):
    """column.value_counts + column.most_common_value (ties semantics,
    planner.py:902) + column.distinct_values (DISTINCT_CAP machinery,
    planner.py:854), one labeled frame — three operators, one driver slot."""
    li = _load(spark, sf_dir, "lineitem")
    o = _load(spark, sf_dir, "orders")
    vc = li.groupBy(F.col("l_returnflag").alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(F.lit("vc").alias("kind"), "value", "cnt")

    mode_res = _run_suite(
        spark,
        o,
        [
            (
                "most_common",
                "expect_column_most_common_value_to_be_in_set",
                {"column": "o_orderpriority", "value_set": ["4-NOT SPECIFIED"]},
            )
        ],
    )
    modes = mode_res.results[0].result["observed_value"]
    mode_df = spark.createDataFrame(
        [("mode", str(m), 0) for m in modes], "kind string, value string, cnt long"
    )

    dset_res = _run_suite(
        spark,
        li,
        [
            (
                "distinct_contain",
                "expect_column_distinct_values_to_contain_set",
                {"column": "l_linestatus", "value_set": ["F", "O"]},
            )
        ],
    )
    observed = dset_res.results[0].result["observed_value"]
    dset_df = spark.createDataFrame(
        [("distinct", str(v), 0) for v in observed],
        "kind string, value string, cnt long",
    )
    return vc.unionAll(mode_df).unionAll(dset_df)


SQL_VALUE_COUNTS = """
SELECT 'vc' AS kind, l_returnflag AS value, CAST(count(*) AS BIGINT) AS cnt
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'mode', o_orderpriority, CAST(0 AS BIGINT) FROM orders GROUP BY o_orderpriority
HAVING count(*) = (SELECT max(c) FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderpriority))
UNION ALL
SELECT 'distinct', l_linestatus, CAST(0 AS BIGINT) FROM (SELECT DISTINCT l_linestatus FROM lineitem)
"""


HIST_BINS = [1.0, 11.0, 21.0, 31.0, 41.0, 51.0]


def q_histogram(spark, sf_dir):
    """Histogram kernel — same [lo,hi) / last-[lo,hi] bin semantics the drift
    pass registers inside the bundled agg (operators/drift.py:39-73; reference
    column_histogram.py:172-240)."""
    li = _load(spark, sf_dir, "lineitem")
    col = F.col("l_quantity")
    k = len(HIST_BINS) - 1
    expr = F.lit(None).cast("long")
    for i in range(k - 1, -1, -1):
        lo, hi = HIST_BINS[i], HIST_BINS[i + 1]
        cond = (col >= F.lit(lo)) & ((col <= F.lit(hi)) if i == k - 1 else (col < F.lit(hi)))
        expr = F.when(cond, F.lit(i).cast("long")).otherwise(expr)
    return (
        li.select(expr.alias("bin"))
        .filter(F.col("bin").isNotNull())
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_HISTOGRAM = """
SELECT bin, CAST(count(*) AS BIGINT) AS cnt FROM (
  SELECT CASE
    WHEN l_quantity >= 1 AND l_quantity < 11 THEN 0
    WHEN l_quantity >= 11 AND l_quantity < 21 THEN 1
    WHEN l_quantity >= 21 AND l_quantity < 31 THEN 2
    WHEN l_quantity >= 31 AND l_quantity < 41 THEN 3
    WHEN l_quantity >= 41 AND l_quantity <= 51 THEN 4
  END AS bin FROM lineitem) WHERE bin IS NOT NULL GROUP BY bin
"""


# ---------------------------------------------------------------------------
# uniqueness / referential
# ---------------------------------------------------------------------------


def q_unique_column(spark, sf_dir):
    o = _load(spark, sf_dir, "orders")
    return _map_metrics_df(
        spark,
        o,
        [("unique", "expect_column_values_to_be_unique", {"column": "o_custkey"})],
    )


SQL_UNIQUE_COLUMN = """
WITH g AS (SELECT o_custkey, count(*) AS c FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey)
SELECT 'unique' AS expectation,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS unexpected_count,
       CAST(CASE WHEN sum(CASE WHEN c > 1 THEN c ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM g
"""


def q_unique_compound(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return _map_metrics_df(
        spark,
        li,
        [
            (
                "compound_unique",
                "expect_compound_columns_to_be_unique",
                {"column_list": ["l_orderkey", "l_linenumber"]},
            )
        ],
    )


SQL_UNIQUE_COMPOUND = """
WITH g AS (SELECT l_orderkey, l_linenumber, count(*) AS c FROM lineitem GROUP BY 1, 2)
SELECT 'compound_unique' AS expectation,
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS unexpected_count,
       CAST(CASE WHEN sum(CASE WHEN c > 1 THEN c ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM g
"""


def q_referential(spark, sf_dir):
    """Referential integrity via anti-join (broadcast-able ref side) —
    SURVEY.md §2.B.7; violations = left_anti output."""
    o = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    return _map_metrics_df(
        spark,
        o,
        [
            (
                "ref_ok",
                "expect_column_values_to_exist_in",
                {"column": "o_custkey", "ref": cust, "ref_column": "c_custkey", "broadcast": True},
            ),
            (
                "ref_violations",
                "expect_column_values_to_exist_in",
                {
                    "column": "o_custkey",
                    "ref": cust.filter(F.col("c_custkey") <= 750),
                    "ref_column": "c_custkey",
                    "broadcast": True,
                },
            ),
        ],
    )


SQL_REFERENTIAL = """
SELECT 'ref_ok' AS expectation, CAST(count(*) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN o_custkey NOT IN (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count,
       CAST(CASE WHEN sum(CASE WHEN o_custkey NOT IN (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM orders
UNION ALL
SELECT 'ref_violations', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey <= 750) THEN 1 ELSE 0 END) AS BIGINT),
       CAST(CASE WHEN sum(CASE WHEN o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey <= 750) THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT)
FROM orders
"""


# ---------------------------------------------------------------------------
# drift
# ---------------------------------------------------------------------------


def q_drift_kl(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    res = _run_suite(
        spark,
        li,
        [
            (
                "kl",
                "expect_column_kl_divergence_to_be_less_than",
                {
                    "column": "l_quantity",
                    "partition_object": {"bins": HIST_BINS, "weights": [0.2] * 5},
                    "threshold": 0.1,
                },
            )
        ],
    )
    evr = res.results[0]
    obs = evr.result.get("observed_value")
    rows = [("kl", float(obs) if obs is not None else None, 1 if evr.success else 0)]
    out = spark.createDataFrame(rows, OBS_SCHEMA)
    return out.select("expectation", F.round("observed", 6).alias("observed"), "success")


SQL_DRIFT_KL = """
WITH h AS (
  SELECT CASE
    WHEN l_quantity >= 1 AND l_quantity < 11 THEN 0
    WHEN l_quantity >= 11 AND l_quantity < 21 THEN 1
    WHEN l_quantity >= 21 AND l_quantity < 31 THEN 2
    WHEN l_quantity >= 31 AND l_quantity < 41 THEN 3
    WHEN l_quantity >= 41 AND l_quantity <= 51 THEN 4
  END AS bin FROM lineitem WHERE l_quantity IS NOT NULL),
n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM h),
agg AS (SELECT sum((c / n.total) * ln((c / n.total) / 0.2)) AS kl
        FROM (SELECT bin, CAST(count(*) AS DOUBLE) AS c FROM h WHERE bin IS NOT NULL GROUP BY bin), n)
SELECT 'kl' AS expectation, round(kl, 6) AS observed,
       CAST(CASE WHEN kl < 0.1 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM agg
"""


def q_drift_chi2(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    res = _run_suite(
        spark,
        li,
        [
            (
                "chi2",
                "expect_column_chi_square_test_p_value_to_be_greater_than",
                {
                    "column": "l_returnflag",
                    "partition_object": {
                        "values": ["A", "N", "R"],
                        "weights": [1 / 3, 1 / 3, 1 / 3],
                    },
                    "p": 0.05,
                },
            )
        ],
    )
    stat = res.results[0].result["details"]["chi_square_statistic"]
    rows = [(float(stat),)]
    out = spark.createDataFrame(rows, "chi_square_statistic double")
    return out.select(F.round("chi_square_statistic", 6).alias("chi_square_statistic"))


SQL_DRIFT_CHI2 = """
WITH cnt AS (
  SELECT
    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS DOUBLE) AS a,
    CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS DOUBLE) AS n,
    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) AS r
  FROM lineitem WHERE l_returnflag IS NOT NULL)
SELECT round(
    pow(a - (a + n + r)/3, 2) / ((a + n + r)/3)
  + pow(n - (a + n + r)/3, 2) / ((a + n + r)/3)
  + pow(r - (a + n + r)/3, 2) / ((a + n + r)/3), 6) AS chi_square_statistic
FROM cnt
"""


def q_drift_ks(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    res = _run_suite(
        spark,
        li,
        [
            (
                "ks",
                "expect_column_kstest_p_value_to_be_greater_than",
                {
                    "column": "l_quantity",
                    "partition_object": {"bins": HIST_BINS, "weights": [0.2] * 5},
                    "p": 0.05,
                },
            )
        ],
    )
    d = res.results[0].result["details"]["ks_statistic"]
    out = spark.createDataFrame([(float(d),)], "ks_statistic double")
    return out.select(F.round("ks_statistic", 6).alias("ks_statistic"))


SQL_DRIFT_KS = """
WITH h AS (
  SELECT CASE
    WHEN l_quantity >= 1 AND l_quantity < 11 THEN 0
    WHEN l_quantity >= 11 AND l_quantity < 21 THEN 1
    WHEN l_quantity >= 21 AND l_quantity < 31 THEN 2
    WHEN l_quantity >= 31 AND l_quantity < 41 THEN 3
    WHEN l_quantity >= 41 AND l_quantity <= 51 THEN 4
  END AS bin FROM lineitem WHERE l_quantity IS NOT NULL),
bins AS (SELECT bin, CAST(count(*) AS DOUBLE) AS c FROM h WHERE bin IS NOT NULL GROUP BY bin),
n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM h),
cdf AS (SELECT bin,
               sum(c) OVER (ORDER BY bin) / n.total AS cp,
               (bin + 1) * 0.2 AS cq
        FROM bins, n)
SELECT round(max(abs(cp - cq)), 6) AS ks_statistic FROM cdf
"""


def q_drift_psi(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    res = _run_suite(
        spark,
        li,
        [
            (
                "psi",
                "expect_column_psi_to_be_less_than",
                {
                    "column": "l_quantity",
                    "partition_object": {"bins": HIST_BINS, "weights": [0.2] * 5},
                    "threshold": 0.2,
                },
            )
        ],
    )
    evr = res.results[0]
    obs = evr.result.get("observed_value")
    rows = [("psi", float(obs) if obs is not None else None, 1 if evr.success else 0)]
    out = spark.createDataFrame(rows, OBS_SCHEMA)
    return out.select("expectation", F.round("observed", 6).alias("observed"), "success")


# PSI with eps=1e-6 floors and renormalization (functions/stats.py:72-80):
# obs = [below]+bins+[above] (below=above=0 with full-range bins), exp =
# [0, .2×5, 0]; p = renorm(max(frac, eps)); psi = Σ (p−q) ln(p/q).
SQL_DRIFT_PSI = """
WITH h AS (
  SELECT CASE
    WHEN l_quantity >= 1 AND l_quantity < 11 THEN 0
    WHEN l_quantity >= 11 AND l_quantity < 21 THEN 1
    WHEN l_quantity >= 21 AND l_quantity < 31 THEN 2
    WHEN l_quantity >= 31 AND l_quantity < 41 THEN 3
    WHEN l_quantity >= 41 AND l_quantity <= 51 THEN 4
  END AS bin FROM lineitem WHERE l_quantity IS NOT NULL),
c AS (SELECT
        CAST(sum(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS c1,
        CAST(sum(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS c2,
        CAST(sum(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS c3,
        CAST(sum(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS DOUBLE) AS c4,
        CAST(sum(CASE WHEN bin = 4 THEN 1 ELSE 0 END) AS DOUBLE) AS c5,
        CAST(count(*) AS DOUBLE) AS t
      FROM h),
p AS (SELECT
        1e-6 AS p0,
        greatest(c1/t, 1e-6) AS p1, greatest(c2/t, 1e-6) AS p2,
        greatest(c3/t, 1e-6) AS p3, greatest(c4/t, 1e-6) AS p4,
        greatest(c5/t, 1e-6) AS p5,
        1e-6 AS p6,
        1e-6 AS q0, 0.2 AS q1, 0.2 AS q2, 0.2 AS q3, 0.2 AS q4, 0.2 AS q5, 1e-6 AS q6
      FROM c),
s AS (SELECT *,
        (p0 + p1 + p2 + p3 + p4 + p5 + p6) AS sp,
        (q0 + q1 + q2 + q3 + q4 + q5 + q6) AS sq
      FROM p)
SELECT round(
    (p0/sp - q0/sq) * ln((p0/sp)/(q0/sq))
  + (p1/sp - q1/sq) * ln((p1/sp)/(q1/sq))
  + (p2/sp - q2/sq) * ln((p2/sp)/(q2/sq))
  + (p3/sp - q3/sq) * ln((p3/sp)/(q3/sq))
  + (p4/sp - q4/sq) * ln((p4/sp)/(q4/sq))
  + (p5/sp - q5/sq) * ln((p5/sp)/(q5/sq))
  + (p6/sp - q6/sq) * ln((p6/sp)/(q6/sq)), 6) AS observed,
  'psi' AS expectation,
  CAST(CASE WHEN
    (p0/sp - q0/sq) * ln((p0/sp)/(q0/sq))
  + (p1/sp - q1/sq) * ln((p1/sp)/(q1/sq))
  + (p2/sp - q2/sq) * ln((p2/sp)/(q2/sq))
  + (p3/sp - q3/sq) * ln((p3/sp)/(q3/sq))
  + (p4/sp - q4/sq) * ln((p4/sp)/(q4/sq))
  + (p5/sp - q5/sq) * ln((p5/sp)/(q5/sq))
  + (p6/sp - q6/sq) * ln((p6/sp)/(q6/sq)) < 0.2 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM s
"""


def q_cramers_phi(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    res = _run_suite(
        spark,
        li,
        [
            (
                "cramers_phi",
                "expect_column_pair_cramers_phi_value_to_be_less_than",
                {"column_A": "l_returnflag", "column_B": "l_linestatus", "threshold": 0.1},
            )
        ],
    )
    evr = res.results[0]
    rows = [("cramers_phi", float(evr.result["observed_value"]), 1 if evr.success else 0)]
    out = spark.createDataFrame(rows, OBS_SCHEMA)
    return out.select("expectation", F.round("observed", 6).alias("observed"), "success")


SQL_CRAMERS_PHI = """
WITH cells AS (
  SELECT l_returnflag AS a, l_linestatus AS b, CAST(count(*) AS DOUBLE) AS o
  FROM lineitem WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
  GROUP BY 1, 2),
margins AS (
  SELECT a, b, o,
         sum(o) OVER (PARTITION BY a) AS ra,
         sum(o) OVER (PARTITION BY b) AS cb,
         sum(o) OVER () AS n
  FROM cells),
chi AS (SELECT sum(pow(o - ra*cb/n, 2) / (ra*cb/n)) AS chi2, max(n) AS n,
               count(DISTINCT a) AS r, count(DISTINCT b) AS c
        FROM margins)
SELECT 'cramers_phi' AS expectation,
       round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS observed,
       CAST(CASE WHEN sqrt(chi2 / (n * least(r - 1, c - 1))) <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM chi
"""


def q_param_ks(spark, sf_dir):
    """One-sample KS via GK quantile sketch, two legs with opposite verdicts:
    integer-valued l_quantity vs uniform(1,49) (discretization ⇒ d≈0.02,
    p≈1e-20 ⇒ FAIL) and a hash-derived continuous uniform u∈[0,1) (p≈O(0.1+)
    ⇒ PASS). Oracle: testing/seeded_oracles.py recomputes both verdicts from
    EXACT empirical-CDF KS stats — the sketch's quantile error is orders of
    magnitude smaller than either margin to the 0.001 threshold."""
    li = _load(spark, sf_dir, "lineitem").withColumn(
        "u",
        F.xxhash64("l_orderkey", "l_linenumber").cast("double")
        / F.lit(18446744073709551616.0)
        + F.lit(0.5),
    )
    res = _run_suite(
        spark,
        li,
        [
            (
                "param_ks_uniform",
                "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
                {
                    "column": "l_quantity",
                    "distribution": "uniform",
                    "params": {"min": 1.0, "range": 49.0},
                    "p_value": 0.001,
                },
            ),
            (
                "param_ks_hash_uniform",
                "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
                {
                    "column": "u",
                    "distribution": "uniform",
                    "params": {"min": 0.0, "range": 1.0},
                    "p_value": 0.001,
                },
            ),
        ],
    )
    rows = [
        (evr.expectation_config["meta"]["label"], 1 if evr.success else 0)
        for evr in res.results
    ]
    return spark.createDataFrame(rows, "expectation string, success long")


def q_json_schema(spark, sf_dir):
    ev = _load(spark, sf_dir, "events")
    return _map_metrics_df(
        spark,
        ev,
        [
            (
                "json_schema",
                "expect_column_values_to_match_json_schema",
                {
                    "column": "props",
                    "json_schema": {
                        "type": "object",
                        "properties": {"k": {"type": "integer", "minimum": 0}},
                        "required": ["k"],
                    },
                },
            )
        ],
    )


SQL_JSON_SCHEMA = """
SELECT 'json_schema' AS expectation,
       CAST(count(*) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN NOT (json_valid(props)
                 AND json_type(json_extract(props, '$.k')) IN ('INTEGER','UBIGINT','BIGINT')
                 AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 0)
            THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count,
       CAST(CASE WHEN sum(CASE WHEN NOT (json_valid(props)
                 AND json_type(json_extract(props, '$.k')) IN ('INTEGER','UBIGINT','BIGINT')
                 AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 0)
            THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM events
"""


# ---------------------------------------------------------------------------
# monotonic / query escape hatch / schema
# ---------------------------------------------------------------------------


def q_monotonic(spark, sf_dir):
    ev = _load(spark, sf_dir, "events")
    return _map_metrics_df(
        spark,
        ev,
        [
            (
                "increasing",
                "expect_column_values_to_be_increasing",
                {"column": "value", "order_by": "event_id"},
            )
        ],
    )


SQL_MONOTONIC = """
WITH w AS (SELECT value, lag(value) OVER (ORDER BY event_id) AS prev FROM events WHERE value IS NOT NULL)
SELECT 'increasing' AS expectation,
       CAST((SELECT count(*) FROM events) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN prev IS NOT NULL AND NOT (value >= prev) THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count,
       CAST(CASE WHEN sum(CASE WHEN prev IS NOT NULL AND NOT (value >= prev) THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM w
"""


def q_schema_checks(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    specs = [
        (
            "columns_match_set",
            "expect_table_columns_to_match_set",
            {
                "column_set": [
                    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                    "l_returnflag", "l_linestatus", "l_shipdate",
                ]
            },
        ),
        ("column_exists", "expect_column_to_exist", {"column": "l_quantity"}),
        (
            "of_type",
            "expect_column_values_to_be_of_type",
            {"column": "l_quantity", "type_": "DoubleType"},
        ),
        ("column_count", "expect_table_column_count_to_equal", {"value": 11}),
    ]
    res = _run_suite(spark, li, specs)
    rows = [
        (evr.expectation_config["meta"]["label"], 1 if evr.success else 0)
        for evr in res.results
    ]
    return spark.createDataFrame(rows, "expectation string, success long")


SQL_SCHEMA_CHECKS = """
SELECT 'columns_match_set' AS expectation, CAST(1 AS BIGINT) AS success
UNION ALL SELECT 'column_exists', CAST(1 AS BIGINT)
UNION ALL SELECT 'of_type', CAST(1 AS BIGINT)
UNION ALL SELECT 'column_count', CAST(1 AS BIGINT)
"""


# ---------------------------------------------------------------------------
# text / dedup / similarity pipeline operators
# ---------------------------------------------------------------------------


def q_text_stats(spark, sf_dir):
    """Token/char/bpe counts + mean word length + fingerprint + language ID
    (operators/text.py) — the text-analysis surface in one frame."""
    d = _load(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        tx.char_count(c).alias("n_chars"),
        tx.token_count(c).alias("n_tokens"),
        tx.bpe_ish_token_count(c).alias("n_bpe"),
        F.round(tx.mean_word_length(c), 4).alias("mean_word_len"),
        tx.fingerprint(c).alias("fp"),
        tx.detect_lang(c).alias("lang_detected"),
    )


def _sql_marker(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in tx.LANG_MARKERS[lang])
    return (
        f"len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
        f" t -> t IN ({markers})))"
    )


SQL_LANG_CASE = f"""
       CASE WHEN greatest({_sql_marker('en')}, {_sql_marker('es')},
                          {_sql_marker('fr')}, {_sql_marker('de')}) = 0 THEN 'und'
            WHEN {_sql_marker('en')} >= {_sql_marker('es')} AND {_sql_marker('en')} >= {_sql_marker('fr')} AND {_sql_marker('en')} >= {_sql_marker('de')} THEN 'en'
            WHEN {_sql_marker('es')} >= {_sql_marker('fr')} AND {_sql_marker('es')} >= {_sql_marker('de')} THEN 'es'
            WHEN {_sql_marker('fr')} >= {_sql_marker('de')} THEN 'fr'
            ELSE 'de' END
"""

SQL_TEXT_STATS = rf"""
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe,
       round(CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
             / len(regexp_split_to_array(trim(text), '\s+')), 4) AS mean_word_len,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
       {SQL_LANG_CASE} AS lang_detected
FROM documents
"""


# PII entities injected deterministically per doc (arm = doc_id % 5). The
# oracle derives expected counts/deltas BY CONSTRUCTION (arm membership +
# hand-computed entity lengths), independent of the Java regexes — the base
# documents text contains no digits and no '@' (verified at sf0.01), so the
# injected entity is the only match. entity-length delta = len(entity) -
# len("[PII]") per scrubbed match.
_PII_INJECT = [
    ("email", "contact john.doe@example.com now", 15),
    ("ssn", "ssn 123-45-6789 on file", 6),
    ("phone", "call (415) 555-0123 today", 9),
    ("credit_card", "card 4111 1111 1111 1111 here", 14),
    ("ipv4", "server at 10.0.0.1 ok", 3),
]


def q_pii_scan(spark, sf_dir):
    """PII detection + scrubbing (operators/text.py:188-244): per-type match
    totals, grand total, and the scrubbed-length delta over a corpus with one
    deterministically injected entity per document."""
    d = _load(spark, sf_dir, "documents")
    arm = F.pmod(F.col("doc_id"), F.lit(len(_PII_INJECT)))
    inject = F.when(arm == 0, F.lit(_PII_INJECT[0][1]))
    for i in range(1, len(_PII_INJECT)):
        inject = inject.when(arm == i, F.lit(_PII_INJECT[i][1]))
    payload = F.concat(F.col("text"), F.lit(" "), inject)
    per_doc = d.select(
        tx.pii_counts(payload).alias("c"),
        tx.pii_total(payload).alias("total"),
        (F.length(payload) - F.length(tx.scrub_pii(payload))).alias("delta"),
    )
    agg = per_doc.agg(
        *[
            F.sum(F.col("c").getField(t)).cast("long").alias(t)
            for t in tx.PII_PATTERNS
        ],
        F.sum("total").cast("long").alias("total"),
        F.sum("delta").cast("long").alias("scrub_delta_chars"),
    )
    metrics = list(tx.PII_PATTERNS) + ["total", "scrub_delta_chars"]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return agg.select(F.expr(f"stack({len(metrics)}, {stack}) AS (metric, hits)"))


SQL_PII_SCAN = "\nUNION ALL\n".join(
    f"SELECT '{name}' AS metric, CAST(count(*) FILTER (WHERE doc_id % 5 = {i}) AS BIGINT) AS hits FROM documents"
    for i, (name, _, _) in enumerate(_PII_INJECT)
) + f"""
UNION ALL SELECT 'total', CAST(count(*) AS BIGINT) FROM documents
UNION ALL SELECT 'scrub_delta_chars',
  CAST(sum(CASE doc_id % 5 {' '.join(f'WHEN {i} THEN {d}' for i, (_, _, d) in enumerate(_PII_INJECT))} END) AS BIGINT)
FROM documents
"""


# URL fixtures: (raw, expected canonical, expected host, valid under
# schemes=[http,https], valid under any scheme). Expected values are
# hand-derived from the documented canonicalization contract — the oracle
# replays the EXPECTATIONS, not the implementation regexes.
_URL_ARMS = [
    ("HTTPS://Example.COM:443/path?a=1&utm_source=x#frag",
     "https://example.com/path?a=1", "example.com", 1, 1),
    ("http://www.Foo.org:80/", "http://www.foo.org", "www.foo.org", 1, 1),
    ("https://a.b.c/p?utm_campaign=z", "https://a.b.c/p", "a.b.c", 1, 1),
    ("https://x.io/p?gclid=1&q=2&fbclid=3", "https://x.io/p?q=2", "x.io", 1, 1),
    ("ftp://Files.example.com/data", "ftp://files.example.com/data",
     "files.example.com", 0, 1),
    ("not a url", "not a url", "", 0, 0),
    ("https://Example.com/%7Euser?id=9#x", "https://example.com/%7Euser?id=9",
     "example.com", 1, 1),
    ("git+ssh://Host.Net/repo", "git+ssh://host.net/repo", "host.net", 0, 1),
]


def q_url_tools(spark, sf_dir):
    """URL canonicalization + host extraction + validity expectations
    (operators/text.py:257-352) over 8 deterministic URL shapes (case, default
    ports, fragments, tracking params, trailing slash, non-URL junk)."""
    d = _load(spark, sf_dir, "documents")
    arm = F.pmod(F.col("doc_id"), F.lit(len(_URL_ARMS)))
    url = F.when(arm == 0, F.lit(_URL_ARMS[0][0]))
    for i in range(1, len(_URL_ARMS)):
        url = url.when(arm == i, F.lit(_URL_ARMS[i][0]))
    sel = d.select("doc_id", url.alias("url"))
    return sel.select(
        "doc_id",
        tx.canonical_url(F.col("url")).alias("canon"),
        tx.url_host(F.col("url")).alias("host"),
        tx.is_valid_url(F.col("url"), schemes=["http", "https"])
        .cast("long")
        .alias("valid_http"),
        tx.is_valid_url(F.col("url")).cast("long").alias("valid_any"),
    )


def _sql_url_case(field: int, quote: bool) -> str:
    arms = " ".join(
        f"WHEN {i} THEN " + (f"'{a[field]}'" if quote else str(a[field]))
        for i, a in enumerate(_URL_ARMS)
    )
    return f"CASE doc_id % {len(_URL_ARMS)} {arms} END"


SQL_URL_TOOLS = f"""
SELECT doc_id,
       {_sql_url_case(1, True)} AS canon,
       {_sql_url_case(2, True)} AS host,
       CAST({_sql_url_case(3, False)} AS BIGINT) AS valid_http,
       CAST({_sql_url_case(4, False)} AS BIGINT) AS valid_any
FROM documents
"""


def q_top_ngrams(spark, sf_dir):
    """Corpus top-k bigrams (operators/text.py:290): explode + lead windows +
    map-side-combined count + TakeOrderedAndProject; deterministic tie-break
    (count desc, ngram asc)."""
    d = _load(spark, sf_dir, "documents")
    return tx.top_ngrams(d, n=2, k=20).select(
        "ngram", F.col("occurrences").cast("long").alias("occurrences")
    )


SQL_TOP_NGRAMS = r"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), ' ') AS l
  FROM documents WHERE trim(text) <> ''),
grams AS (
  SELECT unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i+1])) AS ngram
  FROM toks)
SELECT ngram, CAST(count(*) AS BIGINT) AS occurrences FROM grams
GROUP BY ngram ORDER BY occurrences DESC, ngram ASC LIMIT 20
"""


def q_pack_invariants(spark, sf_dir):
    """Sequence packing (operators/text.py:355): pack documents into
    ≤64-token training packs, then verify the packing invariants as counts —
    every doc assigned exactly once, no multi-member pack over budget,
    oversize docs isolated in singleton packs, pack positions contiguous
    from 0. Totals (n_docs, total_tokens) are recomputed by the oracle; the
    violation counts must be zero."""
    d = _load(spark, sf_dir, "documents")
    packed = tx.pack_sequences(d, max_tokens=64)
    per_pack = packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("members"),
        F.sum("n_tokens").alias("tok"),
        F.max("n_tokens").alias("max_tok"),
        F.min("pack_pos").alias("min_pos"),
        F.max("pack_pos").alias("max_pos"),
    )
    viol = per_pack.agg(
        F.sum(
            F.when((F.col("members") > 1) & (F.col("tok") > 64), 1).otherwise(0)
        ).cast("long").alias("overfull_multi_packs"),
        F.sum(
            F.when((F.col("max_tok") > 64) & (F.col("members") > 1), 1).otherwise(0)
        ).cast("long").alias("oversize_not_alone"),
        F.sum(
            F.when(
                (F.col("min_pos") != 0) | (F.col("max_pos") != F.col("members") - 1), 1
            ).otherwise(0)
        ).cast("long").alias("bad_pack_pos"),
    )
    dup = (
        packed.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .cast("long")
            .alias("multi_assigned_docs")
        )
    )
    tot = packed.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    one = tot.crossJoin(viol).crossJoin(dup)
    metrics = [
        "n_docs", "total_tokens", "overfull_multi_packs",
        "oversize_not_alone", "bad_pack_pos", "multi_assigned_docs",
    ]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return one.select(F.expr(f"stack({len(metrics)}, {stack}) AS (metric, value)"))


SQL_PACK_INVARIANTS = r"""
WITH t AS (SELECT len(regexp_split_to_array(trim(text), '\s+')) AS n FROM documents)
SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM t
UNION ALL SELECT 'total_tokens', CAST(sum(n) AS BIGINT) FROM t
UNION ALL SELECT 'overfull_multi_packs', CAST(0 AS BIGINT)
UNION ALL SELECT 'oversize_not_alone', CAST(0 AS BIGINT)
UNION ALL SELECT 'bad_pack_pos', CAST(0 AS BIGINT)
UNION ALL SELECT 'multi_assigned_docs', CAST(0 AS BIGINT)
"""


# token_budget_sample fixture: two sources whose totals (~1.3-1.5k tokens)
# straddle a 700-token budget (real selection) and one whose budget exceeds
# its total (keep-everything path)
_TB_BUDGETS = {"src1": 700, "src2": 700, "src3": 5000}


def q_token_budget(spark, sf_dir):
    """token_budget_sample (operators/text.py:433) invariants as counts —
    the selection ORDER is xxhash64-seeded (not DuckDB-portable) but the
    guarantees are SQL-checkable: per-source kept tokens never exceed the
    budget; when a source's total fits, everything is kept; otherwise the
    undershoot is smaller than the largest document (the greedy stops at the
    first doc that doesn't fit); no doc from an unbudgeted source, no doc
    kept twice, and two same-seed runs keep the IDENTICAL set. Eligible-doc
    and eligible-token totals are recomputed by the oracle; the violation
    counts must be zero."""
    d = _load(spark, sf_dir, "documents")
    kept1 = tx.token_budget_sample(d, _TB_BUDGETS, seed=42)
    kept2 = tx.token_budget_sample(d, _TB_BUDGETS, seed=42)
    tok = tx.token_count(F.col("text")).cast("long")
    elig = (
        d.filter(F.col("source").isin(list(_TB_BUDGETS)))
        .select("source", tok.alias("tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("tok").alias("tot"),
            F.max("tok").alias("mx"),
        )
    )
    kept_agg = (
        kept1.select("source", tok.alias("tok"))
        .groupBy("source")
        .agg(F.sum("tok").alias("kept_tok"))
    )
    b_df = spark.createDataFrame(
        list(_TB_BUDGETS.items()), "source string, budget long"
    )
    j = elig.join(kept_agg, "source", "left").join(b_df, "source").fillna(
        0, ["kept_tok"]
    )
    viol = (
        (F.col("kept_tok") > F.col("budget"))
        | ((F.col("tot") <= F.col("budget")) & (F.col("kept_tok") != F.col("tot")))
        | (
            (F.col("tot") > F.col("budget"))
            & (F.col("budget") - F.col("kept_tok") >= F.col("mx"))
        )
    )
    per_source = (
        j.select(
            F.concat(F.lit("eligible_docs__"), "source").alias("metric"),
            F.col("n").cast("long").alias("value"),
        )
        .unionByName(
            j.select(
                F.concat(F.lit("eligible_tokens__"), "source").alias("metric"),
                F.col("tot").cast("long").alias("value"),
            )
        )
        .unionByName(
            j.select(
                F.concat(F.lit("budget_violation__"), "source").alias("metric"),
                viol.cast("long").alias("value"),
            )
        )
    )
    foreign = kept1.agg(
        F.coalesce(
            F.sum(
                F.when(~F.col("source").isin(list(_TB_BUDGETS)), 1).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("kept_foreign_sources")
    )
    dup = (
        kept1.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("k") > 1, 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("dup_kept_docs")
        )
    )
    determinism = (
        kept1.select("doc_id")
        .unionByName(kept2.select("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("k") != 2, 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("determinism_mismatch")
        )
    )
    one = foreign.crossJoin(dup).crossJoin(determinism)
    globals_ = one.select(
        F.expr(
            "stack(3, 'kept_foreign_sources', kept_foreign_sources,"
            " 'dup_kept_docs', dup_kept_docs,"
            " 'determinism_mismatch', determinism_mismatch) AS (metric, value)"
        )
    )
    return per_source.unionByName(globals_)


SQL_TOKEN_BUDGET = r"""
WITH t AS (SELECT source, len(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents WHERE source IN ('src1', 'src2', 'src3'))
SELECT concat('eligible_docs__', source) AS metric,
       CAST(count(*) AS BIGINT) AS value FROM t GROUP BY source
UNION ALL SELECT concat('eligible_tokens__', source), CAST(sum(tok) AS BIGINT)
FROM t GROUP BY source
UNION ALL SELECT concat('budget_violation__', source), CAST(0 AS BIGINT)
FROM t GROUP BY source
UNION ALL SELECT 'kept_foreign_sources', CAST(0 AS BIGINT)
UNION ALL SELECT 'dup_kept_docs', CAST(0 AS BIGINT)
UNION ALL SELECT 'determinism_mismatch', CAST(0 AS BIGINT)
"""


def q_clean_funnel(spark, sf_dir):
    """clean_corpus funnel (pipeline.py:47): quality gate → language gate →
    exact dedup, with per-stage surviving-row counts. The oracle replays each
    stage term-for-term in DuckDB (quality_score formula, marker-argmax
    language ID, md5-normalized dedup groups)."""
    from great_expectations_spark import pipeline as pl

    d = _load(spark, sf_dir, "documents")
    res = pl.clean_corpus(
        d,
        min_quality=0.5,
        min_tokens=10,
        languages=["en"],
        dedup="exact",
        count_stages=True,
    )
    rows = [(s, res.stage_counts[s]) for s in res.stages]
    rows.append(("final", res.df.count()))
    return spark.createDataFrame(rows, "stage string, n_rows long")


SQL_CLEAN_FUNNEL = rf"""
WITH s AS (
  SELECT doc_id, text,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
         CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
           / len(regexp_split_to_array(trim(text), '\s+')) AS mwl,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) / length(text) AS punct
  FROM documents),
q AS (SELECT * FROM s
      WHERE (least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
             + CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.5 END
             + (1.0 - least(punct * 4.0, 1.0))) / 3.0 >= 0.5
        AND n_tok >= 10),
l AS (SELECT * FROM q WHERE {SQL_LANG_CASE} = 'en'),
dd AS (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM l GROUP BY 1)
SELECT 'quality' AS stage, CAST(count(*) AS BIGINT) AS n_rows FROM q
UNION ALL SELECT 'language', CAST(count(*) AS BIGINT) FROM l
UNION ALL SELECT 'dedup_exact', CAST(count(*) AS BIGINT) FROM dd
UNION ALL SELECT 'final', CAST(count(*) AS BIGINT) FROM dd
"""


def q_dedup_groups(spark, sf_dir):
    """Exact dedup over a doubled corpus (each text injected twice):
    duplicate GROUPS (md5-normalized groupBy, dedup.py:76) plus the SURVIVOR
    set from ``exact_dedup``'s groupBy + semi-join (dedup.py:37) — both exact
    dedup operators in one frame."""
    d = _load(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.union(d.select((F.col("doc_id") + 10000).alias("doc_id"), "text"))
    groups = dd.exact_duplicate_groups(doubled).select(
        F.lit("group").alias("kind"), "fp", "n_docs", "keep_id"
    )
    kept = dd.exact_dedup(doubled).select(
        F.lit("kept").alias("kind"),
        F.lit("").alias("fp"),
        F.lit(1).cast("long").alias("n_docs"),
        F.col("doc_id").cast("long").alias("keep_id"),
    )
    return groups.unionAll(kept)


SQL_DEDUP_GROUPS = r"""
WITH u AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id + 10000, text FROM documents),
f AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM u)
SELECT 'group' AS kind, fp, CAST(count(*) AS BIGINT) AS n_docs, CAST(min(doc_id) AS BIGINT) AS keep_id
FROM f GROUP BY fp HAVING count(*) > 1
UNION ALL
SELECT 'kept', '', CAST(1 AS BIGINT), CAST(min(doc_id) AS BIGINT) FROM f GROUP BY fp
"""


def q_dedup_jaccard(spark, sf_dir):
    return dd.token_jaccard_pairs(
        _load(spark, sf_dir, "documents"), threshold=0.9
    ).select("a", "b", F.round("jaccard", 6).alias("jaccard"))


SQL_DEDUP_JACCARD = r"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\s+')) AS t
  FROM documents),
sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (SELECT ta.doc_id AS a, tb.doc_id AS b, count(*) AS c
          FROM tok ta JOIN tok tb ON ta.t = tb.t AND ta.doc_id < tb.doc_id
          GROUP BY 1, 2)
SELECT a, b, round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
FROM inter JOIN sizes na ON inter.a = na.doc_id JOIN sizes nb ON inter.b = nb.doc_id
WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.9
"""


def q_dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup candidates (F.hash seeded permutations — not
    SQL-expressible; rows-only check)."""
    return dd.minhash_dedup_pairs(
        _load(spark, sf_dir, "documents"), threshold=0.5
    ).select("a", "b", F.round("est_jaccard", 6).alias("est_jaccard"))


def q_dedup_simhash(spark, sf_dir):
    sigs = dd.simhash_signatures(_load(spark, sf_dir, "documents"))
    return dd.simhash_near_pairs(sigs, max_hamming=8).select("a", "b", "hamming")


def _query_vec(spark, sf_dir):
    row = (
        _load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


def q_sim_topk(spark, sf_dir):
    e = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir)
    top = sim.brute_force_topk(e, qv, k=10)
    return top.select("vec_id", F.round("cosine", 4).alias("cosine"))


SQL_SIM_TOPK = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
z AS (SELECT e.vec_id,
             CAST(unnest(e.embedding) AS DOUBLE) AS ev,
             CAST(unnest(q.qe) AS DOUBLE) AS qv
      FROM embeddings e, q WHERE e.vec_id <> 0)
SELECT vec_id, round(sum(ev*qv) / (sqrt(sum(ev*ev)) * sqrt(sum(qv*qv))), 4) AS cosine
FROM z GROUP BY vec_id
ORDER BY sum(ev*qv) / (sqrt(sum(ev*ev)) * sqrt(sum(qv*qv))) DESC, vec_id ASC
LIMIT 10
"""


def q_sim_pairs(spark, sf_dir):
    return sim.brute_force_pairs(
        _load(spark, sf_dir, "embeddings"), threshold=0.3
    ).select("a", "b", F.round("cosine", 4).alias("cosine"))


SQL_SIM_PAIRS = """
WITH z AS (SELECT ea.vec_id AS a, eb.vec_id AS b,
                  CAST(unnest(ea.embedding) AS DOUBLE) AS xa,
                  CAST(unnest(eb.embedding) AS DOUBLE) AS xb
           FROM embeddings ea JOIN embeddings eb ON ea.vec_id < eb.vec_id)
SELECT a, b, round(sum(xa*xb) / (sqrt(sum(xa*xa)) * sqrt(sum(xb*xb))), 4) AS cosine
FROM z GROUP BY a, b
HAVING sum(xa*xb) / (sqrt(sum(xa*xa)) * sqrt(sum(xb*xb))) >= 0.3
"""


# IVF-PQ oracle fixture: 8-dim vectors derived from vec_id by modular
# arithmetic — every per-block (2-dim) subvector is a function of
# vec_id % p_j with p_j in {5,7,9,11}, so each block has <= 11 distinct
# subvectors and PQ training (k >> 11, sample covering all values) makes
# every vector codebook-REPRESENTABLE: ADC cosine == brute-force cosine
# exactly, and the DuckDB oracle can recompute the same vectors from vec_id
_PQ_MODULI = (5, 7, 9, 11)


def _pq_rep_vector_spark(vec_id_col):
    dims = []
    for p in _PQ_MODULI:
        r = F.pmod(vec_id_col, F.lit(p))
        dims.append((F.lit(1) + r).cast("double"))
        dims.append(F.pmod(r * r, F.lit(p)).cast("double"))
    return F.array(*dims)


def _pq_rep_vector_values(vec_id: int) -> list[float]:
    out: list[float] = []
    for p in _PQ_MODULI:
        r = vec_id % p
        out.extend([float(1 + r), float((r * r) % p)])
    return out


def _pq_oracle_sql() -> str:
    """Brute-force cosine vs the vec_id=0 query over the SAME derived
    vectors, recomputed by DuckDB from the modular arithmetic above. All
    dims are small exact integers, so Spark's ADC (LUT sums) and this SQL
    produce bit-identical doubles — the ORDER BY tiebreak (vec_id ASC)
    matches pq_topk's."""
    q = _pq_rep_vector_values(0)
    dims: list[str] = []
    for p in _PQ_MODULI:
        dims.append(f"CAST(1 + (vec_id % {p}) AS DOUBLE)")
        dims.append(f"CAST(((vec_id % {p}) * (vec_id % {p})) % {p} AS DOUBLE)")
    dot = " + ".join(f"{d} * {qi!r}" for d, qi in zip(dims, q) if qi)
    nrm = " + ".join(f"{d} * {d}" for d in dims)
    qn = math.sqrt(sum(x * x for x in q))
    cos = f"(({dot}) / (sqrt({nrm}) * {qn!r}))"
    return (
        f"SELECT 'ivfpq' AS method, vec_id, round({cos}, 4) AS cosine "
        f"FROM embeddings WHERE vec_id <> 0 "
        f"ORDER BY {cos} DESC, vec_id ASC LIMIT 10"
    )


SQL_SIM_IVF_TOPK = (
    f"SELECT 'ivf' AS method, vec_id, cosine FROM ({SQL_SIM_TOPK}) ivf_part"
    f" UNION ALL SELECT * FROM ({_pq_oracle_sql()}) pq_part"
)


def q_sim_ivf_topk(spark, sf_dir):
    """ANN exactness invariants, one slot, two methods:

    - method='ivf': FULL-probe IVF search must equal the exact brute-force
      top-k (the kmeans quantizer partitions the data, it never drops
      rows), so the brute-force SQL oracle applies verbatim.
    - method='ivfpq': FULL-probe IVF-PQ (operators/similarity.py pq_encode
      + ivfpq_topk) on codebook-REPRESENTABLE vectors derived from vec_id —
      ADC reconstruction is exact there, so the composed index must again
      equal brute-force cosine, which the oracle computes from the same
      modular arithmetic.

    Partial probes / non-representable vectors are the approximate path
    (recall-tested in pytest)."""
    emb = _load(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    cents = sim.train_ivf_centroids(emb, n_centroids=16, sample_size=5000, seed=7)
    indexed = sim.ivf_assign(emb.filter(F.col("vec_id") != 0), cents)
    ivf = sim.ivf_topk(indexed, cents, qv, k=10, n_probe=16).select(
        F.lit("ivf").alias("method"), "vec_id", F.round("cosine", 4).alias("cosine")
    )

    rep = emb.select(
        "vec_id", _pq_rep_vector_spark(F.col("vec_id")).alias("embedding")
    )
    books = sim.train_pq_codebooks(rep, m=4, k=512, sample_size=2000, seed=13)
    pq_cents = sim.train_ivf_centroids(rep, n_centroids=8, sample_size=2000, seed=13)
    pq_indexed = sim.pq_encode(
        sim.ivf_assign(rep.filter(F.col("vec_id") != 0), pq_cents), books
    ).select("vec_id", "centroid_id", "pq_code")
    pq_q = _pq_rep_vector_values(0)
    ivfpq = sim.ivfpq_topk(pq_indexed, pq_cents, books, pq_q, k=10, n_probe=8).select(
        F.lit("ivfpq").alias("method"), "vec_id", F.round("cosine", 4).alias("cosine")
    )
    return ivf.unionByName(ivfpq)


def q_sim_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN (random-hyperplane buckets; approximate — rows-only)."""
    e = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir)
    top = sim.lsh_topk(e, qv, k=10, n_planes=8, multi_probe_hamming=2)
    return top.select("vec_id", F.round("cosine", 4).alias("cosine"))


def q_dedup_spans(spark, sf_dir):
    """Substring-span dedup (operators/dedup.py duplicate_ngram_spans, k=8):
    maximal duplicated token spans per document. Gram identity is a 64-bit
    rot/xor hash of token xxhash64s; the oracle compares literal gram
    strings — identical output barring ~2^-64-per-pair hash collisions."""
    spans = dd.duplicate_ngram_spans(_load(spark, sf_dir, "documents"), k=8)
    return spans.select(
        "doc_id",
        F.col("start_token").cast("bigint").alias("start_token"),
        F.col("end_token").cast("bigint").alias("end_token"),
        F.col("dup_grams").cast("bigint").alias("dup_grams"),
    )


def _sql_dedup_spans(k: int = 8) -> str:
    gram = " || ' ' || ".join(
        ["tok"] + [f"lead(tok, {j}) OVER w" for j in range(1, k)]
    )
    return f"""
WITH arrs AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\s+')
         END AS arr
  FROM documents),
tp AS (
  SELECT doc_id, unnest(range(len(arr))) AS pos, unnest(arr) AS tok FROM arrs),
grams AS (
  SELECT doc_id, pos, {gram} AS gram, lead(tok, {k - 1}) OVER w AS tlast
  FROM tp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
g AS (SELECT doc_id, pos, gram FROM grams WHERE tlast IS NOT NULL),
hot AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
dup AS (SELECT doc_id, pos FROM g JOIN hot USING (gram)),
flag AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w2 IS NULL OR pos > lag(pos) OVER w2 + {k}
              THEN 1 ELSE 0 END AS newspan
  FROM dup WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)),
sp AS (
  SELECT doc_id, pos,
         sum(newspan) OVER (PARTITION BY doc_id ORDER BY pos) AS span
  FROM flag)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_token,
       CAST(max(pos) + {k} AS BIGINT) AS end_token,
       CAST(count(*) AS BIGINT) AS dup_grams
FROM sp GROUP BY doc_id, span
"""


SQL_DEDUP_SPANS = _sql_dedup_spans(8)


# ---------------------------------------------------------------------------
# violations table / partition builders / samplers / streaming
# ---------------------------------------------------------------------------


def q_violations(spark, sf_dir):
    """Distributed COMPLETE-mode: violating rows labeled per expectation
    (plans/violations.py — no driver collect)."""
    from great_expectations_spark.plans.violations import violations_df

    li = _load(spark, sf_dir, "lineitem")
    s = ExpectationSuite(name="v")
    s.add("expect_column_values_to_be_between", column="l_quantity", min_value=1, max_value=40)
    s.add("expect_column_values_to_be_in_set", column="l_returnflag", value_set=["A", "N"])
    v = violations_df(li, s, columns=["l_orderkey", "l_linenumber"])
    return v.select(
        "l_orderkey", "l_linenumber", F.explode("_violated_expectations").alias("violation")
    )


SQL_VIOLATIONS = """
SELECT l_orderkey, l_linenumber, 'expect_column_values_to_be_between' AS violation
FROM lineitem WHERE l_quantity IS NOT NULL AND NOT (l_quantity >= 1 AND l_quantity <= 40)
UNION ALL
SELECT l_orderkey, l_linenumber, 'expect_column_values_to_be_in_set'
FROM lineitem WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N')
"""


def q_partition_builder(spark, sf_dir):
    from great_expectations_spark.operators.partition import build_partition_object

    li = _load(spark, sf_dir, "lineitem")
    po = build_partition_object(li, "l_quantity", bins="uniform", n_bins=5)
    rows = [
        (i, float(po["bins"][i]), float(po["bins"][i + 1]), float(w))
        for i, w in enumerate(po["weights"])
    ]
    out = spark.createDataFrame(rows, "bin long, lo double, hi double, weight double")
    return out.select(
        "bin",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        F.round("weight", 6).alias("weight"),
    )


# uniform bins over [min,max]=[1,50]: width 9.8; last bin closed
SQL_PARTITION_BUILDER = """
WITH m AS (SELECT min(l_quantity) AS lo, max(l_quantity) AS hi, count(l_quantity) AS n FROM lineitem),
b AS (SELECT i, m.lo + i * (m.hi - m.lo)/5 AS blo, m.lo + (i+1) * (m.hi - m.lo)/5 AS bhi, m.n
      FROM m, (SELECT unnest([0,1,2,3,4]) AS i))
SELECT CAST(b.i AS BIGINT) AS bin, round(b.blo, 6) AS lo, round(b.bhi, 6) AS hi,
       round(CAST((SELECT count(*) FROM lineitem l
                   WHERE l.l_quantity >= b.blo
                     AND (CASE WHEN b.i = 4 THEN l.l_quantity <= b.bhi ELSE l.l_quantity < b.bhi END))
             AS DOUBLE) / b.n, 6) AS weight
FROM b
"""


def q_sampler_splitter(spark, sf_dir):
    """Native mod sampler + sha2 hash splitter (reference uses per-row Python
    UDF hashing — sparkdf_data_sampler.py:161-203)."""
    from great_expectations_spark.sources import split_sample as ss

    o = _load(spark, sf_dir, "orders")
    mod = ss.sample_using_mod(o, "o_orderkey", 10, 3).select(
        F.lit("mod").alias("src"), F.col("o_orderkey").alias("key")
    )
    hashed = o.filter(ss.split_on_hashed_column("o_orderkey", 1, "a")).select(
        F.lit("hash").alias("src"), F.col("o_orderkey").alias("key")
    )
    return mod.unionAll(hashed)


SQL_SAMPLER_SPLITTER = """
SELECT 'mod' AS src, o_orderkey AS key FROM orders WHERE o_orderkey % 10 = 3
UNION ALL
SELECT 'hash', o_orderkey FROM orders WHERE substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'a'
"""


def q_streaming_metrics(spark, sf_dir):
    """Watermarked event-time-window unexpected counts over the events table
    replayed as a stream (availableNow). Append mode emits only
    watermark-closed windows (end <= max event time)."""
    import tempfile

    from great_expectations_spark.streaming.validate_stream import streaming_metrics

    ev = _load(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="ges_stream_src_")
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    s = ExpectationSuite(name="sm")
    s.add(
        "expect_column_values_to_be_in_set",
        column="event_type",
        value_set=["click", "view", "purchase", "signup"],
    )
    m = streaming_metrics(
        stream, s, ts_col="ts", window_duration="1 day", watermark_delay="0 seconds"
    )
    name = "ges_stream_metrics_q"
    q = (
        m.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd").alias("day"),
        F.col("element_count"),
        F.col("expect_column_values_to_be_in_set_unexpected").alias("unexpected"),
    )


SQL_STREAMING_METRICS = """
WITH mx AS (SELECT max(ts) AS m FROM events)
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS element_count,
       CAST(sum(CASE WHEN event_type NOT IN ('click','view','purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS unexpected
FROM events, mx
GROUP BY date_trunc('day', ts), mx.m
HAVING date_trunc('day', ts) + INTERVAL 1 DAY <= mx.m
"""


# ---------------------------------------------------------------------------
# image payload (synthesized per BASELINE.json input_hint; rows-only checks)
# ---------------------------------------------------------------------------


def _image_suite():
    suite = ExpectationSuite(name="image_validation")
    suite.add("expect_image_bytes_to_be_decodable", column="bytes")
    suite.add("expect_image_dims_to_match_metadata")
    suite.add("expect_image_fmt_to_match_metadata")
    suite.add("expect_image_phash_to_match", max_hamming_distance=0)
    suite.add("expect_column_values_to_not_be_null", column="caption")
    suite.add("expect_column_values_to_be_unique", column="image_id")
    suite.add("expect_column_values_to_be_in_set", column="fmt", value_set=["png", "jpeg", "webp"])
    suite.add("expect_table_row_count_to_be_between", min_value=1, max_value=10**12)
    return suite


def q_images_validate(spark, sf_dir):
    """Flagship image-payload validation: Arrow pandas_udf decode kernels +
    the standard map-metric machinery, per-partition verdicts by fmt."""
    from great_expectations_spark.testing.images import images_df

    df, ref, _ = images_df(spark, n=500, seed=7)
    result = img.validate_images(df, _image_suite(), partition_by=["fmt"])
    rows = []
    for evr in result.results + result.partition_results:
        r = evr.result or {}
        rows.append(
            (
                evr.expectation_config["expectation_type"],
                "|".join(f"{k}={v}" for k, v in (evr.partition or {}).items()) or "global",
                1 if evr.success else 0,
                int(r["element_count"]) if r.get("element_count") is not None else None,
                int(r["unexpected_count"]) if r.get("unexpected_count") is not None else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "expectation_type string, partition_key string, success long, "
        "element_count long, unexpected_count long",
    )


def q_image_phash_dedup(spark, sf_dir):
    """Near-dup images by perceptual-hash Hamming banding (no decode — the
    bytes column is never read)."""
    from great_expectations_spark.operators.images import image_near_duplicate_pairs
    from great_expectations_spark.testing.images import images_df

    df, _, _ = images_df(spark, n=300, seed=11, dup_frac=0.0, corrupt_frac=0.0)
    copies = df.select(
        F.concat("image_id", F.lit("-copy")).alias("image_id"),
        "bytes", "w", "h", "fmt", "caption", "phash",
    )
    return image_near_duplicate_pairs(df.unionByName(copies), max_hamming=0)


def q_audio_features(spark, sf_dir):
    """Audio payload decode + feature extraction (Arrow kernel over the fake
    PCM codec — stub per build brief; Spark plumbing real)."""
    from great_expectations_spark.operators import multimodal as mm

    df = mm.audio_df(spark, n=200, seed=5)
    e = mm.enrich_audio(df)
    return e.select(
        "audio_id",
        F.col("_audio.ok").alias("ok"),
        F.col("_audio.n_samples").alias("n_samples"),
        F.col("_audio.zero_crossings").alias("zero_crossings"),
        F.round(F.col("_audio.rms"), 3).alias("rms"),
    )


def q_video_frames(spark, sf_dir):
    """Video frame sampling → single-frame image payloads (training-data
    shape for image models fed from video)."""
    from great_expectations_spark.operators import multimodal as mm

    df = mm.video_df(spark, n=100, seed=6)
    frames = mm.sample_frames(df, every_n=2)
    return frames.select("video_id", "frame_idx", F.length("frame_bytes").alias("frame_size"))


def q_images_enrich(spark, sf_dir):
    from great_expectations_spark.testing.images import images_df

    df, _, _ = images_df(spark, n=500, seed=7)
    e = img.enrich_images(df)
    d = F.col(img.DECODED_COL)
    return e.select(
        "image_id",
        d["ok"].alias("decode_ok"),
        (d["w"].eqNullSafe(F.col("w")) & d["h"].eqNullSafe(F.col("h"))).alias("dims_match"),
        d["fmt"].eqNullSafe(F.col("fmt")).alias("fmt_match"),
        F.when(d["ok"], F.bit_count(d["phash"].bitwiseXOR(F.col("phash")))).alias(
            "phash_hamming"
        ),
    )


# ---------------------------------------------------------------------------
# merged bundles — the driver records at most 50 queries (r01 silently
# dropped the last 5), so same-shaped single-purpose queries are unioned
# into bundles; every original metric row is preserved under its label
# ---------------------------------------------------------------------------


def q_set_membership(spark, sf_dir):
    """in_set + mostly (lineitem) + not_in_set (orders), one METRICS frame."""
    li = _load(spark, sf_dir, "lineitem")
    a = _map_metrics_df(
        spark,
        li,
        [
            (
                "in_set",
                "expect_column_values_to_be_in_set",
                {"column": "l_returnflag", "value_set": ["A", "N"]},
            ),
            (
                "mostly",
                "expect_column_values_to_be_in_set",
                {"column": "l_returnflag", "value_set": ["N", "A"], "mostly": 0.6},
            ),
        ],
    )
    return a.unionByName(q_not_in_set(spark, sf_dir))


SQL_SET_MEMBERSHIP = (
    SQL_IN_SET + " UNION ALL " + SQL_MOSTLY + " UNION ALL " + SQL_NOT_IN_SET
)


def q_patterns(spark, sf_dir):
    """regex (customer) + regex_list/like (part) bundles."""
    return q_regex(spark, sf_dir).unionByName(
        q_regex_list(spark, sf_dir)
    ).unionByName(q_like(spark, sf_dir))


SQL_PATTERNS = SQL_REGEX + " UNION ALL " + SQL_REGEX_LIST + " UNION ALL " + SQL_LIKE


def q_json_checks(spark, sf_dir):
    """json_parseable/regex + json_schema over events."""
    return q_json(spark, sf_dir).unionByName(q_json_schema(spark, sf_dir))


SQL_JSON_CHECKS = SQL_JSON + " UNION ALL " + SQL_JSON_SCHEMA


def q_formats(spark, sf_dir):
    """value lengths (part) + strftime (events)."""
    return q_value_lengths(spark, sf_dir).unionByName(q_strftime(spark, sf_dir))


SQL_FORMATS = SQL_VALUE_LENGTHS + " UNION ALL " + SQL_STRFTIME


def q_drift_stats(spark, sf_dir):
    """KL + PSI + Cramér's-phi observed values PLUS the chi-square and KS
    test statistics (lineitem), one consolidated drift slot — (expectation,
    observed, success); the test statistics carry a NULL success (they are
    observed values, not verdicts, in this frame)."""
    stats = (
        q_drift_kl(spark, sf_dir)
        .unionByName(q_drift_psi(spark, sf_dir))
        .unionByName(q_cramers_phi(spark, sf_dir))
    )
    chi2 = q_drift_chi2(spark, sf_dir).select(
        F.lit("chi2").alias("expectation"),
        F.col("chi_square_statistic").alias("observed"),
        F.lit(None).cast("long").alias("success"),
    )
    ks = q_drift_ks(spark, sf_dir).select(
        F.lit("ks").alias("expectation"),
        F.col("ks_statistic").alias("observed"),
        F.lit(None).cast("long").alias("success"),
    )
    return stats.unionByName(chi2).unionByName(ks)


# the per-query SQLs select the same columns in different positions; UNION
# ALL is positional, so re-project each
SQL_DRIFT_STATS = " UNION ALL ".join(
    f"SELECT expectation, observed, success FROM ({s}) d{i}"
    for i, s in enumerate([SQL_DRIFT_KL, SQL_DRIFT_PSI, SQL_CRAMERS_PHI])
) + (
    f" UNION ALL SELECT 'chi2' AS expectation, chi_square_statistic AS observed,"
    f" CAST(NULL AS BIGINT) AS success FROM ({SQL_DRIFT_CHI2}) dc"
    f" UNION ALL SELECT 'ks' AS expectation, ks_statistic AS observed,"
    f" CAST(NULL AS BIGINT) AS success FROM ({SQL_DRIFT_KS}) dk"
)


# ---------------------------------------------------------------------------
# query.column placeholders + evaluation-parameter expressions
# ---------------------------------------------------------------------------


def q_query_column(spark, sf_dir):
    """query.table ({batch} substitution) + {col}/{col_A}/{col_B} placeholder
    substitution in query expectations (reference query.column /
    query.column_pair metric semantics) — one driver slot."""
    li = _load(spark, sf_dir, "lineitem")
    res = _run_suite(
        spark,
        li,
        [
            (
                "no_rows",
                "expect_query_to_return_no_rows",
                {"query": "SELECT * FROM {batch} WHERE l_quantity < 0 OR l_quantity > 50"},
            ),
            (
                "query_col_nulls",
                "expect_query_to_return_no_rows",
                {
                    "query": "SELECT {col} FROM {batch} WHERE {col} IS NULL",
                    "column": "l_shipdate",
                },
            ),
            (
                "query_col_pair_groups",
                "expect_query_row_count_to_be_between",
                {
                    "query": (
                        "SELECT {col_A}, {col_B} FROM {batch} "
                        "GROUP BY {col_A}, {col_B}"
                    ),
                    "column_A": "l_returnflag",
                    "column_B": "l_linestatus",
                    "min_value": 1,
                    "max_value": 100,
                },
            ),
        ],
    )
    rows = []
    for evr in res.results:
        label = evr.expectation_config["meta"]["label"]
        obs = (evr.result or {}).get("observed_value")
        rows.append((label, int(obs), 1 if evr.success else 0))
    return spark.createDataFrame(
        rows, "expectation string, observed long, success long"
    )


SQL_QUERY_COLUMN = """
SELECT 'no_rows' AS expectation,
       CAST(count(*) AS BIGINT) AS observed,
       CAST(CASE WHEN count(*) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM lineitem WHERE l_quantity < 0 OR l_quantity > 50
UNION ALL
SELECT 'query_col_nulls' AS expectation,
       CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS observed,
       CAST(CASE WHEN sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM lineitem
UNION ALL
SELECT 'query_col_pair_groups',
       CAST(count(*) AS BIGINT),
       CAST(CASE WHEN count(*) BETWEEN 1 AND 100 THEN 1 ELSE 0 END AS BIGINT)
FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
"""


def q_eval_params(spark, sf_dir):
    """$PARAMETER expression-language bounds resolved at validate time."""
    li = _load(spark, sf_dir, "lineitem")
    return _obs_df(
        spark,
        li,
        [
            (
                "expr_max",
                "expect_column_max_to_be_between",
                {
                    "column": "l_quantity",
                    "min_value": {"$PARAMETER": "trunc(5 * 2)"},
                    "max_value": {"$PARAMETER": "25 * 2 + exp(0)"},
                },
            ),
            (
                "expr_bound_param",
                "expect_column_min_to_be_between",
                {
                    "column": "l_quantity",
                    "max_value": {"$PARAMETER": "lo + 1"},
                },
            ),
        ],
        evaluation_parameters={"lo": 1},
    )


SQL_EVAL_PARAMS = """
SELECT 'expr_max' AS expectation, round(max(l_quantity), 4) AS observed,
       CAST(CASE WHEN max(l_quantity) >= 10 AND max(l_quantity) <= 51 THEN 1 ELSE 0 END AS BIGINT) AS success
FROM lineitem
UNION ALL
SELECT 'expr_bound_param', round(min(l_quantity), 4),
       CAST(CASE WHEN min(l_quantity) <= 2 THEN 1 ELSE 0 END AS BIGINT)
FROM lineitem
"""


# ---------------------------------------------------------------------------
# profiler (suite bootstrapping) — emission decisions vs a DuckDB oracle
# ---------------------------------------------------------------------------


def q_profiler(spark, sf_dir):
    """profile() emission rules on two tables PLUS the rule-based
    onboarding assistant's emission decisions over a 3-way deterministic
    batch split of orders (exact estimator); each emitted expectation is a
    row — the oracle recomputes the same decisions from the data in SQL.
    The best-regex row is projected out: its candidate inventory is Java
    regex dialect (pytest-covered); every other onboarding rule's decision
    is dialect-neutral and oracle-checked here."""
    from great_expectations_spark.profiler import profile
    from great_expectations_spark.rule_profiler import onboarding_assistant

    rows = []
    for tbl in ("lineitem", "events"):
        suite = profile(_load(spark, sf_dir, tbl), name=tbl)
        for cfg in suite.expectations:
            rows.append((tbl, cfg.kwargs.get("column", ""), cfg.expectation_type))
    orders = _load(spark, sf_dir, "orders")
    batches = [orders.filter(F.expr(f"o_orderkey % 3 = {i}")) for i in range(3)]
    for cfg in onboarding_assistant(batches, estimator="exact").expectations:
        if cfg.expectation_type == "expect_column_values_to_match_regex":
            continue
        rows.append(
            ("orders_onboarding", cfg.kwargs.get("column", ""), cfg.expectation_type)
        )

    # image-onboarding admission decisions over a deterministic image+caption
    # metadata table DERIVED from orders by modular arithmetic (the
    # input_hint schema minus real pixels): image_id collapses mod 97 so
    # every batch provably contains duplicates — the uniqueness rule must
    # REFUSE it (and admit caption/phash); fmt's learned value set and the
    # exact w/h range bounds are emitted as extra value rows the oracle
    # recomputes from the same arithmetic
    from great_expectations_spark.rule_profiler import image_onboarding_assistant

    k = F.col("o_orderkey")
    img = orders.select(
        (k % 3).alias("b"),
        F.concat(F.lit("img-"), (k % 97).cast("string")).alias("image_id"),
        F.lit(b"\x89synthetic").alias("bytes"),
        (F.lit(32) + (k % 8) * 16).cast("int").alias("w"),
        (F.lit(32) + (k % 5) * 32).cast("int").alias("h"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("bmp"), F.lit("gif")),
            (k % 4).cast("int") + 1,
        ).alias("fmt"),
        F.concat(F.lit("caption "), k.cast("string")).alias("caption"),
        k.alias("phash"),
    )
    img_batches = [img.filter(F.col("b") == i).drop("b") for i in range(3)]
    isuite = image_onboarding_assistant(img_batches, estimator="exact")
    for cfg in isuite.expectations:
        if cfg.expectation_type == "expect_column_values_to_match_regex":
            continue
        col = cfg.kwargs.get("column", "")
        rows.append(("image_onboarding", col, cfg.expectation_type))
        if cfg.expectation_type == "expect_column_values_to_be_in_set" and col == "fmt":
            for v in sorted(cfg.kwargs["value_set"]):
                rows.append(("image_onboarding_fmt_set", v, "fmt_value"))
        if col in ("w", "h") and cfg.expectation_type in (
            "expect_column_min_to_be_between",
            "expect_column_max_to_be_between",
        ):
            metric = "min" if "min_to" in cfg.expectation_type else "max"
            rows.append(
                (
                    "image_onboarding_bounds",
                    f"{col}_{metric}",
                    f"{int(cfg.kwargs['min_value'])}:{int(cfg.kwargs['max_value'])}",
                )
            )
    return spark.createDataFrame(rows, "tbl string, entity string, expectation string")


def _profiler_oracle_sql() -> str:
    tables = {
        "lineitem": {
            "cols": [
                "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate",
            ],
            "numeric": {
                "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            },
            "temporal": {"l_shipdate"},
        },
        "events": {
            "cols": ["event_id", "ts", "user_id", "event_type", "value", "props"],
            "numeric": {"event_id", "user_id", "value"},
            "temporal": {"ts"},
        },
    }
    parts = []
    for tbl, spec in tables.items():
        parts.append(
            f"SELECT '{tbl}' AS tbl, '' AS entity, "
            f"'expect_table_columns_to_match_ordered_list' AS expectation"
        )
        parts.append(f"SELECT '{tbl}', '', 'expect_table_row_count_to_be_between'")
        for c in spec["cols"]:
            nn = f"(SELECT count({c}) FROM {tbl})"
            dc = f"(SELECT count(DISTINCT {c}) FROM {tbl})"
            parts.append(f"SELECT '{tbl}', '{c}', 'expect_column_values_to_be_of_type'")
            parts.append(
                f"SELECT '{tbl}', '{c}', 'expect_column_values_to_not_be_null' "
                f"WHERE (SELECT (count(*) - count({c})) * 1.0 / count(*) FROM {tbl}) <= 0.5"
            )
            kinds = (
                ["min", "max", "mean"]
                if c in spec["numeric"]
                else (["min", "max"] if c in spec["temporal"] else [])
            )
            for k in kinds:
                parts.append(
                    f"SELECT '{tbl}', '{c}', 'expect_column_{k}_to_be_between' "
                    f"WHERE {nn} > 0"
                )
            parts.append(
                f"SELECT '{tbl}', '{c}', 'expect_column_values_to_be_in_set' "
                f"WHERE {nn} > 0 AND {dc} <= 20"
            )
            parts.append(
                f"SELECT '{tbl}', '{c}', 'expect_column_values_to_be_unique' "
                f"WHERE {nn} > 0 AND {dc} = {nn}"
            )
    parts.extend(_onboarding_oracle_parts())
    parts.extend(_image_onboarding_oracle_parts())
    return f"WITH img AS ({_IMG_CTE})\n" + "\nUNION ALL\n".join(parts)


# the same deterministic image-metadata derivation q_profiler builds in
# Spark, recomputed by DuckDB from orders (bytes carries no decision weight
# — it is excluded from metadata rules and only gates the payload roster)
_IMG_CTE = """
SELECT o_orderkey % 3 AS b,
       'img-' || CAST(o_orderkey % 97 AS VARCHAR) AS image_id,
       CAST(32 + (o_orderkey % 8) * 16 AS INT) AS w,
       CAST(32 + (o_orderkey % 5) * 32 AS INT) AS h,
       CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
            WHEN 2 THEN 'bmp' ELSE 'gif' END AS fmt,
       'caption ' || CAST(o_orderkey AS VARCHAR) AS caption,
       o_orderkey AS phash
FROM orders
"""


def _image_onboarding_oracle_parts() -> list[str]:
    """image_onboarding_assistant(estimator='exact') decisions over the img
    CTE, batch-split on b — the same admission logic as
    _onboarding_oracle_parts plus: the payload roster (constant — every
    image column exists), fmt's learned value set, and the exact w/h
    min/max range bounds as value rows."""
    t = "image_onboarding"
    cols = ["image_id", "w", "h", "fmt", "caption", "phash"]
    numeric = ["w", "h", "phash"]
    text = ["image_id", "fmt", "caption"]
    parts = [
        f"SELECT '{t}', '', 'expect_table_columns_to_match_set'",
        f"SELECT '{t}', '', 'expect_table_row_count_to_be_between'",
    ]
    for c in cols:
        nn = f"(SELECT count({c}) FROM img)"
        nulls = f"(SELECT count(*) - count({c}) FROM img)"
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_values_to_be_unique' "
            f"WHERE NOT EXISTS (SELECT 1 FROM (SELECT b, {c} AS v, count(*) AS cnt "
            f"FROM img WHERE {c} IS NOT NULL GROUP BY 1, 2) WHERE cnt > 1)"
        )
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_values_to_be_null' WHERE {nn} = 0"
        )
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_values_to_not_be_null' "
            f"WHERE {nulls} = 0"
        )
    for c in numeric:
        nn = f"(SELECT count({c}) FROM img)"
        for kind in ("min", "max", "mean", "median"):
            parts.append(
                f"SELECT '{t}', '{c}', 'expect_column_{kind}_to_be_between' "
                f"WHERE {nn} > 0"
            )
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_stdev_to_be_between' "
            f"WHERE (SELECT max(sd) FROM (SELECT stddev_samp({c}) AS sd FROM img "
            f"GROUP BY b)) > 0"
        )
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_quantile_values_to_be_between' "
            f"WHERE {nn} > 0"
        )
    for c in text:
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_value_lengths_to_be_between' "
            f"WHERE (SELECT count({c}) FROM img) > 0"
        )
    for c in cols:
        latest_dc = f"(SELECT count(DISTINCT {c}) FROM img WHERE b = 2)"
        for e in (
            "expect_column_values_to_be_in_set",
            "expect_column_unique_value_count_to_be_between",
        ):
            parts.append(f"SELECT '{t}', '{c}', '{e}' WHERE {latest_dc} <= 100")
    # the payload roster — emitted whenever the image columns exist
    for e, c in (
        ("expect_image_bytes_to_be_decodable", "bytes"),
        ("expect_image_dims_to_match_metadata", "bytes"),
        ("expect_image_fmt_to_match_metadata", "bytes"),
        ("expect_image_phash_to_match", "bytes"),
    ):
        parts.append(f"SELECT '{t}', '{c}', '{e}'")
    # fmt's learned value set (union over batches)
    parts.append(
        "SELECT 'image_onboarding_fmt_set', fmt, 'fmt_value' "
        "FROM (SELECT DISTINCT fmt FROM img)"
    )
    # exact-estimator w/h bounds: range over the per-batch metric history
    for c in ("w", "h"):
        for kind in ("min", "max"):
            parts.append(
                f"SELECT 'image_onboarding_bounds', '{c}_{kind}', "
                f"CAST(CAST(min(bv) AS BIGINT) AS VARCHAR) || ':' || "
                f"CAST(CAST(max(bv) AS BIGINT) AS VARCHAR) "
                f"FROM (SELECT {kind}({c}) AS bv FROM img GROUP BY b)"
            )
    return parts


def _onboarding_oracle_parts() -> list[str]:
    """SQL recomputation of onboarding_assistant(estimator='exact')
    decisions on orders split by o_orderkey % 3 — each clause mirrors one
    rule's admission/condition logic exactly (rule_profiler.py):
    uniqueness = zero duplicated non-null values in EVERY batch; nullity =
    all-null everywhere; non-nullity plain when zero nulls, mostly variant
    when nulls exist and the worst batch ratio < 0.5; numeric/datetime/text
    rows whenever the column has any non-null value (exact-estimator range
    over per-batch history); stdev additionally needs a positive batch
    stddev; categorical rows when the LATEST batch's distinct count fits
    the FEW(=100) cardinality mode."""
    t = "orders_onboarding"
    numeric = ["o_orderkey", "o_custkey", "o_totalprice"]
    temporal = ["o_orderdate"]
    text = ["o_orderstatus", "o_orderpriority"]
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    parts = [
        f"SELECT '{t}' AS tbl, '' AS entity, 'expect_table_columns_to_match_set' AS expectation",
        f"SELECT '{t}', '', 'expect_table_row_count_to_be_between'",
    ]
    for c in cols:
        nn = f"(SELECT count({c}) FROM orders)"
        nulls = f"(SELECT count(*) - count({c}) FROM orders)"
        worst_null = (
            f"(SELECT max((cnt - nncnt) * 1.0 / cnt) FROM (SELECT count(*) AS cnt, "
            f"count({c}) AS nncnt FROM orders GROUP BY o_orderkey % 3))"
        )
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_values_to_be_unique' "
            f"WHERE NOT EXISTS (SELECT 1 FROM (SELECT o_orderkey % 3 AS b, {c} AS v, "
            f"count(*) AS k FROM orders WHERE {c} IS NOT NULL GROUP BY 1, 2) WHERE k > 1)"
        )
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_values_to_be_null' WHERE {nn} = 0"
        )
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_values_to_not_be_null' "
            f"WHERE {nulls} = 0"
        )
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_values_to_not_be_null' "
            f"WHERE {nulls} > 0 AND {worst_null} < 0.5"
        )
    for c in numeric:
        nn = f"(SELECT count({c}) FROM orders)"
        for k in ("min", "max", "mean", "median"):
            parts.append(
                f"SELECT '{t}', '{c}', 'expect_column_{k}_to_be_between' WHERE {nn} > 0"
            )
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_stdev_to_be_between' "
            f"WHERE (SELECT max(sd) FROM (SELECT stddev_samp({c}) AS sd FROM orders "
            f"GROUP BY o_orderkey % 3)) > 0"
        )
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_quantile_values_to_be_between' "
            f"WHERE {nn} > 0"
        )
    for c in temporal:
        nn = f"(SELECT count({c}) FROM orders)"
        for k in ("min", "max"):
            parts.append(
                f"SELECT '{t}', '{c}', 'expect_column_{k}_to_be_between' WHERE {nn} > 0"
            )
    for c in text:
        parts.append(
            f"SELECT '{t}', '{c}', 'expect_column_value_lengths_to_be_between' "
            f"WHERE (SELECT count({c}) FROM orders) > 0"
        )
    for c in cols:
        latest_dc = (
            f"(SELECT count(DISTINCT {c}) FROM orders WHERE o_orderkey % 3 = 2)"
        )
        for e in (
            "expect_column_values_to_be_in_set",
            "expect_column_unique_value_count_to_be_between",
        ):
            parts.append(f"SELECT '{t}', '{c}', '{e}' WHERE {latest_dc} <= 100")
    return parts


SQL_PROFILER = _profiler_oracle_sql()


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # map expectations
    "nullness": q_nullness,
    "between": q_between,
    "set_membership": q_set_membership,
    "formats": q_formats,
    "patterns": q_patterns,
    "json_checks": q_json_checks,
    "pair": q_pair,
    "multicolumn": q_multicolumn,
    "zscore": q_zscore,
    "row_condition": q_row_condition,
    # aggregates
    "agg_stats": q_agg_stats,
    "agg_quantiles": q_agg_quantiles,
    "agg_distinct": q_agg_distinct,
    "value_counts": q_value_counts,
    "histogram": q_histogram,
    # uniqueness / referential
    "unique_column": q_unique_column,
    "unique_compound": q_unique_compound,
    "referential": q_referential,
    # drift
    "drift_stats": q_drift_stats,
    "param_ks": q_param_ks,
    # special
    "monotonic": q_monotonic,
    "query_column": q_query_column,
    "eval_params": q_eval_params,
    "schema_checks": q_schema_checks,
    "profiler": q_profiler,
    "violations": q_violations,
    "partition_builder": q_partition_builder,
    "sampler_splitter": q_sampler_splitter,
    "streaming_metrics": q_streaming_metrics,
    # images / multimodal (the graft cell payload — never dropped by the
    # driver's 50-query cap again)
    "images_validate": q_images_validate,
    "images_enrich": q_images_enrich,
    "image_phash_dedup": q_image_phash_dedup,
    "audio_features": q_audio_features,
    "video_frames": q_video_frames,
    # text / dedup / similarity
    "text_stats": q_text_stats,
    "dedup_groups": q_dedup_groups,
    "pii_scan": q_pii_scan,
    "url_tools": q_url_tools,
    "top_ngrams": q_top_ngrams,
    "pack_invariants": q_pack_invariants,
    "token_budget": q_token_budget,
    "clean_funnel": q_clean_funnel,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "sim_topk": q_sim_topk,
    "sim_pairs": q_sim_pairs,
    "sim_lsh_topk": q_sim_lsh_topk,
    "sim_ivf_topk": q_sim_ivf_topk,
    "dedup_spans": q_dedup_spans,
}

def _multimodal_oracles() -> dict[str, str]:
    """VALUES-based DuckDB oracles recomputed pure-Python (single-node, no
    Spark, no engine code) over the same deterministic fixtures — see
    great_expectations_spark/testing/oracles.py."""
    from great_expectations_spark.testing import oracles as mo

    return {
        "images_validate": mo.images_validate_sql(n=500, seed=7),
        "images_enrich": mo.images_enrich_sql(n=500, seed=7),
        "image_phash_dedup": mo.image_phash_dedup_sql(n=300, seed=11),
        "audio_features": mo.audio_features_sql(n=200, seed=5),
        "video_frames": mo.video_frames_sql(n=100, seed=6),
    }


def _seeded_oracles() -> dict[str, str]:
    """VALUES-based DuckDB oracles for the seeded-hash / approximate queries,
    recomputed pure-Python+numpy over the sf0.01 parquet fixtures with the
    spec-rederived Spark hash functions (testing/seeded_oracles.py,
    testing/hashes.py — verified bit-for-bit in tests/test_testing_hashes.py)."""
    from great_expectations_spark.testing import seeded_oracles as so

    return {
        "dedup_minhash": so.minhash_pairs_sql(threshold=0.5),
        "dedup_simhash": so.simhash_pairs_sql(max_hamming=8),
        "sim_lsh_topk": so.lsh_topk_sql(k=10, n_planes=8, multi_probe_hamming=2),
        "param_ks": so.param_ks_sql(),
    }


_ORACLES: dict[str, str] = {
    "nullness": SQL_NULLNESS,
    "between": SQL_BETWEEN,
    "set_membership": SQL_SET_MEMBERSHIP,
    "formats": SQL_FORMATS,
    "patterns": SQL_PATTERNS,
    "json_checks": SQL_JSON_CHECKS,
    "pair": SQL_PAIR,
    "multicolumn": SQL_MULTICOLUMN,
    "zscore": SQL_ZSCORE,
    "row_condition": SQL_ROW_CONDITION,
    "agg_stats": SQL_AGG_STATS,
    "agg_quantiles": SQL_AGG_QUANTILES,
    "agg_distinct": SQL_AGG_DISTINCT,
    "value_counts": SQL_VALUE_COUNTS,
    "histogram": SQL_HISTOGRAM,
    "unique_column": SQL_UNIQUE_COLUMN,
    "unique_compound": SQL_UNIQUE_COMPOUND,
    "referential": SQL_REFERENTIAL,
    "drift_stats": SQL_DRIFT_STATS,
    "monotonic": SQL_MONOTONIC,
    "query_column": SQL_QUERY_COLUMN,
    "eval_params": SQL_EVAL_PARAMS,
    "schema_checks": SQL_SCHEMA_CHECKS,
    "profiler": SQL_PROFILER,
    "violations": SQL_VIOLATIONS,
    "partition_builder": SQL_PARTITION_BUILDER,
    "sampler_splitter": SQL_SAMPLER_SPLITTER,
    "streaming_metrics": SQL_STREAMING_METRICS,
    "text_stats": SQL_TEXT_STATS,
    "dedup_groups": SQL_DEDUP_GROUPS,
    "pii_scan": SQL_PII_SCAN,
    "url_tools": SQL_URL_TOOLS,
    "top_ngrams": SQL_TOP_NGRAMS,
    "pack_invariants": SQL_PACK_INVARIANTS,
    "token_budget": SQL_TOKEN_BUDGET,
    "clean_funnel": SQL_CLEAN_FUNNEL,
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    "sim_topk": SQL_SIM_TOPK,
    "sim_pairs": SQL_SIM_PAIRS,
    "sim_ivf_topk": SQL_SIM_IVF_TOPK,
    "dedup_spans": SQL_DEDUP_SPANS,
    **_multimodal_oracles(),
    # the four seeded-hash oracles (_seeded_oracles) are appended lazily in
    # oracle_sql(): they read the sf0.01 parquet fixtures and run ~2 s of
    # pure-Python hashing, which would otherwise tax EVERY import of this
    # module (and hard-fail imports on machines without the fixtures)
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: image-payload validation (north star) + a TPC-H-ish suite on
    sf0.001 lineitem, as one validation-results DataFrame."""
    from great_expectations_spark.testing.images import images_df

    engine = SparkValidationEngine(spark)
    df, ref, _ = images_df(spark, n=1000, seed=42)
    image_result = img.validate_images(df, _image_suite(), partition_by=["fmt"])

    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    suite = ExpectationSuite(name="lineitem_core")
    suite.add("expect_column_values_to_not_be_null", column="l_orderkey")
    suite.add("expect_column_values_to_be_between", column="l_quantity", min_value=1, max_value=50)
    suite.add("expect_column_values_to_be_in_set", column="l_returnflag", value_set=["A", "N", "R"])
    suite.add("expect_column_mean_to_be_between", column="l_quantity", min_value=10, max_value=40)
    suite.add("expect_compound_columns_to_be_unique", column_list=["l_orderkey", "l_linenumber"])
    li_result = engine.validate(li, suite, result_format="BASIC", partition_by=["l_returnflag"])

    return engine.results_df(image_result).unionAll(engine.results_df(li_result))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


_SEEDED_CACHE: dict[str, str] = {}


def oracle_sql() -> dict[str, str]:
    if not _SEEDED_CACHE:
        _SEEDED_CACHE.update(_seeded_oracles())
    return {**_ORACLES, **_SEEDED_CACHE}
