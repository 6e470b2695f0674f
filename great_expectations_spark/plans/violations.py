"""Violation-row extraction as a DataFrame — the 10^12-scale replacement for
COMPLETE-mode driver collects.

The reference materializes full unexpected lists on the driver
(map_metric_provider.py:2384-2506 ``collect()``) — its scale ceiling. Here one
row-level pass evaluates EVERY map expectation's unexpected condition in a
single projection and keeps only violating rows, labeled with the ids of the
expectations they violate; callers write the result to a violations table
(``df.writeTo(...)`` / ``write.parquet``), so no row ever crosses the driver.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.core.config import ExpectationSuite
from great_expectations_spark.operators.conditions import (
    compile_map_condition,
    is_map_expectation,
    translate_row_condition,
)

VIOLATIONS_COL = "_violated_expectations"


def _unexpected_condition(cfg) -> Optional[Column]:
    if not is_map_expectation(cfg.expectation_type):
        return None
    mc = compile_map_condition(cfg.expectation_type, cfg.kwargs)
    rc = cfg.kwargs.get("row_condition")
    dom = (
        translate_row_condition(rc, cfg.kwargs.get("condition_parser", "spark"))
        if rc
        else F.lit(True)
    )
    return dom & mc.considered & F.coalesce(~mc.expected, F.lit(False))


def violations_df(
    df: DataFrame,
    suite: ExpectationSuite,
    label_by: str = "type",
    columns: Optional[list[str]] = None,
) -> DataFrame:
    """Rows violating ≥1 map expectation, with ``_violated_expectations``
    (array<string>) naming which.

    ``label_by``: "type" → expectation_type strings (duplicate types get
    ``#i`` suffixes), "id" → deterministic config ids.
    ``columns``: project to these columns (+ label col); default all —
    pass the key columns at scale so the violations table stays narrow.
    One scan, no shuffle, no driver collect; Catalyst prunes unreferenced
    columns and pushes shared sub-conditions into one WholeStageCodegen span.
    """
    labeled: list[tuple[str, Column]] = []
    seen: dict[str, int] = {}
    for cfg in suite.expectations:
        cond = _unexpected_condition(cfg)
        if cond is None:
            continue
        if label_by == "id":
            label = cfg.id
        else:
            n = seen.get(cfg.expectation_type, 0)
            seen[cfg.expectation_type] = n + 1
            label = cfg.expectation_type if n == 0 else f"{cfg.expectation_type}#{n}"
        labeled.append((label, cond))
    if not labeled:
        empty = df.limit(0)
        return empty.withColumn(VIOLATIONS_COL, F.array().cast("array<string>"))

    tags = F.array(
        *[F.when(cond, F.lit(label)) for label, cond in labeled]
    )
    hit = F.filter(tags, lambda x: x.isNotNull())
    out_cols = [F.col(c) for c in columns] if columns else [F.col(c) for c in df.columns]
    return (
        df.select(*out_cols, hit.alias(VIOLATIONS_COL))
        .filter(F.size(VIOLATIONS_COL) > 0)
    )
