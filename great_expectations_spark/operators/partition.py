"""Partition-object builders — data-derived histogram baselines for drift.

Reference: ``column.partition`` metric (column_partition.py:60-221): bin
strategies ``uniform`` (equal-width from min/max), ``quantile``/``ntile``
(equal-mass from quantiles), ``auto`` (Freedman-Diaconis-style width from the
IQR, column_partition.py:132-221). The partition object produced here feeds
``expect_column_kl_divergence_to_be_less_than`` / KS / PSI as the expected
distribution — compute it once on a baseline snapshot, store it, validate
future batches against it.

All statistics come from ONE aggregate job (min/max/quantiles in a single
``df.agg``); the follow-up weights histogram is a second single-pass agg.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spread_bins(lo: float, hi: float, n_bins: int) -> list[float]:
    if hi <= lo:
        hi = lo + 1.0
    step = (hi - lo) / n_bins
    return [lo + i * step for i in range(n_bins)] + [hi]


def build_partition_bins(
    df: DataFrame,
    column: str,
    bins: str = "uniform",
    n_bins: int = 10,
    allow_relative_error: float = 0.0,
) -> list[float]:
    """Bin edges per strategy — one aggregate job.

    - ``uniform``: equal width over [min, max]
    - ``ntile``/``quantile``/``percentile``: equal mass (exact or
      GK-approximate per ``allow_relative_error``)
    - ``auto``: Freedman-Diaconis width 2·IQR/n^(1/3) clamped to
      [min, max] (reference column_partition.py:132-221)
    """
    col = F.col(column)
    if bins == "uniform":
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        return _spread_bins(float(row["lo"]), float(row["hi"]), n_bins)
    if bins in ("ntile", "quantile", "percentile"):
        qs = [i / n_bins for i in range(n_bins + 1)]
        edges = df.stat.approxQuantile(column, qs, allow_relative_error)
        # dedupe while preserving order (heavy ties collapse bins)
        out: list[float] = []
        for e in edges:
            if not out or e > out[-1]:
                out.append(float(e))
        return out if len(out) >= 2 else _spread_bins(out[0], out[0], 1)
    if bins == "auto":
        row = df.agg(
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
            F.count(col).alias("n"),
            F.percentile_approx(col, F.array(F.lit(0.25), F.lit(0.75)), F.lit(10000)).alias("iqr_q"),
        ).collect()[0]
        lo, hi, n = float(row["lo"]), float(row["hi"]), int(row["n"])
        q25, q75 = (float(x) for x in row["iqr_q"])
        iqr = q75 - q25
        if iqr > 0 and n > 0:
            width = 2.0 * iqr / (n ** (1.0 / 3.0))
            k = max(1, min(1000, int(math.ceil((hi - lo) / width)) if width > 0 else 1))
        else:
            k = n_bins
        return _spread_bins(lo, hi, k)
    raise ValueError(f"unknown bin strategy: {bins}")


def build_partition_object(
    df: DataFrame,
    column: str,
    bins: str = "uniform",
    n_bins: int = 10,
    allow_relative_error: float = 0.0,
) -> dict:
    """Full continuous partition object {bins, weights, tail_weights} — the
    drift-baseline artifact. Weights from one histogram agg pass using the
    same [lo,hi) / last-[lo,hi] semantics as the validation-side histogram
    (operators/drift.py:39-44)."""
    edges = build_partition_bins(df, column, bins, n_bins, allow_relative_error)
    col = F.col(column)
    k = len(edges) - 1
    aggs = []
    for i in range(k):
        cond = (col >= F.lit(edges[i])) & (
            (col <= F.lit(edges[i + 1])) if i == k - 1 else (col < F.lit(edges[i + 1]))
        )
        aggs.append(F.count(F.when(cond, F.lit(1))).alias(f"b{i}"))
    aggs.append(F.count(col).alias("nonnull"))
    aggs.append(F.count(F.when(col < F.lit(edges[0]), 1)).alias("below"))
    aggs.append(F.count(F.when(col > F.lit(edges[-1]), 1)).alias("above"))
    row = df.agg(*aggs).collect()[0]
    nonnull = int(row["nonnull"]) or 1
    return {
        "bins": edges,
        "weights": [int(row[f"b{i}"]) / nonnull for i in range(k)],
        "tail_weights": [int(row["below"]) / nonnull, int(row["above"]) / nonnull],
    }


def build_categorical_partition_object(
    df: DataFrame, column: str, max_values: int = 1000
) -> Optional[dict]:
    """Categorical partition object {values, weights} from a groupBy pass;
    None if cardinality exceeds ``max_values`` (use the continuous path)."""
    rows = (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc(column))
        .limit(max_values + 1)
        .collect()
    )
    if len(rows) > max_values:
        return None
    total = sum(int(r["c"]) for r in rows) or 1
    pairs = sorted((r[column], int(r["c"])) for r in rows)
    return {
        "values": [v for v, _ in pairs],
        "weights": [c / total for _, c in pairs],
    }
