"""Splitters (partition selection) and samplers — §2.A of SURVEY.md.

Reference: split_and_sample/sparkdf_data_splitter.py:38-322 and
sparkdf_data_sampler.py:35-203. Two deliberate departures:

- ``split_on_hashed_column`` / ``sample_using_hash`` use native ``F.sha2`` /
  ``F.hash`` + ``pmod`` instead of the reference's per-row Python
  ``F.udf(hashlib...)`` (sparkdf_data_splitter.py:293-322,
  sparkdf_data_sampler.py:161-203) — stays inside whole-stage codegen.
- Every splitter returns a *predicate Column*; on an Iceberg/partitioned
  source Catalyst turns it into partition pruning (files never opened), which
  is the 10^12-scale point of splitting.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---- splitters: batch_identifiers -> predicate ---------------------------


def split_on_whole_table(df: DataFrame) -> DataFrame:
    return df


def split_on_column_value(column: str, value: Any) -> Column:
    return F.col(column).eqNullSafe(F.lit(value))


def split_on_multi_column_values(values: dict[str, Any]) -> Column:
    cond = F.lit(True)
    for c, v in values.items():
        cond = cond & F.col(c).eqNullSafe(F.lit(v))
    return cond


_DATE_PART_FN = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
}


def split_on_date_parts(column: str, parts: dict[str, int]) -> Column:
    """parts e.g. {"year": 2024, "month": 3} — mirrors
    sparkdf_data_splitter.py:116-161 (split_on_year[/month[/day]] are
    specializations)."""
    cond = F.lit(True)
    for part, value in parts.items():
        fn = _DATE_PART_FN.get(part)
        if fn is None:
            raise ValueError(f"unknown date part: {part}")
        cond = cond & (fn(F.col(column)) == F.lit(int(value)))
    return cond


def split_on_year(column: str, year: int) -> Column:
    return split_on_date_parts(column, {"year": year})


def split_on_year_month(column: str, year: int, month: int) -> Column:
    return split_on_date_parts(column, {"year": year, "month": month})


def split_on_year_month_day(column: str, year: int, month: int, day: int) -> Column:
    return split_on_date_parts(column, {"year": year, "month": month, "day": day})


def split_on_converted_datetime(column: str, date_format: str, value: str) -> Column:
    """Match on a formatted-datetime string (reference converts via
    strftime; here date_format is a Spark pattern, e.g. 'yyyy-MM-dd')."""
    return F.date_format(F.col(column), date_format) == F.lit(value)


def split_on_divided_integer(column: str, divisor: int, value: int) -> Column:
    return (F.col(column) / F.lit(int(divisor))).cast("long") == F.lit(int(value))


def split_on_mod_integer(column: str, mod: int, value: int) -> Column:
    return F.pmod(F.col(column), F.lit(int(mod))) == F.lit(int(value))


def split_on_hashed_column(column: str, hash_digits: int, value: str) -> Column:
    """Native sha2 hex-prefix bucket — replaces the reference's per-row
    hashlib UDF; same observable bucketing semantics (hex digest prefix)."""
    return (
        F.substring(F.sha2(F.col(column).cast("string"), 256), 1, int(hash_digits))
        == F.lit(value)
    )


def distinct_partition_values(
    df: DataFrame, columns: Sequence[str], limit: int = 100_000
) -> list[dict[str, Any]]:
    """Enumerate logical partitions (checkpoint loop drives this); capped to
    keep the driver collect bounded."""
    rows = df.select(*columns).distinct().orderBy(*columns).limit(limit).collect()
    return [r.asDict() for r in rows]


# ---- samplers ------------------------------------------------------------


def sample_using_limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(int(n))


def sample_using_random(df: DataFrame, p: float, seed: Optional[int] = None) -> DataFrame:
    """Bernoulli sample via rand(seed) < p (sparkdf_data_sampler.py:59-77)."""
    return df.filter(F.rand(seed if seed is not None else 42) < float(p))


def sample_using_mod(df: DataFrame, column: str, mod: int, value: int) -> DataFrame:
    return df.filter(F.pmod(F.col(column), F.lit(int(mod))) == F.lit(int(value)))


def sample_using_a_list(df: DataFrame, column: str, value_list: Sequence[Any]) -> DataFrame:
    return df.filter(F.col(column).isin(list(value_list)))


def sample_using_hash(
    df: DataFrame, column: str, hash_digits: int = 1, hash_value: str = "f"
) -> DataFrame:
    """Deterministic hash sample — native sha2 hex suffix match (the
    reference's md5-UDF sampler, sparkdf_data_sampler.py:161-203)."""
    digest = F.sha2(F.col(column).cast("string"), 256)
    return df.filter(
        F.substring(digest, -int(hash_digits), int(hash_digits)) == F.lit(hash_value)
    )
