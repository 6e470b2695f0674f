"""Configurable rule-based profiler — the Spark-first re-expression of the
reference's ``rule_based_profiler/`` framework (rule_based_profiler.py,
domain_builder/, parameter_builder/, estimators/,
expectation_configuration_builder/) and its OnboardingDataAssistant
(data_assistant/onboarding_data_assistant.py).

WHAT is reproduced (observable semantics):
- A profiler = variables + named RULES; each rule = one DOMAIN BUILDER
  (which table slices / columns the rule applies to), a set of PARAMETER
  BUILDERS (statistics estimated over a LIST OF BATCHES), and EXPECTATION
  CONFIGURATION BUILDERS that instantiate expectation configs from
  ``$parameter.…`` / ``$variables.…`` references, optionally gated by a
  condition (rule_based_profiler/rule/rule.py, parameter_container.py
  fully-qualified ``$``-prefixed names).
- Numeric multi-batch ranges via the reference's four estimators — exact,
  quantiles, bootstrap, kde — with false_positive_rate, round_decimals and
  truncate_values semantics
  (parameter_builder/numeric_metric_range_multi_batch_parameter_builder.py,
  estimators/*.py).
- Categorical domains by cardinality mode (helpers/cardinality_checker.py
  ABS_*/REL_* limits), value-set union across batches
  (value_set_multi_batch_parameter_builder.py), best-regex / best-date-format
  candidate selection above a match-ratio threshold
  (regex_pattern_string_parameter_builder.py,
  simple_date_format_string_parameter_builder.py), and map-metric domains
  admitted by mean unexpected-ratio across batches
  (map_metric_column_domain_builder.py,
  mean_unexpected_map_metric_multi_batch_parameter_builder.py).
- ``OnboardingDataAssistant``'s rule roster (table / uniqueness / nullity /
  non-nullity / numeric / datetime / text / categorical) as
  ``onboarding_assistant()``.

HOW is Spark-native, not a port. The reference resolves one metric per
domain per batch through its metric graph — O(rules × domains × batches)
Spark jobs. Here every parameter builder REGISTERS aggregate expressions
first and the profiler resolves them with ONE bundled ``df.agg`` per batch
for ALL rules, domains, and metrics together (the same bundling strategy
as plans/planner.py), so driver traffic is one scalar row per batch and
each batch is scanned once for the whole parameter phase. The only non-agg
statistics are the map-metric domain decisions — duplicated-value and null
counts for ALL candidate columns and ALL batches in ONE tagged-union job
(stacked hash-groupBy for uniqueness) — and bounded
``distinct().limit(cap+1)`` probes for value sets. Nothing driver-side
grows with row count — history vectors are O(batches), value sets are
capped by the cardinality mode.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.core.config import (
    ExpectationConfiguration,
    ExpectationSuite,
)

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")
_TEMPORAL = ("date", "timestamp", "timestamp_ntz")


def _is_numeric(dt: str) -> bool:
    return dt in _NUMERIC or dt.startswith("decimal")


# --------------------------------------------------------------------------
# domains
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Domain:
    """A table slice a rule applies to (reference
    rule_based_profiler/domain.py): ``domain_type`` in {"table", "column",
    "column_pair", "multicolumn"}; ``domain_kwargs`` are the expectation
    kwargs that name it (column / column_A+column_B / column_list)."""

    domain_type: str
    domain_kwargs: tuple[tuple[str, Any], ...] = ()

    @property
    def kwargs(self) -> dict[str, Any]:
        return {k: (list(v) if isinstance(v, tuple) else v) for k, v in self.domain_kwargs}

    @property
    def key(self) -> str:
        # stable alias-safe identity for bundled-agg column names; the hash
        # suffix disambiguates names the sanitization would collide
        # (columns "a b" and "a_b" both sanitize to a_b — without it the
        # second domain would silently read the first one's aggregates)
        import hashlib

        raw = "_".join(str(v) for _, v in self.domain_kwargs)
        if not raw:
            return "table"
        h = hashlib.md5(raw.encode("utf-8")).hexdigest()[:6]
        return f"{re.sub(r'[^0-9A-Za-z_]+', '_', raw)}_{h}"


def _col_domain(c: str) -> Domain:
    return Domain("column", (("column", c),))


# cardinality modes (reference helpers/cardinality_checker.py:46-84);
# relative limits are a fraction of non-null rows
CARDINALITY_MODES: dict[str, tuple[str, float]] = {
    "ZERO": ("abs", 0), "ONE": ("abs", 1), "TWO": ("abs", 2),
    "VERY_FEW": ("abs", 10), "FEW": ("abs", 100), "SOME": ("abs", 1000),
    "MANY": ("abs", 10_000), "VERY_MANY": ("abs", 100_000),
    "ABS_10": ("abs", 10), "ABS_100": ("abs", 100), "ABS_1000": ("abs", 1000),
    "ABS_10_000": ("abs", 10_000), "ABS_100_000": ("abs", 100_000),
    "UNIQUE": ("rel", 1.0), "REL_0_1": ("rel", 1e-3), "REL_1": ("rel", 1e-2),
    "REL_10": ("rel", 0.10), "REL_25": ("rel", 0.25), "REL_50": ("rel", 0.50),
    "ONE_PCT": ("rel", 0.01), "TEN_PCT": ("rel", 0.10),
}

_SEMANTIC_TYPES: dict[str, Callable[[str], bool]] = {
    "numeric": _is_numeric,
    "datetime": lambda dt: dt in _TEMPORAL,
    "text": lambda dt: dt == "string",
    "boolean": lambda dt: dt == "boolean",
    "binary": lambda dt: dt == "binary",
}


class TableDomainBuilder:
    """reference domain_builder/table_domain_builder.py — one table domain."""

    def domains(self, batches: Sequence[DataFrame]) -> list[Domain]:
        return [Domain("table")]


class ColumnDomainBuilder:
    """Column domains filtered by name / suffix / semantic type (reference
    domain_builder/column_domain_builder.py). Filters run on the LATEST
    batch's schema — the reference resolves domains on the active batch."""

    def __init__(
        self,
        include_column_names: Optional[Sequence[str]] = None,
        exclude_column_names: Optional[Sequence[str]] = None,
        include_column_name_suffixes: Optional[Sequence[str]] = None,
        exclude_column_name_suffixes: Optional[Sequence[str]] = None,
        include_semantic_types: Optional[Sequence[str]] = None,
    ) -> None:
        unknown = set(include_semantic_types or ()) - set(_SEMANTIC_TYPES)
        if unknown:
            raise ValueError(f"unknown semantic types: {sorted(unknown)}")
        self.include = list(include_column_names) if include_column_names else None
        self.exclude = set(exclude_column_names or ())
        self.inc_suffix = tuple(include_column_name_suffixes or ())
        self.exc_suffix = tuple(exclude_column_name_suffixes or ())
        self.semantic = list(include_semantic_types or ())

    def _columns(self, batches: Sequence[DataFrame]) -> list[str]:
        df = batches[-1]
        dtypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        cols = self.include if self.include is not None else list(df.columns)
        out = []
        for c in cols:
            if c not in dtypes or c in self.exclude:
                continue
            if self.inc_suffix and not c.endswith(self.inc_suffix):
                continue
            if self.exc_suffix and c.endswith(self.exc_suffix):
                continue
            if self.semantic and not any(
                _SEMANTIC_TYPES[s](dtypes[c]) for s in self.semantic
            ):
                continue
            out.append(c)
        return out

    def domains(self, batches: Sequence[DataFrame]) -> list[Domain]:
        return [_col_domain(c) for c in self._columns(batches)]


class CategoricalColumnDomainBuilder(ColumnDomainBuilder):
    """Columns admitted by a cardinality limit (reference
    domain_builder/categorical_column_domain_builder.py +
    helpers/cardinality_checker.py). ONE bundled agg on the latest batch
    computes approx distinct + non-null count for every candidate at once;
    the (rsd=0.01) sketch decides — exactness comes from the value-set
    probe downstream, which re-checks the cap."""

    def __init__(
        self,
        cardinality_limit_mode: str = "FEW",
        allow_relative_error: float = 0.01,
        **kw: Any,
    ) -> None:
        super().__init__(**kw)
        if cardinality_limit_mode not in CARDINALITY_MODES:
            raise ValueError(
                f"unknown cardinality_limit_mode {cardinality_limit_mode!r}; "
                f"one of {sorted(CARDINALITY_MODES)}"
            )
        self.mode = cardinality_limit_mode
        self.rsd = allow_relative_error

    def domains(self, batches: Sequence[DataFrame]) -> list[Domain]:
        cols = self._columns(batches)
        if not cols:
            return []
        df = batches[-1]
        kind, limit = CARDINALITY_MODES[self.mode]
        aggs = []
        for c in cols:
            aggs.append(F.approx_count_distinct(c, rsd=self.rsd).alias(f"dc__{c}"))
            aggs.append(F.count(F.col(c)).alias(f"nn__{c}"))
        row = df.agg(*aggs).collect()[0].asDict()
        out = []
        for c in cols:
            dc, nn = int(row[f"dc__{c}"] or 0), int(row[f"nn__{c}"] or 0)
            cap = limit if kind == "abs" else limit * nn
            # the sketch decides only when its verdict is outside the HLL
            # error band; a borderline estimate (within ~6σ of the cap) gets
            # an EXACT confirmatory probe so the emission decision is
            # deterministic, not sketch-seed-dependent — the probe is
            # bounded (distinct().limit(cap+1)), never a full distinct scan
            margin = max(1.0, 6.0 * self.rsd * max(dc, 1))
            if dc <= cap - margin:
                out.append(_col_domain(c))
            elif dc > cap + margin:
                continue
            else:
                probe = int(cap) + 1
                exact = (
                    df.select(c)
                    .where(F.col(c).isNotNull())
                    .distinct()
                    .limit(probe)
                    .count()
                )
                if exact <= cap:
                    out.append(_col_domain(c))
        return out


class MultiColumnDomainBuilder:
    """reference domain_builder/multi_column_domain_builder.py — one
    multicolumn domain over an explicit column list."""

    def __init__(self, include_column_names: Sequence[str]) -> None:
        if not include_column_names:
            raise ValueError("include_column_names is required")
        self.columns = list(include_column_names)

    def domains(self, batches: Sequence[DataFrame]) -> list[Domain]:
        return [Domain("multicolumn", (("column_list", tuple(self.columns)),))]


class ColumnPairDomainBuilder:
    """reference domain_builder/column_pair_domain_builder.py — exactly two
    columns, ordered (column_A, column_B)."""

    def __init__(self, include_column_names: Sequence[str]) -> None:
        if len(include_column_names or ()) != 2:
            raise ValueError("ColumnPairDomainBuilder needs exactly 2 columns")
        self.a, self.b = include_column_names

    def domains(self, batches: Sequence[DataFrame]) -> list[Domain]:
        return [Domain("column_pair", (("column_A", self.a), ("column_B", self.b)))]


class MapMetricColumnDomainBuilder(ColumnDomainBuilder):
    """Columns whose map-metric unexpected ratio stays under a cap across
    ALL batches (reference domain_builder/map_metric_column_domain_builder.py
    admits a column when every batch's unexpected fraction <=
    max_unexpected_ratio, default 0 via max_unexpected_values).

    Supported map metrics and their one-pass statistics:
    - column_values.nonnull → unexpected = null rows (plain agg);
    - column_values.null    → unexpected = non-null rows (plain agg);
    - column_values.unique  → unexpected = non-null rows whose value occurs
      more than once; computed for ALL candidates in ONE stacked job:
      explode (column, xxhash64(value)) pairs → groupBy count → per-column
      Σ count·[count>1]. Hash identity, not value identity — a 2⁻⁶⁴ gram
      collision flips an emission decision, not a validation result.
    """

    def __init__(
        self,
        map_metric_name: str,
        max_unexpected_values: int = 0,
        max_unexpected_ratio: Optional[float] = None,
        min_max_unexpected_values_proportion: float = 1.0,
        **kw: Any,
    ) -> None:
        super().__init__(**kw)
        if map_metric_name not in (
            "column_values.nonnull",
            "column_values.null",
            "column_values.unique",
        ):
            raise ValueError(f"unsupported map_metric_name {map_metric_name!r}")
        self.metric = map_metric_name
        self.max_values = max_unexpected_values
        self.max_ratio = max_unexpected_ratio
        self.min_proportion = min_max_unexpected_values_proportion

    def _per_batch_stats(
        self, batches: Sequence[DataFrame], cols: list[str]
    ) -> list[dict[str, tuple[int, int]]]:
        """[{col: (unexpected_count, row_count)}] per batch — ONE Spark job
        for ALL batches and ALL candidate columns: batches union with a
        ``__b`` tag (one scan each, a single job), then either a grouped
        bundled agg (null metrics) or a stacked hash-groupBy (uniqueness)."""
        from functools import reduce

        tagged = reduce(
            DataFrame.union,
            [
                df.select(F.lit(i).alias("__b"), *[F.col(c) for c in cols])
                for i, df in enumerate(batches)
            ],
        )
        if self.metric in ("column_values.nonnull", "column_values.null"):
            aggs = [F.count(F.lit(1)).alias("__n")]
            for c in cols:
                cnt = (
                    F.count(F.when(F.col(c).isNull(), 1))
                    if self.metric == "column_values.nonnull"
                    else F.count(F.col(c))
                )
                aggs.append(cnt.alias(f"u__{c}"))
            rows = {
                r["__b"]: r.asDict()
                for r in tagged.groupBy("__b").agg(*aggs).collect()
            }
            return [
                {
                    c: (int(rows[b][f"u__{c}"] or 0), int(rows[b]["__n"]))
                    for c in cols
                }
                if b in rows
                else {c: (0, 0) for c in cols}
                for b in range(len(batches))
            ]
        # uniqueness: stack (batch, column, value-hash) triples — nulls kept
        # so the same pass yields per-batch row counts — then two groupBys
        stacked = tagged.select(
            "__b",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("c"), F.xxhash64(F.col(c)).alias("h"),
                            F.col(c).isNull().alias("isnull"),
                        )
                        for c in cols
                    ]
                )
            ).alias("s"),
        ).select("__b", "s.*")
        per = (
            stacked.groupBy("__b", "c", "h", "isnull")
            .agg(F.count(F.lit(1)).alias("k"))
            .groupBy("__b", "c")
            .agg(
                F.sum(
                    F.when(~F.col("isnull") & (F.col("k") > 1), F.col("k")).otherwise(0)
                ).alias("u"),
                F.sum(F.col("k")).alias("n"),
            )
            .collect()
        )
        found: dict[tuple[int, str], tuple[int, int]] = {
            (r["__b"], r["c"]): (int(r["u"] or 0), int(r["n"])) for r in per
        }
        return [
            {c: found.get((b, c), (0, 0)) for c in cols}
            for b in range(len(batches))
        ]

    def domains(self, batches: Sequence[DataFrame]) -> list[Domain]:
        cols = self._columns(batches)
        if not cols:
            return []
        ok_counts = {c: 0 for c in cols}
        for stats in self._per_batch_stats(batches, cols):
            for c, (u, n) in stats.items():
                cap = self.max_ratio * n if self.max_ratio is not None else self.max_values
                if u <= cap:
                    ok_counts[c] += 1
        need = math.ceil(self.min_proportion * len(batches))
        return [_col_domain(c) for c in cols if ok_counts[c] >= need]


# --------------------------------------------------------------------------
# multi-batch metric engine (bundled aggregates)
# --------------------------------------------------------------------------

# Spark's exact `percentile` is an ObjectHashAggregate buffering EVERY value
# of the column in the final merge buffer (~0.5 GB at 60M rows; OOM at 10^9+).
# Above this many rows the metric engine swaps a requested exact
# median/quantile for the mergeable Greenwald-Khanna sketch — the engine owns
# the scale decision; small batches keep exact semantics (and the profiler
# oracle stays exact at test scale).
MEDIAN_EXACT_MAX_ROWS = 50_000_000
MEDIAN_APPROX_ACCURACY = 10_000  # rel err ~1e-4


class _ScaleRoutedExpr:
    """An exact aggregate plus its sketch fallback: ``_RuleMetricEngine``
    resolves ``exact`` for batches up to ``MEDIAN_EXACT_MAX_ROWS`` rows and
    ``approx`` beyond."""

    __slots__ = ("exact", "approx")

    def __init__(self, exact: Any, approx: Any) -> None:
        self.exact, self.approx = exact, approx


def _percentile_routed(col: str, q: float) -> _ScaleRoutedExpr:
    return _ScaleRoutedExpr(
        F.expr(f"percentile(`{col}`, {q})"),
        F.expr(f"approx_percentile(`{col}`, {q}, {MEDIAN_APPROX_ACCURACY})"),
    )


# metric name → aggregate-expression factory over a column domain
_AGG_METRICS: dict[str, Callable[[Optional[str]], Any]] = {
    "table.row_count": lambda c: F.count(F.lit(1)),
    "column.min": lambda c: F.min(F.col(c)),
    "column.max": lambda c: F.max(F.col(c)),
    "column.mean": lambda c: F.avg(F.col(c)),
    "column.sum": lambda c: F.sum(F.col(c)),
    "column.standard_deviation": lambda c: F.stddev_samp(F.col(c)),
    "column.median": lambda c: _percentile_routed(c, 0.5),
    "column.distinct_values.count": lambda c: F.count_distinct(F.col(c)),
    "column.unique_proportion": lambda c: F.count_distinct(F.col(c))
    / F.count(F.col(c)),
    "column_values.null.unexpected_count": lambda c: F.count(
        F.when(F.col(c).isNotNull(), 1)
    ),
    "column_values.nonnull.unexpected_count": lambda c: F.count(
        F.when(F.col(c).isNull(), 1)
    ),
    "column.values.length.min": lambda c: F.min(F.length(F.col(c))),
    "column.values.length.max": lambda c: F.max(F.length(F.col(c))),
}


_DISTINCT_METRICS = {"column.distinct_values.count", "column.unique_proportion"}


class _RuleMetricEngine:
    """Accumulates (name, domain, expr) requests from every parameter
    builder in a rule, then resolves them with ONE ``df.agg`` per batch —
    the planner's bundling strategy applied to profiling.

    count_distinct aggregates go to a SEPARATE isolated bundle (second agg
    per batch): a distinct agg inside the shared bundle re-keys every other
    metric's buffer by the distinct value (Spark's Expand plan replicates
    every row per distinct agg) — the same isolation rule as
    plans/planner._reg(distinct=True)."""

    def __init__(self, batches: Sequence[DataFrame]) -> None:
        self.batches = list(batches)
        self._requests: dict[str, Any] = {}
        self._distinct_requests: dict[str, Any] = {}
        self._values: Optional[list[dict[str, Any]]] = None
        self._routed_aliases: set[str] = set()
        self._approx_batches: list[bool] = []

    def request(self, alias: str, expr: Any, distinct: bool = False) -> None:
        if self._values is not None:
            raise RuntimeError("metric engine already resolved")
        (self._distinct_requests if distinct else self._requests).setdefault(
            alias, expr
        )
        if isinstance(expr, _ScaleRoutedExpr):
            self._routed_aliases.add(alias)

    def resolve(self) -> None:
        if self._values is not None:
            return
        self._values = []
        for df in self.batches:
            # exact-percentile requests are scale-gated per batch. The probe
            # is a LIMIT(threshold+1) count, not a full count: batches that
            # are derived DataFrames (filter splits, CSV inputs) would pay a
            # full lineage recomputation for a plain count, while the limit
            # short-circuits once threshold+1 rows are seen — for the huge
            # batches that actually route to the sketch, the probe stops
            # early; for small batches it costs what a count costs
            approx = bool(
                self._routed_aliases
                and df.limit(MEDIAN_EXACT_MAX_ROWS + 1).count()
                > MEDIAN_EXACT_MAX_ROWS
            )
            self._approx_batches.append(approx)
            row: dict[str, Any] = {}
            for bundle in (self._requests, self._distinct_requests):
                if bundle:
                    aggs = [
                        (
                            (expr.approx if approx else expr.exact)
                            if isinstance(expr, _ScaleRoutedExpr)
                            else expr
                        ).alias(a)
                        for a, expr in bundle.items()
                    ]
                    row.update(df.agg(*aggs).collect()[0].asDict())
            self._values.append(row)

    def history(self, alias: str) -> list[Any]:
        if self._values is None:
            raise RuntimeError("metric engine not resolved yet")
        return [v.get(alias) for v in self._values]

    def methods(self, alias: str) -> Optional[list[str]]:
        """Per-batch resolution method for a scale-routed alias (surfaced
        into parameter details when the sketch engaged); None for plain
        aggregates."""
        if self._values is None:
            raise RuntimeError("metric engine not resolved yet")
        if alias not in self._routed_aliases:
            return None
        return [
            f"approx_percentile(accuracy={MEDIAN_APPROX_ACCURACY})"
            if a
            else "percentile"
            for a in self._approx_batches
        ]


# --------------------------------------------------------------------------
# numeric range estimators (reference estimators/*.py)
# --------------------------------------------------------------------------


def estimate_numeric_range(
    values: Sequence[float],
    estimator: str = "bootstrap",
    false_positive_rate: float = 0.05,
    n_resamples: int = 9999,
    seed: Optional[int] = None,
) -> tuple[float, float]:
    """[lower, upper] for a metric's batch-to-batch history.

    - exact: min/max of observations (exact_numeric_range_estimator.py);
    - quantiles: empirical quantiles at fpr/2 and 1-fpr/2, linear
      interpolation (quantiles_numeric_range_estimator.py);
    - bootstrap: Efron-Tibshirani quantile bootstrap
      (functions/stats.bootstrap_range_estimate, clean-room);
    - kde: gaussian-kernel resampling — draw n_resamples from
      observations + N(0, bw), bw = Scott's rule, then the fpr quantiles
      (kde_numeric_range_estimator.py semantics on numpy).
    """
    import numpy as np

    vals = np.asarray([v for v in values if v is not None], dtype="float64")
    if vals.size == 0:
        raise ValueError("no numeric history to estimate a range from")
    if estimator == "exact":
        return float(vals.min()), float(vals.max())
    lo_q, hi_q = false_positive_rate / 2.0, 1.0 - false_positive_rate / 2.0
    if estimator == "quantiles":
        return (
            float(np.quantile(vals, lo_q, method="linear")),
            float(np.quantile(vals, hi_q, method="linear")),
        )
    if estimator == "bootstrap":
        if vals.size < 2:
            return float(vals.min()), float(vals.max())
        from great_expectations_spark.functions.stats import bootstrap_range_estimate

        return bootstrap_range_estimate(
            vals, false_positive_rate=false_positive_rate,
            n_resamples=n_resamples, seed=seed,
        )
    if estimator == "kde":
        if vals.size < 2 or float(vals.std(ddof=1)) == 0.0:
            return float(vals.min()), float(vals.max())
        rng = np.random.default_rng(seed)
        bw = vals.std(ddof=1) * vals.size ** (-1.0 / 5.0)  # Scott's rule
        sample = rng.choice(vals, size=n_resamples, replace=True) + rng.normal(
            0.0, bw, size=n_resamples
        )
        return (
            float(np.quantile(sample, lo_q, method="linear")),
            float(np.quantile(sample, hi_q, method="linear")),
        )
    raise ValueError(
        f"unknown estimator {estimator!r}; one of exact/quantiles/bootstrap/kde"
    )


# --------------------------------------------------------------------------
# parameter builders
# --------------------------------------------------------------------------


class ParameterBuilder:
    """Two-phase: ``register`` aggregate needs into the rule's metric
    engine, then ``build`` the parameter value per domain from the resolved
    per-batch history. Non-agg builders (value set) skip registration."""

    name: str

    def register(self, engine: _RuleMetricEngine, domains: Sequence[Domain]) -> None:
        pass

    def build(
        self,
        engine: _RuleMetricEngine,
        domain: Domain,
        variables: dict[str, Any],
    ) -> dict[str, Any]:
        raise NotImplementedError


def _metric_alias(name: str, metric: str, domain: Domain) -> str:
    return f"{name}__{re.sub(r'[^0-9A-Za-z_]+', '_', metric)}__{domain.key}"


def _metric_expr(metric: str, domain: Domain):
    col = domain.kwargs.get("column")
    qm = re.match(r"^column\.quantile\.(\d*\.?\d+)$", metric)
    if qm:  # dynamic per-quantile metric, e.g. column.quantile.0.25
        if col is None:
            raise ValueError(f"metric {metric!r} needs a column domain")
        return _percentile_routed(col, float(qm.group(1)))
    if metric not in _AGG_METRICS:
        raise ValueError(
            f"unsupported metric {metric!r}; one of {sorted(_AGG_METRICS)}"
        )
    if metric != "table.row_count" and col is None:
        raise ValueError(f"metric {metric!r} needs a column domain")
    return _AGG_METRICS[metric](col)


class MetricMultiBatchParameterBuilder(ParameterBuilder):
    """Per-batch metric history vector (reference
    parameter_builder/metric_multi_batch_parameter_builder.py). The value is
    the full history; ``.value[-1]`` etc. are reachable through reference
    indexing in templates."""

    def __init__(self, name: str, metric_name: str) -> None:
        self.name, self.metric = name, metric_name

    def register(self, engine: _RuleMetricEngine, domains: Sequence[Domain]) -> None:
        for d in domains:
            engine.request(
                _metric_alias(self.name, self.metric, d),
                _metric_expr(self.metric, d),
                distinct=self.metric in _DISTINCT_METRICS,
            )

    def build(self, engine, domain, variables):
        alias = _metric_alias(self.name, self.metric, domain)
        hist = engine.history(alias)
        details: dict = {"metric_name": self.metric}
        methods = engine.methods(alias)
        if methods and any(m != "percentile" for m in methods):
            # the scale gate swapped exact percentile for the GK sketch on
            # at least one batch — surface it (bootstrapped-KS precedent)
            details["method"] = methods
        return {"value": hist, "details": details}


class NumericMetricRangeMultiBatchParameterBuilder(ParameterBuilder):
    """[lower, upper] range over the metric's batch history (reference
    parameter_builder/numeric_metric_range_multi_batch_parameter_builder.py):
    estimator ∈ {exact, quantiles, bootstrap, kde}; ``round_decimals``
    rounds both bounds (0 forced for integer metrics, reference :350-363);
    ``truncate_values`` clamps to hard lower/upper bounds."""

    def __init__(
        self,
        name: str,
        metric_name: str,
        estimator: str = "bootstrap",
        false_positive_rate: float = 0.05,
        n_resamples: int = 9999,
        random_seed: Optional[int] = None,
        round_decimals: Optional[int] = None,
        truncate_values: Optional[dict[str, Optional[float]]] = None,
    ) -> None:
        self.name, self.metric, self.estimator = name, metric_name, estimator
        self.fpr, self.n_resamples, self.seed = false_positive_rate, n_resamples, random_seed
        self.round_decimals = round_decimals
        truncate_values = truncate_values or {}
        unknown = set(truncate_values) - {"lower_bound", "upper_bound"}
        if unknown:
            raise ValueError(f"unrecognized truncate_values keys: {sorted(unknown)}")
        self.truncate = truncate_values

    def register(self, engine, domains):
        for d in domains:
            engine.request(
                _metric_alias(self.name, self.metric, d),
                _metric_expr(self.metric, d),
                distinct=self.metric in _DISTINCT_METRICS,
            )

    def build(self, engine, domain, variables):
        hist_raw = engine.history(_metric_alias(self.name, self.metric, domain))
        hist = [float(v) for v in hist_raw if v is not None]
        if not hist:
            return {"value": None, "details": {"metric_name": self.metric}}
        lo, hi = estimate_numeric_range(
            hist, self.estimator, self.fpr, self.n_resamples, self.seed
        )
        integer_metric = all(float(v).is_integer() for v in hist)
        nd = self.round_decimals
        if nd is None and integer_metric:
            nd = 0
        if nd == 0:
            lo, hi = math.floor(lo), math.ceil(hi)
        elif nd is not None:
            lo, hi = round(lo, nd), round(hi, nd)
        if self.truncate.get("lower_bound") is not None:
            lo = max(lo, self.truncate["lower_bound"])
        if self.truncate.get("upper_bound") is not None:
            hi = min(hi, self.truncate["upper_bound"])
        return {
            "value": [lo, hi],
            "lower_bound": lo,
            "upper_bound": hi,
            "details": {
                "metric_name": self.metric,
                "estimator": self.estimator,
                "num_batches": len(hist),
            },
        }


class MeanUnexpectedMapMetricMultiBatchParameterBuilder(ParameterBuilder):
    """Mean unexpected-RATIO of a map metric across batches (reference
    parameter_builder/
    mean_unexpected_map_metric_multi_batch_parameter_builder.py) — the
    statistic behind 'emit not_be_null with mostly'. Ratio denominator is
    the row count (nonnull/null metrics consider every row)."""

    _METRICS = {
        "column_values.nonnull": "column_values.nonnull.unexpected_count",
        "column_values.null": "column_values.null.unexpected_count",
    }

    def __init__(self, name: str, map_metric_name: str) -> None:
        if map_metric_name not in self._METRICS:
            raise ValueError(
                f"unsupported map_metric_name {map_metric_name!r}; "
                f"one of {sorted(self._METRICS)}"
            )
        self.name, self.map_metric = name, map_metric_name

    def register(self, engine, domains):
        engine.request("__row_count", F.count(F.lit(1)))
        m = self._METRICS[self.map_metric]
        for d in domains:
            engine.request(_metric_alias(self.name, m, d), _metric_expr(m, d))

    def build(self, engine, domain, variables):
        m = self._METRICS[self.map_metric]
        unexpected = engine.history(_metric_alias(self.name, m, domain))
        counts = engine.history("__row_count")
        ratios = [
            (u or 0) / n for u, n in zip(unexpected, counts) if n
        ]
        mean = sum(ratios) / len(ratios) if ratios else 0.0
        return {"value": mean, "details": {"map_metric_name": self.map_metric}}


class ValueSetMultiBatchParameterBuilder(ParameterBuilder):
    """Union of observed non-null values across ALL batches (reference
    parameter_builder/value_set_multi_batch_parameter_builder.py). One
    distinct over the unioned per-batch projections per domain, capped by
    ``max_cardinality`` — the collect is bounded, never corpus-sized."""

    def __init__(self, name: str, max_cardinality: int = 10_000) -> None:
        self.name, self.cap = name, max_cardinality

    def build(self, engine, domain, variables):
        c = domain.kwargs.get("column")
        if c is None:
            raise ValueError("value-set builder needs a column domain")
        from functools import reduce

        union = reduce(
            DataFrame.union,
            [b.select(c).filter(F.col(c).isNotNull()) for b in engine.batches],
        )
        rows = union.distinct().limit(self.cap + 1).collect()
        if len(rows) > self.cap:
            raise ValueError(
                f"value set for {c!r} exceeds max_cardinality={self.cap}"
            )
        values = sorted(
            (r[0] for r in rows), key=lambda v: (str(type(v).__name__), str(v))
        )
        return {"value": values, "details": {"num_batches": len(engine.batches)}}


class _BestCandidateBuilder(ParameterBuilder):
    """Shared machinery for regex / date-format candidate selection: one
    bundled agg per batch computes match and non-null counts for EVERY
    (candidate, domain) pair JVM-side; the best candidate is the one with
    the highest overall match ratio >= threshold (reference
    ParameterBuilder._get_best_candidate_above_threshold)."""

    def __init__(self, name: str, candidates: Sequence[str], threshold: float) -> None:
        self.name = name
        self.candidates = list(candidates)
        self.threshold = threshold

    def _match_expr(self, col, cand: str):
        raise NotImplementedError

    def _alias(self, i: int, domain: Domain) -> str:
        return f"{self.name}__cand{i}__{domain.key}"

    def register(self, engine, domains):
        for d in domains:
            c = d.kwargs.get("column")
            if c is None:
                raise ValueError(f"{type(self).__name__} needs column domains")
            engine.request(f"{self.name}__nn__{d.key}", F.count(F.col(c)))
            for i, cand in enumerate(self.candidates):
                engine.request(
                    self._alias(i, d),
                    F.count(F.when(self._match_expr(F.col(c), cand), 1)),
                )

    def build(self, engine, domain, variables):
        nn = sum(v or 0 for v in engine.history(f"{self.name}__nn__{domain.key}"))
        ratios = {}
        for i, cand in enumerate(self.candidates):
            hits = sum(v or 0 for v in engine.history(self._alias(i, domain)))
            ratios[cand] = (hits / nn) if nn else 0.0
        best = max(ratios, key=lambda k: (ratios[k], -self.candidates.index(k)))
        value = best if nn and ratios[best] >= self.threshold else None
        return {
            "value": value,
            "details": {"success_ratios": ratios, "threshold": self.threshold},
        }


class RegexPatternStringParameterBuilder(_BestCandidateBuilder):
    """Best-matching regex above threshold (reference
    parameter_builder/regex_pattern_string_parameter_builder.py
    CANDIDATE_REGEX). Candidates are evaluated with JVM ``regexp_like``
    (Java dialect — the same engine that will validate them)."""

    DEFAULT_CANDIDATES = [
        r"\d+",
        r"-?\d+",
        r"-?\d+(?:\.\d*)?",
        r"[A-Za-z0-9\.,;:!?()\"'%\-]+",
        r"^\s+",
        r"\s+$",
        r"https?://(?:www\.)?[a-zA-Z0-9][a-zA-Z0-9\-.]*\.[a-zA-Z]{2,}(?:/\S*)?",
        r"<\/?(?:p|a|b|img)(?: [^>]*)?/?>",
        r"(?:\d{1,3}\.){3}\d{1,3}",
        r"\b[\w.%+-]+@[\w.-]+\.\w{2,}\b",
    ]

    def __init__(
        self,
        name: str,
        candidate_regexes: Optional[Sequence[str]] = None,
        threshold: float = 0.9,
    ) -> None:
        super().__init__(
            name,
            list(candidate_regexes) if candidate_regexes else self.DEFAULT_CANDIDATES,
            threshold,
        )

    def _match_expr(self, col, cand: str):
        return F.regexp_like(col.cast("string"), F.lit(cand))


class SimpleDateFormatStringParameterBuilder(_BestCandidateBuilder):
    """Best-matching strftime format above threshold (reference
    parameter_builder/simple_date_format_string_parameter_builder.py
    DEFAULT_CANDIDATE_STRINGS, trimmed to formats this engine's exact
    strptime compiler supports — conditions.strftime_match_expr)."""

    DEFAULT_CANDIDATES = [
        "%Y-%m-%d",
        "%Y-%m-%d %H:%M:%S",
        "%y-%m-%d",
        "%Y/%m/%d",
        "%d/%m/%Y",
        "%m/%d/%Y",
        "%Y%m%d",
        "%H:%M:%S",
        "%Y-%m-%dT%H:%M:%S",
    ]

    def __init__(
        self,
        name: str,
        candidate_strings: Optional[Sequence[str]] = None,
        threshold: float = 0.9,
    ) -> None:
        super().__init__(
            name,
            list(candidate_strings) if candidate_strings else self.DEFAULT_CANDIDATES,
            threshold,
        )

    def _match_expr(self, col, cand: str):
        from great_expectations_spark.operators.conditions import (
            strftime_match_expr,
        )

        # same exact-strptime matcher the strftime expectation compiles to,
        # so the profiler's detected format and the emitted expectation
        # agree row-for-row
        return strftime_match_expr(col.cast("string"), cand)


class PartitionParameterBuilder(ParameterBuilder):
    """Histogram partition object from the LATEST batch (reference
    parameter_builder/partition_parameter_builder.py builds the
    partition_object for KL-divergence expectations); categorical when the
    domain column passes the in-set cardinality probe, else continuous
    Freedman-Diaconis via operators/partition.py."""

    def __init__(self, name: str, bins: str = "auto", max_categories: int = 100) -> None:
        self.name, self.bins, self.max_categories = name, bins, max_categories

    def build(self, engine, domain, variables):
        from great_expectations_spark.operators.partition import (
            build_categorical_partition_object,
            build_partition_object,
        )

        c = domain.kwargs.get("column")
        df = engine.batches[-1]
        probe = (
            df.select(c).filter(F.col(c).isNotNull()).distinct()
            .limit(self.max_categories + 1).collect()
        )
        dt = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[c]
        if len(probe) <= self.max_categories and not _is_numeric(dt):
            po = build_categorical_partition_object(df, c)
        else:
            po = build_partition_object(df, c, bins=self.bins)
        return {"value": po, "details": {"source": "latest_batch"}}


# --------------------------------------------------------------------------
# expectation configuration builder ($parameter / $variables templates)
# --------------------------------------------------------------------------

_REF_RE = re.compile(r"^\$(parameter|variables)\.(.+)$")
_INDEX_RE = re.compile(r"\[(-?\d+)\]")


def _resolve_ref(ref: str, params: dict[str, dict[str, Any]], variables: dict) -> Any:
    """Resolve ``$parameter.name.path[idx]`` / ``$variables.name`` —
    reference parameter_container.py fully-qualified parameter names."""
    m = _REF_RE.match(ref)
    if not m:
        return ref
    scope, path = m.groups()
    # split path into dotted parts with optional [idx] suffixes
    value: Any
    parts = path.split(".")
    if scope == "variables":
        value = variables
    else:
        head = _INDEX_RE.sub("", parts[0])
        if head not in params:
            raise KeyError(f"unknown parameter {head!r} in {ref!r}")
        value = params
    for raw in parts:
        key = _INDEX_RE.sub("", raw)
        if key:
            if value is None:
                # an upstream parameter estimated to None (e.g. all-null
                # history) — resolve the whole reference to None so the
                # config builder skips the expectation instead of crashing
                return None
            if not isinstance(value, dict) or key not in value:
                raise KeyError(f"cannot resolve {ref!r} at {key!r}")
            value = value[key]
        for idx in _INDEX_RE.findall(raw):
            if value is None:
                return None
            value = value[int(idx)]
    return value


def _substitute(obj: Any, params: dict, variables: dict) -> Any:
    if isinstance(obj, str):
        return _resolve_ref(obj, params, variables)
    if isinstance(obj, dict):
        return {k: _substitute(v, params, variables) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_substitute(v, params, variables) for v in obj]
    return obj


_COND_RE = re.compile(
    r"^\s*(\S+)\s*(>=|<=|==|!=|>|<)\s*(\S+)\s*$"
)
_OPS: dict[str, Callable[[Any, Any], bool]] = {
    ">": lambda a, b: a > b, "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b, "<=": lambda a, b: a <= b,
    "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
}


def _literal(tok: str) -> Any:
    low = tok.lower()
    if low in ("none", "null"):
        return None
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(tok)
    except ValueError:
        try:
            return float(tok)
        except ValueError:
            return tok.strip("'\"")


class DefaultExpectationConfigurationBuilder:
    """Instantiate one expectation config per domain from kwarg templates
    (reference expectation_configuration_builder/
    default_expectation_configuration_builder.py). ``condition`` is a
    single comparison over ``$``-references ("$parameter.x.value > 0"),
    evaluated WITHOUT eval(); the config is skipped when false or when any
    referenced parameter resolves to None."""

    def __init__(
        self,
        expectation_type: str,
        condition: Optional[str] = None,
        meta: Optional[dict] = None,
        **kwarg_templates: Any,
    ) -> None:
        self.expectation_type = expectation_type
        self.condition = condition
        self.meta = meta or {}
        self.templates = kwarg_templates

    def _condition_ok(self, params: dict, variables: dict) -> bool:
        if not self.condition:
            return True
        m = _COND_RE.match(self.condition)
        if not m:
            raise ValueError(f"unsupported condition syntax: {self.condition!r}")
        lhs_s, op, rhs_s = m.groups()
        lhs = _resolve_ref(lhs_s, params, variables)
        rhs = _resolve_ref(rhs_s, params, variables)
        if lhs == lhs_s:
            lhs = _literal(lhs_s)
        if rhs == rhs_s:
            rhs = _literal(rhs_s)
        if op in (">", "<", ">=", "<=") and (lhs is None or rhs is None):
            return False
        return _OPS[op](lhs, rhs)

    def build(
        self, domain: Domain, params: dict, variables: dict
    ) -> Optional[ExpectationConfiguration]:
        if not self._condition_ok(params, variables):
            return None
        kwargs: dict[str, Any] = {}
        for k, tmpl in self.templates.items():
            val = _substitute(tmpl, params, variables)
            if val is None and isinstance(tmpl, str) and tmpl.startswith("$"):
                # a required estimated parameter is absent (no regex above
                # threshold, all-null history) — the reference skips the
                # whole configuration, not just the kwarg
                return None
            if val is not None:
                kwargs[k] = val
        return ExpectationConfiguration(
            expectation_type=self.expectation_type,
            kwargs={**domain.kwargs, **kwargs},
            meta=dict(self.meta),
        )


# --------------------------------------------------------------------------
# rule + profiler
# --------------------------------------------------------------------------


@dataclass
class Rule:
    name: str
    domain_builder: Any
    parameter_builders: list[ParameterBuilder] = field(default_factory=list)
    expectation_configuration_builders: list[DefaultExpectationConfigurationBuilder] = field(
        default_factory=list
    )

    def register(
        self, engine: _RuleMetricEngine, batches: Sequence[DataFrame]
    ) -> list[Domain]:
        """Phase 1: resolve domains, enqueue every parameter builder's
        aggregate needs into the (shared) engine."""
        domains = self.domain_builder.domains(batches)
        for pb in self.parameter_builders:
            pb.register(engine, domains)
        return domains

    def emit(
        self,
        engine: _RuleMetricEngine,
        domains: Sequence[Domain],
        variables: dict[str, Any],
    ) -> list[ExpectationConfiguration]:
        """Phase 2 (after engine.resolve()): build parameters per domain and
        instantiate the expectation configurations."""
        out: list[ExpectationConfiguration] = []
        for d in domains:
            params = {
                pb.name: pb.build(engine, d, variables)
                for pb in self.parameter_builders
            }
            for ecb in self.expectation_configuration_builders:
                cfg = ecb.build(d, params, variables)
                if cfg is not None:
                    out.append(cfg)
        return out

    def run(
        self, batches: Sequence[DataFrame], variables: dict[str, Any]
    ) -> list[ExpectationConfiguration]:
        """Standalone single-rule execution (one agg per batch). Inside a
        RuleBasedProfiler the engine is SHARED across rules instead."""
        engine = _RuleMetricEngine(batches)
        domains = self.register(engine, batches)
        if not domains:
            return []
        engine.resolve()
        return self.emit(engine, domains, variables)


class RuleBasedProfiler:
    """reference rule_based_profiler/rule_based_profiler.py: run every rule
    over the batch list and collect the emitted configurations into a
    suite. ``variables`` are profiler-wide ``$variables.…`` bindings."""

    def __init__(
        self,
        name: str,
        rules: Sequence[Rule],
        variables: Optional[dict[str, Any]] = None,
    ) -> None:
        self.name = name
        self.rules = list(rules)
        self.variables = dict(variables or {})

    def run(self, batches: Sequence[DataFrame]) -> ExpectationSuite:
        if not batches:
            raise ValueError("RuleBasedProfiler.run needs >= 1 batch")
        suite = ExpectationSuite(
            name=self.name,
            meta={
                "profiler": self.name,
                "num_batches": len(batches),
                "rules": [r.name for r in self.rules],
            },
        )
        # every rule's parameter aggregates resolve through ONE shared
        # engine — one bundled df.agg per batch for the WHOLE profiler, not
        # per rule (at warehouse scale each extra agg is a full scan);
        # domain builders still run their own bounded jobs in phase 1
        engine = _RuleMetricEngine(batches)
        rule_domains = [(r, r.register(engine, batches)) for r in self.rules]
        engine.resolve()
        for rule, domains in rule_domains:
            if domains:
                suite.extend(rule.emit(engine, domains, self.variables))
        return suite

    # -- declarative config (reference rule_based_profiler/config/) --------

    _DOMAIN_CLASSES = {
        "TableDomainBuilder": TableDomainBuilder,
        "ColumnDomainBuilder": ColumnDomainBuilder,
        "CategoricalColumnDomainBuilder": CategoricalColumnDomainBuilder,
        "MultiColumnDomainBuilder": MultiColumnDomainBuilder,
        "ColumnPairDomainBuilder": ColumnPairDomainBuilder,
        "MapMetricColumnDomainBuilder": MapMetricColumnDomainBuilder,
    }
    _PARAM_CLASSES = {
        "MetricMultiBatchParameterBuilder": MetricMultiBatchParameterBuilder,
        "NumericMetricRangeMultiBatchParameterBuilder": NumericMetricRangeMultiBatchParameterBuilder,
        "MeanUnexpectedMapMetricMultiBatchParameterBuilder": MeanUnexpectedMapMetricMultiBatchParameterBuilder,
        "ValueSetMultiBatchParameterBuilder": ValueSetMultiBatchParameterBuilder,
        "RegexPatternStringParameterBuilder": RegexPatternStringParameterBuilder,
        "SimpleDateFormatStringParameterBuilder": SimpleDateFormatStringParameterBuilder,
        "PartitionParameterBuilder": PartitionParameterBuilder,
    }

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "RuleBasedProfiler":
        """Build from the reference's profiler-config shape
        (rule_based_profiler/config/base.py RuleBasedProfilerConfig):
        {"name", "variables", "rules": {rule_name: {"domain_builder":
        {"class_name", ...}, "parameter_builders": [{"class_name", "name",
        ...}], "expectation_configuration_builders": [{"expectation_type",
        ...}]}}}. ``module_name`` keys are accepted and ignored."""

        variables = config.get("variables") or {}

        def _resolve_vars(v: Any) -> Any:
            # reference configs pass "$variables.x" strings as builder args
            # (Union[str, float] signatures resolved from rule state); this
            # engine resolves them once, at construction
            if isinstance(v, str) and v.startswith("$variables."):
                return _resolve_ref(v, {}, variables)
            if isinstance(v, dict):
                return {k: _resolve_vars(x) for k, x in v.items()}
            if isinstance(v, list):
                return [_resolve_vars(x) for x in v]
            return v

        def _strip(d: dict) -> dict:
            return {
                k: _resolve_vars(v)
                for k, v in d.items()
                if k not in ("class_name", "module_name")
            }

        rules = []
        for rule_name, spec in (config.get("rules") or {}).items():
            db_spec = spec.get("domain_builder") or {"class_name": "TableDomainBuilder"}
            db_cls = cls._DOMAIN_CLASSES.get(db_spec.get("class_name"))
            if db_cls is None:
                raise ValueError(
                    f"unknown domain_builder class {db_spec.get('class_name')!r}"
                )
            pbs = []
            for pb_spec in spec.get("parameter_builders") or []:
                pb_cls = cls._PARAM_CLASSES.get(pb_spec.get("class_name"))
                if pb_cls is None:
                    raise ValueError(
                        f"unknown parameter_builder class {pb_spec.get('class_name')!r}"
                    )
                pbs.append(pb_cls(**_strip(pb_spec)))
            ecbs = []
            for ecb_spec in spec.get("expectation_configuration_builders") or []:
                e = {
                    k: v
                    for k, v in ecb_spec.items()
                    if k not in ("class_name", "module_name")
                }
                ecbs.append(DefaultExpectationConfigurationBuilder(**e))
            rules.append(
                Rule(
                    name=rule_name,
                    domain_builder=db_cls(**_strip(db_spec)),
                    parameter_builders=pbs,
                    expectation_configuration_builders=ecbs,
                )
            )
        return cls(
            name=config.get("name", "rule_based_profiler"),
            rules=rules,
            variables=variables,
        )


# --------------------------------------------------------------------------
# onboarding assistant (reference data_assistant/onboarding_data_assistant.py)
# --------------------------------------------------------------------------


def onboarding_assistant(
    batches: Sequence[DataFrame],
    name: str = "onboarding",
    estimator: str = "bootstrap",
    false_positive_rate: float = 0.05,
    random_seed: Optional[int] = None,
    exclude_column_names: Optional[Sequence[str]] = None,
    cardinality_limit_mode: str = "FEW",
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
) -> ExpectationSuite:
    """Bootstrap a full onboarding suite from multi-batch history — the
    reference OnboardingDataAssistant's rule roster, re-expressed on the
    rule machinery above (each rule = ONE bundled agg per batch):

    - table_rule: row-count range + columns match set;
    - column_value_uniqueness_rule: values_to_be_unique where every batch
      had zero duplicated non-null values;
    - column_value_nullity / nonnullity rules: to_be_null where always all
      null; to_not_be_null (with bootstrapped mostly when nulls are rare
      but nonzero — reference emits mostly from mean unexpected ratio);
    - numeric_columns_rule: min/max/mean/median/stdev ranges + quantile
      value ranges;
    - datetime_columns_rule: min/max ranges (observed bounds, exact
      estimator — timestamps aren't resampled);
    - text_columns_rule: value-length min/max ranges + best-regex match;
    - categorical_columns_rule: value set union + distinct-count range.
    """
    exclude = list(exclude_column_names or ())
    quantiles = tuple(quantiles)
    v = {"fpr": false_positive_rate}

    def _range(pname: str, metric: str, **kw: Any):
        return NumericMetricRangeMultiBatchParameterBuilder(
            pname,
            metric,
            estimator=estimator,
            false_positive_rate=false_positive_rate,
            random_seed=random_seed,
            **kw,
        )

    rules = [
        Rule(
            "table_rule",
            TableDomainBuilder(),
            [_range("row_count_range", "table.row_count", truncate_values={"lower_bound": 0})],
            [
                DefaultExpectationConfigurationBuilder(
                    "expect_table_row_count_to_be_between",
                    min_value="$parameter.row_count_range.value[0]",
                    max_value="$parameter.row_count_range.value[1]",
                ),
            ],
        ),
        Rule(
            "column_value_uniqueness_rule",
            MapMetricColumnDomainBuilder(
                "column_values.unique", exclude_column_names=exclude
            ),
            [],
            [DefaultExpectationConfigurationBuilder("expect_column_values_to_be_unique")],
        ),
        Rule(
            "column_value_nullity_rule",
            MapMetricColumnDomainBuilder(
                "column_values.null", exclude_column_names=exclude
            ),
            [],
            [DefaultExpectationConfigurationBuilder("expect_column_values_to_be_null")],
        ),
        Rule(
            "column_value_nonnullity_rule",
            ColumnDomainBuilder(exclude_column_names=exclude),
            [
                MeanUnexpectedMapMetricMultiBatchParameterBuilder(
                    "null_ratio", "column_values.nonnull"
                )
            ],
            [
                DefaultExpectationConfigurationBuilder(
                    "expect_column_values_to_not_be_null",
                    condition="$parameter.null_ratio.value == 0",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_values_to_not_be_null",
                    condition="$parameter.null_ratio.value > 0",
                    mostly="$parameter.nonnull_mostly.value",
                    meta={"profiler_details": {"mostly_from": "mean null ratio"}},
                ),
            ],
        ),
        Rule(
            "numeric_columns_rule",
            ColumnDomainBuilder(
                include_semantic_types=["numeric"], exclude_column_names=exclude
            ),
            [
                _range("min_range", "column.min"),
                _range("max_range", "column.max"),
                _range("mean_range", "column.mean"),
                _range("median_range", "column.median"),
                _range("stdev_range", "column.standard_deviation"),
                *[
                    _range(f"q_{str(q).replace('.', '_')}", f"column.quantile.{q}")
                    for q in quantiles
                ],
            ],
            [
                DefaultExpectationConfigurationBuilder(
                    "expect_column_min_to_be_between",
                    min_value="$parameter.min_range.value[0]",
                    max_value="$parameter.min_range.value[1]",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_max_to_be_between",
                    min_value="$parameter.max_range.value[0]",
                    max_value="$parameter.max_range.value[1]",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_mean_to_be_between",
                    min_value="$parameter.mean_range.value[0]",
                    max_value="$parameter.mean_range.value[1]",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_median_to_be_between",
                    min_value="$parameter.median_range.value[0]",
                    max_value="$parameter.median_range.value[1]",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_stdev_to_be_between",
                    condition="$parameter.stdev_range.value[1] > 0",
                    min_value="$parameter.stdev_range.value[0]",
                    max_value="$parameter.stdev_range.value[1]",
                ),
                *(
                    [
                        DefaultExpectationConfigurationBuilder(
                            "expect_column_quantile_values_to_be_between",
                            # None-valued history (all-null column) resolves
                            # the condition refs to None -> ordering ops are
                            # False -> skipped; the top-level None check
                            # doesn't see nested lists
                            condition=(
                                f"$parameter.q_{str(quantiles[0]).replace('.', '_')}.value[1]"
                                f" >= $parameter.q_{str(quantiles[0]).replace('.', '_')}.value[0]"
                            ),
                            quantile_ranges={
                                "quantiles": list(quantiles),
                                "value_ranges": [
                                    [
                                        f"$parameter.q_{str(q).replace('.', '_')}.value[0]",
                                        f"$parameter.q_{str(q).replace('.', '_')}.value[1]",
                                    ]
                                    for q in quantiles
                                ],
                            },
                        )
                    ]
                    if quantiles
                    else []
                ),
            ],
        ),
        Rule(
            "datetime_columns_rule",
            ColumnDomainBuilder(
                include_semantic_types=["datetime"], exclude_column_names=exclude
            ),
            [
                MetricMultiBatchParameterBuilder("min_hist", "column.min"),
                MetricMultiBatchParameterBuilder("max_hist", "column.max"),
            ],
            [
                DefaultExpectationConfigurationBuilder(
                    "expect_column_min_to_be_between",
                    min_value="$parameter.min_hist.min",
                    max_value="$parameter.min_hist.max",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_max_to_be_between",
                    min_value="$parameter.max_hist.min",
                    max_value="$parameter.max_hist.max",
                ),
            ],
        ),
        Rule(
            "text_columns_rule",
            ColumnDomainBuilder(
                include_semantic_types=["text"], exclude_column_names=exclude
            ),
            [
                _range("len_min_range", "column.values.length.min"),
                _range("len_max_range", "column.values.length.max"),
                RegexPatternStringParameterBuilder("best_regex", threshold=1.0),
            ],
            [
                DefaultExpectationConfigurationBuilder(
                    "expect_column_value_lengths_to_be_between",
                    min_value="$parameter.len_min_range.value[0]",
                    max_value="$parameter.len_max_range.value[1]",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_values_to_match_regex",
                    regex="$parameter.best_regex.value",
                ),
            ],
        ),
        Rule(
            "categorical_columns_rule",
            CategoricalColumnDomainBuilder(
                cardinality_limit_mode=cardinality_limit_mode,
                exclude_column_names=exclude,
            ),
            [
                ValueSetMultiBatchParameterBuilder("observed_set"),
                _range("distinct_range", "column.distinct_values.count",
                       truncate_values={"lower_bound": 0}),
            ],
            [
                DefaultExpectationConfigurationBuilder(
                    "expect_column_values_to_be_in_set",
                    value_set="$parameter.observed_set.value",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_unique_value_count_to_be_between",
                    min_value="$parameter.distinct_range.value[0]",
                    max_value="$parameter.distinct_range.value[1]",
                ),
            ],
        ),
    ]

    # two fixups the template language doesn't express directly:
    # - nonnull "mostly": computed from the mean null ratio, floored to 2dp
    #   (the not_be_null emission in profiler.profile uses the same floor)
    # - datetime min/max of the HISTORY vector (min of mins, max of maxes)
    class _MostlyFromNullRatio(ParameterBuilder):
        name = "nonnull_mostly"

        def register(self, engine, domains):
            engine.request("__row_count", F.count(F.lit(1)))
            for d in domains:
                engine.request(
                    _metric_alias("nonnull_mostly", "column_values.nonnull.unexpected_count", d),
                    _metric_expr("column_values.nonnull.unexpected_count", d),
                )

        def build(self, engine, domain, variables):
            unexpected = engine.history(
                _metric_alias("nonnull_mostly", "column_values.nonnull.unexpected_count", domain)
            )
            counts = engine.history("__row_count")
            # default guards an ALL-empty history (every batch zero rows)
            worst = max(
                ((u or 0) / n for u, n in zip(unexpected, counts) if n),
                default=0.0,
            )
            if worst >= 0.5:
                return {"value": None, "details": {}}
            return {"value": math.floor((1 - worst) * 100) / 100, "details": {}}

    rules[3].parameter_builders.append(_MostlyFromNullRatio())

    class _HistAggBuilder(MetricMultiBatchParameterBuilder):
        def build(self, engine, domain, variables):
            out = super().build(engine, domain, variables)
            vals = [x for x in out["value"] if x is not None]
            out["min"] = min(vals) if vals else None
            out["max"] = max(vals) if vals else None
            return out

    rules[5].parameter_builders = [
        _HistAggBuilder("min_hist", "column.min"),
        _HistAggBuilder("max_hist", "column.max"),
    ]

    profiler = RuleBasedProfiler(name, rules, variables=v)
    suite = profiler.run(batches)
    # table columns match set (reference table_rule emits it from the batch
    # schema; no parameter machinery needed)
    suite.expectations.insert(
        0,
        ExpectationConfiguration(
            "expect_table_columns_to_match_set",
            kwargs={"column_set": sorted(batches[-1].columns)},
        ),
    )
    suite.meta["assistant"] = "onboarding"
    suite.meta["estimator"] = estimator
    return suite


def image_onboarding_assistant(
    batches: Sequence[DataFrame],
    name: str = "image_onboarding",
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    fmt_col: str = "fmt",
    phash_col: str = "phash",
    max_hamming_distance: int = 0,
    estimator: str = "bootstrap",
    false_positive_rate: float = 0.05,
    random_seed: Optional[int] = None,
    exclude_column_names: Optional[Sequence[str]] = None,
) -> ExpectationSuite:
    """Onboarding for image+caption tables (the input_hint schema:
    image_id, bytes, w, h, fmt, caption, phash) — the standard multi-batch
    rule roster over the METADATA columns (uniqueness admission finds
    image_id/phash keys, the categorical rule learns the observed fmt set,
    numeric rules bound w/h/phash from batch history, text rules bound
    caption lengths), plus the PAYLOAD expectation roster wired to the
    table's column names: bytes decodability, decoded dims == (w, h),
    decoded fmt == fmt, recomputed phash within ``max_hamming_distance``
    (operators/images.py — one shared Arrow decode per suite).

    Binary columns carry no batch statistics worth estimating, so
    ``bytes_col`` is excluded from the metadata rules and drives the
    payload expectations instead; they are emitted only when the column
    exists in the latest batch's schema."""
    cols = set(batches[-1].columns) if batches else set()
    suite = onboarding_assistant(
        batches,
        name=name,
        estimator=estimator,
        false_positive_rate=false_positive_rate,
        random_seed=random_seed,
        exclude_column_names=[bytes_col, *(exclude_column_names or ())],
    )
    if bytes_col in cols:
        suite.expectations.append(
            ExpectationConfiguration(
                "expect_image_bytes_to_be_decodable", kwargs={"column": bytes_col}
            )
        )
        if w_col in cols and h_col in cols:
            suite.expectations.append(
                ExpectationConfiguration(
                    "expect_image_dims_to_match_metadata",
                    kwargs={"column": bytes_col, "w_column": w_col, "h_column": h_col},
                )
            )
        if fmt_col in cols:
            suite.expectations.append(
                ExpectationConfiguration(
                    "expect_image_fmt_to_match_metadata",
                    kwargs={"column": bytes_col, "fmt_column": fmt_col},
                )
            )
        if phash_col in cols:
            suite.expectations.append(
                ExpectationConfiguration(
                    "expect_image_phash_to_match",
                    kwargs={
                        "column": bytes_col,
                        "phash_column": phash_col,
                        "max_hamming_distance": max_hamming_distance,
                    },
                )
            )
    suite.meta["assistant"] = "image_onboarding"
    return suite
