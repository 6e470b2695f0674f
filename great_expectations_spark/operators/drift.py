"""Distribution-drift expectations (KL / chi-square / KS / PSI).

Scale design (north rule): the cluster computes ONLY histogram bin counts —
registered as ``sum(when(col in bin, 1))`` expressions inside the suite's
single bundled aggregate pass (no Bucketizer, no extra scan; compare the
reference's ML-lib path at column_histogram.py:172-240) — or value counts via
the shared groupBy pass for categorical partitions. All test statistics are
driver-side math in functions/stats.py.

The reference supports KL on Spark
(expect_column_kl_divergence_to_be_less_than.py:209-693) but KS / chi-square /
bootstrapped-KS are pandas-only (self_check/util.py:1903-1906); here they are
first-class at scale via the histogram sketch, and PSI is added (standard
drift practice for production pipelines; not in the reference).
"""

from __future__ import annotations

import math
from typing import Any, Callable

from pyspark.sql import Column, functions as F

from great_expectations_spark.core.config import ExpectationConfiguration
from great_expectations_spark.functions.stats import (
    adjust_expected_weights,
    chi2_sf,
    chi_square_test,
    cramers_phi,
    kl_divergence,
    ks_from_histograms,
    ks_pvalue,
    parameterized_cdf,
    psi,
)


def is_categorical_partition(po: dict) -> bool:
    return "values" in po


def _bin_condition(col: Column, lo: float, hi: float, is_last: bool) -> Column:
    """[lo, hi) — last bin [lo, hi] (the reference's upper-bound-equality fix
    at column_histogram.py:172-240)."""
    cond = col >= F.lit(float(lo))
    cond = cond & ((col <= F.lit(float(hi))) if is_last else (col < F.lit(float(hi))))
    return cond


def register_histogram(planner: Any, column: str, bins: list[float], dom: Column) -> dict:
    """Register below/bin/above count aliases in the bundled main pass."""
    col = F.col(column)
    k = len(bins) - 1
    aliases = {
        "below": planner._reg(
            ("hist.below", column, bins[0]),
            F.count(F.when(dom & (col < F.lit(float(bins[0]))), F.lit(1))),
        ),
        "above": planner._reg(
            ("hist.above", column, bins[-1]),
            F.count(F.when(dom & (col > F.lit(float(bins[-1]))), F.lit(1))),
        ),
        "nonnull": planner._reg(
            ("nonnull", "whole", column), F.count(F.when(dom, col))
        ),
        "bins": [
            planner._reg(
                ("hist.bin", column, bins[i], bins[i + 1], i == k - 1),
                F.count(
                    F.when(dom & _bin_condition(col, bins[i], bins[i + 1], i == k - 1), F.lit(1))
                ),
            )
            for i in range(k)
        ],
    }
    return aliases


def _observed_histogram(metrics: dict, aliases: dict) -> tuple[list[int], int, int, int]:
    bin_counts = [int(metrics[a] or 0) for a in aliases["bins"]]
    below = int(metrics[aliases["below"]] or 0)
    above = int(metrics[aliases["above"]] or 0)
    nonnull = int(metrics[aliases["nonnull"]] or 0)
    return bin_counts, below, above, nonnull


def _categorical_observed(gb, expected_values: list) -> tuple[list[int], int]:
    """Observed counts aligned to expected_values + count of unseen values."""
    counts = {values[0]: cnt for values, cnt in gb.top}
    aligned = [int(counts.get(v, 0)) for v in expected_values]
    extra = sum(c for v, c in counts.items() if v not in set(expected_values))
    return aligned, extra


def _compile_kl(planner: Any, cfg: ExpectationConfiguration) -> None:
    from great_expectations_spark.plans.planner import _Item

    kw = cfg.kwargs
    column = kw["column"]
    po = kw["partition_object"]
    threshold = kw.get("threshold")
    tail_holdout = float(kw.get("tail_weight_holdout", 0.0))
    internal_holdout = float(kw.get("internal_weight_holdout", 0.0))
    dom, _ = planner._domain(cfg)

    if is_categorical_partition(po):
        values = list(po["values"])
        key = planner._need_groupby((column,), drop_nulls=True, want_top=True)
        weights, _, _ = adjust_expected_weights(po["weights"], tail_holdout, internal_holdout)

        def decide(ctx) -> tuple[bool, dict]:
            aligned, extra = _categorical_observed(ctx.groupby[key], values)
            pk = aligned + ([extra] if extra else [])
            qk = list(weights) + ([0.0] if extra else [])
            kl = kl_divergence(pk, qk)
            ok = threshold is not None and kl < threshold
            return bool(ok), {
                "observed_value": kl if not math.isinf(kl) else None,
                "details": {
                    "observed_partition": {"values": values, "weights": _fracs(aligned)}
                },
            }

        planner._items.append(_Item(cfg, decide, partition_capable=False))
        return

    bins = [float(b) for b in po["bins"]]
    aliases = register_histogram(planner, column, bins, dom)
    weights, below_w, above_w = adjust_expected_weights(
        po["weights"], tail_holdout, internal_holdout, po.get("tail_weights")
    )

    def decide(ctx) -> tuple[bool, dict]:
        bin_counts, below, above, nonnull = _observed_histogram(ctx.metrics, aliases)
        if nonnull == 0:
            return True, {"observed_value": None}
        pk = [below / nonnull] + [c / nonnull for c in bin_counts] + [above / nonnull]
        qk = [below_w] + list(weights) + [above_w]
        kl = kl_divergence(pk, qk)
        ok = threshold is not None and kl < threshold
        return bool(ok), {
            "observed_value": kl if not math.isinf(kl) else None,
            "details": {
                "observed_partition": {
                    "bins": bins,
                    "weights": [c / nonnull for c in bin_counts],
                    "tail_weights": [below / nonnull, above / nonnull],
                }
            },
        }

    planner._items.append(_Item(cfg, decide, partition_capable=True))


def _fracs(counts: list[int]) -> list[float]:
    t = sum(counts)
    return [c / t if t else 0.0 for c in counts]


def _compile_chi_square(planner: Any, cfg: ExpectationConfiguration) -> None:
    from great_expectations_spark.plans.planner import _Item

    kw = cfg.kwargs
    column = kw["column"]
    po = kw["partition_object"]
    p_threshold = float(kw.get("p", 0.05))
    values = list(po["values"])
    key = planner._need_groupby((column,), drop_nulls=True, want_top=True)

    def decide(ctx) -> tuple[bool, dict]:
        aligned, extra = _categorical_observed(ctx.groupby[key], values)
        pk = aligned + ([extra] if extra else [])
        qk = list(po["weights"]) + ([0.0] if extra else [])
        stat, pval = chi_square_test(pk, qk)
        return bool(pval > p_threshold), {
            "observed_value": pval,
            "details": {"chi_square_statistic": stat, "observed_counts": aligned},
        }

    planner._items.append(_Item(cfg, decide, partition_capable=False))


def _compile_ks(planner: Any, cfg: ExpectationConfiguration) -> None:
    from great_expectations_spark.plans.planner import _Item

    kw = cfg.kwargs
    column = kw["column"]
    po = kw["partition_object"]
    p_threshold = float(kw.get("p", 0.05))
    dom, _ = planner._domain(cfg)
    bins = [float(b) for b in po["bins"]]
    aliases = register_histogram(planner, column, bins, dom)
    weights = list(po["weights"])

    def decide(ctx) -> tuple[bool, dict]:
        bin_counts, below, above, nonnull = _observed_histogram(ctx.metrics, aliases)
        if nonnull == 0:
            return True, {"observed_value": None}
        obs = [below] + bin_counts + [above]
        exp = [0.0] + weights + [0.0]
        d = ks_from_histograms(obs, exp)
        pval = ks_pvalue(d, nonnull)
        return bool(pval > p_threshold), {
            "observed_value": pval,
            "details": {"ks_statistic": d},
        }

    planner._items.append(_Item(cfg, decide, partition_capable=True))


def _compile_psi(planner: Any, cfg: ExpectationConfiguration) -> None:
    from great_expectations_spark.plans.planner import _Item

    kw = cfg.kwargs
    column = kw["column"]
    po = kw["partition_object"]
    threshold = float(kw.get("threshold", 0.2))
    dom, _ = planner._domain(cfg)

    if is_categorical_partition(po):
        values = list(po["values"])
        key = planner._need_groupby((column,), drop_nulls=True, want_top=True)

        def decide(ctx) -> tuple[bool, dict]:
            aligned, extra = _categorical_observed(ctx.groupby[key], values)
            pk = aligned + ([extra] if extra else [])
            qk = list(po["weights"]) + ([0.0] if extra else [])
            v = psi(pk, qk)
            return bool(v < threshold), {"observed_value": v}

        planner._items.append(_Item(cfg, decide, partition_capable=False))
        return

    bins = [float(b) for b in po["bins"]]
    aliases = register_histogram(planner, column, bins, dom)
    weights = list(po["weights"])

    def decide(ctx) -> tuple[bool, dict]:
        bin_counts, below, above, nonnull = _observed_histogram(ctx.metrics, aliases)
        if nonnull == 0:
            return True, {"observed_value": None}
        obs = [below] + bin_counts + [above]
        exp = [0.0] + weights + [0.0]
        v = psi(obs, exp)
        return bool(v < threshold), {"observed_value": v}

    planner._items.append(_Item(cfg, decide, partition_capable=True))


def _compile_cramers_phi(planner: Any, cfg: ExpectationConfiguration) -> None:
    """expect_column_pair_cramers_phi_value_to_be_less_than — categorical
    association between two columns. Pandas-only in the reference
    (self_check/util.py:1903-1906); here the contingency table comes from the
    shared groupBy pass (one shuffle on (A,B)), phi is driver math.
    Continuous columns should be pre-binned (the reference's bins_A/bins_B
    path) — pass already-bucketed columns."""
    from great_expectations_spark.plans.planner import _Item

    kw = cfg.kwargs
    a, b = kw["column_A"], kw["column_B"]
    threshold = float(kw.get("threshold", 0.1))
    key = planner._need_groupby((a, b), drop_nulls=True, want_top=True)

    def decide(ctx) -> tuple[bool, dict]:
        gb = ctx.groupby[key]
        contingency = {values: cnt for values, cnt in gb.top}
        rows = len({v[0] for v in contingency})
        cols = len({v[1] for v in contingency})
        phi, chi2 = cramers_phi(contingency, rows, cols)
        return bool(phi < threshold), {
            "observed_value": phi,
            "details": {"chi_squared": chi2, "n_rows": rows, "n_cols": cols},
        }

    planner._items.append(_Item(cfg, decide, partition_capable=False))


def _compile_parameterized_ks(planner: Any, cfg: ExpectationConfiguration) -> None:
    """expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than
    — one-sample KS against a named distribution (norm/uniform/expon).

    Pandas-only in the reference (sample-based scipy.stats.kstest); the scale
    path here evaluates |F_dist(x_p) − p| at K approximate sample quantiles
    from the bundled agg pass (GK sketch — single pass, mergeable)."""
    from great_expectations_spark.plans.planner import _Item

    kw = cfg.kwargs
    column = kw["column"]
    p_threshold = float(kw.get("p_value", kw.get("p", 0.05)))
    cdf = parameterized_cdf(kw["distribution"], kw.get("params"))
    n_probe = int(kw.get("n_quantiles", 100))
    dom, dom_id = planner._domain(cfg)
    col = F.col(column)
    probes = [i / n_probe for i in range(1, n_probe)]
    a_q = planner._reg(
        ("param_ks_quantiles", column, dom_id, n_probe),
        F.percentile_approx(
            F.when(dom, col), F.array(*[F.lit(p) for p in probes]), F.lit(10000)
        ),
    )
    a_n = planner._reg(("nonnull", dom_id, column), F.count(F.when(dom, col)))

    def decide(ctx) -> tuple[bool, dict]:
        xs = ctx.metrics[a_q]
        nonnull = ctx.metrics[a_n] or 0
        if xs is None or nonnull == 0:
            return True, {"observed_value": None}
        d = max(abs(cdf(float(x)) - p) for x, p in zip(xs, probes))
        pval = ks_pvalue(d, nonnull)
        return bool(pval > p_threshold), {
            "observed_value": pval,
            "details": {"ks_statistic": d, "n_quantile_probes": n_probe},
        }

    planner._items.append(_Item(cfg, decide, partition_capable=True))


DRIFT_COMPILERS: dict[str, Callable[[Any, ExpectationConfiguration], None]] = {
    "expect_column_kl_divergence_to_be_less_than": _compile_kl,
    "expect_column_chi_square_test_p_value_to_be_greater_than": _compile_chi_square,
    # reference spelling (expect_column_chisquare_test_p_value_to_be_greater_than.py)
    "expect_column_chisquare_test_p_value_to_be_greater_than": _compile_chi_square,
    "expect_column_kstest_p_value_to_be_greater_than": _compile_ks,
    # histogram-sketch stand-in for the reference's bootstrapped sample KS
    # (pandas-only there — expect_column_bootstrapped_ks_test_p_value_...)
    "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than": _compile_ks,
    "expect_column_psi_to_be_less_than": _compile_psi,
    "expect_column_pair_cramers_phi_value_to_be_less_than": _compile_cramers_phi,
    "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than": _compile_parameterized_ks,
}
