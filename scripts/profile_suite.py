#!/usr/bin/env python
"""spark-submit entry point for suite bootstrapping: profile a batch and
write an expectation suite JSON — the engine's counterpart of the
reference's profile-then-edit workflow (``great_expectations suite new``
with a profiler, rule_based_profiler/ + cli/suite.py).

    spark-submit --py-files ges.zip scripts/profile_suite.py \
        --input /path/or/catalog.table --output suite.json \
        --name nightly --columns a,b,c --drift-baselines --pii-checks

The emitted JSON loads back through ExpectationSuite.from_json (both this
engine's and the reference's key layout are accepted); pass
--reference-format to write the reference's on-disk schema
(expectation_suite_name, clean-empty meta) instead.

Multi-batch modes (rule_profiler.py): ``--onboarding`` runs the onboarding
assistant over a batch split of the input (``--split-column`` + mod/hash/
value ``--split-method``), bootstrapping range bounds from batch-to-batch
history instead of pinning one batch; ``--rule-config cfg.yaml`` runs a
reference-shaped RuleBasedProfiler config over the same split.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="path (parquet/csv/...) or catalog table")
    p.add_argument("--table", action="store_true", help="treat --input as a catalog table")
    p.add_argument("--snapshot-id", type=int, default=None, help="Iceberg snapshot pin")
    p.add_argument("--output", required=True, help="suite JSON output path")
    p.add_argument("--name", default="profiled", help="suite name")
    p.add_argument("--columns", default=None, help="comma-separated columns (default: all)")
    p.add_argument("--cardinality-limit", type=int, default=20)
    p.add_argument("--row-count-tolerance", type=float, default=0.1)
    p.add_argument("--approx", action="store_true",
                   help="approx distinct counts (large batches)")
    p.add_argument("--drift-baselines", action="store_true",
                   help="emit KL partition_object baselines from this batch")
    p.add_argument("--pii-checks", action="store_true",
                   help="emit no-PII expectations for clean string columns")
    p.add_argument("--reference-format", action="store_true",
                   help="write the reference's on-disk suite schema")
    g = p.add_argument_group("multi-batch rule profiling")
    g.add_argument("--onboarding", action="store_true",
                   help="run the rule-based onboarding assistant over a "
                        "multi-batch split of the input instead of the "
                        "single-batch profiler")
    g.add_argument("--image-onboarding", action="store_true",
                   help="image+caption-table variant: metadata rules plus "
                        "the payload expectation roster (decodability, "
                        "dims/fmt match, phash recompute)")
    g.add_argument("--rule-config", default=None,
                   help="YAML/JSON RuleBasedProfiler config (reference "
                        "rule_based_profiler config shape) to run over the "
                        "batch split instead of the onboarding roster")
    g.add_argument("--split-column", default=None,
                   help="column that partitions the input into batches "
                        "(required with --onboarding/--rule-config)")
    g.add_argument("--split-method", choices=("mod", "hash", "value"),
                   default="mod",
                   help="mod: column %% N; hash: pmod(xxhash64(col), N); "
                        "value: one batch per distinct value (<= 50)")
    g.add_argument("--num-batches", type=int, default=3,
                   help="batch count for mod/hash splits")
    g.add_argument("--estimator", choices=("exact", "quantiles", "bootstrap", "kde"),
                   default="bootstrap", help="numeric range estimator")
    g.add_argument("--fpr", type=float, default=0.05,
                   help="false positive rate for range estimators")
    g.add_argument("--seed", type=int, default=None,
                   help="random seed for bootstrap/kde")
    g.add_argument("--exclude-columns", default=None,
                   help="comma-separated columns the rules skip")
    return p


def _split_batches(df, args):
    from pyspark.sql import functions as F

    c = args.split_column
    if not c:
        raise SystemExit("--onboarding/--image-onboarding/--rule-config need --split-column")
    if args.split_method == "value":
        values = [
            r[0]
            for r in df.select(c).filter(F.col(c).isNotNull()).distinct()
            .orderBy(c).limit(51).collect()
        ]
        if len(values) > 50:
            raise SystemExit(
                f"--split-method value: {c!r} has > 50 distinct values; "
                "use mod/hash or a coarser column"
            )
        return [df.filter(F.col(c) == v) for v in values]
    n = args.num_batches
    if n < 2:
        raise SystemExit("--num-batches must be >= 2")
    if args.split_method == "hash":
        key = F.pmod(F.xxhash64(F.col(c)), F.lit(n))
    else:
        key = F.pmod(F.col(c).cast("bigint"), F.lit(n))
    return [df.filter(key == i) for i in range(n)]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from great_expectations_spark.profiler import profile
    from great_expectations_spark.sources.batch import BatchSpec, load_batch

    spark = SparkSession.builder.appName("ges-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spec = BatchSpec(
        table=args.input if args.table else None,
        path=None if args.table else args.input,
        snapshot_id=args.snapshot_id,
    )
    df = load_batch(spark, spec)
    if args.rule_config:  # noqa: SIM114 — distinct assistants below
        from great_expectations_spark.rule_profiler import RuleBasedProfiler
        from great_expectations_spark.sources.checkpoint_config import _load_file

        profiler = RuleBasedProfiler.from_config(_load_file(args.rule_config))
        suite = profiler.run(_split_batches(df, args))
        suite.name = args.name
    elif args.onboarding or args.image_onboarding:
        from great_expectations_spark.rule_profiler import (
            image_onboarding_assistant,
            onboarding_assistant,
        )

        assistant = (
            image_onboarding_assistant if args.image_onboarding
            else onboarding_assistant
        )
        suite = assistant(
            _split_batches(df, args),
            name=args.name,
            estimator=args.estimator,
            false_positive_rate=args.fpr,
            random_seed=args.seed,
            exclude_column_names=(
                args.exclude_columns.split(",") if args.exclude_columns else None
            ),
        )
    else:
        suite = profile(
            df,
            name=args.name,
            columns=args.columns.split(",") if args.columns else None,
            cardinality_limit=args.cardinality_limit,
            row_count_tolerance=args.row_count_tolerance,
            exact=not args.approx,
            drift_baselines=args.drift_baselines,
            pii_checks=args.pii_checks,
        )
    payload = suite.to_reference_json() if args.reference_format else suite.to_json()
    with open(args.output, "w") as f:
        f.write(payload + "\n")
    import json

    print(
        json.dumps(
            {
                "suite": args.name,
                "expectations": len(suite.expectations),
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
