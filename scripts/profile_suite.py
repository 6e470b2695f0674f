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
    return p


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
