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

Batch discovery (sources/discovery.py): instead of splitting one table,
``--discover-hive`` / ``--discover-pattern`` treat ``--input`` as a
partitioned layout root and feed the discovered batch list (sorted by
``--discover-sort``, filtered by ``--discover-index``) to the multi-batch
mode — e.g. profile the last five ``year=/month=`` partitions:

    scripts/profile_suite.py --input s3a://bucket/events --output s.json \
        --onboarding --discover-hive \
        --discover-sort year:numeric,month:numeric --discover-index=-5:
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
    d = p.add_argument_group(
        "batch discovery (multi-batch input from a partitioned layout — "
        "sources/discovery.py; replaces --split-column)"
    )
    d.add_argument("--discover-hive", action="store_true",
                   help="treat --input as a layout root: one batch per "
                        "key=value partition directory")
    d.add_argument("--discover-pattern", default=None,
                   help="regex over paths relative to --input; named groups "
                        "(or --discover-group-names) become batch "
                        "identifiers")
    d.add_argument("--discover-group-names", default=None,
                   help="comma-separated group names for the regex")
    d.add_argument("--discover-sort", default=None,
                   help="comma list key[:type][:desc], e.g. "
                        "'year:numeric,month:numeric' — first key is the "
                        "primary sort")
    d.add_argument("--discover-index", default=None,
                   help="data_connector_query index over the sorted batch "
                        "list, e.g. '-5:' for the five most recent")
    return p


def _parse_sorters(spec: str) -> list[dict]:
    out = []
    for part in spec.split(","):
        bits = part.split(":")
        cfg = {"key": bits[0]}
        for b in bits[1:]:
            if b in ("asc", "desc"):
                cfg["orderby"] = b
            else:
                cfg["type"] = b
        out.append(cfg)
    return out


def _discovered_batches(spark, args):
    from great_expectations_spark.sources.discovery import (
        discover_batches,
        load_discovered_batches,
    )

    defs = discover_batches(
        args.input,
        args.discover_pattern,
        args.discover_group_names.split(",") if args.discover_group_names else None,
        hive=args.discover_hive,
        spark=spark,
        sorters=_parse_sorters(args.discover_sort) if args.discover_sort else None,
        data_connector_query=(
            {"index": args.discover_index} if args.discover_index else None
        ),
    )
    if not defs:
        raise SystemExit(f"discovery matched nothing under {args.input!r}")
    print(
        f"discovered {len(defs)} batches: "
        + ", ".join(str(d.batch_identifiers) for d in defs[:8])
        + (" ..." if len(defs) > 8 else "")
    )
    return load_discovered_batches(spark, defs)


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

    discovering = bool(args.discover_hive or args.discover_pattern)
    multi_batch = bool(args.rule_config or args.onboarding or args.image_onboarding)
    if discovering and not multi_batch:
        raise SystemExit(
            "--discover-* needs a multi-batch mode "
            "(--onboarding / --image-onboarding / --rule-config)"
        )
    if discovering:
        df = None
        batches = _discovered_batches(spark, args)
    else:
        spec = BatchSpec(
            table=args.input if args.table else None,
            path=None if args.table else args.input,
            snapshot_id=args.snapshot_id,
        )
        df = load_batch(spark, spec)
        batches = None
    if args.rule_config:  # noqa: SIM114 — distinct assistants below
        from great_expectations_spark.rule_profiler import RuleBasedProfiler
        from great_expectations_spark.sources.checkpoint_config import _load_file

        profiler = RuleBasedProfiler.from_config(_load_file(args.rule_config))
        suite = profiler.run(batches if batches is not None else _split_batches(df, args))
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
            batches if batches is not None else _split_batches(df, args),
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
