#!/usr/bin/env python
"""spark-submit entry point for training-corpus cleaning — the CLI face of
``great_expectations_spark.pipeline.clean_corpus``:

    spark-submit --py-files ges.zip scripts/clean_corpus.py \
        --input docs.parquet --output cleaned.parquet \
        --min-quality 0.3 --min-tokens 5 --languages en,es \
        --scrub-pii --dedup minhash --max-dup-fraction 0.5 \
        --benchmark evalset.parquet --max-contamination 0.1

Writes the cleaned corpus as parquet and prints ONE JSON summary line with
the per-stage audit counts (rows surviving each stage).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="cleaned parquet output path")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--no-quality-gate", action="store_true")
    p.add_argument("--languages", default=None, help="comma-separated allowlist")
    p.add_argument("--scrub-pii", action="store_true")
    p.add_argument("--dedup", default="exact", choices=["exact", "minhash", "none"])
    p.add_argument("--dedup-threshold", type=float, default=0.9)
    p.add_argument("--max-dup-fraction", type=float, default=None,
                   help="drop docs whose duplicated-span token fraction exceeds this")
    p.add_argument("--benchmark", default=None, help="eval-set parquet for decontamination")
    p.add_argument("--max-contamination", type=float, default=0.1)
    p.add_argument("--contamination-k", type=int, default=8)
    p.add_argument("--output-partitions", type=int, default=None,
                   help="coalesce/repartition the output file count")
    p.add_argument("--token-budgets", default=None,
                   help='JSON {source: target_tokens} — training-mix '
                        'sampling of the CLEANED corpus (e.g. '
                        '\'{"web": 1000000, "code": 200000}\')')
    p.add_argument("--source-col", default="source")
    p.add_argument("--budget-seed", type=int, default=42)
    p.add_argument("--pack-max-tokens", type=int, default=None,
                   help="also write training-pack assignments for the "
                        "cleaned corpus (pack_sequences) to "
                        "<output>_packs.parquet")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from great_expectations_spark.pipeline import clean_corpus

    spark = SparkSession.builder.appName("ges-clean-corpus").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    df = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    res = clean_corpus(
        df,
        id_col=args.id_col,
        text_col=args.text_col,
        min_quality=None if args.no_quality_gate else args.min_quality,
        min_tokens=None if args.no_quality_gate else args.min_tokens,
        languages=args.languages.split(",") if args.languages else None,
        scrub_pii=args.scrub_pii,
        dedup=None if args.dedup == "none" else args.dedup,
        dedup_threshold=args.dedup_threshold,
        max_dup_fraction=args.max_dup_fraction,
        benchmark=bench,
        max_contamination=args.max_contamination,
        contamination_k=args.contamination_k,
        token_budgets=json.loads(args.token_budgets) if args.token_budgets else None,
        source_col=args.source_col,
        budget_seed=args.budget_seed,
        count_stages=True,
        persist_intermediate=True,
    )
    out = res.df
    if args.output_partitions:
        out = out.repartition(args.output_partitions)
    out.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    packs_path = None
    if args.pack_max_tokens:
        from great_expectations_spark.operators.text import pack_sequences

        packs_path = args.output.rstrip("/") + "_packs.parquet"
        pack_sequences(
            spark.read.parquet(args.output),
            max_tokens=args.pack_max_tokens,
            id_col=args.id_col,
            text_col=args.text_col,
        ).write.mode("overwrite").parquet(packs_path)
    res.unpersist()
    print(
        json.dumps(
            {
                "input_rows": df.count(),
                "output_rows": n_out,
                "stages": res.stages,
                "stage_counts": res.stage_counts,
                "output": args.output,
                "packs_output": packs_path,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
