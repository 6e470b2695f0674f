"""Scale rehearsal for the cluster/span dedup path — runs the two operators
whose pytest coverage tops out at ~500k docs against 5-10M synthetic inputs,
with EXACT expected-output checks, and reports wall time + iteration counts.

Inputs are generated deterministically inside Spark (`spark.range` + hash
arithmetic) — no files, no external data — so the rehearsal measures the
operators, not a parquet scan.

  python tools/scale_rehearsal.py                 # both trials, full size
  python tools/scale_rehearsal.py --clique-nodes 800000 --chain-nodes 262144 \
      --docs 500000                                # smoke-sized
  python tools/scale_rehearsal.py --skip-spans    # clusters only

Trial 1 — duplicate_clusters on a 10M-node pair graph:
  * `--clique-nodes` (default 8,000,000) nodes in 5-node star components
    (the LSH near-clique shape: diameter 2);
  * `--chain-nodes` (default 2,097,152) nodes in `--chain-len` (default 512)
    long path components (the templated-boilerplate chain shape that
    exercises pointer jumping: O(log 512) ≈ 10 rounds, not 512).
  Checks: exact component count, exact label fingerprint properties
  (every clique labels to its base node; every chain labels to its head),
  and iterations-to-converge ≤ the O(log diameter) budget.

Trial 2 — duplicate_ngram_spans on `--docs` (default 5,000,000) documents of
  24 random-vocab tokens, 1 in 10 carrying a fixed 10-token boilerplate at
  token positions [5, 15). With k=8 the only duplicated grams are the 3
  fully-inside-boilerplate grams, so EVERY boilerplate doc must yield exactly
  one span (start=5, end=15, dup_grams=3) and no other doc any span.

Prints one JSON line per trial and a `rehearsal_total_s` footer.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-rehearsal")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.log.level", "ERROR")
        .getOrCreate()
    )


def cluster_trial(
    spark: SparkSession, clique_nodes: int, chain_nodes: int, chain_len: int
) -> dict:
    from great_expectations_spark.operators.dedup import duplicate_clusters

    if clique_nodes % 5 or chain_nodes % chain_len:
        raise SystemExit("--clique-nodes must be %5==0; --chain-nodes %chain-len==0")
    # star edges: node -> its group base (5 nodes/component, diameter 2)
    stars = (
        spark.range(clique_nodes)
        .select(
            F.col("id").alias("a"),
            (F.col("id") - F.col("id") % 5).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
    )
    # chain edges: consecutive nodes, broken every chain_len (diameter 511)
    base = clique_nodes
    chains = (
        spark.range(chain_nodes - 1)
        .filter((F.col("id") % chain_len) != (chain_len - 1))
        .select(
            (F.col("id") + base).alias("a"), (F.col("id") + base + 1).alias("b")
        )
    )
    edges = stars.union(chains)
    n_components = clique_nodes // 5 + chain_nodes // chain_len

    stats: dict = {}
    t0 = time.monotonic()
    labels = duplicate_clusters(edges, stats=stats)
    # exact structural checks, all computed distributed:
    #  - every node labeled, component count exact
    #  - every label is the component's minimum member (base / chain head),
    #    which for this construction means label % 5 == 0 (cliques) or
    #    (label - base) % chain_len == 0 (chains)
    agg = labels.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.count_distinct("cluster_id").alias("components"),
        F.sum(
            F.when(
                (
                    (F.col("cluster_id") < base)
                    & (F.col("cluster_id") % 5 == 0)
                    & (F.col("node") - F.col("cluster_id") < 5)
                    & (F.col("node") >= F.col("cluster_id"))
                )
                | (
                    (F.col("cluster_id") >= base)
                    & ((F.col("cluster_id") - base) % chain_len == 0)
                    & (F.col("node") >= F.col("cluster_id"))
                    & (F.col("node") - F.col("cluster_id") < chain_len)
                ),
                0,
            ).otherwise(1)
        ).alias("mislabeled"),
    ).collect()[0]
    wall = time.monotonic() - t0

    ok = (
        agg["nodes"] == clique_nodes + chain_nodes
        and agg["components"] == n_components
        and agg["mislabeled"] == 0
        and stats.get("converged") is True
    )
    return {
        "trial": "duplicate_clusters",
        "nodes": clique_nodes + chain_nodes,
        "edges_clique": clique_nodes - clique_nodes // 5,
        "edges_chain": chain_nodes - chain_nodes // chain_len,
        "chain_len": chain_len,
        "components_expected": n_components,
        "components_found": agg["components"],
        "mislabeled": agg["mislabeled"],
        "iterations": stats.get("iterations"),
        "converged": stats.get("converged"),
        "wall_s": round(wall, 2),
        "nodes_per_s": int((clique_nodes + chain_nodes) / wall),
        "ok": ok,
    }


def span_trial(spark: SparkSession, docs: int) -> dict:
    from great_expectations_spark.operators.dedup import duplicate_ngram_spans

    n_tokens, bp_lo, bp_hi, k = 24, 5, 15, 8
    # token j of doc i: fixed boilerplate word for 1-in-10 docs at [5,15),
    # else a token UNIQUE to (doc, position) — vocab-drawn flanks collide by
    # birthday (two bp docs sharing token4 extend the span to start=4; at 5M
    # docs every vocab word collides), which would break the exact span
    # assertion; unique flanks keep "only boilerplate duplicates" exact at
    # any size while gram volume (the thing being measured) is identical
    def tok(j: int):
        if bp_lo <= j < bp_hi:
            return F.when(
                F.col("id") % 10 == 0, F.lit(f"bp{j}")
            ).otherwise(F.concat_ws("_", F.lit("w"), F.col("id"), F.lit(j)))
        return F.concat_ws("_", F.lit("w"), F.col("id"), F.lit(j))

    # one codegen'd projection per doc — NOT explode+collect_list, whose
    # element order is not guaranteed under sort-based aggregation fallback
    # (observed: ~0.25% of docs reassembled with a flank token inside the
    # boilerplate, shifting the span); n_tokens is a compile-time constant
    # so the straight concat is both exact and the fastest generator
    corpus = (
        spark.range(docs)
        .repartition(64)
        .select(
            F.col("id").cast("string").alias("doc_id"),
            F.concat_ws(" ", *[tok(j) for j in range(n_tokens)]).alias("text"),
        )
    )

    t0 = time.monotonic()
    spans = duplicate_ngram_spans(corpus, k=k, min_count=2)
    agg = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count_distinct("doc_id").alias("docs_with_spans"),
        F.sum(
            F.when(
                (F.col("start_token") == bp_lo)
                & (F.col("end_token") == bp_hi)
                & (F.col("dup_grams") == bp_hi - bp_lo - k + 1),
                0,
            ).otherwise(1)
        ).alias("wrong_spans"),
    ).collect()[0]
    wall = time.monotonic() - t0

    expected_docs = (docs + 9) // 10  # ids 0,10,20,... — ceil(docs/10)
    ok = (
        agg["n_spans"] == expected_docs
        and agg["docs_with_spans"] == expected_docs
        and agg["wrong_spans"] == 0
    )
    return {
        "trial": "duplicate_ngram_spans",
        "docs": docs,
        "tokens": docs * n_tokens,
        "k": k,
        "spans_expected": expected_docs,
        "spans_found": agg["n_spans"],
        "wrong_spans": agg["wrong_spans"],
        "wall_s": round(wall, 2),
        "tokens_per_s": int(docs * n_tokens / wall),
        "ok": ok,
    }


def ivfpq_trial(
    spark: SparkSession, vectors: int, dim: int = 32, n_queries: int = 8
) -> dict:
    """IVF-PQ at 5M synthetic vectors (Trial 3): high-entropy sin-derived
    points plus 10 PLANTED groups of 11 near-identical vectors (0.03
    perturbation around a shared anchor — mutual true nearest neighbors,
    cosine ~0.999 vs <=~0.5 for random pairs), all generated from `id`
    (exactly reproducible). Queries are the group anchors, so the exact
    top-10 is unambiguous AND separated at code resolution — an earlier
    draft ranked same-cluster jitter below quantization resolution, which
    measures ADC tie-breaking, not the index. Measures pq_encode
    throughput, shortlist candidate recall (true top-10 inside the ADC
    top-100 — the bound on the shortlist+exact-rerank pipeline), and IVF
    probe fidelity at 8/64 lists."""
    from great_expectations_spark.operators import similarity as sim

    import numpy as np
    import pandas as pd

    n_clusters = 64
    group_step = max(11, vectors // 10)  # 10 planted groups
    # incommensurate pseudo-random frequencies per dim — an arithmetic
    # progression (first draft) makes the id->vector curve a 1-D torus walk
    # with near-resonances (ids ~1700 apart at cosine 0.9998), polluting
    # the exact top-10 with non-planted neighbors
    freqs = np.array(
        [0.37 + ((j * 2654435761) % 1000003) / 500001.5 for j in range(dim)]
    )
    pfreqs = np.array(
        [0.11 + ((j * 40503) % 65521) / 32760.5 for j in range(dim)]
    )
    joff = np.arange(dim, dtype=np.float64)

    def gen(batches):
        # vectorized numpy generator (a 768-expression F.array of sins runs
        # interpreted and took 60 s per 100k vectors; this is ~100x faster
        # with identical math)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            mem = (ids % group_step) < 11
            base = np.where(mem, ids - (ids % group_step), ids).astype(
                np.float64
            )
            E = np.sin(base[:, None] * freqs[None, :] + joff[None, :])
            if mem.any():
                E[mem] += 0.03 * np.sin(
                    ids[mem, None].astype(np.float64) * pfreqs[None, :]
                )
            yield pd.DataFrame({"vec_id": ids, "embedding": list(E)})

    emb = (
        spark.range(vectors)
        .repartition(64)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
        .persist()
    )
    emb.count()  # materialize: measure the operators, not the generator

    t0 = time.monotonic()
    books = sim.train_pq_codebooks(emb, m=8, k=256, sample_size=20_000, seed=11)
    cents = sim.train_ivf_centroids(emb, n_centroids=n_clusters, sample_size=20_000, seed=11)
    train_s = time.monotonic() - t0

    t0 = time.monotonic()
    index = (
        sim.pq_encode(sim.ivf_assign(emb, cents), books)
        .select("vec_id", "centroid_id", "pq_code")  # raw vectors DROPPED
        .persist()
    )
    n_encoded = index.count()
    encode_s = time.monotonic() - t0

    # At billion scale PQ is a CANDIDATE GENERATOR: the ADC shortlist is
    # exact-reranked. The metrics that matter are (a) candidate recall —
    # the true top-10 inside the ADC top-100 shortlist, which bounds the
    # recall of the full shortlist+rerank pipeline — and (b) probe
    # fidelity — how much of the full-probe ADC ranking survives scanning
    # only 8/64 inverted lists. Queries are planted-group anchors.
    q_ids = [g * group_step for g in range(n_queries)]
    q_rows = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(q_ids)).collect()
    }
    cand_rec = probe_fid = adc_rec = 0.0
    t0 = time.monotonic()
    for qid in q_ids:
        qv = q_rows[qid]
        exact = {r["vec_id"] for r in sim.brute_force_topk(emb, qv, k=10).collect()}
        full100 = [
            r["vec_id"]
            for r in sim.ivfpq_topk(
                index, cents, books, qv, k=100, n_probe=n_clusters
            ).collect()
        ]
        probe10 = {
            r["vec_id"]
            for r in sim.ivfpq_topk(index, cents, books, qv, k=10, n_probe=8).collect()
        }
        cand_rec += len(exact & set(full100)) / 10.0
        adc_rec += len(exact & set(full100[:10])) / 10.0
        probe_fid += len(probe10 & set(full100[:10])) / 10.0
    search_s = time.monotonic() - t0
    cand_rec /= n_queries
    adc_rec /= n_queries
    probe_fid /= n_queries
    emb.unpersist()
    index.unpersist()

    ok = n_encoded == vectors and cand_rec >= 0.9 and probe_fid >= 0.9
    return {
        "trial": "ivfpq_ann",
        "vectors": vectors,
        "dim": dim,
        "m": 8,
        "k": 256,
        "train_s": round(train_s, 2),
        "encode_s": round(encode_s, 2),
        "encode_vectors_per_s": int(vectors / encode_s),
        "queries": n_queries,
        "candidate_recall_10_in_100": round(cand_rec, 3),
        "probe_fidelity_8_of_64": round(probe_fid, 3),
        "adc_recall_at_10": round(adc_rec, 3),
        "search_s_total": round(search_s, 2),
        "ok": ok,
    }


def skew_trial(spark: SparkSession, rows: int) -> dict:
    """Skewed-key rehearsal (VERDICT r4 #3): a zipf-shaped key over ``rows``
    synthetic rows — ONE key owns 20% of all rows, two more own 10%/5%, the
    remainder spreads over a 100k-key tail — through the three aggregation
    shapes the north rule's skew clause cares about, comparing the salted
    rewrite (functions/skew.py) against the naive plan on BOTH wall time and
    exact output equality (row count + bit_xor fingerprint over every output
    row — not a sample):

      * top-k values per key: naive window + rank filter vs
        salted_top_values.
      * exact distinct-count per key: naive count_distinct vs
        salted_distinct_count (value-hash salting, disjoint partials).
      * groupBy count (algebraic control): measured UNSALTED on purpose —
        map-side partial aggregation absorbs pure row skew.

    Walls are best-of-2 interleaved (shared noisy host); identical-output is
    a hard check. Values are ``id`` itself, so the hot key's distinct-value
    count equals its row count — the worst case for holistic per-key state.

    MEASURED FINDING (10M and 40M rows, local[32]): the NAIVE plans win both
    holistic shapes here, because Spark >=3.5 already neutralizes them —
    the rank-limit filter compiles to WindowGroupLimit with a PARTIAL pass
    before the shuffle (each map task pre-prunes to <=k rows per key, so the
    hot key never funnels; plan-verified), and count_distinct's 4-phase
    rewrite dedupes (key, value) map-side. Salting adds a shuffle each and
    measured 1.4-4.6x slower. The utilities stay for what the optimizer
    does NOT rescue — holistic per-key state beyond rank-limits (rank k >
    spark.sql.optimizer.windowGroupLimitThreshold, collect_* growth, or a
    per-key distinct set too large for one final-merge task) — but the
    engine's own hot paths deliberately use the natively-rescued shapes."""
    from great_expectations_spark.functions import skew as sk
    from pyspark.sql import Window

    n0, n1, n2 = rows // 5, rows // 10, rows // 20
    key = (
        F.when(F.col("id") < n0, F.lit(0))
        .when(F.col("id") < n0 + n1, F.lit(1))
        .when(F.col("id") < n0 + n1 + n2, F.lit(2))
        .otherwise(F.pmod(F.xxhash64(F.col("id")), F.lit(100_000)) + F.lit(3))
    )
    df = (
        spark.range(rows)
        .repartition(64)
        .select(key.alias("k"), F.col("id").alias("v"))
        .persist()
    )
    df.count()  # materialize: measure the aggregations, not the generator

    def fingerprint(out) -> tuple[int, int]:
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "bit_xor(xxhash64(" + ", ".join(out.columns) + "))"
            ).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def naive_topk():
        counts = df.groupBy("k", "v").agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy("k").orderBy(F.desc("cnt"), F.asc("v"))
        return (
            counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= 5)
            .drop("_rk")
        )

    variants = {
        "topk_naive": naive_topk,
        "topk_salted": lambda: sk.salted_top_values(df, "k", "v", k=5),
        "distinct_naive": lambda: df.groupBy("k").agg(
            F.count_distinct(F.col("v")).alias("distinct_count")
        ),
        "distinct_salted": lambda: sk.salted_distinct_count(df, "k", "v"),
        "groupby_count_unsalted": lambda: df.groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt")
        ),
    }
    walls: dict[str, float] = {}
    prints: dict[str, tuple[int, int]] = {}
    for _ in range(2):  # interleaved best-of-2
        for name, fn in variants.items():
            t0 = time.monotonic()
            fp = fingerprint(fn())
            w = time.monotonic() - t0
            walls[name] = min(walls.get(name, float("inf")), round(w, 2))
            prints[name] = fp
    df.unpersist()

    identical = (
        prints["topk_naive"] == prints["topk_salted"]
        and prints["distinct_naive"] == prints["distinct_salted"]
    )
    return {
        "trial": "skewed_key_salting",
        "rows": rows,
        "hot_key_rows": n0,
        "tail_keys": 100_000,
        "walls_s": walls,
        "topk_rows": prints["topk_naive"][0],
        "distinct_rows": prints["distinct_naive"][0],
        "salted_equals_naive": identical,
        "ok": identical,
    }


def token_budget_trial(spark: SparkSession, docs: int) -> dict:
    """token_budget_sample at 5M docs / 3 sources (Trial 4): synthetic
    (source, doc_id, n_tokens) rows — the scale path feeds a precomputed
    token_count_col, so the trial measures the sampler, not a tokenizer.
    Budgets force real selection on two sources (~40% of their total) and
    keep-everything on the third. Checks are EXACT: per-source kept tokens
    <= budget, undershoot < the source's max doc, keep-all where the budget
    exceeds the total, no unbudgeted source, no doc kept twice, and two
    same-seed runs keep the identical set."""
    from great_expectations_spark.operators.text import token_budget_sample

    base = (
        spark.range(docs)
        .repartition(64)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
            (F.lit(50) + F.col("id") % 100).alias("n_tok"),
        )
        .persist()
    )
    base.count()
    totals = {
        r["source"]: (int(r["tot"]), int(r["mx"]))
        for r in base.groupBy("source")
        .agg(F.sum("n_tok").alias("tot"), F.max("n_tok").alias("mx"))
        .collect()
    }
    budgets = {
        "src0": int(totals["src0"][0] * 0.4),
        "src1": int(totals["src1"][0] * 0.4),
        "src2": totals["src2"][0] + 1_000_000,  # keep-everything path
        # src3 unbudgeted: must not appear in the kept set
    }

    t0 = time.monotonic()
    kept = token_budget_sample(
        base, budgets, token_count_col="n_tok", seed=7
    ).persist()
    agg = {
        r["source"]: (int(r["kt"]), int(r["n"]))
        for r in kept.groupBy("source")
        .agg(F.sum("n_tok").alias("kt"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    wall = time.monotonic() - t0

    violations = []
    for s, b in budgets.items():
        tot, mx = totals[s]
        kt = agg.get(s, (0, 0))[0]
        if kt > b:
            violations.append(f"{s}: kept {kt} > budget {b}")
        if tot <= b and kt != tot:
            violations.append(f"{s}: keep-all expected {tot}, kept {kt}")
        if tot > b and b - kt >= mx:
            violations.append(f"{s}: undershoot {b - kt} >= max doc {mx}")
    foreign = kept.filter(~F.col("source").isin(list(budgets))).count()
    if foreign:
        violations.append(f"{foreign} docs from unbudgeted sources")
    dups = (
        kept.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    )
    if dups:
        violations.append(f"{dups} docs kept twice")
    kept2 = token_budget_sample(base, budgets, token_count_col="n_tok", seed=7)
    mismatch = (
        kept.select("doc_id")
        .unionByName(kept2.select("doc_id"))
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") != 2)
        .count()
    )
    if mismatch:
        violations.append(f"{mismatch} determinism mismatches")
    kept_docs = sum(n for _, n in agg.values())
    kept.unpersist()
    base.unpersist()

    return {
        "trial": "token_budget_sample",
        "docs": docs,
        "sources": 4,
        "budgeted_sources": 3,
        "kept_docs": kept_docs,
        "kept_tokens": {s: agg.get(s, (0, 0))[0] for s in budgets},
        "budgets": budgets,
        "violations": violations,
        "select_wall_s": round(wall, 2),
        "docs_per_s": int(docs / wall),
        "ok": not violations,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--clique-nodes", type=int, default=8_000_000)
    ap.add_argument("--chain-nodes", type=int, default=2_097_152)
    ap.add_argument("--chain-len", type=int, default=512)
    ap.add_argument("--docs", type=int, default=5_000_000)
    ap.add_argument("--vectors", type=int, default=5_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--budget-docs", type=int, default=5_000_000)
    ap.add_argument("--skew-rows", type=int, default=10_000_000)
    ap.add_argument("--skip-clusters", action="store_true")
    ap.add_argument("--skip-spans", action="store_true")
    ap.add_argument("--skip-ivfpq", action="store_true")
    ap.add_argument("--skip-budget", action="store_true")
    ap.add_argument("--skip-skew", action="store_true")
    args = ap.parse_args()

    spark = build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    t0 = time.monotonic()
    if not args.skip_clusters:
        r = cluster_trial(spark, args.clique_nodes, args.chain_nodes, args.chain_len)
        print(json.dumps(r))
        results.append(r)
    if not args.skip_spans:
        r = span_trial(spark, args.docs)
        print(json.dumps(r))
        results.append(r)
    if not args.skip_ivfpq:
        r = ivfpq_trial(spark, args.vectors, dim=args.dim)
        print(json.dumps(r))
        results.append(r)
    if not args.skip_budget:
        r = token_budget_trial(spark, args.budget_docs)
        print(json.dumps(r))
        results.append(r)
    if not args.skip_skew:
        r = skew_trial(spark, args.skew_rows)
        print(json.dumps(r))
        results.append(r)
    print(json.dumps({"rehearsal_total_s": round(time.monotonic() - t0, 2)}))
    spark.stop()
    return 0 if all(r["ok"] for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
