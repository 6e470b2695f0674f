"""End-to-end training-corpus cleaning: one composition of the pipeline
operators (quality filter → language filter → PII scrub → dedup →
benchmark decontamination) with a per-stage audit trail.

This is glue, not new semantics — every stage is one of the
operators/{text,dedup}.py primitives, so the whole pipeline stays a lazy
DataFrame composition: nothing executes until the caller acts on the
result, and Catalyst fuses the projection stages into the scan. Stage
counts are opt-in (``count_stages=True``; one aggregate job per enabled
stage) and omitted otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.operators import dedup as dd
from great_expectations_spark.operators import text as tx


@dataclass
class CorpusCleanResult:
    """Cleaned corpus + what each stage did. ``df`` is the final lazy
    DataFrame; ``stage_counts`` maps stage name → rows surviving it
    (populated only when ``clean_corpus(count_stages=True)``; each count is
    one Spark job)."""

    df: DataFrame
    stages: list[str] = field(default_factory=list)
    stage_counts: dict[str, int] = field(default_factory=dict)
    params: dict[str, Any] = field(default_factory=dict)
    # the cached intermediate when persist_intermediate=True, so the caller
    # can release it (result.unpersist()) once the cleaned corpus is
    # materialized — otherwise the cache stays pinned for the app lifetime
    persisted: Optional[DataFrame] = None
    # every OTHER cache the pipeline created (minhash signatures, the
    # token-budget input) — released by the same unpersist() call
    caches: list = field(default_factory=list)

    def unpersist(self) -> None:
        if self.persisted is not None:
            self.persisted.unpersist()
            self.persisted = None
        for c in self.caches:
            c.unpersist()
        self.caches = []


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: Optional[float] = 0.3,
    min_tokens: Optional[int] = 5,
    languages: Optional[list[str]] = None,
    scrub_pii: bool = False,
    dedup: Optional[str] = "exact",
    dedup_threshold: float = 0.9,
    max_dup_fraction: Optional[float] = None,
    dup_span_k: int = 8,
    benchmark: Optional[DataFrame] = None,
    max_contamination: float = 0.1,
    contamination_k: int = 8,
    token_budgets: Optional[dict] = None,
    source_col: str = "source",
    budget_seed: int = 42,
    count_stages: bool = False,
    persist_intermediate: bool = False,
) -> CorpusCleanResult:
    """Standard training-data cleaning recipe over a documents table:

    1. quality gate: ``quality_score >= min_quality`` and
       ``token_count >= min_tokens`` (one fused projection+filter);
    2. language gate: ``detect_lang in languages``;
    3. PII scrub: rewrite ``text_col`` through ``scrub_pii`` (rows kept,
       payload redacted);
    4. dedup: 'exact' (md5-normalized, keeps min id),
       'minhash' (LSH near-dup pairs → connected components → keep one
       canonical doc per cluster at ``dedup_threshold`` est-Jaccard), or
       None;
    5. span filter: drop docs whose corpus-duplicated-span token fraction
       (``duplicate_ngram_spans`` at ``dup_span_k``) exceeds
       ``max_dup_fraction`` — removes boilerplate-dominated documents that
       whole-doc dedup keeps;
    6. decontamination: drop docs whose k-gram overlap with ``benchmark``
       exceeds ``max_contamination`` (anti-join against the contaminated
       id set);
    7. training-mix sampling: ``token_budgets`` ({source: target_tokens})
       runs ``text.token_budget_sample`` over the CLEANED corpus — the
       budgets apply to what survives the gates, which is what actually
       trains (bucketed prefix sums, no per-source global window).

    Every stage is optional (None/False disables it) and shuffle-bounded;
    the only joins are the dedup semi/anti-joins and the contamination
    gram join, all bounded by corpus size (see the operator docstrings for
    the 100-TB arguments).
    """
    out = df
    stages: list[str] = []
    counts: dict[str, int] = {}

    def record(stage: str) -> None:
        stages.append(stage)
        if count_stages:
            counts[stage] = out.count()

    c = F.col(text_col)
    if min_quality is not None or min_tokens is not None:
        cond = F.lit(True)
        if min_quality is not None:
            cond = cond & (tx.quality_score(c) >= min_quality)
        if min_tokens is not None:
            cond = cond & (tx.token_count(c) >= min_tokens)
        out = out.filter(cond)
        record("quality")
    if languages:
        out = out.filter(tx.detect_lang(c).isin(list(languages)))
        record("language")
    if scrub_pii:
        out = out.withColumn(text_col, tx.scrub_pii(c))
        record("pii_scrub")
    # dedup / span-filter / decontamination FORK the lineage (the corpus
    # feeds both the pair/span/overlap computation and the final
    # semi/anti-join), so without a persist Spark recomputes the gate
    # stages once per fork. Opt-in: correct either way, and at scale the
    # caller chooses storage level / checkpointing policy.
    forks = (dedup is not None) + (max_dup_fraction is not None) + (
        benchmark is not None
    ) + (token_budgets is not None)
    persisted = None
    caches: list = []
    if persist_intermediate and forks:
        out = persisted = out.persist()
        record("persist")
    if dedup == "exact":
        out = dd.exact_dedup(out, id_col=id_col, text_col=text_col)
        record("dedup_exact")
    elif dedup == "minhash":
        # inline minhash_dedup_pairs so the signature cache it needs (sigs
        # feed BOTH the band join and the est-jaccard verify) is tracked in
        # ``caches`` and released by result.unpersist() — the packaged
        # helper pins its internal persist for the app lifetime
        sigs = dd.minhash_signatures(out, id_col, text_col).persist()
        caches.append(sigs)
        cands = dd.minhash_lsh_candidates(sigs, id_col, bands=16, rows_per_band=4)
        pairs = dd.minhash_estimate_jaccard(sigs, cands, id_col).filter(
            F.col("est_jaccard") >= dedup_threshold
        )
        out = dd.dedup_by_clusters(out, pairs, id_col=id_col)
        record("dedup_minhash")
    elif dedup is not None:
        raise ValueError(f"unknown dedup strategy: {dedup!r}")
    if max_dup_fraction is not None:
        spans = dd.duplicate_ngram_spans(
            out, id_col=id_col, text_col=text_col, k=dup_span_k
        )
        over = (
            dd.duplicated_token_stats(out, spans, id_col=id_col, text_col=text_col)
            .filter(F.col("dup_fraction") > max_dup_fraction)
            .select(id_col)
        )
        out = out.join(over, on=id_col, how="left_anti")
        record("span_filter")
    if benchmark is not None:
        contaminated = (
            dd.benchmark_contamination(
                out, benchmark, id_col=id_col, text_col=text_col, k=contamination_k
            )
            .filter(F.col("contamination_fraction") > max_contamination)
            .select(id_col)
        )
        out = out.join(contaminated, on=id_col, how="left_anti")
        record("decontaminate")
    if token_budgets is not None:
        if persist_intermediate and forks > 1:
            # token_budget_sample makes three passes over its input; the
            # opt-in persist point sits ABOVE the dedup/span/decontam
            # joins, so each pass would re-run them — cache the cleaned
            # corpus at this boundary too (released by result.unpersist())
            out = out.persist()
            caches.append(out)
        out = tx.token_budget_sample(
            out,
            token_budgets,
            source_col=source_col,
            id_col=id_col,
            text_col=text_col,
            seed=budget_seed,
        )
        record("token_budget")

    return CorpusCleanResult(
        df=out,
        stages=stages,
        stage_counts=counts,
        persisted=persisted,
        caches=caches,
        params={
            "min_quality": min_quality,
            "min_tokens": min_tokens,
            "languages": list(languages) if languages else None,
            "scrub_pii": scrub_pii,
            "dedup": dedup,
            "dedup_threshold": dedup_threshold,
            "max_dup_fraction": max_dup_fraction,
            "dup_span_k": dup_span_k if max_dup_fraction is not None else None,
            "max_contamination": max_contamination if benchmark is not None else None,
            "contamination_k": contamination_k,
            "token_budgets": dict(token_budgets) if token_budgets else None,
        },
    )


def clean_image_corpus(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    phash_col: Optional[str] = "phash",
    drop_undecodable: bool = True,
    dedup_max_hamming: Optional[int] = 4,
    benchmark: Optional[DataFrame] = None,
    bench_phash_col: str = "phash",
    benchmark_max_hamming: int = 8,
    count_stages: bool = False,
    persist_intermediate: bool = False,
) -> CorpusCleanResult:
    """Image-payload counterpart of ``clean_corpus`` over an image+caption
    table (image_id, bytes, ..., phash):

    1. decodability gate: drop rows whose payload fails the codec (one
       Arrow decode per image; skipped when ``drop_undecodable=False``).
       When ``phash_col`` is None the recomputed phash from this decode is
       used downstream, so the stage also runs (decode is what produces it);
    2. perceptual dedup: phash near-dup pairs within ``dedup_max_hamming``
       → connected components → keep the min-id canonical image per
       cluster (pigeonhole-complete banding, no decode — stored phash);
    3. decontamination: drop images whose phash is within
       ``benchmark_max_hamming`` of any benchmark image
       (``image_benchmark_contamination``).

    Bytes are read exactly once (stage 1) and only if that stage runs;
    dedup and decontamination work off the phash column alone.
    """
    from great_expectations_spark.operators.images import (
        enrich_images,
        image_benchmark_contamination,
        image_near_duplicate_pairs,
    )

    out = df
    stages: list[str] = []
    counts: dict[str, int] = {}

    def record(stage: str) -> None:
        stages.append(stage)
        if count_stages:
            counts[stage] = out.count()

    phash_requested = phash_col
    if drop_undecodable or phash_col is None:
        # single-file inputs decode on one core otherwise (the Arrow decode
        # is the most expensive stage of this pipeline)
        enriched = enrich_images(
            tx.ensure_parallelism(out, id_col), bytes_col=bytes_col
        )
        if drop_undecodable:
            enriched = enriched.filter(F.col("_decoded.ok"))
        if phash_col is None:
            phash_col = "_recomputed_phash"
            enriched = enriched.withColumn(phash_col, F.col("_decoded.phash"))
        out = enriched.drop("_decoded")
        record("decodable")

    forks = (dedup_max_hamming is not None) + (benchmark is not None)
    persisted = None
    if persist_intermediate and forks:
        out = persisted = out.persist()
        record("persist")

    if dedup_max_hamming is not None:
        pairs = image_near_duplicate_pairs(
            out, id_col=id_col, phash_col=phash_col, max_hamming=dedup_max_hamming
        )
        out = dd.dedup_by_clusters(
            out, pairs, id_col=id_col, id_a="image_a", id_b="image_b"
        )
        record("dedup_phash")

    if benchmark is not None:
        contaminated = image_benchmark_contamination(
            out,
            benchmark,
            id_col=id_col,
            phash_col=phash_col,
            bench_phash_col=bench_phash_col,
            max_hamming=benchmark_max_hamming,
        ).select(id_col)
        out = out.join(contaminated, on=id_col, how="left_anti")
        record("decontaminate")

    if phash_requested is None:
        # the recomputed phash is pipeline-internal scaffolding — the
        # returned corpus keeps the caller's input schema
        out = out.drop("_recomputed_phash")

    return CorpusCleanResult(
        df=out,
        stages=stages,
        stage_counts=counts,
        persisted=persisted,
        params={
            "drop_undecodable": drop_undecodable,
            "phash_col": phash_requested,
            "dedup_max_hamming": dedup_max_hamming,
            "benchmark_max_hamming": (
                benchmark_max_hamming if benchmark is not None else None
            ),
        },
    )
