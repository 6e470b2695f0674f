"""Text-analysis operators for training-data pipelines over a documents table
(doc_id, text, ...). All JVM-side Catalyst expressions (split/regexp/aggregate
higher-order functions) — no Python UDFs anywhere in this module.

These are first-class pipeline ops (not reference parity — the reference is
payload-agnostic): token counting, quality scoring, n-gram language ID,
content fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def ensure_parallelism(df: DataFrame, key: str) -> DataFrame:
    """Small inputs often arrive as one or two file partitions — every
    CPU-heavy operator would then run on one core. Repartition by the key
    up to default parallelism when the input has fewer partitions (no-op on
    well-partitioned production tables). Lives here (the leaf module) so
    text and dedup operators share one definition without an import cycle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key)
    return df


# --- tokenization --------------------------------------------------------


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    t = F.split(F.trim(col), r"\s+")
    return F.when(F.trim(col) == "", F.array()).otherwise(t)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: split on the word/punct boundary regex
    GPT-style BPE vocabularies roughly follow (letters runs, digit runs,
    punctuation singles). Deterministic, JVM-side regexp_count."""
    return (
        F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    )


def char_count(col: Column) -> Column:
    return F.length(col)


# --- quality scoring -----------------------------------------------------

_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "was", "on", "are", "as", "with", "at", "be", "this", "have", "from",
]


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    return F.when(n > 0, sw.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.regexp_count(col, F.lit(r"[^\w\s]"))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Heuristic document quality ∈ [0,1]: length band + sane word length +
    low punctuation density. Deterministic formula, SQL-expressible (the
    DuckDB oracle mirrors it term for term)."""
    n_chars = F.length(col).cast("double")
    len_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    mwl = mean_word_length(col)
    wl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    p_score = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    return (len_score + wl_score + p_score) / F.lit(3.0)


# --- language ID ---------------------------------------------------------

# tiny marker-word inventories per language (deterministic heuristic)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "fr": ["le", "la", "les", "des", "est", "dans", "une", "pour"],
    "de": ["der", "die", "das", "und", "ist", "mit", "von", "nicht"],
}


def lang_scores(col: Column) -> Column:
    """Struct of per-language marker-hit counts."""
    toks = tokens(F.lower(col))
    fields = [
        F.size(F.filter(toks, lambda t: t.isin(m))).alias(lang)
        for lang, m in LANG_MARKERS.items()
    ]
    return F.struct(*fields)


def detect_lang(col: Column) -> Column:
    """argmax language by marker count; 'und' when no markers hit.

    Ties break by LANG_MARKERS order (en > es > fr > de)."""
    s = lang_scores(col)
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_n = s[langs[0]]
    for lang in langs[1:]:
        cond = s[lang] > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, s[lang]).otherwise(best_n)
    return F.when(best_n > 0, best).otherwise(F.lit("und"))


# --- fingerprinting ------------------------------------------------------


def normalize_text(col: Column) -> Column:
    """lower + collapse whitespace — canonical form for dedup."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of normalized text (exact-dup key; stable
    across engines so an external oracle reproduces it)."""
    return F.md5(normalize_text(col))


def rolling_fingerprints(
    col: Column, k: int = 50, stride: int = 25, normalized: bool = False
) -> Column:
    """Array of window fingerprints (rolling-hash-style document shingles at
    character granularity): md5 of each k-char window every `stride` chars.
    Native: sequence + transform + substr — no Python.

    Hot paths: materialize ``normalize_text`` as a column first and pass
    ``normalized=True`` — expressions referenced inside the transform lambda
    re-evaluate per element."""
    norm = col if normalized else normalize_text(col)
    n = F.length(norm)
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(k) + 1, F.lit(1)), F.lit(stride))
    return F.transform(starts, lambda s: F.md5(norm.substr(s, F.lit(k))))


# --- table-level convenience ---------------------------------------------


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → per-doc analysis columns (single projection, one scan)."""
    c = F.col(text_col)
    return df.select(
        "*",
        char_count(c).alias("n_chars_computed"),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        stopword_ratio(c).alias("stopword_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        mean_word_length(c).alias("mean_word_len"),
        quality_score(c).alias("quality"),
        detect_lang(c).alias("lang_detected"),
        fingerprint(c).alias("fp"),
        pii_total(c).alias("pii_hits"),
    )


# --- PII detection / scrubbing -------------------------------------------

# Standard public detection patterns (Java regex; all JVM-side regexp_count/
# regexp_replace — no Python in the hot path). Detection-grade, not
# validation-grade: a matched "credit_card" is 13-19 digits in card
# grouping, not a Luhn-checked number. Order matters for scrubbing:
# longer/more-specific number shapes run before the generic phone shape so
# a card number is not half-eaten by the phone pattern first.
# Version tag surfaced in expect_column_values_to_not_contain_pii EVR
# details (details.patterns_version) so downstream consumers quoting the
# expectation as a compliance gate can see exactly WHICH pattern inventory
# was scanned. Bump when PII_PATTERNS changes shape or membership.
PII_PATTERNS_VERSION = "ges-pii/1.1-detection-grade"

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "credit_card": r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{1,7}\b",
    "phone": r"(?:\+\d{1,3}[ .-]?)?(?:\(\d{3}\)|\b\d{3})[ .-]\d{3}[ .-]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_counts(col: Column, pii_types: list[str] | None = None) -> Column:
    """struct<email:int, ssn:int, ...> of per-type PII match counts."""
    types = list(PII_PATTERNS) if pii_types is None else list(pii_types)
    if not types:
        # an empty struct / a None fold result would silently degrade to a
        # Python bool downstream (e.g. pii_total(...) == 0 → literal False)
        raise ValueError("pii_types must be non-empty")
    unknown = set(types) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown pii_types: {sorted(unknown)}")
    return F.struct(
        *[F.regexp_count(col, F.lit(PII_PATTERNS[t])).alias(t) for t in types]
    )


def pii_total(col: Column, pii_types: list[str] | None = None) -> Column:
    """Total PII matches across the selected types (0 for clean text).

    Counts can overlap between types (an SSN-shaped string inside a longer
    digit run may also match the card pattern) — suitable for a
    contains-PII-or-not gate, not an exact entity census."""
    types = list(PII_PATTERNS) if pii_types is None else list(pii_types)
    counts = pii_counts(col, types)
    total = None
    for t in types:
        c = counts.getField(t)
        total = c if total is None else total + c
    return total


def scrub_pii(
    col: Column,
    replacement: str = "[PII]",
    pii_types: list[str] | None = None,
) -> Column:
    """Replace every PII match with ``replacement``, applying patterns in
    PII_PATTERNS order (specific digit shapes before the generic phone
    shape). Chained JVM regexp_replace — one projection, no UDFs."""
    unknown = (set(pii_types) - set(PII_PATTERNS)) if pii_types is not None else set()
    if unknown:
        raise ValueError(f"unknown pii_types: {sorted(unknown)}")
    types = [t for t in PII_PATTERNS if pii_types is None or t in set(pii_types)]
    if not types:
        raise ValueError("pii_types must be non-empty")
    out = col
    for t in types:
        out = F.regexp_replace(out, PII_PATTERNS[t], replacement)
    return out


# --- URL canonicalization -------------------------------------------------

# Tracking query parameters stripped during canonicalization (public
# convention: UTM campaign tags + common click ids).
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "ref",
)


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL for dedup/grouping: lowercase scheme+host,
    default ports and fragments stripped, tracking query params removed,
    remaining query left in original order, trailing slash on the bare root
    path dropped. Pure JVM regexp/string ops — detection-grade
    normalization (no IDN/percent-encoding resolution)."""
    u = F.trim(col)
    # lowercase scheme://host[:port] prefix only (path/query are case-sensitive)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
    )
    # fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # default ports — scheme-specific: only :80 is default for http and
    # :443 for https (http://h:443 and https://h:80 are DIFFERENT
    # resources and must not merge under canonicalization)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(?=[/?#]|$)", r"$1")
    # tracking params: drop "param=value&" (keeping the preceding ?/& for
    # the successor) or a trailing "param=value", then tidy the leftover
    # separator a trailing removal can strand
    tracking = "|".join(TRACKING_PARAMS)
    u = F.regexp_replace(u, r"(?<=[?&])(?:" + tracking + r")=[^&#]*&", "")
    u = F.regexp_replace(u, r"(?<=[?&])(?:" + tracking + r")=[^&#]*$", "")
    u = F.regexp_replace(u, r"[?&]$", "")
    # bare-path trailing slash (https://x.com/ -> https://x.com)
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", r"$1")
    return u


def url_host(col: Column) -> Column:
    """Lowercased host (registrable-domain analysis, per-site caps)."""
    return F.lower(F.regexp_extract(F.trim(col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))


def top_ngrams(
    df: DataFrame,
    n: int = 1,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level most-frequent token n-grams: (ngram, occurrences),
    count-descending then ngram-ascending, limited to k.

    Unigrams are one explode + count groupBy (map-side combine). For n>1
    the gram strings come from n-1 ``lead`` window columns over the
    doc-exploded tokens (partition-local, codegen'd concat) — never a
    per-element transform lambda. The final top-k is a
    TakeOrderedAndProject (per-partition heaps), not a global sort."""
    if n < 1:
        raise ValueError("n must be >= 1")
    c = F.col(text_col)
    toks = ensure_parallelism(df.select(id_col, text_col), id_col).select(
        F.col(id_col), F.posexplode(tokens(normalize_text(c))).alias("pos", "tok")
    )
    if n == 1:
        grams = toks.select(F.col("tok").alias("ngram"))
    else:
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy("pos")
        leads = [F.col("tok")] + [
            F.lead("tok", j).over(w).alias(f"_t{j}") for j in range(1, n)
        ]
        grams = (
            toks.select(F.col(id_col), F.col("pos"), *leads)
            .filter(F.col(f"_t{n - 1}").isNotNull())
            .select(
                F.concat_ws(
                    " ", F.col("tok"), *[F.col(f"_t{j}") for j in range(1, n)]
                ).alias("ngram")
            )
        )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("ngram"))
        .limit(k)
    )


def is_valid_url(col: Column, schemes: list[str] | None = None) -> Column:
    """True where the value parses as an absolute URL (scheme://host with
    optional path/query/fragment, no embedded whitespace). Detection-grade
    single-regex check, JVM-side; ``schemes`` restricts the accepted scheme
    list (e.g. ["http", "https"]), matched case-insensitively per RFC 3986
    §3.1 (HTTPS:// is the https scheme)."""
    if schemes is not None:
        if not schemes:
            raise ValueError("schemes must be non-empty")
        import re as _re

        # escape metacharacters: a scheme like "git+ssh" must not turn its
        # '+' into a quantifier (Java regex accepts these escapes too)
        scheme = "(?i:" + "|".join(_re.escape(x) for x in schemes) + ")"
    else:
        scheme = "[A-Za-z][A-Za-z0-9+.-]*"
    return col.rlike(r"^" + scheme + r"://[^\s/?#]+(?:[/?#]\S*)?$")


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Assign documents to training packs of at most ``max_tokens`` tokens
    (sequence packing for LLM pre-training batches — public practice, e.g.
    the T5/GPT packing recipes). Returns
    (id_col, n_tokens, pack_id:string, pack_pos:int).

    Docs longer than ``max_tokens`` get a singleton pack (the downstream
    tokenizer truncates); order within a bucket is id-ascending, so output
    is deterministic.

    Scale shape: packing is inherently sequential, so it runs greedily
    WITHIN hash buckets (``num_buckets`` defaults to 4× default
    parallelism) via one Arrow ``applyInPandas`` pass — each bucket holds
    only (id, n_tokens) pairs, ~16 bytes/doc, so even trillion-token
    corpora bucket comfortably; no global ordering, no driver collect.
    Cross-bucket packing efficiency loss is at most one under-filled pack
    per bucket. Token counts ride a codegen'd projection
    (``token_count``) unless a precomputed ``token_count_col`` is given.
    """
    import pandas as pd

    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = spark.sparkContext.defaultParallelism * 4
    n_tok = (
        F.col(token_count_col)
        if token_count_col is not None
        else token_count(F.col(text_col))
    )
    # NULL/negative counts pack as 0 tokens (a NULL text has none) — a
    # nullable long reaches Arrow as float64 with NaN and int(NaN) would
    # crash the kernel mid-stage
    n_tok = F.greatest(F.lit(0), F.coalesce(n_tok.cast("long"), F.lit(0)))
    src = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).alias("_bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(by=[id_col], kind="mergesort").reset_index(drop=True)
        bucket = int(pdf["_bucket"].iloc[0]) if len(pdf) else 0
        pack_ids, pack_pos = [], []
        cur, used, pos = 0, 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            # membership (pos), not token usage, gates the new pack: a
            # zero-token doc leaves used == 0, and an oversize doc must not
            # join its pack (it is only allowed to be alone in one)
            if pos > 0 and used + n > max_tokens:
                cur, used, pos = cur + 1, 0, 0
            pack_ids.append(f"{bucket}-{cur}")
            pack_pos.append(pos)
            used += n
            pos += 1
            if used >= max_tokens:
                cur, used, pos = cur + 1, 0, 0
        out = pdf[[id_col, "n_tokens"]].copy()
        out["pack_id"] = pack_ids
        out["pack_pos"] = pd.Series(pack_pos, dtype="int32")
        return out

    schema = f"{id_col} {dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[id_col]}, n_tokens long, pack_id string, pack_pos int"
    return src.groupBy("_bucket").applyInPandas(pack, schema)


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    seed: int = 42,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic per-source token-budget subsample — the training-mix
    step: given target token ``budgets`` per source ({"web": 10**9,
    "code": 10**8}), keep a seeded pseudo-random subset of each source
    whose token total is as close to the budget as possible WITHOUT
    exceeding it (undershoot < one document). Sources absent from
    ``budgets`` are dropped — the mix is explicit. Docs with NULL source,
    NULL id, or NULL/negative token counts are excluded.

    Selection order is ``xxhash64(id, seed)`` — a uniform, reproducible
    shuffle of each source, so the kept subset is an unbiased sample and
    two runs with the same seed pick identical documents.

    Scale shape (NO global ordering): a per-source running total would be
    a window over ONE partition per source — the classic 100-TB
    bottleneck. Instead docs hash into ``n_buckets`` buckets per source;
    one bundled agg computes per-(source, bucket) token sums; the DRIVER
    prefix-sums the ≤ sources × n_buckets summary rows (bounded, data-size
    independent) and decides: buckets fully inside the budget pass via one
    broadcast semi-join, and ALL straddling buckets (at most one per
    source, ~1/n_buckets of it each) resolve together in one broadcast
    join + one cumulative-sum window partitioned by (source, bucket).
    Three passes over the input total — summary, full-bucket, straddler —
    regardless of the number of sources; persist ``df`` upstream to trade
    memory for the repeated scans.
    """
    if not budgets:
        raise ValueError("budgets must name at least one source")
    for s, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {s!r} must be >= 0")
    from pyspark.sql import Window

    n_tok = (
        F.col(token_count_col)
        if token_count_col is not None
        else token_count(F.col(text_col))
    )
    base = (
        ensure_parallelism(
            df.filter(
                F.col(source_col).isin(list(budgets))
                & F.col(id_col).isNotNull()
            ),
            id_col,
        )
        .withColumn("_tb_tok", n_tok.cast("long"))
        .filter(F.col("_tb_tok").isNotNull() & (F.col("_tb_tok") >= 0))
        .withColumn("_tb_h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .withColumn("_tb_b", F.pmod(F.col("_tb_h"), F.lit(n_buckets)))
    )
    summary = (
        base.groupBy(source_col, "_tb_b")
        .agg(F.sum("_tb_tok").alias("_t"))
        .collect()
    )
    by_source: dict = {}
    for r in summary:
        by_source.setdefault(r[source_col], []).append((int(r["_tb_b"]), int(r["_t"])))
    full_rows: list[tuple] = []  # (source, bucket)
    partial: list[tuple] = []  # (source, bucket, remaining_tokens)
    for s, buckets in by_source.items():
        remaining = int(budgets[s])
        for b, t in sorted(buckets):
            if t <= remaining:
                full_rows.append((s, b))
                remaining -= t
            else:
                if remaining > 0:
                    partial.append((s, b, remaining))
                break  # later buckets cannot fit before the straddler
    spark = df.sparkSession
    keep = base.limit(0)
    if full_rows:
        full_df = spark.createDataFrame(
            full_rows, f"{source_col} string, _tb_b long"
        )
        keep = base.join(F.broadcast(full_df), [source_col, "_tb_b"], "left_semi")
    if partial:
        # ONE branch for every straddling bucket (a per-source union would
        # rescan the input once per source): broadcast-join the (source,
        # bucket, remaining) decisions, cumulative-sum within each tiny
        # (source, bucket) window partition (~1/n_buckets of its source)
        part_df = spark.createDataFrame(
            partial, f"{source_col} string, _tb_b long, _tb_rem long"
        )
        w = (
            Window.partitionBy(source_col, "_tb_b")
            .orderBy("_tb_h", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        frag = (
            base.join(F.broadcast(part_df), [source_col, "_tb_b"])
            .withColumn("_tb_cum", F.sum("_tb_tok").over(w))
            .filter(F.col("_tb_cum") <= F.col("_tb_rem"))
            .drop("_tb_cum", "_tb_rem")
        )
        keep = keep.unionByName(frag)
    return keep.drop("_tb_tok", "_tb_h", "_tb_b")
