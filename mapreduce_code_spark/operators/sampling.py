"""Deterministic sampling / dataset-split operators for training-data
pipelines.

A training corpus needs splits and samples that are (a) reproducible
across runs, engines, and cluster layouts, (b) stable under data growth
— adding new documents must never reassign old ones — and (c) free of
coordination (no global sort, no RNG state). All three fall out of
hashing the KEY instead of rolling dice: ``bucket(key) = md5-derived
60-bit integer mod 10_000`` is a pure function of the key, uniform
across buckets, and identical in Spark and DuckDB (so every operator
here is exactly SQL-oracle-able — no statistical "close enough").

Contrast with ``DataFrame.sample``/``randomSplit``: those draw from a
seeded RNG over the *partition layout*, so the same call on the same
data can select different rows after a repartition — exactly the
instability a training pipeline can't have.

Scale shape: every operator is a narrow map (hash + compare) — no
shuffle, no driver state; the split/sample predicate pushes into the
scan pipeline and composes with any downstream plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000  # permyriad resolution: thresholds are basis points


def key_bucket(col, salt: str = "") -> F.Column:
    """Uniform bucket in [0, 10000) from a key column: first 15 md5 hex
    chars (60 bits, fits BIGINT in both engines) mod 10_000.

    ``salt`` makes buckets for different PURPOSES independent: without
    it, composing two threshold-keep operators (sample then split) would
    select by the SAME bucket, so e.g. a 20% sample split 90/10 would
    put HALF the sample in 'val' instead of 10% — every distinct
    decision must hash a distinct salted key. Portable to DuckDB as
    ``('0x' || substr(md5('<salt>|' || CAST(k AS VARCHAR)), 1, 15))
    ::BIGINT % 10000``."""
    key = col.cast("string")
    if salt:
        key = F.concat(F.lit(salt + "|"), key)
    return (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
        % BUCKETS
    )


def _bucket_sql(key: str, salt: str = "") -> str:
    expr = f"CAST({key} AS VARCHAR)"
    if salt:
        expr = f"'{salt}|' || {expr}"
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT % 10000"


def train_val_split(
    documents: DataFrame, val_bp: int = 1000, key: str = "doc_id"
) -> DataFrame:
    """Assign every document to 'train' or 'val' by key hash:
    ``(doc_id, bucket, split)`` with ``val_bp`` basis points (default
    10%) going to 'val'. The assignment is a pure function of the key —
    rerunning, reshuffling, or appending data never moves a document
    across the split (the leakage guarantee fine-tuning pipelines
    need).

    ``key`` names the hashed column; pass a GROUP column (e.g.
    ``source``) for a group-aware split: every row of a group hashes
    identically, so correlated near-duplicates inside a group (same
    domain, same crawl seed) can never straddle the boundary — the
    group-leakage guard. Still a narrow per-row map: no shuffle, no
    group materialization."""
    b = key_bucket(F.col(key), salt="split")
    return documents.select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < val_bp, "val").otherwise("train").alias("split"),
    )


def train_val_split_sql(val_bp: int = 1000) -> str:
    b = _bucket_sql("doc_id", salt="split")
    return f"""
SELECT doc_id, {b} AS bucket,
       CASE WHEN {b} < {val_bp} THEN 'val' ELSE 'train' END AS split
FROM documents
"""


# Per-language sampling rates in basis points: downsample the dominant
# language, keep rarer ones at full rate — the standard rebalancing move
# for multilingual training mixes. Languages not listed fall back to
# DEFAULT_RATE_BP.
STRATA_RATES_BP = {"en": 2000, "de": 5000, "fr": 5000, "es": 5000}
DEFAULT_RATE_BP = 10_000  # keep everything for unlisted (rare) strata


def stratified_sample(
    documents: DataFrame,
    rates_bp: dict[str, int] | None = None,
    default_bp: int = DEFAULT_RATE_BP,
) -> DataFrame:
    """Deterministic per-stratum sample over the ``lang`` column:
    ``(doc_id, lang, bucket)`` for the kept documents. Each stratum keeps
    keys whose bucket falls below its rate, so a document's fate depends
    only on (its key, its stratum's rate) — growing a stratum or adding
    strata never resamples existing rows, and nested rates are monotone
    (a 20% sample is a superset of a 10% sample of the same stratum)."""
    rates = rates_bp if rates_bp is not None else STRATA_RATES_BP
    b = key_bucket(F.col("doc_id"), salt="sample")
    threshold = F.lit(default_bp)
    for lang, bp in sorted(rates.items()):
        threshold = F.when(F.col("lang") == lang, bp).otherwise(threshold)
    return (
        documents.select("doc_id", "lang", b.alias("bucket"))
        .filter(F.col("bucket") < threshold)
    )


def pack_documents(
    documents: DataFrame, budget_tokens: int = 2048, n_shards: int = 8
) -> DataFrame:
    """Deterministic sequence packing (concat-then-chunk): lay documents
    end-to-end in doc_id order and cut packs every ``budget_tokens``
    tokens — the batch-construction step of a pretraining pipeline.
    Returns ``(doc_id, shard, n_tokens, start_offset, pack_id,
    offset_in_pack)``.

    Packing is inherently sequential, which is why it's SHARDED: the
    running offset is a window sum partitioned by a hash shard of
    doc_id, so each shard packs independently and in parallel — a global
    ORDER BY would funnel 100 TB through one task. Shard count is the
    parallelism knob; assignments are pure functions of (doc_id, text),
    so the same corpus packs identically on any cluster layout.
    """
    n_tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    shard = key_bucket(F.col("doc_id"), salt="shard") % n_shards
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = documents.select(
        "doc_id", shard.alias("shard"), n_tok.alias("n_tokens")
    )
    off = base.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return off.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {budget_tokens}").alias("pack_id"),
        (F.col("start_offset") % budget_tokens).alias("offset_in_pack"),
    )


def pack_documents_sql(budget_tokens: int = 2048, n_shards: int = 8) -> str:
    b = _bucket_sql("doc_id", salt="shard")
    return f"""
WITH base AS (
  SELECT doc_id, {b} % {n_shards} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), off AS (
  SELECT *, CAST(COALESCE(sum(n_tokens) OVER (
      PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start_offset
  FROM base
)
SELECT doc_id, shard, n_tokens, start_offset,
       start_offset // {budget_tokens} AS pack_id,
       start_offset % {budget_tokens} AS offset_in_pack
FROM off
"""


def chunk_documents(
    documents: DataFrame, size: int = 32, stride: int = 24
) -> DataFrame:
    """Sliding-window token chunking with overlap — the context-window
    preparation step of a pretraining/fine-tuning pipeline (cut each
    document into ``size``-word chunks every ``stride`` words, so
    consecutive chunks overlap by ``size - stride`` words and no token
    is dropped at a hard boundary). Returns ``(doc_id, chunk_id,
    start_word, chunk_words, chunk_text)``; a document shorter than
    ``size`` words yields exactly one (whole-document) chunk.

    Chunk count and content are pure functions of the text (integer
    arithmetic only), so the op is exactly SQL-oracle-able and stable
    across layouts. Scale shape: one narrow map — split, an in-row
    ``sequence``/``transform`` explode, and slices; no shuffle, no
    state, and the per-row blowup is bounded by ``n_words / stride``.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        # stride > size leaves every (start+size, next start) word range
        # in no chunk AND the chunk-count formula emits an empty
        # past-the-end tail chunk — refuse the degenerate geometry
        # instead of silently dropping tokens
        raise ValueError("stride must be <= size (chunks must tile or overlap)")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("bigint")
    n_chunks = F.when(n_words <= size, F.lit(1).cast("bigint")).otherwise(
        F.expr(f"(size(split(text, ' ')) - {size} + {stride - 1}) div {stride}")
        + 1
    )
    base = documents.select(
        "doc_id", words.alias("w"), n_words.alias("n_words"),
        n_chunks.alias("n_chunks"),
    )
    ch = base.select(
        "doc_id",
        "n_words",
        "w",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
            "chunk_id"
        ),
    )
    start = F.col("chunk_id") * stride
    return ch.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("start_word"),
        F.least(F.lit(size).cast("bigint"), F.col("n_words") - start).alias(
            "chunk_words"
        ),
        F.concat_ws(
            " ", F.slice(F.col("w"), (start + 1).cast("int"), size)
        ).alias("chunk_text"),
    )


def chunk_documents_sql(size: int = 32, stride: int = 24) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n_words
  FROM documents
), ch AS (
  SELECT doc_id, n_words, w,
         unnest(range(CASE WHEN n_words <= {size} THEN 1
                           ELSE (n_words - {size} + {stride - 1}) // {stride} + 1
                      END)) AS chunk_id
  FROM base
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {stride} AS BIGINT) AS start_word,
       CAST(least({size}, n_words - chunk_id * {stride}) AS BIGINT)
         AS chunk_words,
       array_to_string(
         list_slice(w, chunk_id * {stride} + 1, chunk_id * {stride} + {size}),
         ' ') AS chunk_text
FROM ch
"""


def source_cap_sample(documents: DataFrame, cap: int = 20) -> DataFrame:
    """Per-source document cap — domain balancing (the CCNet/RefinedWeb
    move: no single site/domain may dominate the training mix). Keeps at
    most ``cap`` documents per ``source``, chosen by hash priority
    (salted bucket of doc_id) with doc_id as the tiebreak, so the kept
    set is a pure function of the data: stable across runs and layouts,
    and adding documents to a source can only displace hash-lower
    priorities, never reshuffle the whole selection. Returns ``(doc_id,
    source, priority, rk)`` for kept documents.

    Scale shape: one shuffle keyed on ``source``. The rank filter
    compiles to Spark's WindowGroupLimit, which prunes to the per-source
    top-``cap`` BEFORE the exchange on every map task — a hot domain
    ships ``cap`` rows per input partition, not its full row count, so
    the classic web-crawl skew (one domain = half the corpus) never
    funnels through one reducer.
    """
    pri = key_bucket(F.col("doc_id"), salt="srccap")
    w = Window.partitionBy("source").orderBy("priority", "doc_id")
    return (
        documents.select("doc_id", "source", pri.alias("priority"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= cap)
    )


def source_cap_sample_sql(cap: int = 20) -> str:
    b = _bucket_sql("doc_id", salt="srccap")
    return f"""
WITH p AS (
  SELECT doc_id, source, {b} AS priority FROM documents
), r AS (
  SELECT doc_id, source, priority,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY priority, doc_id) AS BIGINT) AS rk
  FROM p
)
SELECT doc_id, source, priority, rk FROM r WHERE rk <= {cap}
"""


def quality_weighted_sample(
    documents: DataFrame, max_rate_bp: int = 8000
) -> DataFrame:
    """Quality-weighted deterministic sample: each document's keep rate
    is ``quality · max_rate_bp`` basis points (quality ∈ {0, ¼, ½, ¾, 1}
    from ``functions.text.quality_score`` — exact integer indicators),
    so high-quality documents are kept proportionally more often — the
    curation pipeline's soft quality gate, with the same layout/growth
    stability as every hash-keyed sample here. Returns ``(doc_id, lang,
    quality, bucket)`` for kept documents."""
    from mapreduce_code_spark.functions.text import quality_score

    q = quality_score(documents).select("doc_id", "quality")
    b = key_bucket(F.col("doc_id"), salt="qsample")
    threshold = F.floor(F.col("quality") * max_rate_bp).cast("bigint")
    return (
        documents.select("doc_id", "lang", b.alias("bucket"))
        .join(q, "doc_id")
        .filter(F.col("bucket") < threshold)
        .select("doc_id", "lang", "quality", "bucket")
    )


def quality_weighted_sample_sql(max_rate_bp: int = 8000) -> str:
    from mapreduce_code_spark.functions.text import STOPWORDS_EN

    stop = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    b = _bucket_sql("doc_id", salt="qsample")
    return f"""
WITH s AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) AS n_uniq,
         len(list_filter(string_split(text, ' '), w -> w IN ({stop})))
           AS n_stop,
         length(text) AS n_chars
  FROM documents
), q AS (
  SELECT doc_id, lang,
         (CASE WHEN n_words >= 20 AND n_words <= 2000 THEN 1 ELSE 0 END
          + CASE WHEN n_chars / n_words >= 3.0 AND n_chars / n_words <= 12.0
                 THEN 1 ELSE 0 END
          + CASE WHEN n_stop / n_words >= 0.05 AND n_stop / n_words <= 0.6
                 THEN 1 ELSE 0 END
          + CASE WHEN n_uniq * 2 >= n_words THEN 1 ELSE 0 END) / 4.0
           AS quality
  FROM s
)
SELECT doc_id, lang, quality, {b} AS bucket
FROM q
WHERE {b} < CAST(floor(quality * {max_rate_bp}) AS BIGINT)
"""


def stratified_sample_sql(
    rates_bp: dict[str, int] | None = None,
    default_bp: int = DEFAULT_RATE_BP,
) -> str:
    rates = rates_bp if rates_bp is not None else STRATA_RATES_BP
    b = _bucket_sql("doc_id", salt="sample")
    whens = " ".join(
        f"WHEN '{lang}' THEN {bp}" for lang, bp in sorted(rates.items())
    )
    return f"""
SELECT doc_id, lang, {b} AS bucket
FROM documents
WHERE {b} < CASE lang {whens} ELSE {default_bp} END
"""


def temperature_mix_sample(documents: DataFrame, frac: float = 0.5) -> DataFrame:
    """Temperature-flattened source mixture (the ``n^alpha`` reweighting
    LLM mixes use to keep dominant sources from drowning rare ones; this
    is the alpha = 0.5 member, whose per-source keep rate is
    ``frac · sqrt(N / n_s)`` capped at 1 — rare sources kept whole,
    dominant ones downsampled toward sqrt-proportionality). Returns the
    kept ``(doc_id, source, bucket, threshold)`` rows.

    alpha is pinned at 0.5 deliberately: sqrt is IEEE-correctly-rounded
    (``pow`` is not), and the threshold avoids any data-ordered float
    sum (no normalization over per-source weights), so the integer
    bucket-vs-threshold comparison is bit-identical across engines.
    Determinism: membership is a pure function of (doc_id, n_s, N), and
    it moves MONOTONICALLY with the threshold: growing other sources
    (N up) can only ADD members to this source, growing the source
    itself (n_s up faster than sqrt(N)) can only drop them — no
    rerun/reshuffle churn, and a capped (rate-1) source is immune to
    both until its threshold re-enters (0, 10000).

    Scale shape: per-source counts are a map-side-combined groupBy over
    (source) — tiny — then broadcast back; the total is one scalar.
    The corpus itself is a narrow scan + filter, no shuffle of the text
    columns at any size.
    """
    counts = documents.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    total = documents.agg(F.count(F.lit(1)).alias("n_total"))
    thr = F.least(
        F.lit(BUCKETS).cast("bigint"),
        F.floor(
            F.lit(float(BUCKETS))
            * F.lit(frac)
            * F.sqrt(F.col("n_total"))
            / F.sqrt(F.col("n_s"))
        ).cast("bigint"),
    )
    b = key_bucket(F.col("doc_id"), salt="tempmix")
    return (
        documents.select("doc_id", "source", b.alias("bucket"))
        .join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(total))
        .withColumn("threshold", thr)
        .filter(F.col("bucket") < F.col("threshold"))
        .select("doc_id", "source", "bucket", "threshold")
    )


def temperature_mix_sample_sql(frac: float = 0.5) -> str:
    """DuckDB twin of :func:`temperature_mix_sample` (same operation
    order in the threshold expression, same salted bucket).

    Every float literal is wrapped in ``CAST(.. AS DOUBLE)``: DuckDB
    parses bare numeric literals as DECIMAL and evaluates
    ``10000.0 * 0.07`` EXACTLY (700.0) where Spark's double product is
    700.0000000000001 — a one-ulp drift that floor() turns into an
    off-by-one threshold. Casting both factors first forces the same
    IEEE double multiply on both engines for ANY frac, not just the
    values that happen to round identically."""
    b = _bucket_sql("doc_id", salt="tempmix")
    thr = (
        f"least({BUCKETS}, CAST(floor(CAST({float(BUCKETS)!r} AS DOUBLE)"
        f" * CAST({float(frac)!r} AS DOUBLE) * sqrt(n_total)"
        f" / sqrt(n_s)) AS BIGINT))"
    )
    return f"""
WITH c AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
t AS (SELECT count(*) AS n_total FROM documents),
bk AS (SELECT doc_id, source, {b} AS bucket FROM documents)
SELECT doc_id, source, bucket,
       {thr} AS threshold
FROM bk JOIN c USING (source) CROSS JOIN t
WHERE bucket < {thr}
"""


# ---------------------------------------------------------------------------
# Deterministic global training-order shuffle (round-5 verdict #5): the
# ordering function behind sources/bucketing.write_shuffled. A training
# run wants a reproducible, source-interleaved permutation of the corpus
# — never ingestion order (source-clumped: a whole epoch segment from one
# domain wrecks SGD), never rand() (irreproducible, resume-hostile).
# ---------------------------------------------------------------------------

SHUFFLE_SHARDS = 8
ORD_BITS = 60  # 15 md5 hex chars — fits BIGINT in both engines


def shuffle_ord_key(key: str, salt: str):
    """The 60-bit md5 ordering hash of ``salt|key`` — the ONE expression
    builder behind :func:`shuffle_order` and the written-layout readers
    (``plans/pipeline.epoch_layout_manifest``), so the permutation's
    hash algebra can never drift between the writer and a later reader
    re-deriving order from bytes on disk."""
    k = F.concat(F.lit(f"shuffle|{salt}|"), F.col(key).cast("string"))
    return F.conv(F.substring(F.md5(k), 1, 15), 16, 10).cast("bigint")


def shuffle_order(
    df: DataFrame,
    key: str = "doc_id",
    salt: str = "epoch0",
    n_shards: int = SHUFFLE_SHARDS,
) -> DataFrame:
    """Assign every row its position in a deterministic global shuffle:
    ``ord_key`` = 60-bit md5 of ``salt|key`` (the global sort key),
    ``shard`` = ord_key's HIGH bits (ceil-divided so shard ranges
    partition [0, 2^60) contiguously), ``pos`` = 1-based rank within the
    shard by (ord_key, key). Reading shards 0..n-1 each in pos order
    therefore replays the single global ascending-ord_key permutation —
    a pure function of (salt, key): stable across runs, engines,
    cluster layouts, and data GROWTH (new keys interleave; old keys
    keep their relative order). A new ``salt`` is a fresh independent
    permutation (epoch reshuffle without rewriting data semantics).
    Sources interleave because the hash ignores ``source``.

    Scale shape: one narrow map for the hash, one shard-keyed exchange
    for the per-shard rank window — the same single-shuffle budget as
    any hive-partitioned write. ``key`` ties in ``pos``'s ORDER BY make
    rank well-defined even under md5 collisions (~n^2/2^61 chance)."""
    step = ((1 << ORD_BITS) + n_shards - 1) // n_shards
    ord_key = shuffle_ord_key(key, salt)
    w = Window.partitionBy("shard").orderBy("ord_key", key)
    return (
        df.withColumn("ord_key", ord_key)
        .withColumn("shard", F.expr(f"ord_key div {step}"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
    )


def shuffle_order_sql(
    key: str = "doc_id",
    salt: str = "epoch0",
    n_shards: int = SHUFFLE_SHARDS,
) -> str:
    """DuckDB twin of :func:`shuffle_order` over ``documents`` (same
    md5 60-bit ord_key, same ceil-step high-bit shard, same rank)."""
    step = ((1 << ORD_BITS) + n_shards - 1) // n_shards
    h = (
        f"('0x' || substr(md5('shuffle|{salt}|' || CAST({key} AS VARCHAR)),"
        f" 1, 15))::BIGINT"
    )
    return f"""
WITH h AS (
  SELECT doc_id, source, {h} AS ord_key FROM documents
)
SELECT doc_id, source, ord_key, ord_key // {step} AS shard,
       row_number() OVER (PARTITION BY ord_key // {step}
                          ORDER BY ord_key, {key}) AS pos
FROM h
"""
