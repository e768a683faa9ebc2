"""Bucketed-table layout for shuffle-free co-located joins.

A join between two fact tables shuffles BOTH sides on the join key every
time it runs. When the same join recurs (orders ⋈ lineitem on orderkey in
every pipeline run), pre-bucketing both tables by the key amortizes that
shuffle into the write: Spark's bucketed scan exposes the hash
distribution to the planner, and the sort-merge join runs with NO
Exchange on either side — at 100 TB that's the difference between a
full-network shuffle per query and zero.

The bucket count is fixed at write time; pick it so each bucket of the
larger table is a few hundred MB at target scale (bucket ≈ task).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def _micros_timestamps(spark: SparkSession):
    """Force the stats-bearing TIMESTAMP_MICROS parquet encoding for the
    duration of a layout write. Spark's default INT96 carries NO min/max
    statistics — silently defeating a stats-clustered layout for time
    columns — and the per-write ``outputTimestampType`` option is
    ignored by the parquet writer (verified: the file still comes out
    INT96), so this has to be the SESSION conf; concurrent writers on
    the same session during this window would also get MICROS — run
    clustered rewrites serially or on their own session."""
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets lets the sort-merge join skip its Sort too."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table, format="parquet")


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on ``key``; with matching
    bucket specs the physical plan contains no Exchange."""
    return spark.table(left).join(spark.table(right), key, how)


def compact(spark: SparkSession, path: str, target_bytes: int = 256 << 20) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ~``target_bytes`` files.

    At 100 TB, streaming sinks and fine-grained partitions leave millions
    of KB-sized files; every downstream scan then pays per-file open/
    footer costs and the driver pays listing. Rewriting to ~256 MB files
    restores scan efficiency. Returns the new file count. (Sizing uses
    the current on-disk bytes from the file index — no data scan.)
    """
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = sum(
        f.getLen()
        for f in fs.listStatus(jpath)
        if f.getPath().getName().endswith(".parquet")
    )
    n_files = max(1, -(-total // target_bytes))
    tmp = path.rstrip("/") + ".compact_tmp"
    bak = path.rstrip("/") + ".compact_bak"
    jtmp = spark._jvm.org.apache.hadoop.fs.Path(tmp)
    jbak = spark._jvm.org.apache.hadoop.fs.Path(bak)
    # clear residue from a previously crashed run BEFORE renaming — with
    # stale dirs present, Hadoop rename returns false (it does not raise)
    # or nests the source inside the existing destination
    fs.delete(jtmp, True)
    fs.delete(jbak, True)
    spark.read.parquet(path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    # rename-aside, never delete-then-rename: the original stays intact
    # (as .compact_bak) until the rewritten copy is in place, so a crash
    # at any step leaves a complete dataset on disk. Every rename's
    # boolean result is checked — Hadoop signals failure by returning
    # false, not raising.
    if not fs.rename(jpath, jbak):
        raise IOError(f"compact: could not move {path} aside")
    if not fs.rename(jtmp, jpath):
        fs.rename(jbak, jpath)  # roll back; original untouched
        raise IOError(f"compact: could not promote {tmp}")
    fs.delete(jbak, True)
    return n_files


def write_clustered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Range-clustered parquet layout for min-max data skipping — the
    complement of :func:`save_bucketed` (hash layout serves joins; range
    layout serves selective scans).

    ``repartitionByRange`` assigns each output file a contiguous,
    (near-)disjoint range of ``cols`` (via a driver-side range sampling
    pass), and the within-file sort tightens every parquet ROW-GROUP's
    min/max stats as well. A predicate on the leading cluster column then
    prunes whole files at planning/footer time and whole row groups at
    scan time — at 100 TB a time-range query over a ts-clustered events
    table touches only the files its window overlaps instead of all of
    them. This is the stats-clustering half of what table formats call
    Z-ordering; for a single-column (or prefix-ordered) predicate
    workload, plain range clustering skips strictly better than a
    Z-curve.
    """
    with _micros_timestamps(df.sparkSession):
        df.repartitionByRange(
            n_files, *[F.col(c) for c in cols]
        ).sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12):
    """Morton (Z-curve) interleaved-bit sort key over ``cols`` — the
    multi-column counterpart of :func:`write_clustered`'s single-range
    clustering (public technique; cf. Delta Lake OSS ``OPTIMIZE ZORDER
    BY``). Each column is normalized to a ``bits``-bit fixed-point
    bucket against its global min/max, and the buckets' bits are
    interleaved (column i gets bit positions ``b*k + (k-1-i)``), so rows
    close in EVERY dimension get close z-values and each output file's
    min/max footer stats stay tight on ALL the clustered columns at
    once, not just the leading one.

    Returns ``(df_with_key, key_col_name)``. Scale shape: one bounded
    min/max aggregate broadcast back via a single-row crossJoin (no
    driver collect), then pure bit-algebra in one projection. Linear
    min/max bucketing is skew-sensitive (a heavy-hitter value crowds one
    bucket) — for skewed columns, pre-transform (log, rank-bucket)
    before clustering; range-sampled bucket boundaries are what table
    formats use and slot in here without changing the interleave.
    NULL values bucket to 0 per column (they cluster with that column's
    minimum instead of nulling the whole key).

    Integral columns bucket in EXACT decimal(38,0) arithmetic (``div``
    integral divide — never a double round-trip): 60-bit hash ids, the
    kind this repo writes elsewhere, sit far beyond the 2^53 range where
    doubles stop distinguishing adjacent BIGINTs, and a silent collapse
    of distinct ids into one bucket is exactly the wrong failure mode
    for a layout key. Fractional/temporal columns keep the double path
    (their type already concedes that precision)."""
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        IntegralType,
        NumericType,
        TimestampType,
    )

    k = len(cols)
    if k < 2:
        raise ValueError("z-ordering needs >= 2 columns; use write_clustered")
    if bits * k > 63:
        # shiftleft on BIGINT masks the shift count mod 64: an
        # out-of-range bit position would silently fold a column's high
        # bucket bits into the LOW bits of the key (or hit the sign bit
        # and invert the curve) — fail fast instead
        raise ValueError(
            f"bits*len(cols) = {bits * k} exceeds the 63 usable BIGINT "
            f"bits; lower bits (e.g. {63 // k}) or cluster fewer columns"
        )
    ok = (NumericType, TimestampType, DateType, BooleanType)
    for c in cols:
        if not isinstance(df.schema[c].dataType, ok):
            raise ValueError(
                f"zorder_key: column {c!r} has non-orderable-as-number "
                f"type {df.schema[c].dataType.simpleString()}; cast or "
                "bucket it to a numeric first"
            )
    helper = {"_zkey", *(f"_zb{i}" for i in range(k)),
              *(f"_zn{i}" for i in range(k)),
              *(f"_zd{i}" for i in range(k)),
              *(f"_zmin{i}" for i in range(k)),
              *(f"_zmax{i}" for i in range(k))}
    clash = helper & set(df.columns)
    if clash:
        raise ValueError(
            f"zorder_key: input already has reserved helper column(s) "
            f"{sorted(clash)}; rename them first"
        )
    exact = [isinstance(df.schema[c].dataType, IntegralType) for c in cols]
    aggs = []
    for i, c in enumerate(cols):
        v = F.col(c).cast("decimal(38,0)" if exact[i] else "double")
        aggs += [F.min(v).alias(f"_zmin{i}"), F.max(v).alias(f"_zmax{i}")]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    hi = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        lo_c, hi_c = F.col(f"_zmin{i}"), F.col(f"_zmax{i}")
        if exact[i]:
            # exact integral divide via generated numerator/denominator
            # columns: (v-lo) <= 2^64 (20 digits) times hi <= 2^63 bits'
            # worth of scale still fits decimal(38,0); `div` truncates
            # toward zero == floor on the non-negative numerator
            v = F.col(c).cast("decimal(38,0)")
            out = (
                out.withColumn(f"_zn{i}", (v - lo_c) * F.lit(hi))
                .withColumn(f"_zd{i}", hi_c - lo_c)
            )
            bucket = F.when(
                v.isNull() | (hi_c == lo_c), F.lit(0)
            ).otherwise(F.expr(f"_zn{i} div _zd{i}")).cast("bigint")
            out = out.withColumn(f"_zb{i}", bucket).drop(
                f"_zn{i}", f"_zd{i}"
            )
        else:
            v = F.col(c).cast("double")
            bucket = F.when(
                v.isNull() | (hi_c == lo_c), F.lit(0)
            ).otherwise(
                F.floor((v - lo_c) * hi / (hi_c - lo_c))
            ).cast("bigint")
            out = out.withColumn(f"_zb{i}", bucket)
        for b in range(bits):
            bit = F.shiftright(F.col(f"_zb{i}"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + (k - 1 - i)))
    out = out.withColumn("_zkey", z).drop(
        *[f"_zmin{i}" for i in range(k)],
        *[f"_zmax{i}" for i in range(k)],
        *[f"_zb{i}" for i in range(k)],
    )
    return out, "_zkey"


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8, bits: int = 12
) -> None:
    """Z-order-clustered parquet layout: range-partition and sort by the
    Morton key from :func:`zorder_key`, so a selective predicate on ANY
    of ``cols`` prunes files by footer min/max — where
    :func:`write_clustered` only skips on its leading column. Use for
    the two-to-three-column selective-scan workload (e.g. events
    filtered by ts AND user bucket); for one-column predicates plain
    range clustering skips strictly better. The helper key column is
    dropped before the write: the layout IS the key."""
    keyed, zcol = zorder_key(df, cols, bits)
    with _micros_timestamps(df.sparkSession):
        (
            keyed.repartitionByRange(n_files, F.col(zcol))
            .sortWithinPartitions(zcol)
            .drop(zcol)
            .write.mode("overwrite")
            .parquet(path)
        )


def overwrite_partitions(df: DataFrame, path: str, *part_cols: str) -> None:
    """Idempotent partition backfill: write ``df`` into a hive-
    partitioned dataset replacing ONLY the partitions present in ``df``
    (``partitionOverwriteMode=dynamic``), leaving every other partition
    byte-untouched. The standard reprocess-one-day move at 100 TB —
    static overwrite mode (Spark's default) would silently DELETE the
    whole dataset and keep only the backfilled slice, which is the
    classic data-loss footgun this wrapper exists to prevent. Re-running
    the same backfill is a no-op-equivalent rewrite (idempotent), so a
    retried job never duplicates rows.

    Unlike the timestamp encoding in :func:`write_clustered`, dynamic
    overwrite IS honored as a per-write option on this build (verified:
    untouched partitions survive with the session conf left at its
    static default), so this writer is concurrency-safe — no session
    conf is mutated.
    """
    df.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(*part_cols).parquet(path)


def write_sharded(
    df: DataFrame, path: str, n_shards: int = 8, key: str = "doc_id"
) -> None:
    """Write the final training-mix layout: hive-partitioned by a
    DETERMINISTIC hash shard of ``key`` (``shard=N/`` directories, one
    file per shard). Shard membership is a pure function of the key —
    identical across runs, engines, and cluster layouts (the property a
    resumable multi-epoch training loader needs), unlike
    ``repartition(n)`` round-robin whose assignment depends on the input
    partitioning.

    Scale notes: ``repartition(shard)`` aligns the shuffle with the
    output partitioning, so each shard directory is written by exactly
    one task as one file — at 100 TB raise ``n_shards`` until shard
    size fits the downstream loader. Readers filtering on ``shard`` get
    partition pruning for free (hive layout). The shard hashes the key
    DIRECTLY (60 md5 bits mod n_shards) rather than through
    ``sampling.key_bucket`` — the bucket space there is 10,000, which
    would cap the shard count and skew any non-divisor n_shards by up to
    a whole bucket's worth of keys.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("outshard|"), F.col(key).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    sharded = df.withColumn("shard", h % n_shards)
    sharded.repartition("shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)


def write_shuffled(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    key: str = "doc_id",
    salt: str = "epoch0",
    drop_key: bool = False,
) -> None:
    """Deterministic global training-order shuffle writer: the on-disk
    complement of :func:`operators.sampling.shuffle_order`. Rows land in
    ``shard=N/`` hive directories (one file per shard) physically sorted
    by the 60-bit md5 ``ord_key``; shard N holds the N-th contiguous
    high-bit range of the hash space, so a loader reading shards
    ``0..n-1`` sequentially (or shard-parallel with per-shard order)
    replays ONE reproducible global permutation — the same permutation
    every rewrite, on any cluster layout, with sources interleaved
    (the hash ignores ``source``). A different ``salt`` writes an
    independent permutation: per-epoch reshuffle without a new data
    semantic. Resumability falls out: a loader checkpoint is just
    (shard, pos).

    Scale shape: one narrow hash map + one shard-keyed exchange aligned
    with the output partitioning (each shard = exactly one task writing
    one sorted file, cf. :func:`write_sharded`); raise ``n_shards``
    until a shard fits the loader. The helper columns are dropped
    before the write — the layout IS the order, and ord_key is
    recomputable from (salt, key) by construction. ``drop_key=True``
    additionally drops the key column itself: for a DERIVED key (e.g. a
    concat of id columns built just for this write) keeping it would
    persist redundant bytes into every training shard."""
    from mapreduce_code_spark.operators.sampling import shuffle_order

    ordered = shuffle_order(df, key=key, salt=salt, n_shards=n_shards)
    sorted_rows = (
        ordered.drop("pos")
        .repartition("shard")
        # shard leads the sort so the partitioned-file writer's required
        # ordering (partition cols first) is already satisfied — without
        # it the writer inserts its own Sort(shard), destroying the
        # ord_key order this layout exists to provide
        .sortWithinPartitions("shard", "ord_key", key)
        .drop(*(["ord_key", key] if drop_key else ["ord_key"]))
    )
    (
        sorted_rows.write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
