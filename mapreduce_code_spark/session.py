"""SparkSession factory.

Centralizes the configs that matter at both test scale (local[32]) and
cluster scale (1000 executors / 100 TB):

- AQE on: runtime shuffle-partition coalescing, auto broadcast conversion,
  and skew-join splitting replace hand-tuning per query.
- ``spark.sql.shuffle.partitions`` defaults to ~cores locally; at cluster
  scale AQE's coalescing makes the initial number a ceiling, not a target.
- Arrow enabled: every pandas UDF / mapInPandas crossing is batched.
- Session timezone pinned UTC so DuckDB-oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# process-wide spark.local.dir (shuffle/spill/broadcast scratch), created
# once — get_spark may be called many times but only the FIRST JVM
# creation reads the conf, and one dir per process keeps the exit sweep
# trivial
_LOCAL_DIR: str | None = None


def _tmpfs_local_dir() -> str | None:
    """RAM-backed ``spark.local.dir`` for this process, or None to keep
    Spark's default (disk) behavior.

    Why (r16 verdict #1): the r16 probe proved a concurrent small-file
    fsync/rename writer on the root filesystem selectively inflates
    queries whose timed path commits files there — and after the
    streamed checkpoints moved to tmpfs (``scratch.py``), the driver
    window's flags moved one tier down, onto batch rows whose SHUFFLE
    writes still landed on the root disk via the default
    ``spark.local.dir=/tmp``. Shuffle blocks at bench scale (sf0.1) are
    single-digit MBs per query — trivially RAM-safe in 128 GiB — so the
    bench/driver session's shuffle scratch moves to tmpfs too, taking
    every remaining timed-path root-disk commit out of reach of
    whatever else the host is fsyncing. On a real cluster this knob is
    moot: executors get dedicated local SSD/NVMe scratch, not a shared
    root disk.

    Honors ``SPARK_GRAFT_DISK_LOCAL=1`` (via ``scratch._ram_base``) for
    blowup-tier probes whose spill could pressure tmpfs, and returns
    None when /dev/shm is absent. NOTE: only effective on the FIRST
    SparkContext creation in a process — ``getOrCreate`` on a live
    session cannot move its local dirs."""
    global _LOCAL_DIR
    from mapreduce_code_spark.scratch import _ram_base, scratch_dir

    if _ram_base() is None:
        return None
    if _LOCAL_DIR is None:
        _LOCAL_DIR = scratch_dir("sparklocal_")
    return _LOCAL_DIR

# Broadcast caps for jobs over HIGH-DUPLICATION (highly-compressible)
# corpora — the regime every dedup job is in by definition. Both of
# Spark's automatic broadcast decisions estimate from COMPRESSED bytes:
# the static planner from parquet file sizes, AQE's SMJ->BHJ demotion
# from compressed shuffle bytes. Dictionary/RLE encodings compress a
# 99%-duplicate column ~100x, so either estimate can sit two orders of
# magnitude under the in-memory HashedRelation a broadcast must build.
# Measured (r12 sf10 probe tier): a 12-query run over a 100x verbatim-
# duplicated corpus died in BroadcastExchangeExec with
# notEnoughMemoryToBuildAndBroadcastTableError after a ~1 GiB single-
# allocation GC-locker retry — an AQE runtime conversion whose shuffle
# stats said "small". The 2m cap keeps worst-case in-heap expansion
# (~100x) near 200 MB. Explicit broadcast() hints are unaffected —
# hints bypass thresholds, and the engine only hints provably tiny dims.
HIGH_DUPLICATION_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "2m",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "2m",
}


def apply_high_duplication_confs(spark: SparkSession) -> dict[str, str | None]:
    """Cap automatic broadcasts for a high-duplication workload.

    Both confs are runtime-settable, so this works on a live session.
    Returns the previous values for ``restore_confs``. A value of
    ``None`` means the conf was NEVER EXPLICITLY SET on this session
    (``conf.get(k, None)`` returns the passed default, not the
    registered SQL default) — the common case for
    ``spark.sql.adaptive.autoBroadcastJoinThreshold``. Restoring such a
    key requires ``spark.conf.unset(k)``; ``conf.set(k, None)`` raises.
    Use ``restore_confs(spark, prev)``, which handles both cases.
    """
    prev = {}
    for k, v in HIGH_DUPLICATION_CONFS.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    return prev


def restore_confs(spark: SparkSession, prev: dict[str, str | None]) -> None:
    """Restore confs saved by ``apply_high_duplication_confs``.

    ``None`` means the key was unset before the apply — unset it again
    so the session returns to the registered SQL default (the canonical
    session's registered plans/floors depend on defaults, so a scoped
    apply/restore cycle must be plan-transparent; pinned in
    tests/test_plan_shapes.py)."""
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def get_spark(
    app_name: str = "mapreduce_code_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster the caller passes ``master=None`` and lets
    spark-submit decide; locally we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos type —
        # read as long and convert via exact integer division (sources.io)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    local_dir = _tmpfs_local_dir()
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
