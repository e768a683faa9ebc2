"""Measured evidence for the two round-7 pipeline-maintenance claims.

Probe A — epoch flip vs re-curation (`plans/pipeline.epoch_manifest`):
the claim is that flipping an already-materialized training set to a
new epoch salt costs one scan of the CURATED shards plus one rank
exchange, while `training_manifest` re-pays the whole curation pass
(scoring scan + keeper window) over the RAW corpus. Measured by
materializing the training set once per scale (1x and a
`tools/scale_probe.build_blowup` identity-remapped Nx corpus — verbatim
text duplicated, so the curated keeper set is scale-INVARIANT by
construction), then timing `epoch_manifest` against `training_manifest`
at a fresh salt. Expected shape: the full manifest grows with the raw
corpus; the epoch flip does not grow at all (its input is the
growth-stable curated set) — at 100 TB this is the difference between
an epoch costing a curation pass and costing one shuffle of the
surviving chunks.

Probe B — hash-log compaction (`plans/pipeline.compact_hash_log`): the
claim is that a long-running ingest accumulates one hash-log partition
per micro-batch and the per-batch history probe (`_history_hits`, a
zero-shuffle scan) then pays per-partition task/listing/footer overhead
linear in BATCHES EVER RUN, while compaction folds the history into one
distinct content_hash-sorted partition so the probe is bounded by the
DISTINCT corpus. Measured by laying the corpus' real hashes out as
``n_batches`` committed log partitions (the exact layout
`_ingest_batch` writes), timing the probe, compacting, and timing it
again. Row counts are asserted identical before/after — compaction must
change cost, never semantics.

Usage: python tools/pipeline_probe.py [sf_dir] [repeats] [copies] [n_batches]
Prints one JSON line: {"epoch": {...}, "compaction": {...}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from scale_probe import build_blowup  # noqa: E402  (sibling module)


def _timed(fn, repeats: int):
    best, out = None, None
    for _ in range(repeats):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), out


def probe_epoch(spark, sf_dir: str, repeats: int, copies: int) -> dict:
    import hashlib

    from mapreduce_code_spark.plans.pipeline import (
        epoch_layout_manifest,
        epoch_manifest,
        materialize_epoch,
        materialize_training_set,
        training_manifest,
    )

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    blow_dir = f"/tmp/scale{copies}x_{tag}"
    build_blowup(sf_dir, blow_dir, copies)

    result = {}
    for label, d in (("1x", sf_dir), (f"{copies}x", blow_dir)):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        work = tempfile.mkdtemp(prefix="epoch_probe_")
        try:
            shards = f"{work}/shards"
            materialize_training_set(docs, shards)
            t_epoch, df = _timed(
                lambda: epoch_manifest(spark, shards, salt="epoch1").count(),
                repeats,
            )
            t_full, n_full = _timed(
                lambda: training_manifest(docs, salt="epoch1").count(),
                repeats,
            )
            assert df == n_full, (df, n_full)  # same epoch, same rows
            # round-9 bytes path: the flip EXECUTED (materialize_epoch
            # rewrites the curated shards at the new salt through
            # write_shuffled) and the written layout AUDITED
            # (epoch_layout_manifest: physical shard column + re-ranked
            # pos + md5 over written text). Both consume the curated
            # set, which is growth-stable under the blowup's verbatim
            # duplication — so like the manifest flip, both should stay
            # FLAT while full re-curation grows with the raw corpus.
            epoch1 = f"{work}/epoch1"
            t_flip, _ = _timed(
                lambda: (
                    shutil.rmtree(epoch1, ignore_errors=True),
                    materialize_epoch(spark, shards, epoch1, salt="epoch1"),
                )[1],
                repeats,
            )
            t_audit, n_audit = _timed(
                lambda: epoch_layout_manifest(
                    spark, epoch1, salt="epoch1"
                ).count(),
                repeats,
            )
            assert n_audit == n_full, (n_audit, n_full)
            result[label] = {
                "epoch_manifest": t_epoch,
                "flip_to_bytes": t_flip,
                "layout_audit": t_audit,
                "full_recuration": t_full,
                "rows": df,
                "speedup": round(t_full / t_epoch, 2),
            }
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return result


def probe_compaction(
    spark, sf_dir: str, repeats: int, n_batches: int
) -> dict:
    from pyspark.sql import functions as F

    from mapreduce_code_spark.plans.pipeline import (
        _history_hits,
        compact_hash_log,
    )

    work = tempfile.mkdtemp(prefix="compact_probe_")
    staging = f"{work}/staging"
    hashes_dir = f"{staging}/hashes"
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # real history logs are DISJOINT in content_hash by construction
        # (the anti-join logs each hash exactly once), so distinct first
        # and spread hashes across batches by their own value
        hashes = (
            docs.select(F.sha2(F.col("text"), 256).alias("content_hash"))
            .distinct()
            .withColumn(
                "b", F.pmod(F.hash("content_hash"), F.lit(n_batches))
            )
            .localCheckpoint()
        )
        # the exact layout _ingest_batch commits: one dir per micro-batch
        for i in range(n_batches):
            hashes.filter(F.col("b") == i).select(
                "content_hash"
            ).coalesce(1).write.parquet(f"{hashes_dir}/batch_id={i}")
        probe = docs.limit(2000).select(
            F.sha2(F.col("text"), 256).alias("content_hash")
        ).localCheckpoint()

        def scan():
            return _history_hits(probe, hashes_dir, n_batches).count()

        def n_files():
            return sum(
                len(fs) for _, _, fs in os.walk(hashes_dir)
            )

        t_before, hits_before = _timed(scan, repeats)
        files_before = n_files()
        t_compact, _ = _timed(
            lambda: compact_hash_log(
                spark, staging, before_batch_id=n_batches
            ),
            1,
        )
        t_after, hits_after = _timed(scan, repeats)
        assert hits_before == hits_after, (hits_before, hits_after)
        return {
            "n_batches": n_batches,
            "probe_before": t_before,
            "probe_after": t_after,
            "compact_cost": t_compact,
            "files_before": files_before,
            "files_after": n_files(),
            "hits": hits_before,
            "speedup": round(t_before / t_after, 2),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    n_batches = int(sys.argv[4]) if len(sys.argv) > 4 else 120

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(
        json.dumps(
            {
                "epoch": probe_epoch(spark, sf_dir, repeats, copies),
                "compaction": probe_compaction(
                    spark, sf_dir, repeats, n_batches
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
