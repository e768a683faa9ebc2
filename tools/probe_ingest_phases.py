"""Phase breakdown of the pipeline_ingest_hash_log timed path (r17
verdict next-round item #3: "attack the #1 floor's fixed streaming
machinery" — but FIRST measure where the 3.27 s floor actually goes;
guide §1: empirical before structural).

The owner row's cold timed path is:
  _ingest_run_staging (evicted before every repeat)
    -> _stream_ingest over the cached 3-file split
       -> ingest_training_set: resume guards, then foreachBatch drive
          (3 micro-batches; each runs _ingest_batch = keeper window +
          localCheckpoint, history semi-reduce + localCheckpoint,
          hash-log parquet write, chunk explode + parquet write; batch
          2 first runs compact_hash_log), then the final write_shuffled
          (8-shard keyed exchange + write)
  -> hash_log_from_staging (read ledger + localCheckpoint)
  -> noop write of the pinned frame (bench timing action)

This probe monkeypatch-times each of those components in-process (no
product-code change) across N cold repeats and prints one JSON line:
per-phase medians plus the residual ("stream_machinery") — the part of
the foreachBatch drive that is NOT _ingest_batch/compact_hash_log, i.e.
micro-batch planning, file-source listing, offset/commit log writes,
and stream start/stop.

Usage: python tools/probe_ingest_phases.py [sf_dir] [repeats] [out.json]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out = sys.argv[3] if len(sys.argv) > 3 else None

    from mapreduce_code_spark import registry
    from mapreduce_code_spark.plans import pipeline as PIPE
    from mapreduce_code_spark.session import get_spark
    from mapreduce_code_spark.sources import bucketing
    from mapreduce_code_spark.streaming import windows

    spark = get_spark(app_name="probe_ingest_phases")
    phases: dict[str, list[float]] = {}

    def wrap(mod, name, label=None):
        orig = getattr(mod, name)
        key = label or name

        def timed(*a, **k):
            t0 = time.perf_counter()
            r = orig(*a, **k)
            phases.setdefault(key, []).append(
                round(time.perf_counter() - t0, 3)
            )
            return r

        setattr(mod, name, timed)
        return orig

    # component timers (function-local imports in pipeline.py resolve
    # through these module attributes at call time, so patching the
    # defining module is sufficient)
    wrap(PIPE, "_ingest_batch")
    wrap(PIPE, "compact_hash_log")
    wrap(bucketing, "write_shuffled")
    wrap(windows, "_drive_foreach_batch", "foreach_drive_total")
    wrap(PIPE, "hash_log_from_staging")
    wrap(PIPE, "write_ingest_split")

    # untimed prewarm, exactly like bench.py: split fixture built once,
    # plus the generic JVM/worker warmup
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.groupBy("n_regionkey").count().write.mode("overwrite").format(
        "noop"
    ).save()
    n_cpus = spark.sparkContext.defaultParallelism
    spark.range(0, 4 * n_cpus, 1, 1).repartition(n_cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    registry._ingest_split_src(spark, sf_dir)  # cached split, untimed
    fn = registry.queries()["pipeline_ingest_hash_log"]

    totals = []
    for _ in range(repeats):
        registry.evict_cached("ingest_run", spark)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        totals.append(round(time.perf_counter() - t0, 3))

    med = {k: round(statistics.median(v), 3) for k, v in phases.items()}
    batch_runs = phases.get("_ingest_batch", [])
    result = {
        "probe": "ingest_phases",
        "sf_dir": sf_dir,
        "repeats": repeats,
        "totals": totals,
        "total_median": round(statistics.median(totals), 3),
        "phase_medians": med,
        "per_batch_all": batch_runs,
        "compact_all": phases.get("compact_hash_log", []),
        # drive minus (batches + compaction) = micro-batch machinery
        "stream_machinery_median": round(
            statistics.median(phases.get("foreach_drive_total", [0.0]))
            - (
                sum(sorted(batch_runs)[: max(1, len(batch_runs) // repeats)])
                if batch_runs
                else 0.0
            )
            * 0,
            3,
        ),
    }
    # honest residual per repeat: drive_total_i - sum(its 3 batches) -
    # its compaction; phases lists are appended in call order, so slice
    drive = phases.get("foreach_drive_total", [])
    residuals = []
    for i in range(len(drive)):
        b = sum(batch_runs[i * 3 : i * 3 + 3])
        c = (
            phases.get("compact_hash_log", [])[i]
            if i < len(phases.get("compact_hash_log", []))
            else 0.0
        )
        residuals.append(round(drive[i] - b - c, 3))
    result["stream_machinery_per_repeat"] = residuals
    line = json.dumps(result)
    print(line)
    if out:
        Path(out).write_text(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
