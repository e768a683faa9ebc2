"""Strong-scaling (cores-axis) probe — the complement of scale_probe.

scale_probe measures the DATA axis (1x vs Nx rows at fixed cores);
this measures the CORES axis (fixed data, local[2] vs local[8] vs
local[32]) for input-linear families, because the 100 TB argument has
two halves: "the work grows linearly with input" (three decades in
SURVEY §9) and "adding executors buys that work back" — which until
now was asserted from plan shape, not measured. A fresh SparkSession
per leg (master is a context property; stop() then rebuild), shuffle
partitions = cores (the same width convention the bench uses), shared
builds prewarmed per session and EXCLUDED from the timed window
(bench's owner/consumer attribution), min-of-N per leg.

Actions per query follow scale_probe's caveat: count() where the row
count is load-bearing (text_bpe_encode's token explode,
pipeline_curated_corpus's filter+dedup), a checksum aggregate over
every output column for row-count-invariant plans
(sampling_pack_documents — the r14 count-pruning incident).

sampling_pack_documents is included deliberately AS the nuanced case:
its window stage parallelism is capped by n_shards=8 (the documented
knob), so its 8->32-core step should flatten while the tokenize stage
keeps scaling — a probe that only contained embarrassingly-parallel
scans would overstate the engine.

Usage: python tools/strong_scaling_probe.py [sf_dir] [copies]
[cores_csv] [repeats] [names_csv]
Defaults: /root/testdata/sf0.1, 200, "2,8,32", 2, the three families
above. Prints one JSON line; per-leg progress goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from scale_probe import blowup_dir, build_blowup  # noqa: E402


def _checksum_pack(df):
    """Non-prunable action for pack_documents: aggregate every computed
    column so the tokenize + window sum must actually run."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.sum("start_offset").alias("so"),
        F.sum("n_tokens").alias("nt"),
        F.max("pack_id").alias("mp"),
        F.count("*").alias("n"),
    ).collect()[0]
    return row["n"]


ACTIONS = {"sampling_pack_documents": _checksum_pack}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cores_list = [
        int(c)
        for c in (sys.argv[3] if len(sys.argv) > 3 else "2,8,32").split(",")
    ]
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    names = (
        [n for n in sys.argv[5].split(",") if n]
        if len(sys.argv) > 5
        else [
            "text_bpe_encode",
            "pipeline_curated_corpus",
            "sampling_pack_documents",
        ]
    )

    # Fine-grained physical layout, or the probe measures parquet split
    # planning instead of the operators (the r14 v1 run: ALL THREE
    # families flat at ~1.6x speedup for 16x cores, because a
    # single-file tier with DuckDB's default ~122k-row groups plans
    # into ~2 scan splits — maxSplitBytes floors at 4 MB of COMPRESSED
    # bytes while tokenize cost is per UNCOMPRESSED row, the classic
    # compressed-text-corpus hazard; strong_scaling_r14_splitcapped.json
    # keeps that measurement). Two uniform levers across every leg:
    # small row groups at build time, small split/open sizes at scan
    # time — emulating the many-splits regime a real 100 TB corpus has
    # by construction.
    out_dir = blowup_dir(copies, sf_dir, variant="rg8192")
    build_blowup(sf_dir, out_dir, copies, {"documents"}, row_group_size=8192)

    from pyspark.sql import SparkSession

    from mapreduce_code_spark.operators.dedup import release_persisted
    from mapreduce_code_spark.registry import SHARED_BUILDS, queries
    from mapreduce_code_spark.session import apply_high_duplication_confs

    qs = queries()
    unknown = sorted(set(names) - set(qs))
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    result: dict = {n: {} for n in names}
    for cores in cores_list:
        print(f"[strong_scaling] session local[{cores}]", file=sys.stderr)
        spark = (
            SparkSession.builder.master(f"local[{cores}]")
            .config("spark.sql.shuffle.partitions", str(cores))
            .config("spark.driver.memory", "16g")
            # uniform across legs (see the layout note above): split by
            # 256 KB of compressed bytes so scan tasks track row groups,
            # not the 4 MB default that under-splits compressed text
            .config("spark.sql.files.maxPartitionBytes", "262144")
            .config("spark.sql.files.openCostInBytes", "65536")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        apply_high_duplication_confs(spark)
        for name in names:
            # prewarm this query's shared builds in THIS session so the
            # timed window is the query's own scan, not the owner's
            # training cost (bench attribution convention)
            for kind, (owner, build, consumers) in SHARED_BUILDS.items():
                if name in consumers and name != owner:
                    build(spark, out_dir).count()
            action = ACTIONS.get(name, lambda df: df.count())
            best, rows = None, None
            for _ in range(repeats):
                t0 = time.monotonic()
                rows = action(qs[name](spark, out_dir))
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            release_persisted()
            result[name][f"c{cores}"] = round(best, 3)
            # record rows PER LEG: a cores-dependent row-count divergence
            # is a correctness signal this probe catches for free (r14
            # advisor low — a single overwritten scalar masked it)
            result[name].setdefault("rows_by_cores", {})[f"c{cores}"] = rows
            print(
                f"[strong_scaling] {name} local[{cores}]: {best:.3f}s",
                file=sys.stderr,
            )
        spark.stop()

    lo, hi = min(cores_list), max(cores_list)
    divergent = []
    for name in names:
        t_lo, t_hi = result[name][f"c{lo}"], result[name][f"c{hi}"]
        speedup = round(t_lo / t_hi, 2) if t_hi > 0 else None
        result[name][f"speedup_{lo}to{hi}"] = speedup
        # parallel efficiency vs the ideal (hi/lo)x speedup
        result[name][f"efficiency_{lo}to{hi}"] = (
            round(speedup / (hi / lo), 2) if speedup else None
        )
        # rows must be cores-invariant; collapse to a scalar only when
        # every leg agrees, else keep the per-leg dict and fail the run
        leg_rows = set(result[name].get("rows_by_cores", {}).values())
        if len(leg_rows) == 1:
            result[name]["rows"] = leg_rows.pop()
            del result[name]["rows_by_cores"]
        elif leg_rows:
            result[name]["rows_divergent"] = True
            divergent.append(name)
            print(
                f"[strong_scaling] ROWS DIVERGED across cores for {name}: "
                f"{result[name]['rows_by_cores']}",
                file=sys.stderr,
            )
    print(
        json.dumps(
            {
                "copies": copies,
                "cores": cores_list,
                "rows_divergent": divergent,
                "queries": result,
            }
        )
    )
    return 1 if divergent else 0


if __name__ == "__main__":
    raise SystemExit(main())
