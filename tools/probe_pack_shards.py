"""Measure the n_shards knob behind sampling_pack_documents' 32-core
plateau (r14 verdict #7).

The r14 strong-scaling probe showed pack plateauing at 4.0x on 32
cores; the suspected cause is the registered default ``n_shards=8`` in
``operators/sampling.pack_documents`` — the running-offset window is
partitioned by a hash shard of doc_id, so shard count IS the
parallelism of the pack stage. This probe times the same checksummed
action at local[32] over the same 200x rg8192 blowup tier the
strong-scaling probe used, at several n_shards values, holding
everything else fixed. If the plateau lifts with n_shards, the cap is
the documented knob, not a hidden serial stage.

Usage: python tools/probe_pack_shards.py [sf_dir] [copies] [shards_csv]
       [repeats]
Emits one JSON line; write it to probe_pack_shards.json (receipt).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from scale_probe import blowup_dir, build_blowup  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    shards_list = [
        int(s)
        for s in (sys.argv[3] if len(sys.argv) > 3 else "8,32,128").split(",")
    ]
    # clamp like bench.py: repeats=0 would leave best=None and crash at
    # the round() below (r15 advisor, low)
    repeats = max(int(sys.argv[4]) if len(sys.argv) > 4 else 2, 1)

    out_dir = blowup_dir(copies, sf_dir, variant="rg8192")
    build_blowup(sf_dir, out_dir, copies, {"documents"}, row_group_size=8192)

    from pyspark.sql import functions as F
    from pyspark.sql import SparkSession

    from mapreduce_code_spark.operators.sampling import pack_documents

    # same session shape as tools/strong_scaling_probe.py's local[32]
    # leg, so the n_shards axis is comparable to the cores axis
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.files.maxPartitionBytes", "262144")
        .config("spark.sql.files.openCostInBytes", "65536")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{out_dir}/documents.parquet")

    def checksum(df) -> tuple[int, int]:
        """Forces the full pack and returns the n_shards-INVARIANT
        aggregates (row count, sum of n_tokens): both are properties of
        the input corpus, not the shard layout, so a divergence across
        shard counts is a correctness bug in the knob. start_offset and
        pack_id are legitimately shard-dependent, so they participate in
        the forced action but are not compared (r15 advisor, low: the
        old version discarded everything but the row count, so a
        shards-dependent token-sum divergence would have passed)."""
        row = df.agg(
            F.sum("start_offset").alias("so"),
            F.sum("n_tokens").alias("nt"),
            F.max("pack_id").alias("mp"),
            F.count("*").alias("n"),
        ).collect()[0]
        return row["n"], row["nt"]

    result: dict = {}
    invariants: set[tuple[int, int]] = set()
    for n_shards in shards_list:
        best, inv = None, None
        for _ in range(repeats):
            t0 = time.monotonic()
            inv = checksum(pack_documents(docs, n_shards=n_shards))
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        invariants.add(inv)
        result[f"shards{n_shards}"] = {
            "sec": round(best, 3),
            "rows": inv[0],
            "sum_n_tokens": inv[1],
        }
        print(
            f"[pack_shards] n_shards={n_shards}: {best:.3f}s "
            f"rows={inv[0]} sum_n_tokens={inv[1]}",
            file=sys.stderr,
        )
    spark.stop()
    # mirror strong_scaling_probe's rows_by_cores check: the invariant
    # pair must be identical across every shard count
    shard_invariant = len(invariants) == 1
    if not shard_invariant:
        print(
            f"[pack_shards] INVARIANT VIOLATION across shard counts: "
            f"{sorted(invariants)}",
            file=sys.stderr,
        )

    lo, hi = shards_list[0], shards_list[-1]
    speedup = (
        round(result[f"shards{lo}"]["sec"] / result[f"shards{hi}"]["sec"], 2)
        if result[f"shards{hi}"]["sec"] > 0
        else None
    )
    print(
        json.dumps(
            {
                "copies": copies,
                "cores": 32,
                "shards": shards_list,
                f"speedup_{lo}to{hi}": speedup,
                "shard_invariant": shard_invariant,
                "results": result,
            }
        )
    )
    return 0 if shard_invariant else 1


if __name__ == "__main__":
    raise SystemExit(main())
