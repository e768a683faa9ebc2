"""SGD per-iteration cost attribution (r13 agenda item 3, r12 prep).

The r12 clean-window sf10 re-measure corrected the SGD story: the sweep
is genuinely row-linear at ~2 M rows/s AGGREGATE through the mapInPandas
path (60 M rows ≈ 30 s/iteration on local[32]), so the 100 TB sizing
number is rows/s — and "where does the second go" should be measured,
not inferred. This probe decomposes one iteration into its three owner
costs, each timed in isolation:

1. ``kernel`` — the pure-Python sequential float loop
   (``_partition_kernel``), fed an in-memory pandas batch directly: the
   reference-faithful compute floor, rows/s on ONE core.
2. ``to_lists`` — the pandas→Python materialization inside the kernel
   (``y.tolist()`` + ``np.stack(features).tolist()``), timed alone: the
   price of leaving Arrow land, also per-core.
3. ``arrow_sweep`` (needs --spark) — a no-op mapInPandas count over the
   PERSISTED points frame at sf0.1, the exact per-iteration machinery
   minus the kernel: cached-block read + Arrow serialization + Python
   worker round-trip + combine-sized result.

Interpretation: if (1)+(2) per-core times the worker parallelism is far
below the banked per-iteration wall time, the bottleneck is (3)'s
transfer path, and scaling executors scales throughput linearly (the
kernel never saturates); if (1) dominates, the Python loop is the
asymptote and the lever would be kernel-level (at the cost of the
reference-faithful float order, which is frozen by contract).

Usage: python tools/sgd_kernel_probe.py [n_rows] [--spark [sf_dir]]
Prints one JSON line. Timing-sensitive: run in a quiet window; the
no-spark legs are single-core and tolerate background load far better
than the sweep leg.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd


def _batch(n_rows: int, d: int = 4, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(n_rows, d))
    ys = (feats @ np.array([0.5, -0.25, 0.1, 0.05]) > 0).astype("float64")
    # flat float64 columns, the r18 kernel layout (y, x0..x{d-1})
    cols = {"y": ys}
    for j in range(d):
        cols[f"x{j}"] = feats[:, j]
    return pd.DataFrame(cols)


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 500_000
    out: dict = {"n_rows": n_rows}

    from mapreduce_code_spark.operators.regression import _partition_kernel

    pdf = _batch(n_rows)
    theta = (0.0, 0.0, 0.0, 0.0)

    def _min_of(k, fn):
        best = None
        for _ in range(k):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best

    # (2) the pandas->python materialization alone (it happens inside
    # the kernel too; subtracting isolates the float loop). One untimed
    # warm-up first — the cold first touch of the object column costs
    # ~30% extra and belongs to neither leg; min-of-3 after.
    def to_lists():
        pdf["y"].tolist()
        [pdf[f"x{j}"].tolist() for j in range(4)]

    to_lists()  # warm-up
    to_lists_s = _min_of(3, to_lists)
    out["to_lists"] = {
        "sec": round(to_lists_s, 4),
        "rows_per_s_core": int(n_rows / to_lists_s),
    }

    # (1) the full kernel (includes its own to_lists pass), per link
    for link in ("linear", "logistic"):
        kern = _partition_kernel(theta, alpha=0.001, accuracy=0.1, link=link)


        def run():
            result = list(kern(iter([pdf])))
            assert result[0]["n"].iloc[0] == n_rows

        kernel_s = _min_of(3, run)
        loop_s = kernel_s - to_lists_s  # the float loop alone
        out[f"kernel_{link}"] = {
            "sec": round(kernel_s, 4),
            "rows_per_s_core": int(n_rows / kernel_s),
            "float_loop_rows_per_s_core": int(n_rows / max(loop_s, 1e-9)),
        }

    # (1b) the native sweep (r18), same batch — reports the speedup and
    # verifies the partials agree bit-for-bit with the Python loop
    from mapreduce_code_spark.operators.regression import _native_kernel_path

    so = _native_kernel_path()
    out["native_available"] = bool(so)
    if so:
        for link in ("linear", "logistic"):
            kern_py = _partition_kernel(theta, alpha=0.001, accuracy=0.1, link=link)
            ref = list(kern_py(iter([pdf])))[0]
            kern_c = _partition_kernel(
                theta, alpha=0.001, accuracy=0.1, link=link, so_path=so
            )

            def run_c():
                result = list(kern_c(iter([pdf])))
                assert result[0]["n"].iloc[0] == n_rows

            native_s = _min_of(3, run_c)
            got = list(kern_c(iter([pdf])))[0]
            out[f"native_{link}"] = {
                "sec": round(native_s, 4),
                "rows_per_s_core": int(n_rows / native_s),
                "bit_equal_python": bool(
                    list(got["theta_sum"].iloc[0]) == list(ref["theta_sum"].iloc[0])
                    and got["all_continue"].iloc[0] == ref["all_continue"].iloc[0]
                ),
            }

    if "--spark" in sys.argv:
        i = sys.argv.index("--spark")
        sf_dir = (
            sys.argv[i + 1]
            if len(sys.argv) > i + 1
            else "/root/testdata/sf0.1"
        )
        from pyspark.sql import SparkSession
        from mapreduce_code_spark.plans import prep
        from mapreduce_code_spark.sources.io import load_table

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("sgd_kernel_probe")
            .getOrCreate()
        )
        # same frame the registered logistic fit sweeps (registry
        # n_partitions=8); plain repartition(8) stands in for the salt
        # layout — partition placement doesn't change Arrow transfer cost
        pts = (
            prep.labeled_points_binary(load_table(spark, sf_dir, "lineitem"))
            .repartition(8)
            .select("y", "features")
        )
        pts.persist()
        total = pts.count()  # materialize the cache, like sgd_fit does

        def noop(batches):
            n = 0
            for b in batches:
                n += len(b)
            yield pd.DataFrame({"n": [n]})

        sweeps = []
        for _ in range(3):
            t0 = time.monotonic()
            got = (
                pts.mapInPandas(noop, schema="n long")
                .groupBy()
                .sum("n")
                .collect()[0][0]
            )
            sweeps.append(time.monotonic() - t0)
            assert got == total
        pts.unpersist()
        best = min(sweeps)
        out["arrow_sweep"] = {
            "sf_dir": sf_dir,
            "rows": total,
            "n_splits": 8,
            "sec_min_of_3": round(best, 4),
            "rows_per_s_aggregate": int(total / best),
        }

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
