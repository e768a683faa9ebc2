"""Per-iteration and setup-cost attribution for the registered SGD
queries (r17 verdict next-round item #4: the first-repeat tail is
~2-5x the floor; before restructuring anything, measure WHICH part of
a fresh fit is slow — setup (bounds/salt-probe/repartition/persist) vs
the per-iteration mapInPandas+collect round trip, and whether the tail
is concentrated in iteration 1 (JIT/codegen) or spread evenly).

Monkeypatch-times, inside a fresh session (prewarmed exactly like
bench.py so worker-spawn tails don't pollute the reading):
  - DataFrame.collect  -> every per-iteration combine (one per iter)
  - DataFrame.first    -> the bounds + head lookups (setup)
  - _exact_partition_salts -> the one-off hash-probe job (setup,
    process-cached afterwards)
Runs each query fn N times end-to-end (timed like bench: noop sink)
WITHOUT evicting the salt cache between repeats — matching the bench,
where repeat 1 pays the probe and repeat 2 rides it.

Usage: python tools/probe_sgd_phases.py [sf_dir] [repeats] [out.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql.classic.dataframe import DataFrame

    from mapreduce_code_spark import registry
    from mapreduce_code_spark.operators import regression
    from mapreduce_code_spark.session import get_spark

    spark = get_spark(app_name="probe_sgd_phases")

    # bench-identical untimed prewarm
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.groupBy("n_regionkey").count().write.mode("overwrite").format(
        "noop"
    ).save()
    n_cpus = spark.sparkContext.defaultParallelism
    spark.range(0, 4 * n_cpus, 1, 1).repartition(n_cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    for fixture, consumers in registry.SOURCE_FIXTURES:
        if {"regression_sgd_linear", "regression_sgd_logistic"} & consumers:
            fixture(spark, sf_dir)

    events: list[tuple[str, float]] = []

    orig_collect = DataFrame.collect
    orig_first = DataFrame.first

    def collect(self):
        t0 = time.perf_counter()
        r = orig_collect(self)
        events.append(("collect", round(time.perf_counter() - t0, 4)))
        return r

    def first(self):
        t0 = time.perf_counter()
        r = orig_first(self)
        events.append(("first", round(time.perf_counter() - t0, 4)))
        return r

    DataFrame.collect = collect
    DataFrame.first = first

    orig_salts = regression._exact_partition_salts

    def salts(sp, n):
        t0 = time.perf_counter()
        r = orig_salts(sp, n)
        events.append(("salt_probe", round(time.perf_counter() - t0, 4)))
        return r

    regression._exact_partition_salts = salts

    qs = registry.queries()
    report: dict[str, list] = {}
    for name in ("regression_sgd_linear", "regression_sgd_logistic"):
        fn = qs[name]
        per_run = []
        for i in range(repeats):
            events.clear()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            total = round(time.perf_counter() - t0, 3)
            per_run.append(
                {
                    "total": total,
                    "iterations": regression.LAST_FIT_ITERATIONS.copy(),
                    "events": list(events),
                    "sum_collect": round(
                        sum(t for k, t in events if k == "collect"), 3
                    ),
                    "sum_first": round(
                        sum(t for k, t in events if k == "first"), 3
                    ),
                }
            )
        report[name] = per_run

    line = json.dumps({"probe": "sgd_phases", "sf_dir": sf_dir, "runs": report})
    print(line)
    if out:
        Path(out).write_text(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
