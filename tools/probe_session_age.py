"""Session-age A/B for a late-sweep bench flag (r16 verdict #5).

`similarity_assign_centroids` flagged ~1.8x typical in two independent
r16 windows (builder sweep 3: 2.37 s; driver: 2.814 s) while
same-round FRESH-session subset runs read 1.231 s — so the question is
whether the inflation is the DRIVER-WINDOW I/O mechanism (fixed for
checkpoints in r16, for shuffle scratch in r17) or simply SESSION AGE:
by its late position in a full 98-query sweep the JVM has run ~90
queries' worth of codegen, the code cache and GC heap are grown, and
Python worker pools have churned.

The A/B: time the target min-of-2 in (A) a FRESH session that runs
only the target, and (B) an AGED session that first runs the K queries
immediately PRECEDING the target in the full sweep's registry order —
the same neighborhood position the flagging sweeps gave it — then the
target. Both legs run through `bench.py <subset>` (the exact
measurement path the flags came from; bench executes a subset in
registry order, so the target lands last in leg B by construction).
Both legs idle — run nothing else alongside. If B >> A the mechanism
is session aging, not window I/O, and the flag needs no code action;
if B ~ A the aging hypothesis dies and the row goes back to the
window-I/O pile.

Usage: python tools/probe_session_age.py [target] [k_preceding] [out.json]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def bench_subset(names: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_BENCH_REPEATS", "2")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), *names],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
        timeout=1800,
    )
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"bench subset failed rc={out.returncode}")
    timings: dict[str, float] = {}
    for line in out.stderr.splitlines():
        m = re.match(r"# (\S+): ([0-9.]+)s", line)
        if m:
            timings[m.group(1)] = float(m.group(2))
    return timings


def main() -> int:
    target = sys.argv[1] if len(sys.argv) > 1 else "similarity_assign_centroids"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    sys.path.insert(0, str(REPO))
    from mapreduce_code_spark.registry import queries

    order = list(queries())
    if target not in order:
        raise SystemExit(f"unknown query {target!r}")
    idx = order.index(target)
    # the K queries that run immediately before the target in a full
    # sweep — the aged leg reproduces its usual late-sweep position
    warmup = order[max(0, idx - k) : idx]
    t0 = time.monotonic()
    fresh = bench_subset([target])
    aged = bench_subset([*warmup, target])
    result = {
        "target": target,
        "k_preceding": len(warmup),
        "warmup": warmup,
        "fresh_min": fresh.get(target),
        "aged_min": aged.get(target),
        "aged_over_fresh": (
            round(aged[target] / fresh[target], 2)
            if fresh.get(target) and aged.get(target)
            else None
        ),
        "aged_leg_timings": aged,
        "wall_sec": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(result))
    if len(sys.argv) > 3:
        Path(sys.argv[3]).write_text(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
