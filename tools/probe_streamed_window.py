"""Reproduce the driver-window slowdown on the checkpoint-heavy
streamed rows (r15 verdict #1).

The observation: `dedup_streamed_incremental` read >=1.8x its floor in
the DRIVER's bench window in both r14 and r15 (6.02/6.54 s in r15 vs
2.87 s builder-idle) and `events_streamed_view_purchase` read 4.50/7.53
s vs a 2.115 s floor — while the same run's MEDIAN was 0.913 (clean)
and every builder-idle sweep put both rows within ~1.2x. So the
mechanism is row-selective, not global contention.

What distinguishes exactly these rows: their timed section performs
many SMALL SYNCHRONOUS FILESYSTEM COMMITS on the root disk —
`events_streamed_view_purchase` is a stream-stream join (4 state
stores x 4 partitions committing per micro-batch to the memory sink's
temp checkpoint under /tmp), `dedup_streamed_incremental` runs
foreachBatch with an explicit /tmp checkpoint plus a per-batch parquet
sink. Every batch row, by contrast, executes against the noop sink —
zero filesystem commits in the timed path. A concurrent writer issuing
fsyncs on the same disk (the driver archiving receipts/artifacts in
its window) stalls small-file create/rename/commit latency without
consuming enough CPU to move the run median.

This probe measures that directly: it times a fixed query subset via
`bench.py <subset>` (the exact measurement path the driver uses) twice
— once idle, once with a background contender process doing
write+fsync loops on the root disk — and reports both legs. If the
streamed rows inflate under the contender while the batch controls
hold, the mechanism is named. Run it again after pointing the
streamed scaffolding's checkpoints/sinks at /dev/shm (tmpfs): the
inflation should vanish, because tmpfs commits never touch the disk
queue the contender is stalling.

Usage: python tools/probe_streamed_window.py [mode] [out.json]
  mode: "both" (default) | "idle" | "contended" | "meta" | "cpu" | "mix"
  ("meta" = contended leg with the small-file create+fsync+rename
  contender; "cpu" = contended leg with N short-burst CPU spinners —
  models a driver process doing its own work during the bench window)
Emits one JSON line; write it to a probe receipt when done.

SPARK_GRAFT_PROBE_SUBSET=a,b,c overrides the query subset (r16 verdict
#1: the r17 follow-up probes the BATCH shuffle-writing rows the driver
window flagged after the streamed rows were fixed). Because run_leg
propagates the environment, exporting SPARK_GRAFT_DISK_LOCAL=1 gives a
pre-fix leg (Spark local dirs + scratch back on the root disk) and the
default environment the post-fix (tmpfs) leg.
"""

from __future__ import annotations

import json
import os
import re
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# the two flagged rows, two streamed controls that did NOT flag, and
# two batch controls (one shuffle-heavy, one the verdict-#5 nit row);
# SPARK_GRAFT_PROBE_SUBSET overrides (module docstring)
SUBSET = [
    s
    for s in os.environ.get("SPARK_GRAFT_PROBE_SUBSET", "").split(",")
    if s
] or [
    "dedup_streamed_incremental",
    "events_streamed_view_purchase",
    "events_streamed_tumbling",
    "relational_streamed_hll",
    "dedup_ngram_jaccard",
    "relational_histogram_quantiles",
]

_CONTENDER = r"""
import os, sys, time
d = sys.argv[1]
mode = sys.argv[2]
buf = os.urandom(1 << 22)  # 4 MiB
i = 0
while True:
    if mode == "bulk":
        # one 32 MiB file + fsync per iteration: the shape of a driver
        # archiving bench/correctness artifacts
        p = os.path.join(d, f"c{i % 4}.bin")
        with open(p, "wb") as f:
            for _ in range(8):
                f.write(buf)
            f.flush(); os.fsync(f.fileno())
    elif mode == "meta":
        # many small create+fsync+rename: the shape of a concurrent
        # checkpoint/state-store writer
        for j in range(64):
            p = os.path.join(d, f"s{j}.tmp")
            with open(p, "wb") as f:
                f.write(buf[:4096])
                f.flush(); os.fsync(f.fileno())
            os.replace(p, os.path.join(d, f"s{j}.f"))
    else:
        # short CPU bursts with sleeps: a driver process doing its own
        # bookkeeping — too little total CPU to move a 32-core run
        # median, but enough to jitter task-launch latency on rows
        # whose critical path is many tiny sequential stages
        t = time.monotonic()
        while time.monotonic() - t < 0.05:
            sum(k * k for k in range(10000))
        time.sleep(0.05)
    i += 1
"""


def run_leg(contended: bool, contender_mode: str = "bulk") -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_BENCH_REPEATS", "2")
    procs: list[subprocess.Popen] = []
    work = None
    if contended:
        work = tempfile.mkdtemp(prefix="probe_contender_", dir="/tmp")
        # "mix" models a live driver process: CPU bookkeeping bursts +
        # small-file fsync writes at once
        modes = (
            ["cpu"] * 4
            if contender_mode == "cpu"
            else ["cpu", "cpu", "meta", "bulk"]
            if contender_mode == "mix"
            else [contender_mode]
        )
        for m in modes:
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-c", _CONTENDER, work, m]
                )
            )
    t0 = time.monotonic()
    try:
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), *SUBSET],
            capture_output=True,
            text=True,
            env=env,
            cwd=str(REPO),
            timeout=1800,
        )
    finally:
        for p in procs:
            p.send_signal(signal.SIGTERM)
            p.wait()
        if work:
            for f in Path(work).iterdir():
                f.unlink(missing_ok=True)
            os.rmdir(work)
    wall = round(time.monotonic() - t0, 1)
    timings: dict[str, float] = {}
    for line in out.stderr.splitlines():
        m = re.match(r"# (\S+): ([0-9.]+)s", line)
        if m:
            timings[m.group(1)] = float(m.group(2))
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"bench subset failed rc={out.returncode}")
    return {"timings": timings, "wall_sec": wall, "contended": contended}


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    legs = {}
    if mode in ("both", "idle"):
        legs["idle"] = run_leg(False)
        print(f"[probe] idle: {legs['idle']['timings']}", file=sys.stderr)
    if mode in ("both", "contended", "meta", "cpu", "mix"):
        cmode = mode if mode in ("meta", "cpu", "mix") else "bulk"
        legs["contended"] = run_leg(True, contender_mode=cmode)
        legs["contended"]["contender_mode"] = cmode
        print(
            f"[probe] contended({cmode}): {legs['contended']['timings']}",
            file=sys.stderr,
        )
    result: dict = {"subset": SUBSET, "legs": legs}
    if "idle" in legs and "contended" in legs:
        # both sides guarded (r16 advisor, low): a 0/absent IDLE parse
        # must skip the query, not ZeroDivisionError away the whole
        # receipt after both legs already ran
        result["inflation"] = {
            n: round(legs["contended"]["timings"][n] / t, 2)
            for n, t in legs["idle"]["timings"].items()
            if t and legs["contended"]["timings"].get(n)
        }
    print(json.dumps(result))
    if len(sys.argv) > 2:
        Path(sys.argv[2]).write_text(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
