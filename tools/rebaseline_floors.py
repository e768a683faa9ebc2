"""Re-baseline the per-query bench floors on the CURRENT host (r13
verdict #1 escape hatch).

bench.py's floor sidecar refuses to fold contended runs — correct for
tracking engine time on a stable host, but after the r12 clean-window
host was replaced by a ~40-50% slower one, EVERY run reads contended
against the old floors and the 2x-of-floor contract rides on a stale
artifact forever. The sanctioned exit (r13 verdict: "declare the r12
floors a faster host's numbers, re-baseline per-query floors on the
current host with a min-of-3 contended protocol, and record the host
delta in BASELINE.md"):

1. Archive the incumbent sidecar to ``bench_floors_<tag>.json`` (a
   committed artifact — the old host's engine-time floors stay
   inspectable, they are not overwritten history).
2. New floor per query = min over EVERY sample (all repeats of all
   sweeps) from >=3 same-sf sweep snapshots taken on the current host.
   Min-of-many across independent invocations is exactly how the old
   floors were earned; three sweeps x repeats=2 gives 6 samples per
   query, which bounds single-run noise without pretending the host
   is faster than it is.
3. Write a fresh ``bench_timings.json`` with the same schema bench.py
   reads (``sf`` + ``queries``) plus a ``rebaselined`` block recording
   provenance: sweep files, the archived floor total, the new total,
   and the per-query median host delta.

Usage: python tools/rebaseline_floors.py <archive_tag> <sweep.json>...
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        print("need an archive tag and >=3 sweep snapshots (min-of-3 protocol)")
        return 2
    tag = sys.argv[1]
    sweep_paths = [Path(p) for p in sys.argv[2:]]
    sweeps = [json.loads(p.read_text()) for p in sweep_paths]

    sfs = {s.get("sf") for s in sweeps}
    if len(sfs) != 1:
        print(f"REFUSING: sweeps disagree on sf: {sfs}")
        return 2
    sf = sfs.pop()

    sidecar = ROOT / "bench_timings.json"
    old = json.loads(sidecar.read_text())
    if old.get("sf") != sf:
        print(f"REFUSING: sidecar sf={old.get('sf')!r} != sweeps sf={sf!r}")
        return 2
    archive = ROOT / f"bench_floors_{tag}.json"
    if archive.exists():
        print(f"REFUSING to overwrite archive {archive.name}")
        return 2

    names = set(old.get("queries", {}))
    for s, p in zip(sweeps, sweep_paths):
        # empty lists count as missing: a floor computed from fewer
        # samples than the advertised protocol must refuse, not shrink
        missing = {n for n in names if not s.get("runs", {}).get(n)}
        if missing:
            print(f"REFUSING: {p.name} lacks runs for {sorted(missing)[:5]}...")
            return 2
        # a sweep query with no incumbent floor gets NO floor here — the
        # same policy as bench.py (newly registered queries earn their
        # entry on the next clean run) — but loudly, never silently
        extra = set(s["runs"]) - names
        if extra:
            print(
                f"note: {p.name} measured {sorted(extra)} which have no "
                "incumbent floor; they are NOT given floors by this tool"
            )

    new_floors = {
        n: round(min(t for s in sweeps for t in s["runs"][n]), 3)
        for n in sorted(names)
    }
    # seed TYPICAL from the same samples (r15: bench.fold_policy's
    # contended test and regression bar compare against typical, the
    # median honest-idle time — a re-baseline that wrote only min
    # floors would silently drop the reference and resume the
    # vs-min-envelope ratchet the typical exists to prevent)
    new_typical = {
        n: round(
            statistics.median(t for s in sweeps for t in s["runs"][n]), 3
        )
        for n in sorted(names)
    }
    old_floors = old["queries"]
    ratios = sorted(
        new_floors[n] / old_floors[n] for n in names if old_floors[n] > 0
    )
    # every committed floor is >0 in practice; None (not a crash) if a
    # degenerate sidecar ever makes the median undefined. True median
    # (averages the two middle elements on even-length lists — 98
    # queries is even; r14 advisor low: the upper-middle shortcut could
    # sit half a gap off).
    host_delta = round(statistics.median(ratios), 3) if ratios else None

    archive.write_text(json.dumps(old, indent=1, sort_keys=True))
    last = sweeps[-1]
    out = {
        "total_sec": round(sum(new_floors.values()), 3),
        "n_floor_queries": len(new_floors),
        "fresh_total_sec": last.get("fresh_total_sec"),
        "sf": sf,
        "repeats": last.get("repeats"),
        "queries": new_floors,
        "typical": new_typical,
        "runs": last.get("runs"),
        "contended": last.get("contended"),
        "median_ratio_vs_reference": 1.0,
        "run_contended": False,
        "regressed_vs_prior": [],
        "sgd_iterations": last.get("sgd_iterations"),
        "rebaselined": {
            "archived_floors": archive.name,
            "archived_total_sec": old.get("total_sec"),
            "sweep_files": [p.name for p in sweep_paths],
            # min over queries, so the count is the GUARANTEED number of
            # samples behind every floor (a set-iteration sample could
            # overstate a query that lost a repeat)
            "n_samples_per_query": sum(
                min(len(s["runs"][n]) for n in names) for s in sweeps
            ),
            "median_host_delta_vs_archived": host_delta,
        },
    }
    sidecar.write_text(json.dumps(out, indent=1, sort_keys=True))
    print(
        f"floors re-baselined: {old.get('total_sec')}s ({archive.name}) -> "
        f"{out['total_sec']}s over {len(new_floors)} queries; "
        f"median per-query host delta {host_delta}x"
    )
    print(f"artifact: {sidecar}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
