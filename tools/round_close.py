"""Round-close receipt regeneration (r12 verdict item 1).

The determinism and partition-invariance artifacts exist so the judge
does not have to argue that intervening commits were result-inert —
r12's DETERMINISM receipt predated its last four code commits and the
verdict flagged exactly that. This script makes the ordering a
mechanical property instead of a discipline:

1. Refuses to run if the working tree has uncommitted CODE changes
   (tracked .py files under mapreduce_code_spark/, tools/, tests/, or
   the contract/bench entry points) — receipts generated over a dirty
   tree certify nothing. Round artifacts (*.json, *.md) may be dirty.
2. Runs the determinism audit (sf0.01) and the partition-invariance
   audit (sf0.01 per r12 verdict item 2 — r12 banked it at sf0.001,
   where several queries have too few rows to exercise multi-partition
   reduction trees) as SUBPROCESSES, so each gets the same bare-session
   environment the standalone tools use.
3. Verifies both written receipts' mtimes postdate the last code
   commit, and prints the timestamps for the commit message.

Usage: python tools/round_close.py [--skip-determinism]
       [--skip-invariance]
Exit 0 = both audits green and ordering verified.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

CODE_GLOBS = (
    "mapreduce_code_spark/",
    "tools/",
    "tests/",
    "__spark_entry__.py",
    "bench.py",
)

SF_DIR = "/root/testdata/sf0.01"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, capture_output=True, text=True, check=True
    ).stdout.strip()


def classify_dirty(porcelain: str) -> list[str]:
    """Paths from ``git status --porcelain`` output that are CODE (would
    invalidate a receipt); round artifacts (*.json, *.md, logs) pass."""
    dirty = []
    for line in porcelain.splitlines():
        path = line[3:].split(" -> ")[-1].strip().strip('"')
        if any(path.startswith(g) or path == g for g in CODE_GLOBS):
            dirty.append(path)
    return dirty


def dirty_code_paths() -> list[str]:
    return classify_dirty(_git("status", "--porcelain"))


def last_code_commit_epoch() -> tuple[str, int]:
    sha = _git("log", "-1", "--format=%H", "--", *CODE_GLOBS)
    epoch = int(_git("show", "-s", "--format=%ct", sha))
    return sha, epoch


def main() -> int:
    skip_det = "--skip-determinism" in sys.argv
    skip_inv = "--skip-invariance" in sys.argv

    dirty = dirty_code_paths()
    if dirty:
        print("REFUSING: uncommitted code changes — receipts over a dirty")
        print("tree certify nothing. Commit first:")
        for p in dirty:
            print(f"  {p}")
        return 2

    sha, code_epoch = last_code_commit_epoch()
    print(
        f"last code commit: {sha[:12]} at "
        f"{time.strftime('%Y-%m-%d %H:%M:%S', time.localtime(code_epoch))}"
    )

    steps: list[tuple[str, list[str], str]] = []
    if not skip_det:
        steps.append(
            (
                "determinism",
                [sys.executable, "tools/determinism_audit.py", SF_DIR],
                "DETERMINISM_r*.json",
            )
        )
    if not skip_inv:
        steps.append(
            (
                "partition-invariance",
                [sys.executable, "tools/partition_invariance_audit.py", SF_DIR],
                "PARTITION_INVARIANCE_r*.json",
            )
        )

    failures = []
    for label, cmd, glob in steps:
        print(f"\n=== {label} audit ({SF_DIR}) ===")
        rc = subprocess.run(cmd, cwd=ROOT).returncode
        if rc != 0:
            print(f"{label}: FAILED (exit {rc})")
            failures.append(label)
            continue
        newest = max(ROOT.glob(glob), key=lambda p: p.stat().st_mtime)
        mtime = int(newest.stat().st_mtime)
        ok = mtime > code_epoch
        print(
            f"{label}: {newest.name} mtime "
            f"{time.strftime('%Y-%m-%d %H:%M:%S', time.localtime(mtime))} "
            f"{'POSTDATES' if ok else 'PREDATES'} last code commit"
        )
        if not ok:
            failures.append(label)

    if failures:
        print(f"\nROUND CLOSE FAILED: {failures}")
        return 1
    print("\nROUND CLOSE OK: receipts regenerated and postdate the last code commit")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
