"""Round-close receipt regeneration (r12 verdict item 1).

The determinism and partition-invariance artifacts exist so the judge
does not have to argue that intervening commits were result-inert —
r12's DETERMINISM receipt predated its last four code commits and the
verdict flagged exactly that. This script makes the ordering a
mechanical property instead of a discipline:

1. Refuses to run if the working tree has uncommitted CODE changes
   (anything under mapreduce_code_spark/, tools/, tests/, or the
   contract/bench entry points — deliberately coarser than "*.py":
   a dirty path under a code dir fails SAFE even if it is a stray
   .md, because the cost of a spurious refusal is one commit, while
   the cost of a miscertified receipt is an argument with the judge).
   Root-level round artifacts (SURVEY.md, *_r{N}.json, logs) may be
   dirty. A rename counts as dirty if EITHER side is a code path.
2. Runs the determinism audit (sf0.01) and the partition-invariance
   audit (sf0.01 per r12 verdict item 2 — r12 banked it at sf0.001,
   where several queries have too few rows to exercise multi-partition
   reduction trees) as SUBPROCESSES, so each gets the same bare-session
   environment the standalone tools use. The SPARK_GRAFT_*_OUT
   overrides are stripped from the child env so the receipts land at
   their canonical round paths.
3. Verifies each receipt by PROVENANCE, not glob-newest mtime: the
   audit prints ``artifact: <path>`` only after writing; round_close
   captures that exact path, re-reads it, checks its recorded sf_dir
   matches this run's AND its recorded ``head_sha`` equals the current
   HEAD (the receipt names the commit it certifies — content, not
   mtime: a regenerated receipt over unchanged results is
   byte-identical, so git history alone cannot order it), and only
   then checks its mtime postdates the last code commit. (A
   refuse-to-overwrite exit, an env-redirected receipt, or a stale
   checked-out file can therefore never be certified — the r13 review
   finding.)

Usage: python tools/round_close.py [--skip-determinism]
       [--skip-invariance]
Exit 0 = both audits green and ordering verified.
"""

from __future__ import annotations

import json
import os
import re
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


def _is_code(path: str) -> bool:
    return any(path.startswith(g) or path == g for g in CODE_GLOBS)


def classify_dirty(porcelain: str) -> list[str]:
    """Paths from ``git status --porcelain`` output that sit under the
    code globs (would invalidate a receipt). Root-level round artifacts
    pass. A rename is dirty if EITHER endpoint is a code path — a
    rename FROM code removes code from the tree just as surely as an
    edit (review finding: the destination-only check let
    'R tools/x.py -> NOTES.md' escape)."""
    dirty = []
    for line in porcelain.splitlines():
        rest = line[3:].strip()
        sides = [s.strip().strip('"') for s in rest.split(" -> ")]
        hits = [s for s in sides if _is_code(s)]
        if hits:
            # report the code-side path(s); for a code->code rename the
            # destination is what is dirty now
            dirty.append(hits[-1])
    return dirty


def dirty_code_paths() -> list[str]:
    return classify_dirty(_git("status", "--porcelain"))


def last_code_commit_epoch() -> tuple[str, int]:
    sha = _git("log", "-1", "--format=%H", "--", *CODE_GLOBS)
    epoch = int(_git("show", "-s", "--format=%ct", sha))
    return sha, epoch


def _run_audit(cmd: list[str]) -> tuple[int, str | None]:
    """Run an audit subprocess, teeing stdout through, and return
    (returncode, artifact_path) where artifact_path is parsed from the
    audit's own ``artifact: <path>`` line — printed only after a
    successful write, so it is the receipt's provenance."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("SPARK_GRAFT_DETERMINISM_OUT", "SPARK_GRAFT_PARTITION_OUT")
    }
    proc = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True, text=True)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-2000:] if proc.stderr else "")
    m = None
    for m in re.finditer(r"^artifact: (.+)$", proc.stdout, re.M):
        pass  # keep the last one
    return proc.returncode, (m.group(1).strip() if m else None)


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

    steps: list[tuple[str, list[str]]] = []
    if not skip_det:
        steps.append(
            ("determinism", [sys.executable, "tools/determinism_audit.py", SF_DIR])
        )
    if not skip_inv:
        steps.append(
            (
                "partition-invariance",
                [sys.executable, "tools/partition_invariance_audit.py", SF_DIR],
            )
        )

    failures = []
    for label, cmd in steps:
        print(f"\n=== {label} audit ({SF_DIR}) ===")
        rc, artifact = _run_audit(cmd)
        if rc != 0:
            print(f"{label}: FAILED (exit {rc})")
            failures.append(label)
            continue
        if artifact is None:
            # exit 0 with no artifact line = the audit's
            # refuse-to-overwrite path (or a filtered run) — nothing was
            # written this run, so there is nothing to certify
            print(f"{label}: NO RECEIPT WRITTEN this run (refused overwrite?)")
            failures.append(label)
            continue
        path = Path(artifact)
        try:
            receipt = json.loads(path.read_text())
        except (OSError, ValueError) as exc:
            print(f"{label}: receipt {path} unreadable: {exc}")
            failures.append(label)
            continue
        if receipt.get("sf_dir") != SF_DIR:
            print(
                f"{label}: receipt {path.name} records "
                f"sf_dir={receipt.get('sf_dir')!r}, expected {SF_DIR!r}"
            )
            failures.append(label)
            continue
        # the strong check: the receipt names the commit it certifies
        # (content, not mtime — a regenerated receipt over unchanged
        # results is byte-identical, so git history alone can't order it)
        head = _git("rev-parse", "HEAD")
        recorded_sha = receipt.get("head_sha")
        if recorded_sha != head:
            print(
                f"{label}: receipt {path.name} certifies "
                f"head_sha={str(recorded_sha)[:12]}, but HEAD is {head[:12]}"
            )
            failures.append(label)
            continue
        mtime = int(path.stat().st_mtime)
        ok = mtime > code_epoch
        print(
            f"{label}: {path.name} certifies HEAD {head[:12]}; mtime "
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
