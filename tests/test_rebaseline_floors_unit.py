"""Unit pins for tools/rebaseline_floors.py (r13 verdict #1 escape
hatch). The tool rewrites the bench-contract floor sidecar, so its
refusal paths — sf mismatch, overwrite of an existing archive, a sweep
missing a floor query — must fail loudly, and the happy path must
compute min-over-every-sample with honest provenance. Pure-subprocess
tests over a temp tree; the real invocation's output is the committed
r14 sidecar + bench_floors_r12host.json archive.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

TOOL = Path(__file__).resolve().parent.parent / "tools" / "rebaseline_floors.py"


def _run(tmp: Path, args: list[str]) -> subprocess.CompletedProcess:
    # the tool resolves ROOT from its own location; copy it into the
    # temp tree so the sidecar it touches is the fixture, never the
    # repo's committed one
    tooldir = tmp / "tools"
    tooldir.mkdir(exist_ok=True)
    (tooldir / "rebaseline_floors.py").write_text(TOOL.read_text())
    return subprocess.run(
        [sys.executable, str(tooldir / "rebaseline_floors.py"), *args],
        cwd=tmp, capture_output=True, text=True,
    )


def _sidecar(tmp: Path, sf="0.1", queries=None) -> None:
    (tmp / "bench_timings.json").write_text(json.dumps({
        "sf": sf,
        "total_sec": 3.0,
        "queries": queries or {"q1": 1.0, "q2": 2.0},
    }))


def _sweep(tmp: Path, name: str, runs, sf="0.1") -> str:
    p = tmp / name
    p.write_text(json.dumps({
        "sf": sf, "fresh_total_sec": 9.9, "repeats": 2, "runs": runs,
        "contended": [], "sgd_iterations": {},
    }))
    return str(p)


def test_happy_path_min_over_all_samples_and_provenance(tmp_path):
    _sidecar(tmp_path)
    s = [
        _sweep(tmp_path, "s1.json", {"q1": [1.9, 1.7], "q2": [3.0, 2.8]}),
        _sweep(tmp_path, "s2.json", {"q1": [1.5, 1.8], "q2": [2.9, 3.1]}),
        _sweep(tmp_path, "s3.json", {"q1": [1.6, 2.0], "q2": [2.6, 2.7]}),
    ]
    proc = _run(tmp_path, ["oldhost", *s])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = json.loads((tmp_path / "bench_timings.json").read_text())
    assert out["queries"] == {"q1": 1.5, "q2": 2.6}  # min over all 6
    # typical seeded from the SAME samples (r15: median over all 6),
    # so a re-baseline never drops bench.fold_policy's reference
    assert out["typical"] == {"q1": 1.75, "q2": 2.85}
    assert out["run_contended"] is False
    rb = out["rebaselined"]
    assert rb["archived_floors"] == "bench_floors_oldhost.json"
    assert rb["archived_total_sec"] == 3.0
    assert rb["n_samples_per_query"] == 6
    # archive preserves the incumbent floors byte-meaningfully
    arch = json.loads((tmp_path / "bench_floors_oldhost.json").read_text())
    assert arch["queries"] == {"q1": 1.0, "q2": 2.0}


def test_refuses_sf_mismatch_between_sweeps(tmp_path):
    _sidecar(tmp_path)
    s = [
        _sweep(tmp_path, "s1.json", {"q1": [1.0], "q2": [1.0]}),
        _sweep(tmp_path, "s2.json", {"q1": [1.0], "q2": [1.0]}, sf="0.01"),
        _sweep(tmp_path, "s3.json", {"q1": [1.0], "q2": [1.0]}),
    ]
    proc = _run(tmp_path, ["t", *s])
    assert proc.returncode == 2 and "disagree on sf" in proc.stdout
    # sidecar untouched on refusal
    assert json.loads((tmp_path / "bench_timings.json").read_text())[
        "queries"] == {"q1": 1.0, "q2": 2.0}


def test_refuses_existing_archive_and_missing_runs(tmp_path):
    _sidecar(tmp_path)
    s = [
        _sweep(tmp_path, "s1.json", {"q1": [1.0], "q2": [1.0]}),
        _sweep(tmp_path, "s2.json", {"q1": [1.0], "q2": [1.0]}),
        _sweep(tmp_path, "s3.json", {"q1": [1.0], "q2": [1.0]}),
    ]
    (tmp_path / "bench_floors_t.json").write_text("{}")
    proc = _run(tmp_path, ["t", *s])
    assert proc.returncode == 2 and "REFUSING to overwrite" in proc.stdout

    _sidecar(tmp_path, queries={"q1": 1.0, "q2": 2.0, "q3": 3.0})
    proc = _run(tmp_path, ["t2", *s])  # sweeps lack q3
    assert proc.returncode == 2 and "lacks runs" in proc.stdout
