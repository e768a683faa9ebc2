"""Pure-pandas unit pins for tools/compare.frames_match — the compare
standard shared by the oracle check (driver_check), the determinism
audit, and the partition-invariance audit. Imports tools/compare
directly (pandas-only; importing driver_check would pull in duckdb,
pyspark, and the full engine registry just to test three pandas
functions — r13 review finding).

The r12 advisor found that a float-vs-string column pair raised an
uncaught ValueError out of frames_match (astype(float) on non-numeric
strings); in partition_invariance_audit the call sits outside the
per-query try, so one such mismatch would have crashed the whole audit
with no receipt instead of reporting MISMATCH. Pin that it now reports.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from compare import frames_match, normalize  # noqa: E402


def test_float_vs_string_column_reports_mismatch_not_crash():
    got = pd.DataFrame({"a": [1.5, 2.5]})
    want = pd.DataFrame({"a": ["x", "y"]})
    status = frames_match(got, want)
    assert status.startswith("VALUE MISMATCH"), status


def test_identical_frames_ok_and_float_rtol_absorbed():
    got = pd.DataFrame({"a": [1, 2], "b": [0.1, 0.2]})
    want = pd.DataFrame({"a": [1, 2], "b": [0.1 + 1e-12, 0.2]})
    assert frames_match(normalize(got), normalize(want)) == "OK"


def test_int_vs_float_dtype_drift_is_failure():
    # the driver hashes canonicalized values, so 0 vs 0.0 differs
    got = pd.DataFrame({"a": [0, 1]})
    want = pd.DataFrame({"a": [0.0, 1.0]})
    status = frames_match(got, want)
    assert status.startswith("DTYPE DRIFT"), status
