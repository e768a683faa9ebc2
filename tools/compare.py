"""Driver-faithful result comparison — pandas-only, no Spark/DuckDB.

Extracted from tools/driver_check.py (r13 review finding: the "pure
pandas" unit pins imported driver_check, whose module scope pulls in
duckdb, pyspark, and the full engine registry). This module is the
shared compare standard for the oracle check (driver_check), the
determinism audit, and the partition-invariance audit; driver_check
re-exports both names so existing imports keep working.
"""

from __future__ import annotations

import pandas as pd


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def frames_match(got: pd.DataFrame, want: pd.DataFrame) -> str:
    """Driver-faithful compare of two NORMALIZED frames; returns "OK" or
    the first failure reason. The driver hashes canonicalized values, so
    DuckDB HUGEINT->float64 drift against Spark's int64 is a FAILURE
    even when values are numerically equal (e.g. 0.0 vs 0). rtol applies
    only when BOTH sides are genuinely float; integer columns compare
    exactly. Shared by the oracle check and the partition-invariance
    audit (same standard: "would the driver row stay green")."""
    if list(got.columns) != list(want.columns):
        return (
            f"SCHEMA MISMATCH spark={list(got.columns)} "
            f"oracle={list(want.columns)}"
        )
    if len(got) != len(want):
        return f"ROWCOUNT MISMATCH spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        g_int = pd.api.types.is_integer_dtype(g)
        w_int = pd.api.types.is_integer_dtype(w)
        try:
            if g_int != w_int and pd.api.types.is_numeric_dtype(
                g
            ) and pd.api.types.is_numeric_dtype(w):
                return (
                    f"DTYPE DRIFT in {c}: spark={g.dtype} "
                    f"oracle={w.dtype} (driver hash would differ)"
                )
            if g_int and w_int:
                if not g.astype("int64").equals(w.astype("int64")):
                    return f"VALUE MISMATCH in {c}"
            elif pd.api.types.is_float_dtype(
                g
            ) or pd.api.types.is_float_dtype(w):
                pd.testing.assert_series_equal(
                    g.astype(float), w.astype(float),
                    check_names=False, rtol=1e-9, check_dtype=False)
            elif not g.astype(str).equals(w.astype(str)):
                return f"VALUE MISMATCH in {c}"
        except (AssertionError, TypeError, OverflowError, ValueError):
            # ValueError: astype(float) on a non-numeric column when one
            # side is float and the other string — a genuine mismatch,
            # not an audit crash (r12 advisor low: the extraction exposed
            # partition_invariance_audit, whose frames_match call sits
            # outside its per-query try, to an uncaught ValueError).
            return f"VALUE MISMATCH in {c}"
    return "OK"
