"""Pins the SGD golden-theta oracle to a fresh fit (r13 verdict #2).

The pinned literals in ``operators/sgd_theta_pinned.py`` are only a
valid oracle while a fresh ``sgd_fit`` at the registered layout still
reproduces them bit-for-bit; this suite re-derives them every run so a
kernel, prep-plan, or fixture change turns a silently-wrong oracle
into a loud test failure. Runs at sf0.01 — the driver's correctness
tier, the tier the literals were captured at — not the smoke sf.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_code_spark import registry
from mapreduce_code_spark.operators.sgd_theta_pinned import (
    SGD_GOLDEN,
    double_literal,
    sgd_theta_oracle_sql,
)

SF_ORACLE = "/root/testdata/sf0.01"


@pytest.mark.parametrize("link,qname", [
    ("linear", "regression_sgd_linear"),
    ("logistic", "regression_sgd_logistic"),
])
def test_golden_theta_reproduces_fresh_fit(spark, link, qname):
    """A fresh run of the REGISTERED query at the driver tier must equal
    the pinned literals bit-for-bit (compared via float.hex, so an
    ulp of drift fails — rtol would mask exactly the regressions the
    golden oracle exists to catch)."""
    rows = sorted(
        registry.queries()[qname](spark, SF_ORACLE).collect(),
        key=lambda r: r["coef_idx"],
    )
    theta, iterations, converged = SGD_GOLDEN[link]
    assert [r["coef_idx"] for r in rows] == list(range(len(theta)))
    assert [r["theta"].hex() for r in rows] == [t.hex() for t in theta]
    assert all(r["iterations"] == iterations for r in rows)
    assert all(r["converged"] == converged for r in rows)


@pytest.mark.parametrize("link", ["linear", "logistic"])
def test_oracle_literals_parse_bit_identical_in_duckdb(link):
    """DuckDB must parse the oracle's e-notation literals to the exact
    doubles (a bare decimal literal goes through DECIMAL and loses an
    ulp on 2 of these 8 values — the reason double_literal exists)."""
    con = duckdb.connect()
    got = con.sql(sgd_theta_oracle_sql(link)).fetchall()
    con.close()
    theta, iterations, converged = SGD_GOLDEN[link]
    assert [(r[0], r[1].hex(), r[2], r[3]) for r in sorted(got)] == [
        (i, t.hex(), iterations, converged) for i, t in enumerate(theta)
    ]


def test_double_literal_survives_duckdb_round_trip():
    """The two observed ulp-trap values plus edge shapes round-trip."""
    vals = [
        0.029504291107419138,   # DECIMAL-parse lost an ulp on this one
        -0.021634732074917326,  # and this one
        1.0, -0.0, 1e-300, 123456789.123456789, 5e-324,
    ]
    con = duckdb.connect()
    for v in vals:
        got = con.sql(f"SELECT {double_literal(v)} AS t").fetchone()[0]
        assert got.hex() == v.hex(), v
    con.close()


def test_assert_pinned_sf_guards_other_tiers():
    """r14 verdict #3: the golden literals are valid ONLY at sf0.01, so
    the guard must pass that tier (any path spelling) and fail every
    other tier with a self-describing error naming the pinned sf and
    the recapture path — never a silent hash mismatch on correct rows."""
    from mapreduce_code_spark.operators.sgd_theta_pinned import (
        PINNED_SF_DIR,
        PINNED_SF_QUERIES,
        assert_pinned_sf,
    )

    assert PINNED_SF_DIR == "sf0.01"
    # both registered SGD rows carry the pin, and only they do
    assert PINNED_SF_QUERIES == (
        "regression_sgd_linear",
        "regression_sgd_logistic",
    )
    for ok in ("/root/testdata/sf0.01", "/root/testdata/sf0.01/", "sf0.01"):
        assert_pinned_sf(ok, "regression_sgd_linear")
    for bad in ("/root/testdata/sf0.1", "/root/testdata/sf0.001", "sf1"):
        with pytest.raises(ValueError, match="pinned to sf0.01"):
            assert_pinned_sf(bad, "regression_sgd_logistic")


def test_driver_check_consults_the_pin():
    """tools/driver_check.py must import the guard so a correctness run
    at a non-pinned sf fails self-describingly before the Spark run —
    pinned here so a refactor can't silently drop the wiring."""
    import pathlib

    src = pathlib.Path(
        __file__
    ).resolve().parent.parent.joinpath("tools", "driver_check.py").read_text()
    assert "assert_pinned_sf" in src and "PINNED_SF_QUERIES" in src
