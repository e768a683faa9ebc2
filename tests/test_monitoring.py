"""Monitoring operators: z-score anomalies and chi-square drift —
oracle parity (exact, rtol=0), statistical invariants, and the
stream-static scoring path."""

from __future__ import annotations

import pytest

from mapreduce_code_spark.operators import monitoring as MON
from mapreduce_code_spark.sources.io import load_table
from tests.helpers import assert_parity


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_anomaly_oracle_parity_exact(spark, sf_dir, events):
    assert_parity(MON.anomaly_zscore(events), sf_dir, MON.anomaly_zscore_sql(), rtol=0)


def test_drift_oracle_parity_exact(spark, sf_dir, events):
    assert_parity(MON.drift_chisq(events), sf_dir, MON.drift_chisq_sql(), rtol=0)


def test_anomalies_exceed_threshold_and_are_rare(events):
    rows = MON.anomaly_zscore(events).collect()
    assert rows, "synthetic values should contain >3-sigma outliers"
    assert all(abs(r["z"]) > 3.0 for r in rows)
    # 3-sigma outliers are a small tail, not a mislabeled bulk
    assert len(rows) < events.count() * 0.05


def test_drift_margins_and_nonnegativity(events):
    rows = MON.drift_chisq(events).collect()
    assert sum(r["n_ref"] + r["n_cur"] for r in rows) == events.count()
    assert all(r["chisq"] >= 0.0 for r in rows)
    # the synthetic stream is stationary: the halves should NOT drift
    # (total chi-square over df=4 far below the 0.01 critical value)
    assert sum(r["chisq"] for r in rows) < 13.28


def test_scoring_against_reference_stats_is_stateless(spark, events):
    # scoring half the stream against FULL-stream stats flags exactly
    # the full-run anomalies that fall in that half — the property that
    # makes the operator safe to run incrementally / as a stream
    full = {r["event_id"]: r["z"] for r in MON.anomaly_zscore(events).collect()}
    stats = MON.value_stats(events)
    half = events.where("event_id % 2 = 0")
    got = {
        r["event_id"]: r["z"]
        for r in MON.score_zscore(half, stats).collect()
    }
    want = {eid: z for eid, z in full.items() if eid % 2 == 0}
    assert got == want


def test_value_stats_exactness(spark, events):
    # sufficient statistics are exact integers: recompute driver-side
    import math

    pdf = events.select("event_type", "value").toPandas()
    vq = (pdf["value"].astype(float) * 100.0 + 0.5).apply(math.floor)
    by = pdf.assign(vq=vq).groupby("event_type")["vq"]
    want = {
        t: (int(g.count()), int(g.sum()), int((g * g).sum()))
        for t, g in by
    }
    got = {
        r["event_type"]: (r["n"], int(r["s"]), int(r["ss"]))
        for r in MON.value_stats(events).collect()
    }
    assert got == want


def _mon_cross_check(spark, rows, sql, columns="event_id BIGINT, event_type STRING, value DOUBLE"):
    """Run a synthetic events slice through BOTH engines."""
    import duckdb
    import pandas as pd

    sdf = spark.createDataFrame(rows, columns)
    con = duckdb.connect()
    con.register("events", sdf.toPandas())
    want = con.execute(sql).df()
    return sdf, want


def test_constant_value_group_flags_nothing_both_engines(spark):
    # sigma = 0: must not crash under ANSI mode, must not diverge from
    # the oracle (which yields NULL z -> dropped), in either engine
    rows = [(i, "flatfee", 9.99) for i in range(50)] + [
        (100 + i, "normal", float(i)) for i in range(50)
    ] + [(999, "normal", 1e6)]
    sdf, want = _mon_cross_check(spark, rows, MON.anomaly_zscore_sql())
    got = MON.anomaly_zscore(sdf).toPandas()
    assert set(got["event_type"]) == {"normal"} == set(want["event_type"])
    assert sorted(got["event_id"]) == sorted(want["event_id"])


def test_huge_outlier_does_not_overflow(spark):
    # vq ~ 5.6e10 -> vq^2 ~ 3e21 would overflow int64; decimal/HUGEINT
    # sums must survive AND flag the outlier
    rows = [(i, "pay", float(i % 7)) for i in range(200)] + [
        (777, "pay", 560_000_000.21)
    ]
    sdf, want = _mon_cross_check(spark, rows, MON.anomaly_zscore_sql())
    got = MON.anomaly_zscore(sdf).toPandas()
    assert 777 in set(got["event_id"])
    assert sorted(got["event_id"]) == sorted(want["event_id"])


def test_drift_split_uses_observed_id_range(spark):
    # snowflake-style ids far from 0: the min-aware midpoint still puts
    # rows on both sides
    base = 10**17
    rows = [(base + i, "click" if i % 2 else "view", 1.0) for i in range(100)]
    sdf, _ = _mon_cross_check(spark, rows, MON.drift_chisq_sql())
    out = MON.drift_chisq(sdf).collect()
    assert all(r["n_ref"] > 0 and r["n_cur"] > 0 for r in out)


def test_retention_oracle_parity(spark, sf_dir, events):
    assert_parity(
        MON.retention_cohorts(events), sf_dir, MON.retention_cohorts_sql(), rtol=0
    )


def test_retention_invariants(spark, events):
    rows = MON.retention_cohorts(events).collect()
    cells = {(r["cohort_day"], r["day_offset"]): r["n_users"] for r in rows}
    assert all(off >= 0 for _, off in cells)
    # offset-0 cell of each cohort counts the whole cohort, so it is the
    # max over that cohort's row of the matrix
    by_cohort = {}
    for (c, off), n in cells.items():
        by_cohort.setdefault(c, {})[off] = n
    for c, row in by_cohort.items():
        assert 0 in row
        assert row[0] == max(row.values())
    # total users across offset-0 cells = distinct users overall
    assert sum(r[0] for r in by_cohort.values()) == events.select(
        "user_id"
    ).distinct().count()


def test_attribution_oracle_parity(spark, sf_dir, events):
    assert_parity(
        MON.attribution_last_touch(events),
        sf_dir,
        MON.attribution_last_touch_sql(),
        rtol=0,
    )


def test_attribution_planted_journey(spark):
    # user 1: view page 7 -> purchase 10 min later (credited);
    # user 2: view page 3 -> purchase 2 HOURS later (outside window);
    # user 3: purchase with no view at all (unattributed);
    # user 4: view page 7 -> view page 9 -> purchase (LAST touch: 9)
    from tests.helpers import EVENTS_SCHEMA_STR, event_row as ev

    rows = [
        ev(1, 1, "view", 0, 7),
        ev(2, 1, "purchase", 10, 0, 25.50),
        ev(3, 2, "view", 0, 3),
        ev(4, 2, "purchase", 120, 0),
        ev(5, 3, "purchase", 5, 0),
        ev(6, 4, "view", 0, 7),
        ev(7, 4, "view", 1, 9),
        ev(8, 4, "purchase", 2, 0, 4.99),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA_STR)
    got = {
        r["page"]: (r["n_purchases"], r["revenue_cents"])
        for r in MON.attribution_last_touch(df).collect()
    }
    assert got == {7: (1, 2550), 9: (1, 499)}


def test_attribution_null_page_view_refreshes_nothing(spark):
    # a view whose props carry no page must refresh neither the carried
    # page nor the clock: the stale page-5 view is outside the horizon,
    # so the purchase is unattributed (crediting 5 here was a real bug)
    from tests.helpers import EVENTS_SCHEMA_STR, event_row as ev

    rows = [
        ev(1, 1, "view", 0, 5),
        ev(2, 1, "view", 40, None),
        ev(3, 1, "purchase", 45, 0),
        # control: same shape inside the horizon still credits page 5
        ev(4, 2, "view", 0, 5),
        ev(5, 2, "view", 10, None),
        ev(6, 2, "purchase", 15, 0, 7.00),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA_STR)
    got = {
        r["page"]: (r["n_purchases"], r["revenue_cents"])
        for r in MON.attribution_last_touch(df).collect()
    }
    assert got == {5: (1, 700)}


def test_session_paths_oracle_parity(spark, sf_dir, events):
    assert_parity(
        MON.session_paths(events), sf_dir, MON.session_paths_sql(), rtol=0
    )


def test_session_paths_planted_sessions(spark):
    from tests.helpers import EVENTS_SCHEMA_STR, event_row as ev

    rows = [
        # user 1, session A: 7 -> 9 ; then a 2h gap ; session B: 7 -> 9
        ev(1, 1, "view", 0, 7),
        ev(2, 1, "click", 5, 9),
        ev(3, 1, "view", 180, 7),
        ev(4, 1, "click", 185, 9),
        # user 2, one session: 7 -> 9 (same path, third occurrence)
        ev(5, 2, "view", 0, 7),
        ev(6, 2, "view", 3, 9),
        # user 3: lone event (path "4"), plus a null-page event ignored
        ev(7, 3, "view", 0, 4),
        ev(8, 3, "error", 1, None),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA_STR)
    got = {
        r["path"]: (r["n_sessions"], r["rank"])
        for r in MON.session_paths(df).collect()
    }
    assert got == {"7->9": (3, 1), "4": (1, 2)}
