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
