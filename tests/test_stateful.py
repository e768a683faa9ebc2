"""applyInPandasWithState parity: replay the same events in multiple
micro-batches; the final stateful emission per user must equal the
one-pass batch aggregate (and its DuckDB oracle)."""

from __future__ import annotations

import time

from mapreduce_code_spark.sources.io import load_table
from mapreduce_code_spark.streaming import stateful as S
from mapreduce_code_spark.streaming import windows as W
from tests.helpers import assert_parity


def test_batch_twin_oracle_parity(spark, sf_dir):
    assert_parity(
        S.user_running_totals_batch(load_table(spark, sf_dir, "events")),
        sf_dir,
        S.user_running_totals_sql(),
    )


def test_stateful_stream_matches_batch(spark, sf_dir, tmp_path):
    """Split events into 3 files replayed one per micro-batch: state must
    accumulate across batches to the exact batch-aggregate totals."""
    ev = load_table(spark, sf_dir, "events").limit(600).persist()
    src = str(tmp_path / "ev_chunks")
    # three chunks with distinct mtimes → three deterministic micro-batches
    chunks = ev.randomSplit([1.0, 1.0, 1.0], seed=7)
    for i, c in enumerate(chunks):
        c.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = W.run_to_memory(
        S.user_running_totals_stream(stream), "running_totals", "update"
    )
    try:
        # update mode: keep only each user's LAST emission (max n_events —
        # totals are monotone in batches seen)
        got = (
            spark.table("running_totals")
            .toPandas()
            .sort_values(["user_id", "n_events"])
            .groupby("user_id", as_index=False)
            .last()
        )
        want = (
            S.user_running_totals_batch(ev)
            .toPandas()
            .sort_values("user_id", ignore_index=True)
        )
        got = got[want.columns].reset_index(drop=True)
        assert got.equals(want), "stateful totals != batch aggregate"
        # and it really was incremental: more emissions than users
        n_users = len(want)
        assert spark.table("running_totals").count() > n_users
    finally:
        q.stop()
        ev.unpersist()


def test_tws_matches_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 successor API) produces the
    same final totals as the batch aggregate."""
    import pytest as _pytest

    if not S.HAS_TWS:
        _pytest.skip("no transformWithStateInPandas on this Spark")
    ev = load_table(spark, sf_dir, "events").limit(400).persist()
    src = str(tmp_path / "tws_src")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = W.run_to_memory(
            S.user_running_totals_tws(stream), "tws_totals", "update"
        )
        try:
            got = (
                spark.table("tws_totals")
                .toPandas()
                .sort_values(["user_id", "n_events"])
                .groupby("user_id", as_index=False)
                .last()
            )
            want = (
                S.user_running_totals_batch(ev)
                .toPandas()
                .sort_values("user_id", ignore_index=True)
            )
            got = got[want.columns].reset_index(drop=True)
            assert got.equals(want)
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        ev.unpersist()


def test_state_ttl_evicts_idle_users(spark, tmp_path):
    """state_ttl_ms bounds state under an unbounded key domain: a user
    idle past the TTL is evicted (their timed-out state removed), so
    their next event starts a FRESH total instead of accumulating.

    With ProcessingTimeTimeout the stream keeps scheduling timer-check
    batches, so processAllAvailable() never reports idle — the test
    drives a real processing-time trigger and polls the memory sink.
    """
    from datetime import datetime

    src = str(tmp_path / "ttl_src")
    schema = "user_id long, value double, ts timestamp"

    def write_chunk(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def wait_for(predicate, timeout_s=60):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            pdf = spark.table("ttl_totals").toPandas()
            if predicate(pdf):
                return pdf
            time.sleep(0.5)
        raise AssertionError("condition not reached within timeout")

    t0 = datetime(2024, 1, 1)
    # batch 1: user 1 (3 events) — state created, 2s TTL timer armed
    write_chunk([(1, 1.0, t0), (1, 2.0, t0), (1, 3.0, t0)])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        S.user_running_totals_stream(stream, state_ttl_ms=2_000)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ttl_totals")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        wait_for(lambda p: (p.user_id == 1).any())
        time.sleep(3.0)  # let user 1's TTL expire (no new events)
        # later batches fire user 1's timed-out handler → state removed
        write_chunk([(2, 5.0, t0)])
        wait_for(lambda p: (p.user_id == 2).any())
        # user 1 returns — must start from scratch (n_events=1), NOT 3+1
        write_chunk([(1, 9.0, t0)])
        emitted = wait_for(
            lambda p: ((p.user_id == 1) & (p.n_events == 1)).any()
        )
        u1 = emitted[emitted.user_id == 1]
        assert set(u1.n_events) == {1, 3}  # never 4: no accumulation
        fresh = u1[u1.n_events == 1].iloc[0]
        assert fresh.sum_value_micro == 9_000_000  # 9.0 only, not 15.0
    finally:
        q.stop()


def test_streamed_attribution_carries_state_across_batches(spark, tmp_path):
    """A view in micro-batch 1 must attribute a purchase in micro-batch
    2 (cross-batch carry-forward), and the full replay must equal the
    batch window operator."""
    from mapreduce_code_spark.operators import monitoring as MON
    from mapreduce_code_spark.streaming import stateful as SA
    from tests.helpers import EVENTS_SCHEMA_STR as schema_str
    from tests.helpers import event_row as ev

    batch1 = [
        ev(1, 1, "view", 0, 7),
        ev(2, 2, "view", 1, 3),
        ev(9, 4, "view", 2, -1),  # negative page id is legal
        ev(10, 5, "view", 0, 6),
        ev(11, 5, "view", 3, None),  # null-page view: refreshes nothing
    ]
    batch2 = [
        ev(3, 1, "purchase", 10, 0, 25.50),  # attributed to 7 (cross-batch)
        ev(4, 2, "purchase", 120, 0),  # outside 30-min horizon
        ev(5, 3, "purchase", 12, 0),  # never saw a view
        ev(12, 4, "purchase", 8, 0, 3.00),  # carried page -1 (no sentinel clash)
        ev(13, 5, "purchase", 9, 0, 2.00),  # carried page 6 survives null view
    ]
    src = str(tmp_path / "attr_chunks")
    for chunk in (batch1, batch2):
        spark.createDataFrame(chunk, schema_str).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = W.run_to_memory(
        SA.attribution_stream(stream), "attr_xbatch", "append"
    )
    try:
        got = {
            (r["page"], r["cents"])
            for r in spark.table("attr_xbatch").collect()
        }
        assert got == {(7, 2550), (-1, 300), (6, 200)}
        want = {
            (r["page"], r["revenue_cents"])
            for r in MON.attribution_last_touch(
                spark.createDataFrame(batch1 + batch2, schema_str)
            ).collect()
        }
        assert want == {(7, 2550), (-1, 300), (6, 200)}
    finally:
        q.stop()


def test_streamed_attribution_matches_batch_on_time_split(
    spark, sf_dir, tmp_path
):
    """Corpus replayed as two TIME-ORDERED micro-batches == the batch
    window operator's page report."""
    from pyspark.sql import functions as F

    from mapreduce_code_spark.operators import monitoring as MON
    from mapreduce_code_spark.streaming import stateful as SA

    ev = load_table(spark, sf_dir, "events").persist()
    # Split on EVENT TIME, not event_id: the kernel's multi-batch
    # correctness precondition is that batches arrive time-ordered per
    # user, and a ts midpoint makes that precondition hold by
    # construction instead of riding on the corpus's incidental
    # event_id/ts alignment.
    mid = ev.agg(
        F.expr(
            "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"
        ).alias("m")
    ).collect()[0]["m"]
    ts_us = F.expr("unix_micros(ts)")
    src = str(tmp_path / "attr_time_chunks")
    for part in (ev.where(ts_us < mid), ev.where(ts_us >= mid)):
        part.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = W.run_to_memory(
        SA.attribution_stream(stream), "attr_timesplit", "append"
    )
    try:
        got = {
            (r["page"], r["n"], r["s"])
            for r in spark.table("attr_timesplit")
            .groupBy("page")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
            .collect()
        }
        want = {
            (r["page"], r["n_purchases"], r["revenue_cents"])
            for r in MON.attribution_last_touch(ev).collect()
        }
        assert got == want
    finally:
        q.stop()
        ev.unpersist()
