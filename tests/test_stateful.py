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
