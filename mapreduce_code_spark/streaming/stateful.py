"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.10/§2.11 north-star: the engine's arbitrary-state surface,
beyond built-in windowed aggregation).

Operator: per-user running totals — event count, micro-unit value sum,
and last-seen timestamp — maintained as explicit group state across
micro-batches and emitted (update semantics) on every batch where the
user appears. The batch twin is a plain groupBy aggregate; the parity
test splits the same input into multiple files and replays them one
micro-batch at a time, asserting that the final stateful emission per
user equals the batch aggregate.

Scale notes:
- State is keyed by ``user_id``: Spark hash-partitions groups across
  executors; per-group state is O(1) (three longs), so total state is
  O(distinct users) regardless of event volume.
- Arrow-batched: each group's rows cross to Python as pandas chunks,
  vectorized aggregation inside; no per-row Python loop.
- State TTL: ``user_running_totals_stream(state_ttl_ms=...)`` arms a
  ``ProcessingTimeTimeout`` timer per update and evicts idle users'
  state — bounded state under an unbounded key domain (test-proven in
  ``tests/test_stateful.py::test_state_ttl_evicts_idle_users``). The
  contract query keeps NoTimeout because the test tables' user domain
  is finite.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mapreduce_code_spark.streaming.windows import VALUE_SCALE, _qvalue

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value_micro long, last_ts_micros long"
)
STATE_SCHEMA = "n long, s long, last long"


def _qvalue_np(v: np.ndarray) -> np.ndarray:
    # same exact-IEEE quantization as streaming.windows._qvalue
    return np.floor(v * VALUE_SCALE + 0.5).astype("int64")


def _make_update_user_totals(ttl_ms: int | None):
    """Build the state-update kernel; with ``ttl_ms`` set, each update
    arms a processing-time timer and the timed-out invocation drops the
    group's state (the bounded-state path for unbounded key domains)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # TTL expiry: evict this user's state entirely; no emission.
            # The next event for the user starts a fresh total.
            state.remove()
            return
        n, s, last = state.get if state.exists else (0, 0, -1)
        for pdf in pdfs:
            n += len(pdf)
            s += int(_qvalue_np(pdf["value"].to_numpy()).sum())
            # normalize to µs first — Arrow may hand over ns- or µs-unit
            # stamps
            ts_micros = pdf["ts"].astype("datetime64[us]").astype("int64")
            last = max(last, int(ts_micros.max()))
        state.update((n, s, last))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value_micro": [s],
                "last_ts_micros": [last],
            }
        )

    return update


_update_user_totals = _make_update_user_totals(None)


def user_running_totals_stream(
    events: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Stateful per-user running totals over a streaming events frame.
    Emits the updated totals for every user seen in each micro-batch.

    ``state_ttl_ms`` is the production knob for unbounded key domains
    (SURVEY §9): when set, every state update arms a processing-time
    timer; a user idle past the TTL has their state evicted in the next
    executed micro-batch, so total state is O(keys active within one TTL
    window) instead of O(all keys ever seen). Eviction resets the
    running total — the semantics a TTL asks for.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_user_totals(state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def user_running_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the stateful operator: one aggregate pass."""
    qv = _qvalue()  # the ONE quantization definition (windows._qvalue)
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(qv).alias("sum_value_micro"),
        F.max(F.unix_micros("ts")).alias("last_ts_micros"),
    )


def user_running_totals_sql() -> str:
    """DuckDB twin of the batch aggregate (micro-unit exact)."""
    return """
WITH ev AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events)
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_value_micro,
       max(epoch_us(ts)) AS last_ts_micros
FROM ev GROUP BY user_id
"""


# --------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's successor API for arbitrary state
# (same operator as above, new API): typed value state via a
# StatefulProcessor, RocksDB-backed state store.
# --------------------------------------------------------------------------

try:  # the processor API import is 4.0+; its state protocol needs protobuf
    import google.protobuf  # noqa: F401 — TWS driver worker hard-requires it

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, s, last = (
                self._totals.get() if self._totals.exists() else (0, 0, -1)
            )
            for pdf in rows:
                n += len(pdf)
                s += int(_qvalue_np(pdf["value"].to_numpy()).sum())
                ts_micros = pdf["ts"].astype("datetime64[us]").astype("int64")
                last = max(last, int(ts_micros.max()))
            self._totals.update((n, s, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value_micro": [s],
                    "last_ts_micros": [last],
                }
            )

        def close(self) -> None:
            pass

    HAS_TWS = True
    _TWS_UNAVAILABLE = ""
except ImportError as _exc:  # pragma: no cover - older Spark or no protobuf
    HAS_TWS = False
    # record WHICH dependency gated it: on Spark 4 with no protobuf the
    # old "needs Spark >= 4.0" message sent readers chasing the wrong
    # upgrade (r12; this container IS Spark 4.1 — protobuf is the gap)
    _TWS_UNAVAILABLE = f"{type(_exc).__name__}: {_exc}"


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """The same stateful running-totals operator on the
    ``transformWithStateInPandas`` API (requires the RocksDB state store:
    ``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider``)."""
    if not HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas unavailable — needs Spark >= 4.0 "
            f"AND protobuf (the state protocol); gated by: {_TWS_UNAVAILABLE}"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        _RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ------------------------------------------------ streamed attribution

ATTR_OUTPUT_SCHEMA = "page long, cents long"
ATTR_STATE_SCHEMA = "page long, us long"


def _attr_update_factory(horizon_us: int):
    """Kernel: carry the last view's (page, epoch-us) across micro-
    batches; within a batch, SORT the user's rows by (ts, event_id) and
    forward-fill, seeded from state — so a single-batch run is exactly
    the batch operator, and a time-split multi-batch run agrees as long
    as micro-batches arrive in event-time order per user (the natural
    ingest order; a reordering deployment would add a watermark buffer
    upstream, cf. module docstring)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # state presence IS the "seen a view" flag — no in-band sentinel
        # (a legitimate page id could collide with any reserved value)
        seeded = state.exists
        page, us = state.get if seeded else (0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        pages = pdf["page"].to_numpy()
        # null-page views (props null / unparseable k) refresh NEITHER
        # the carried page NOR the clock — mirrors the batch operator
        is_view = (
            (pdf["event_type"] == "view").to_numpy()
            & pd.notna(pages)
        )
        vp = pd.Series(np.where(is_view, pages, np.nan)).ffill()
        vu = pd.Series(np.where(is_view, ts_us, np.nan)).ffill()
        if seeded:
            vp = vp.fillna(page)
            vu = vu.fillna(us)
        attributed = (
            (pdf["event_type"] == "purchase").to_numpy()
            & vp.notna().to_numpy()
            & ((ts_us - vu.fillna(0).astype("int64")) <= horizon_us).to_numpy()
        )
        if is_view.any():
            last = int(np.max(np.nonzero(is_view)[0]))
            state.update((int(pages[last]), int(ts_us.iloc[last])))
        elif seeded:
            state.update((page, us))
        if attributed.any():
            yield pd.DataFrame(
                {
                    "page": vp[attributed].astype("int64"),
                    "cents": pdf["cents"][attributed].astype("int64"),
                }
            )

    return update


def attribution_stream(
    events: DataFrame, window_minutes: int = 30
) -> DataFrame:
    """Streamed last-touch attribution: per-user carry-forward state via
    ``applyInPandasWithState`` (append semantics — each attributed
    purchase is emitted exactly once). Input may be a readStream; the
    page/cents projection happens before the stateful exchange so only
    five narrow columns shuffle."""
    from mapreduce_code_spark.operators.monitoring import _cents

    prepared = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("page"),
        _cents(F.col("value")).alias("cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _attr_update_factory(window_minutes * 60 * 1_000_000),
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
