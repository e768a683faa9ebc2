"""Stream-stream joins with watermark-bounded state (SURVEY §2.10).

One plan builder serves batch and streaming (same pattern as
streaming/windows.py): pass batch frames and it is a plain inequality
join; pass two ``readStream`` frames and Spark runs a stateful
stream-stream join where BOTH watermarks plus the time-range condition
bound the join state — without them a 100 TB stream would buffer
forever waiting for arbitrarily-late matches.

(The batch/registered scale path for the same semantics is
``operators.relational.bucketed_range_join``; the streaming join must
express the raw time-range predicate so Spark can derive state-eviction
bounds from it.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP_S = 600


def view_then_purchase(
    views: DataFrame,
    purchases: DataFrame,
    gap_s: int = DEFAULT_GAP_S,
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Correlate each view with the same user's purchases within
    ``gap_s`` seconds after it: ``(user_id, view_id, purchase_id,
    gap_us)``. ``watermark=None`` for batch twins."""
    v = views.select(
        F.col("user_id").alias("user_v"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("ts_v"),
    )
    p = purchases.select(
        F.col("user_id").alias("user_p"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("ts_p"),
    )
    if watermark is not None:
        v = v.withWatermark("ts_v", watermark)
        p = p.withWatermark("ts_p", watermark)
    cond = (
        (F.col("user_v") == F.col("user_p"))
        & (F.col("ts_p") > F.col("ts_v"))
        & (F.col("ts_p") <= F.col("ts_v") + F.expr(f"INTERVAL {gap_s} SECOND"))
    )
    return v.join(p, cond).select(
        F.col("user_v").alias("user_id"),
        "view_id",
        "purchase_id",
        (F.unix_micros("ts_p") - F.unix_micros("ts_v")).alias("gap_us"),
    )
