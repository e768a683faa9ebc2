"""Skew mitigation patterns for 100 TB-scale shuffles.

At cluster scale a handful of hot keys (one viral user, one default
brand) can hold a whole stage hostage: every row for the key lands on
one reducer. Two standing mitigations, both pure DataFrame rewrites that
preserve results exactly:

1. **Salted two-phase aggregation** (`salted_agg_counts`): append a
   random salt to the key, aggregate (key, salt) — spreading each hot
   key over ``n_salts`` reducers — then aggregate the per-salt partials.
   For algebraic aggregates (count/sum/min/max) the regrouping is exact.

2. **Salted skew join** (`salted_join`): explode the *small* side
   ``n_salts``× (one copy per salt value), salt the big side randomly,
   and join on (key, salt). Each hot key's rows split across ``n_salts``
   tasks. Exact for any join type on the big side's rows.

When NOT to hand-salt: Spark's AQE skew-join
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) already
splits oversized *sort-merge join* partitions at runtime — prefer it
when the skew is in a join AQE can see. Hand salting still matters for
(a) skewed *aggregations* (AQE does not split agg partitions),
(b) skew appearing after UDF stages where stats are gone, and
(c) deterministic layout requirements.

The salt uses a hash of the full row (not ``rand()``) so plans stay
deterministic and re-executable — a failed-stage retry re-salts rows
identically, which ``rand()`` does not guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

DEFAULT_SALTS = 16


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    # deterministic per-row salt: hash every column PLUS the row's
    # partition-relative position (monotonically_increasing_id), so
    # byte-identical duplicate rows of a hot key — the canonical skew
    # case — still spread over n_salts reducers. Stable across task
    # retries for a fixed partition layout (the same guarantee Spark's
    # own recompute relies on), unlike rand().
    return F.pmod(
        F.hash(F.monotonically_increasing_id(), *[F.col(c) for c in df.columns]),
        F.lit(n_salts),
    )


def salted_agg_counts(
    df: DataFrame, key: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Two-phase skew-proof ``groupBy(key).count()``: partial counts per
    (key, salt), then exact recombination per key. Returns
    ``(key, cnt)`` — identical to the direct groupBy."""
    return (
        df.withColumn("_salt", _row_salt(df, n_salts))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("cnt"))
    )


def salted_agg_sum(
    df: DataFrame, key: str, value: Column, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Two-phase skew-proof sum of ``value`` per ``key`` → ``(key, total)``.
    ``value`` should already be exact-typed (decimal/long) if cross-engine
    bit-stability matters — same discipline as everywhere else."""
    return (
        df.withColumn("_salt", _row_salt(df, n_salts))
        .withColumn("_v", value)
        .groupBy(key, "_salt")
        .agg(F.sum("_v").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("total"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew join: replicate ``small`` once per salt, salt ``big``'s rows,
    join on (key, salt). Result equals ``big.join(small, key, how)`` for
    'inner' and 'left' (each big row meets exactly one replica of its
    key's small rows).

    Use when one side has hot keys AND the small side is too big to
    broadcast outright (a broadcast join is immune to skew and is the
    first choice when it fits).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (big-side-preserving)")
    salted_big = big.withColumn("_salt", _row_salt(big, n_salts))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated_small, [key, "_salt"], how).drop("_salt")
