"""Iterative regression via partition-local SGD + snapshot averaging,
plus closed-form OLS as the SQL-expressible sibling.

Re-expresses ``/root/reference/logisticreg/logisticreg.java`` and
``/root/reference/multilinereg/multilinereg.java`` (structurally identical;
the single differing line is the sigmoid, ``logisticreg.java:79``).

Faithful semantics (verified against the source):

- Per record, in sequence within a task: ``h = link(x · θ)``; if
  ``|h − y| > accuracy`` update ``θ_j += α·(y−h)·x_j`` in place and emit a
  *snapshot* of θ with continue-flag true, else emit the unchanged θ with
  flag false (``logisticreg.java:76-97``). One emission per record.
- The single reducer element-wise sums ALL per-record snapshots, divides
  by the number of records, and ANDs the flags (``logisticreg.java:104-139``)
  — i.e. the next iterate is the **average of the per-record θ trajectory**
  (Polyak-style trajectory averaging over Zinkevich-style parallel SGD).
- The driver stops when the ANDed flag is false — i.e. when ANY record
  fell within accuracy — or at ``max_iter`` (``logisticreg.java:203``).
  Surprising, but it is what the reference computes; kept faithfully.

Spark-first execution:

- The mapper's per-JVM sequential sweep becomes an Arrow-batched
  ``mapInPandas`` over each partition (partition ≈ map split).
- The reference funnels one value PER RECORD to a single reducer
  (constant key "1", ``logisticreg.java:95-97``) — a scalability cliff at
  100 TB. Here each partition pre-aggregates locally (sum of snapshots,
  AND of flags, count) and emits ONE row; the driver combines the
  ~numPartitions tiny rows. Mathematically identical to the reference's
  reduce, with shuffle volume O(partitions · d) instead of O(rows · d).
- θ travels driver → executors via a broadcast variable per iteration
  (replacing the per-JVM HDFS theta-file read, ``logisticreg.java:67-75``).

Determinism: snapshot averaging depends on partition layout and
in-partition order. ``sgd_fit`` therefore assigns each row a RANGE split
id by exact integer arithmetic over the ``row_id`` domain, places each
split on its own partition exactly (hash-salt lookup — see
``_exact_partition_salts``), and sorts within partitions by ``row_id``,
so results are bit-reproducible for a given ``n_partitions`` and input
layout (SURVEY §7.2). ``repartitionByRange`` was NOT enough (r11
finding): its range boundaries come from reservoir sampling seeded by
the RDD id, which changes across actions in one session — two identical
6k-row fits at 8 partitions differed in the third decimal. Assertions
are tolerance-based regardless; ``row_id`` itself
(``monotonically_increasing_id`` over the scan) is deterministic for a
fixed file set and session conf, like the reference's HDFS block
splits are for a fixed cluster config.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHA = 0.03  # logisticreg.java:150
ACCURACY = 0.01  # logisticreg.java:151
MAX_ITER = 50  # logisticreg.java:147 (the conf "numIter"=2 at :152 is unused)

_PARTIAL_SCHEMA = "all_continue boolean, n long, theta_sum array<double>"

# Most recent fit's iteration count per link, recorded by sgd_fit.
# bench.py copies it into its sidecar (r9 verdict #5): the SGD queries'
# wall time is iterations × per-iteration cost, and the stop rule is
# data/trajectory-dependent, so a slow bench line needs to be
# attributable to convergence-path variance vs a real per-iteration
# regression.
LAST_FIT_ITERATIONS: dict[str, int] = {}


@dataclass
class SGDResult:
    theta: list[float]
    iterations: int
    converged: bool  # stopped via the reference's any-record-within-accuracy rule
    # how many partitions actually held rows: with scan-derived sparse
    # row_ids the domain buckets track scan-block granularity, so this
    # can be < n_partitions (Hadoop's mappers ≤ input splits, kept
    # faithfully) — recorded so the collapse is observable, never silent
    n_splits_effective: int = 0


def _partition_kernel(theta_b, alpha: float, accuracy: float, link: str):
    # theta_b is the Broadcast handle — resolving .value INSIDE the kernel
    # keeps theta out of the per-task closure (one torrent copy per
    # executor instead of one serialized copy per task)
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Hot sequential loop in PURE PYTHON floats (r10: 2× over the
        # previous numpy-per-row form — three small-array dispatches per
        # record cost more than d=4 float ops), and the float ORDER is
        # now exactly the reference's: the dot accumulates sequentially
        # h += x[j]*theta[j] (logisticreg.java:77 — numpy's `x @ theta`
        # rounds pairwise and diverged in the last ulp), and the update
        # scales as alpha * ((y-h) * x[j]) (logisticreg.java:85's
        # parenthesization, not the hoisted (alpha*(y-h)) * x[j]).
        # math.exp beats np.exp on scalars ~10×.
        from math import exp as _exp

        theta = [float(t) for t in theta_b.value]
        d = len(theta)
        rng_d = range(d)
        snap_sum = [0.0] * d
        n = 0
        all_continue = True
        logistic = link == "logistic"
        for pdf in batches:
            ys = pdf["y"].tolist()
            xs = np.stack(pdf["features"].to_numpy()).tolist()
            for y, x in zip(ys, xs):
                h = 0.0
                for j in rng_d:
                    h += x[j] * theta[j]  # logisticreg.java:77
                if logistic:
                    # clamp: math.exp overflows past ~709 (np.exp → inf);
                    # saturate h to 0/1 the same way inf would
                    if h < -709.0:
                        h = 0.0
                    elif h > 709.0:
                        h = 1.0
                    else:
                        h = 1.0 / (1.0 + _exp(-h))
                if abs(h - y) > accuracy:
                    err = y - h
                    for j in rng_d:
                        theta[j] += alpha * (err * x[j])  # logisticreg.java:85
                else:
                    all_continue = False  # this record's flag is "false"
                for j in rng_d:
                    snap_sum[j] += theta[j]  # snapshot, logisticreg.java:87,92
                n += 1
        yield pd.DataFrame(
            {"all_continue": [all_continue], "n": [n], "theta_sum": [snap_sum]}
        )

    return kernel


_SALT_CACHE: dict[int, list[int]] = {}


def _exact_partition_salts(spark, n_part: int) -> list[int]:
    """``salts[p]`` is a BIGINT whose Spark hash-partition slot at
    ``n_part`` partitions is exactly ``p`` — so
    ``repartition(n_part, salt_col)`` places split ``p`` on partition
    ``p`` alone, with no range-boundary sampling and no collisions.
    Computed by probing Spark's own ``hash()`` (murmur3) over a small
    ``range`` so the Python side never re-implements the JVM hash;
    cached per n_part — the mapping depends only on the (fixed) hash
    algorithm, never on the session, so a cached list stays correct
    across sessions. The probe is one tiny job per fit at worst —
    never per iteration — and 32·n_part candidates cover all residues
    with overwhelming probability (the loop widens if not)."""
    key = n_part
    if key not in _SALT_CACHE:
        found: dict[int, int] = {}
        m = 32 * n_part
        while len(found) < n_part:
            probe = spark.range(m).select(
                F.col("id"),
                F.pmod(F.hash(F.col("id")), F.lit(n_part)).alias("p"),
            )
            for r in probe.collect():
                found.setdefault(r["p"], r["id"])
            m *= 4
        _SALT_CACHE[key] = [found[p] for p in range(n_part)]
    return _SALT_CACHE[key]


def sgd_fit(
    points: DataFrame,
    link: str = "linear",
    alpha: float = ALPHA,
    accuracy: float = ACCURACY,
    max_iter: int = MAX_ITER,
    n_partitions: int | None = None,
) -> SGDResult:
    """Fit by the reference's iterate-average-until-stop loop.

    ``points``: ``(row_id bigint, y double, features array<double>)`` with
    bias pre-injected at ``features[0]``. ``link``: ``linear`` | ``logistic``.
    """
    if link not in ("linear", "logistic"):
        raise ValueError(f"unknown link {link!r}")
    spark = points.sparkSession
    sc = spark.sparkContext
    n_part = n_partitions or points.rdd.getNumPartitions()
    # Deterministic layout → reproducible trajectory averaging (SURVEY
    # §7.2). repartitionByRange is NOT deterministic (r11 finding: its
    # boundaries are reservoir-sampled with an RDD-id-dependent seed),
    # so the split id is computed by exact integer arithmetic over the
    # row_id domain — contiguous ranges, like the reference's map
    # splits — and each split is placed on its own partition exactly
    # via the salt lookup (one cheap min/max agg + one tiny probe job,
    # once per fit, never per iteration).
    bounds = points.select(
        F.min("row_id").alias("lo"), F.max("row_id").alias("hi")
    ).first()
    if bounds["lo"] is None:
        raise ValueError(
            "sgd_fit: points frame is empty — nothing to fit "
            "(an empty partition sweep would divide by zero)"
        )
    lo, span = bounds["lo"], bounds["hi"] - bounds["lo"] + 1
    salts = _exact_partition_salts(spark, n_part)
    # Equal-WIDTH buckets via one integer DIV: exact at any id
    # magnitude (a double-rounded floor could misassign boundary rows)
    # and overflow-free — the review found ((row_id-lo)*n_part) can
    # exceed BIGINT when the id domain is monotonically_increasing_id's
    # sparse (scan_partition << 33) layout at very large scan-partition
    # counts, while (row_id-lo) DIV width never leaves [0, n_part).
    # Semantics note (same review): with mid-style sparse ids the
    # domain buckets track SCAN-BLOCK granularity, not row rank — if
    # the scan has fewer blocks than n_partitions the fit runs fewer
    # effective trajectories. That is Hadoop's own split semantics
    # (mappers never outnumber input splits, the reference can't
    # either), kept deliberately; it is OBSERVABLE, not silent, via
    # SGDResult.n_splits_effective below.
    width = -(-span // n_part)  # exact ceil(span / n_part)
    split = F.expr(f"CAST(((row_id - {lo}L) DIV {width}L) AS INT)")
    pts = (
        points.withColumn(
            "__salt",
            # BIGINT cast is load-bearing: the salts were probed via
            # hash() over BIGINT ids, and Spark's murmur3 of an INT
            # differs from the same value as a LONG — an int literal
            # here would land splits on the wrong partitions
            F.element_at(
                F.array(*[F.lit(s).cast("bigint") for s in salts]),
                split + F.lit(1),
            ),
        )
        .repartition(n_part, "__salt")
        .sortWithinPartitions("row_id")
        .select("y", "features")
    )
    pts.persist()
    try:
        head = pts.select("features").first()
        if head is None:  # unreachable (bounds checked above); belt
            raise ValueError("sgd_fit: points frame is empty")
        d = len(head["features"])
        theta = np.zeros(d)  # logisticreg.java:161-164
        converged = False
        it = 0
        # max_iter <= 0 means the loop body never binds `partials`; the
        # zero-theta result must still return (r11 advisor, low) with
        # n_splits_effective = 0 — no sweep ever touched a split
        partials: list = []
        for it in range(1, max_iter + 1):
            theta_b = sc.broadcast(theta)
            partials = pts.mapInPandas(
                _partition_kernel(theta_b, alpha, accuracy, link),
                schema=_PARTIAL_SCHEMA,
            ).collect()
            theta_b.destroy()
            total = sum(r["n"] for r in partials)
            snap = np.sum([np.asarray(r["theta_sum"]) for r in partials], axis=0)
            theta = snap / total  # reducer average, logisticreg.java:136-138
            if not all(r["all_continue"] for r in partials):
                converged = True  # stop rule, logisticreg.java:203
                break
        LAST_FIT_ITERATIONS[link] = it
        return SGDResult(
            theta=theta.tolist(),
            iterations=it,
            converged=converged,
            # every partition yields one partial (n=0 when empty), so
            # this is a free byproduct of the last iteration's combine
            n_splits_effective=sum(1 for r in partials if r["n"] > 0),
        )
    finally:
        pts.unpersist()


def sgd_fit_df(points: DataFrame, link: str = "linear", **kw) -> DataFrame:
    """DataFrame wrapper for the driver contract: one row per coefficient
    ``(coef_idx int, theta double, iterations int, converged boolean)``."""
    res = sgd_fit(points, link=link, **kw)
    spark = points.sparkSession
    return spark.createDataFrame(
        [(i, t, res.iterations, res.converged) for i, t in enumerate(res.theta)],
        "coef_idx int, theta double, iterations int, converged boolean",
    )


def ols_stats(points: DataFrame) -> DataFrame:
    """Sufficient statistics for the normal equations X'Xθ = X'y as one
    row of pure aggregations (SQL-expressible; the oracle-able sibling of
    the non-SQL-expressible SGD loop). Features fixed at d=4
    (bias + 3, FIXTURES.md §2.2)."""
    f = [F.col("features").getItem(i) for i in range(4)]
    aggs = []
    for i in range(4):
        for j in range(i, 4):
            aggs.append(F.sum(f[i] * f[j]).alias(f"xx_{i}{j}"))
    for i in range(4):
        aggs.append(F.sum(f[i] * F.col("y")).alias(f"xy_{i}"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    return points.agg(*aggs)


def ols_stats_exact(lineitem: DataFrame) -> DataFrame:
    """Decimal-exact OLS sufficient statistics straight from ``lineitem``
    (y = l_extendedprice; x = [1, l_quantity, l_discount, l_tax]).

    Double sums are summation-order-dependent, so a Spark result and a
    DuckDB oracle could differ in the last ulps. Casting every input to
    DECIMAL(14,4) first makes the aggregation exact and order-independent
    — bit-identical across engines — then the final cast back to double is
    deterministic. The cost (decimal arithmetic vs double) is irrelevant
    for a 14-value-per-row aggregate even at 100 TB; the pattern matters
    more than the cycles.
    """
    cols = [
        F.lit(1).cast("decimal(14,4)"),
        F.col("l_quantity").cast("decimal(14,4)"),
        F.col("l_discount").cast("decimal(14,4)"),
        F.col("l_tax").cast("decimal(14,4)"),
    ]
    y = F.col("l_extendedprice").cast("decimal(14,4)")
    aggs = []
    for i in range(4):
        for j in range(i, 4):
            aggs.append(
                F.sum(cols[i] * cols[j]).cast("double").alias(f"xx_{i}{j}")
            )
    for i in range(4):
        aggs.append(F.sum(cols[i] * y).cast("double").alias(f"xy_{i}"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    return lineitem.agg(*aggs)


def ols_stats_exact_sql() -> str:
    """The DuckDB twin of :func:`ols_stats_exact` (identical casts)."""
    cols = [
        "CAST(1 AS DECIMAL(14,4))",
        "CAST(l_quantity AS DECIMAL(14,4))",
        "CAST(l_discount AS DECIMAL(14,4))",
        "CAST(l_tax AS DECIMAL(14,4))",
    ]
    y = "CAST(l_extendedprice AS DECIMAL(14,4))"
    parts = []
    for i in range(4):
        for j in range(i, 4):
            parts.append(
                f"CAST(sum({cols[i]} * {cols[j]}) AS DOUBLE) AS xx_{i}{j}"
            )
    for i in range(4):
        parts.append(f"CAST(sum({cols[i]} * {y}) AS DOUBLE) AS xy_{i}")
    parts.append("count(*) AS n")
    return "SELECT " + ", ".join(parts) + " FROM lineitem"


def ols_solve(points: DataFrame) -> np.ndarray:
    """Closed-form OLS θ from the aggregated sufficient statistics."""
    row = ols_stats(points).first()
    d = 4
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            xtx[i, j] = xtx[j, i] = row[f"xx_{i}{j}"]
        xty[i] = row[f"xy_{i}"]
    return np.linalg.solve(xtx, xty)
