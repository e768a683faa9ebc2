"""Regression tests: exactly-linear golden (FIXTURES.md §3.2), separable
logistic, OLS closed-form cross-check vs numpy lstsq, determinism, and
decimal-exact oracle parity for the OLS stats."""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_code_spark.operators.regression import (
    ols_solve,
    ols_stats_exact,
    ols_stats_exact_sql,
    sgd_fit,
)
from tests.helpers import assert_parity


def _points(spark, rows):
    return spark.createDataFrame(
        [(i, float(y), [float(v) for v in x]) for i, (y, x) in enumerate(rows)],
        "row_id long, y double, features array<double>",
    )


@pytest.fixture(scope="module")
def linear_micro(spark):
    # y = 10 + 3*x1 - 1*x2, zero noise (FIXTURES.md §3.2); the offset keeps
    # |y| > accuracy at theta=0 so the any-record stop rule doesn't fire
    # before the first update
    rng = np.random.default_rng(7)
    rows = []
    for _ in range(64):
        x1, x2 = rng.uniform(-1, 1), rng.uniform(-1, 1)
        rows.append((10 + 3 * x1 - x2, [1.0, x1, x2]))
    return _points(spark, rows)


@pytest.fixture(scope="module")
def separable_micro(spark):
    # linearly separable in x1 with a wide margin
    rng = np.random.default_rng(11)
    rows = []
    for _ in range(32):
        x1 = rng.uniform(1.0, 2.0)
        rows.append((1.0, [1.0, x1]))
        rows.append((0.0, [1.0, -x1]))
    return _points(spark, rows)


def test_sgd_linear_recovers_theta(linear_micro):
    # accuracy=0 disables the early stop until a record hits h == y
    # EXACTLY — on noiseless data the trajectory average converges to the
    # true theta first (verified by standalone simulation: stop ~iter 60)
    res = sgd_fit(linear_micro, link="linear", alpha=0.1, accuracy=0.0,
                  max_iter=200, n_partitions=2)
    assert np.allclose(res.theta, [10.0, 3.0, -1.0], atol=1e-3)


def test_sgd_stop_rule_fires_fast(linear_micro):
    # faithful semantics: sequential SGD tracks the target within the
    # first sweeps, so SOME record lands within accuracy almost
    # immediately and the loop stops — the reference's own README caveat
    # (logisticreg.java:8-10) about biased averaged theta
    res = sgd_fit(linear_micro, link="linear", alpha=0.1, accuracy=0.05,
                  max_iter=400, n_partitions=2)
    assert res.converged and res.iterations <= 5


def test_sgd_linear_deterministic(linear_micro):
    a = sgd_fit(linear_micro, link="linear", alpha=0.1, accuracy=0.0,
                max_iter=30, n_partitions=2)
    b = sgd_fit(linear_micro, link="linear", alpha=0.1, accuracy=0.0,
                max_iter=30, n_partitions=2)
    assert a.theta == b.theta and a.iterations == b.iterations


def test_sgd_logistic_converges(separable_micro):
    res = sgd_fit(separable_micro, link="logistic", alpha=0.5, accuracy=0.01,
                  max_iter=400, n_partitions=2)
    assert res.converged
    theta = np.asarray(res.theta)
    # predicted class is right for every training point
    assert theta[1] > 0


def test_sgd_stop_rule_any_record():
    """Stop fires when ANY record is within accuracy (logisticreg.java:203)
    — even if the fit is bad for the rest."""
    # y for x=0 is always 0*theta=0 → |h-y|=0 <= accuracy on first pass
    # (linear link), so the loop must stop after iteration 1.
    import mapreduce_code_spark.session as S

    spark = S.get_spark()
    pts = spark.createDataFrame(
        [(0, 0.0, [0.0]), (1, 100.0, [1.0])],
        "row_id long, y double, features array<double>",
    )
    res = sgd_fit(pts, link="linear", alpha=0.01, accuracy=0.5, max_iter=10,
                  n_partitions=1)
    assert res.converged and res.iterations == 1


def test_ols_matches_lstsq(linear_micro):
    full = linear_micro.selectExpr(
        "row_id", "y",
        "array(features[0], features[1], features[2],"
        " features[1]*features[2]) as features",
    )
    theta = ols_solve(full)
    pdf = full.toPandas()
    X = np.stack(pdf["features"].to_numpy())
    want, *_ = np.linalg.lstsq(X, pdf["y"].to_numpy(), rcond=None)
    assert np.allclose(theta, want, atol=1e-8)


def test_ols_stats_oracle_parity(spark, sf_dir):
    from mapreduce_code_spark.sources.io import load_table

    assert_parity(
        ols_stats_exact(load_table(spark, sf_dir, "lineitem")),
        sf_dir,
        ols_stats_exact_sql(),
        rtol=0,
    )


def test_sgd_partition_count_stability_envelope(spark, sf_dir):
    """The 100 TB story for partition-SGD is "partition ≈ map split"
    (the reference runs one sequential SGD per split and averages,
    multilinereg.java / logisticreg.java:136-138), so theta genuinely
    DEPENDS on the split count — trajectory averaging over more, smaller
    partitions averages less-converged trajectories. This pins the
    measured stability envelope (r10 verdict #8) at the test SF: per
    partition count the fit is bit-deterministic, the stop rule's
    iteration count and convergence flag are split-invariant, and the
    relative L2 drift of theta across 2/8/32 partitions stays inside
    the measured envelope (sf0.001: ≤0.22 linear / ≤0.22 logistic;
    measured to SHRINK with rows-per-partition — 0.025-0.092 at sf0.01,
    SURVEY §9 — so the bound here is the small-SF worst case)."""
    from mapreduce_code_spark.plans import prep
    from mapreduce_code_spark.sources.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    for link, pts in (
        ("linear", prep.labeled_points_scaled(li)),
        ("logistic", prep.labeled_points_binary(li)),
    ):
        fits = {
            n: sgd_fit(pts, link=link, max_iter=5, n_partitions=n)
            for n in (2, 8, 32)
        }
        # deterministic per split count (same layout -> same trajectory)
        again = sgd_fit(pts, link=link, max_iter=5, n_partitions=8)
        assert again.theta == fits[8].theta
        # dense scan-local row_ids at this SF -> every requested split
        # holds rows (the sparse-id scan-block collapse documented on
        # SGDResult.n_splits_effective must NOT happen here)
        for n, f in fits.items():
            assert f.n_splits_effective == n, (link, n, f.n_splits_effective)
        # the stop rule is split-invariant here: every partitioning sees
        # some record within accuracy in the same sweep
        assert len({(f.iterations, f.converged) for f in fits.values()}) == 1
        ref = np.asarray(fits[8].theta)  # the registered rows run at 8
        nrm = float(np.linalg.norm(ref))
        assert nrm > 0
        for n, f in fits.items():
            drift = float(np.linalg.norm(np.asarray(f.theta) - ref)) / nrm
            # measured worst case 0.22 (sf0.001 logistic @32) + ~10%
            # margin for equal-width boundary placement; a drift past
            # this is a REAL widening of the envelope, not noise (the
            # fit is bit-deterministic, so there is no run-to-run
            # variance to absorb)
            assert drift <= 0.25, (link, n, drift)


def test_sgd_sparse_row_id_domain_tracks_scan_blocks(spark, linear_micro):
    """The exact integer-width layout buckets by row_id VALUE, so
    `monotonically_increasing_id`-style SPARSE domains (scan_partition
    << 33 | row) track scan-BLOCK granularity, not row rank — the
    documented Hadoop-faithful semantics (mappers never outnumber input
    splits; see the layout comment in sgd_fit). Pins, on a 2-block
    mid-style frame fit with n_partitions=8 (r11 verdict #6):

    - the collapse is OBSERVABLE: n_splits_effective == 2, never 8;
    - it is DETERMINISTIC: two fits agree bitwise;
    - it is EXACTLY the map-split story: the sparse fit equals — to the
      bit — a dense-id fit with n_partitions == the block count, because
      each scan block becomes one trajectory with identical row order
      (empty splits contribute a vacuous all_continue=True and +0.0
      partials, which perturb nothing)."""
    import pandas as pd

    rows = linear_micro.orderBy("row_id").toPandas()
    half = len(rows) // 2
    sparse = rows.copy()
    # mid layout: block 0 -> ids 0..half-1, block 1 -> (1 << 33) + i
    sparse["row_id"] = [
        int(i) if i < half else (1 << 33) + int(i - half)
        for i in range(len(rows))
    ]
    sparse_df = spark.createDataFrame(
        sparse, schema="row_id long, y double, features array<double>"
    )

    fit_sparse = sgd_fit(sparse_df, link="linear", max_iter=5, n_partitions=8)
    again = sgd_fit(sparse_df, link="linear", max_iter=5, n_partitions=8)
    assert fit_sparse.n_splits_effective == 2  # 2 blocks, not 8 splits
    assert again.theta == fit_sparse.theta  # bit-reproducible

    fit_dense2 = sgd_fit(linear_micro, link="linear", max_iter=5, n_partitions=2)
    assert fit_dense2.n_splits_effective == 2
    assert fit_sparse.theta == fit_dense2.theta  # partition ≈ map split
    assert (fit_sparse.iterations, fit_sparse.converged) == (
        fit_dense2.iterations,
        fit_dense2.converged,
    )


def test_native_sweep_bit_equals_python_fallback(linear_micro, separable_micro):
    """r18: the per-record sweep compiles to C (guide §4.2) with the
    identical IEEE op sequence; a cluster executor without the .so
    falls back to the pure-Python loop. The two paths must produce
    BIT-IDENTICAL theta trajectories — this pins it through the real
    sgd_fit on both links (the sigmoid path exercises libm exp)."""
    import mapreduce_code_spark.operators.regression as R

    if not R._native_kernel_path():
        pytest.skip("no C compiler on this host — python path is the only path")
    for pts, link in ((linear_micro, "linear"), (separable_micro, "logistic")):
        native = sgd_fit(pts, link=link, max_iter=5, n_partitions=4)
        prior = R._NATIVE_SO
        R._NATIVE_SO = ""  # force the python fallback
        try:
            python = sgd_fit(pts, link=link, max_iter=5, n_partitions=4)
        finally:
            R._NATIVE_SO = prior
        assert native.theta == python.theta, link  # bitwise: == on floats
        assert native.iterations == python.iterations
        assert native.converged == python.converged
