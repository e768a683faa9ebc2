"""Automated plan-shape audit: every registered query's physical plan is
checked for scale anti-patterns.

- ``CartesianProduct`` — an unbroadcast cross join means a shuffle-side
  blowup that cannot survive scale.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan means the
  hot path fell off Arrow vectorization (our Python crossings must be
  ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).

``BroadcastNestedLoopJoin`` is allowed: it appears only for non-equi
joins against broadcast-tiny sides (query vectors, corpus-size scalars),
where it is the right plan.
"""

from __future__ import annotations

import pytest

from mapreduce_code_spark.registry import queries

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(queries()))
def test_no_scale_antipatterns(spark, sf_dir, name):
    df = queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in FORBIDDEN:
        assert marker not in plan, f"{name}: {marker} in physical plan"
