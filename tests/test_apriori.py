"""Apriori operator tests: hand-computed micro-fixture (FIXTURES.md §3.1),
raw/final behavioral variants, downward-closure property, and DuckDB
oracle parity for the registered queries."""

from __future__ import annotations

import pytest

from mapreduce_code_spark.operators.frequent import (
    AprioriConfig,
    frequent_items,
    frequent_itemsets,
)
from mapreduce_code_spark.registry import oracle_sql, queries
from tests.helpers import assert_parity

# 9 baskets over {a..e}; with Support=5 the frequent itemsets are exactly
# a:7, b:6, c:5, "a b":5 (hand-checked; FIXTURES.md §3.1).
BASKETS_MICRO = [
    ["a", "b"],
    ["a", "b"],
    ["a", "b"],
    ["a", "b"],
    ["a", "b", "c"],
    ["a", "c"],
    ["a", "c"],
    ["b", "c"],
    ["c", "d", "e"],
]


@pytest.fixture(scope="module")
def tx_micro(spark):
    return spark.createDataFrame(
        [(i, items) for i, items in enumerate(BASKETS_MICRO)],
        "basket_id long, items array<string>",
    )


def test_frequent_items_micro(tx_micro):
    got = {r["item"]: r["cnt"] for r in frequent_items(tx_micro, 5).collect()}
    assert got == {"a": 7, "b": 6, "c": 5}


def test_frequent_itemsets_final_mode(tx_micro):
    got = {r["itemset"]: r["cnt"] for r in frequent_itemsets(tx_micro).collect()}
    assert got == {"a": 7, "b": 6, "c": 5, "a b": 5}


def test_frequent_itemsets_raw_mode(tx_micro):
    # _raw: no singleton re-emit, no reduce-side HAVING → all subset counts
    # over the pruned (frequent-only) token lists appear unfiltered.
    cfg = AprioriConfig(emit_singletons=False, reduce_side_having=False)
    got = {r["itemset"]: r["cnt"] for r in frequent_itemsets(tx_micro, cfg).collect()}
    assert got == {"a b": 5, "a c": 3, "b c": 2, "a b c": 1}


def test_downward_closure(tx_micro):
    """Every subset of a frequent itemset is frequent (Apriori property)."""
    rows = frequent_itemsets(tx_micro).collect()
    freq = {r["itemset"] for r in rows}
    for r in rows:
        items = r["itemset"].split(" ")
        for x in items:
            assert x in freq


@pytest.mark.parametrize("name", ["apriori_frequent_items", "apriori_frequent_itemsets"])
def test_oracle_parity(spark, sf_dir, name):
    assert_parity(queries()[name](spark, sf_dir), sf_dir, oracle_sql()[name])


def test_udtf_variant_matches_udf(tx_micro):
    """The Python-UDTF lateral-join formulation produces exactly the
    UDF+explode result (both _final and _raw modes)."""
    from mapreduce_code_spark.operators.frequent import frequent_itemsets_udtf

    for cfg in (
        AprioriConfig(),
        AprioriConfig(emit_singletons=False, reduce_side_having=False),
    ):
        a = {
            (r["itemset"], r["cnt"])
            for r in frequent_itemsets(tx_micro, cfg).collect()
        }
        b = {
            (r["itemset"], r["cnt"])
            for r in frequent_itemsets_udtf(tx_micro, cfg).collect()
        }
        assert a == b
