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


def test_ordered_identity_mode(spark):
    """Faithful reference replay (apriori_final.java:82-93): itemset keys
    preserve basket order, so baskets listing "b a" count toward the
    itemset "b a" — a DIFFERENT key from "a b" — while the default mode
    folds both spellings into the canonical sorted key."""
    tx = spark.createDataFrame(
        [(i, ["b", "a"]) for i in range(5)]
        + [(5 + i, ["a", "b"]) for i in range(5)],
        "basket_id long, items array<string>",
    )
    ordered = {
        r["itemset"]: r["cnt"]
        for r in frequent_itemsets(
            tx, AprioriConfig(ordered_identity=True)
        ).collect()
    }
    # 10 baskets of {a,b} but only 5 in each spelling: both order-
    # sensitive pair keys exist, separately counted
    assert ordered["b a"] == 5 and ordered["a b"] == 5
    assert ordered["a"] == 10 and ordered["b"] == 10
    canonical = {
        r["itemset"]: r["cnt"] for r in frequent_itemsets(tx).collect()
    }
    # default mode canonicalizes even order-mixed input arrays
    assert canonical["a b"] == 10 and "b a" not in canonical


def test_transactions_ordered_preserves_line_order(spark):
    """transactions_ordered keeps l_linenumber encounter order with
    first-occurrence dedup; transactions sorts."""
    from mapreduce_code_spark.plans import prep

    lineitem = spark.createDataFrame(
        [(1, 1, 101), (1, 2, 100), (1, 3, 101), (2, 1, 100)],
        "l_orderkey long, l_linenumber int, l_partkey long",
    )
    part = spark.createDataFrame(
        [(100, "A"), (101, "B")], "p_partkey long, p_brand string"
    )
    got = {
        r["basket_id"]: r["items"]
        for r in prep.transactions_ordered(lineitem, part).collect()
    }
    assert got == {1: ["B", "A"], 2: ["A"]}
    srt = {
        r["basket_id"]: r["items"]
        for r in prep.transactions(lineitem, part).collect()
    }
    assert srt == {1: ["A", "B"], 2: ["A"]}


def test_read_transactions_text_ordered(spark, tmp_path):
    """ordered=True keeps line order ('b a' stays b-then-a) for faithful
    replay of reference input files; default still canonicalizes."""
    from mapreduce_code_spark.sources.io import read_transactions_text

    p = str(tmp_path / "baskets.txt")
    with open(p, "w") as f:
        f.write("b a\n\na b c\n")
    ordered = [
        r["items"]
        for r in read_transactions_text(spark, p, ordered=True)
        .orderBy("basket_id")
        .collect()
    ]
    assert ordered == [["b", "a"], ["a", "b", "c"]]
    canonical = [
        r["items"]
        for r in read_transactions_text(spark, p).orderBy("basket_id").collect()
    ]
    assert canonical == [["a", "b"], ["a", "b", "c"]]
