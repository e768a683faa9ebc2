"""Association-rule tests: micro-fixture goldens for both enumeration
modes, confidence bounds property, and DuckDB oracle parity."""

from __future__ import annotations

import pytest

from mapreduce_code_spark.operators.rules import association_rules
from mapreduce_code_spark.registry import oracle_sql, queries


@pytest.fixture(scope="module")
def counts_micro(spark):
    # frequent-itemset counts of the FIXTURES §3.1 micro baskets at S=5
    rows = [("a", 7), ("b", 6), ("c", 5), ("a b", 5)]
    return spark.createDataFrame(rows, "itemset string, cnt long")


@pytest.fixture(scope="module")
def counts_triple(spark):
    # a frequent triple with all its subsets, to exercise faithful mode
    rows = [
        ("a", 10), ("b", 9), ("c", 8),
        ("a b", 7), ("a c", 6), ("b c", 5), ("a b c", 5),
    ]
    return spark.createDataFrame(rows, "itemset string, cnt long")


def test_rules_standard_micro(counts_micro):
    got = {
        (r["antecedent"], r["consequent"]): (r["sub_cnt"], r["full_cnt"])
        for r in association_rules(counts_micro, 5).collect()
    }
    assert got == {("a", "b"): (7, 5), ("b", "a"): (6, 5)}


def test_rules_faithful_micro(counts_micro):
    # reference recursion never emits rules for size-2 itemsets
    # (level-0 singletons are not emitted, apriori_raw.java:229-231)
    assert association_rules(counts_micro, 5, faithful=True).count() == 0


def test_rules_faithful_triple(counts_triple):
    rows = association_rules(counts_triple, 5, faithful=True).collect()
    got = {r["antecedent"]: r for r in rows if r["itemset"] == "a b c"}
    # guard apriori_raw.java:288 → antecedents "a b", "a c" only, not "b c"
    assert set(got) == {"a b", "a c"}
    assert got["a b"]["confidence"] == pytest.approx(100.0 * 5 / 7)
    assert (
        got["a b"]["rule"]
        == "[a b] => [a, b, c] [X]-7 => [X,Y]-5 CONFIDENCE-RATE ="
    )


def test_rules_standard_triple_complete(counts_triple):
    rows = [
        r for r in association_rules(counts_triple, 5).collect()
        if r["itemset"] == "a b c"
    ]
    # all 6 proper non-empty antecedents of {a,b,c}
    assert {r["antecedent"] for r in rows} == {"a", "b", "c", "a b", "a c", "b c"}
    for r in rows:
        assert 0 < r["confidence"] <= 100.0


@pytest.mark.parametrize(
    "name", ["apriori_association_rules", "apriori_association_rules_ref"]
)
def test_oracle_parity(spark, sf_dir, name):
    # the canonical variant is retired from the driver surface (r6
    # budget) but keeps full oracle parity here
    from mapreduce_code_spark.registry import _RETIRED, _RETIRED_ORACLES

    from tests.helpers import assert_parity

    fn = queries().get(name) or _RETIRED[name]
    sql = oracle_sql().get(name) or _RETIRED_ORACLES[name]
    assert_parity(fn(spark, sf_dir), sf_dir, sql)
