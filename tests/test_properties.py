"""Property-based tests (hypothesis): operator laws that must hold for
ANY input, not just the fixtures. Example counts are kept small — each
example runs a real Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_code_spark.operators import relational as R
from mapreduce_code_spark.operators import skew

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_kv = st.lists(
    st.tuples(st.integers(0, 9), st.text("ab", min_size=1, max_size=3)),
    min_size=0,
    max_size=12,
)


@given(cur=_kv, upd=_kv)
@settings(**_SETTINGS)
def test_kv_upsert_laws(spark, cur, upd):
    """keys(result) == keys(cur) ∪ keys(upd); updated keys carry the
    update's value; untouched keys carry the current value."""
    # dedupe inputs per key (upsert semantics need unique keys per side)
    cur_d = dict(cur)
    upd_d = dict(upd)
    schema = "k long, v string"
    cur_df = spark.createDataFrame(list(cur_d.items()) or [], schema)
    upd_df = spark.createDataFrame(list(upd_d.items()) or [], schema)
    got = {r["k"]: r["v"] for r in R.kv_upsert(cur_df, upd_df, "k").collect()}
    assert got == {**cur_d, **upd_d}


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["hot", "a", "b"]), st.integers(-100, 100)),
        min_size=0,
        max_size=30,
    ),
    n_salts=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_salted_agg_equals_direct(spark, rows, n_salts):
    df = spark.createDataFrame(rows or [], "k string, v long")
    direct = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    salted = {
        (r["k"], r["cnt"])
        for r in skew.salted_agg_counts(df, "k", n_salts=n_salts).collect()
    }
    assert salted == direct


_edges = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=40,
)


@given(edges=_edges)
@settings(**_SETTINGS)
def test_star_contraction_matches_union_find(spark, edges):
    """Star-contraction component labels equal a driver-side union-find
    on arbitrary random graphs — the property that guards the subtle
    emission rules (large-star emits only from the v>u perspective,
    small-star rewires Γ< ∪ {u}) against shape-specific blind spots."""
    from mapreduce_code_spark.operators import dedup

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {v for e in edges for v in e}
    expect = {v: find(v) for v in nodes}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in dedup.dup_components_star(pairs).collect()
    }
    assert got == expect
