"""Graph operators: PageRank (quantized-int64 power iteration) and
degree-oriented triangle counting — structural invariants, brute-force
cross-checks on adversarial topologies, and oracle parity at sf0.001."""

from __future__ import annotations

import itertools
import random

import pytest

from mapreduce_code_spark.operators import graph as G
from mapreduce_code_spark.sources.io import load_table
from tests.helpers import assert_parity


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src BIGINT, dst BIGINT"
    )


def _brute_triangles(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({n for e in und for n in e})
    count = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            count[a] += 1
            count[b] += 1
            count[c] += 1
    deg = {n: sum(n in e for e in und) for n in nodes}
    return {n: (deg[n], count[n]) for n in nodes}


@pytest.mark.parametrize("seed,n,m", [(1, 8, 12), (2, 12, 30), (3, 20, 60)])
def test_triangles_match_brute_force(spark, seed, n, m):
    rng = random.Random(seed)
    pairs = {
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    }
    got = {
        r["node"]: (r["degree"], r["n_triangles"])
        for r in triangle_rows(spark, pairs)
    }
    assert got == _brute_triangles(pairs)


def triangle_rows(spark, pairs):
    return G.triangle_counts(_edges_df(spark, pairs)).collect()


def test_triangles_complete_graph_k5(spark):
    pairs = list(itertools.combinations(range(5), 2))
    rows = triangle_rows(spark, pairs)
    # every node of K5 sits in C(4,2) = 6 triangles, degree 4
    assert {(r["degree"], r["n_triangles"]) for r in rows} == {(4, 6)}
    assert len(rows) == 5


def test_triangles_triangle_free_graph(spark):
    # 4-cycle: degrees 2, zero triangles everywhere
    rows = triangle_rows(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert [(r["degree"], r["n_triangles"]) for r in rows] == [(2, 0)] * 4


def test_pagerank_uniform_on_cycle(spark):
    # directed 6-cycle: perfectly symmetric, every rank identical and the
    # total mass exact (no dangling nodes, divisions all exact)
    n = 6
    df = G.pagerank(_edges_df(spark, [(i, (i + 1) % n) for i in range(n)]))
    rows = df.collect()
    assert len({r["rank_q"] for r in rows}) == 1
    assert rows[0]["rank_q"] == G.SCALE // n


def test_pagerank_star_center_dominates_and_mass_conserved(spark):
    # star: leaves 1..9 -> 0; 0 is dangling (mass redistributed)
    leaves = list(range(1, 10))
    df = G.pagerank(_edges_df(spark, [(i, 0) for i in leaves]))
    ranks = {r["node"]: r["rank_q"] for r in df.collect()}
    assert ranks[0] > max(ranks[i] for i in leaves)
    assert len({ranks[i] for i in leaves}) == 1
    # integer-floor dust only: each of the 5 iterations floors at most
    # ~3 divisions per node
    total = sum(ranks.values())
    assert G.SCALE * 0.999 < total <= G.SCALE


def test_pagerank_independent_of_partitioning(spark):
    rng = random.Random(7)
    pairs = {(rng.randrange(30), rng.randrange(30)) for _ in range(120)}
    e = _edges_df(spark, pairs)
    a = {r["node"]: r["rank_q"] for r in G.pagerank(e).collect()}
    b = {
        r["node"]: r["rank_q"]
        for r in G.pagerank(e.repartition(13, "dst")).collect()
    }
    assert a == b


def test_click_edges_sparsify_is_keyhash_monotone(spark, sf_dir):
    # the sparsifier is a pure function of the edge identity: raising
    # keep_bp only ever ADDS edges (never reassigns), keep_bp=0 admits
    # nothing, keep_bp=BUCKETS admits every observed transition
    from mapreduce_code_spark.operators.sampling import BUCKETS

    ev = load_table(spark, sf_dir, "events")
    frontier = [
        {
            (r["src"], r["dst"])
            for r in G.click_edges(ev, keep_bp=bp).collect()
        }
        for bp in (0, 1500, 5000, BUCKETS)
    ]
    assert frontier[0] == set()
    assert frontier[1] and frontier[1] < frontier[2] < frontier[3]


def test_pagerank_oracle_parity(spark, sf_dir):
    df = G.pagerank(G.click_edges(load_table(spark, sf_dir, "events")))
    assert_parity(df, sf_dir, G.pagerank_clicks_sql())


def test_triangles_oracle_parity(spark, sf_dir):
    df = G.triangle_counts(G.click_edges(load_table(spark, sf_dir, "events")))
    assert_parity(df, sf_dir, G.triangle_clicks_sql())


def _brute_coreness(pairs):
    """Textbook peeling: repeatedly remove the min-degree node."""
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {}
    deg = {n: len(ns) for n, ns in adj.items()}
    k = 0
    while deg:
        n = min(deg, key=lambda x: (deg[x], x))
        k = max(k, deg[n])
        core[n] = k
        for m in adj[n]:
            if m in deg and m != n:
                deg[m] -= 1
        del deg[n]
        for m in adj[n]:
            adj.get(m, set()).discard(n)
    return core


@pytest.mark.parametrize("seed,n,m", [(11, 10, 18), (12, 15, 45), (13, 25, 90)])
def test_coreness_matches_peeling(spark, seed, n, m):
    rng = random.Random(seed)
    pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    pairs = {p for p in pairs if p[0] != p[1]}
    got = {
        r["node"]: r["coreness"]
        for r in G.coreness(_edges_df(spark, pairs), n_rounds=30).collect()
    }
    assert got == _brute_coreness(pairs)


def test_coreness_converges_at_shipped_rounds(spark, sf_dir):
    e = G.click_edges(load_table(spark, sf_dir, "events"))
    c8 = {r["node"]: r["coreness"] for r in G.coreness(e, n_rounds=8).collect()}
    c9 = {r["node"]: r["coreness"] for r in G.coreness(e, n_rounds=9).collect()}
    assert c8 == c9


def test_coreness_oracle_parity(spark, sf_dir):
    df = G.coreness(G.click_edges(load_table(spark, sf_dir, "events")))
    assert_parity(df, sf_dir, G.coreness_clicks_sql(), rtol=0)


def test_lpa_separates_planted_cliques(spark):
    # two 4-cliques joined by ONE bridge edge: propagation keeps them in
    # different communities (each clique's internal majority dominates)
    k4a = list(itertools.combinations([0, 1, 2, 3], 2))
    k4b = list(itertools.combinations([10, 11, 12, 13], 2))
    pairs = k4a + k4b + [(3, 10)]
    got = {
        r["node"]: r["community"]
        for r in G.lpa_communities(_edges_df(spark, pairs)).collect()
    }
    assert {got[n] for n in (0, 1, 2, 3)} == {0}
    assert {got[n] for n in (10, 11, 12, 13)} == {10}


def test_lpa_deterministic_under_partitioning(spark):
    rng = random.Random(21)
    pairs = {(rng.randrange(40), rng.randrange(40)) for _ in range(150)}
    e = _edges_df(spark, pairs)
    a = {r["node"]: r["community"] for r in G.lpa_communities(e).collect()}
    b = {
        r["node"]: r["community"]
        for r in G.lpa_communities(e.repartition(11, "dst")).collect()
    }
    assert a == b


def test_lpa_oracle_parity(spark, sf_dir):
    df = G.lpa_communities(G.click_edges(load_table(spark, sf_dir, "events")))
    assert_parity(df, sf_dir, G.lpa_clicks_sql(), rtol=0)
