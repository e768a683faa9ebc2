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


_doc_words = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=40
)


@given(
    words=_doc_words,
    size=st.integers(1, 10),
    stride=st.integers(1, 10),
)
@settings(**_SETTINGS)
def test_chunking_laws(spark, words, size, stride):
    """For any doc and any valid (size, stride≤size): every word index is
    covered by at least one chunk, every chunk is the exact word slice it
    claims, chunk starts are 0, stride, 2·stride…, and only the last
    chunk may be shorter than size (when the doc is longer than size).
    stride > size must be refused (it drops tokens)."""
    import pytest

    from mapreduce_code_spark.operators import sampling as SMP

    text = " ".join(words)
    if stride > size:
        with pytest.raises(ValueError):
            SMP.chunk_documents(
                spark.createDataFrame(
                    [(0, text, "en", "s", 1)],
                    "doc_id long, text string, lang string, source string,"
                    " n_chars long",
                ),
                size=size,
                stride=stride,
            )
        return
    df = spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    chunks = sorted(
        SMP.chunk_documents(df, size=size, stride=stride).collect(),
        key=lambda r: r["chunk_id"],
    )
    n = len(words)
    covered = set()
    for i, r in enumerate(chunks):
        assert r["chunk_id"] == i and r["start_word"] == i * stride
        expect = words[r["start_word"] : r["start_word"] + size]
        assert r["chunk_text"] == " ".join(expect)
        assert r["chunk_words"] == len(expect)
        if i < len(chunks) - 1 and n > size:
            assert r["chunk_words"] == size  # only the tail may be short
        covered.update(range(r["start_word"], r["start_word"] + r["chunk_words"]))
    assert covered == set(range(n))


_corpus = st.lists(_doc_words, min_size=1, max_size=6)


@given(docs=_corpus, n=st.integers(2, 4))
@settings(**_SETTINGS)
def test_dup_spans_match_bruteforce(spark, docs, n):
    """dup_spans equals a driver-side brute force on arbitrary tiny
    corpora: duplicated n-gram positions per doc, merged into maximal
    runs — guards the islands arithmetic and the >=2-docs rule."""
    from collections import Counter

    from mapreduce_code_spark.operators import dedup as DD

    rows = [
        (i, " ".join(w), "en", "s", len(" ".join(w)))
        for i, w in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # brute force: gram -> set of docs; then per-doc dup positions -> runs
    gram_docs = {}
    for i, w in enumerate(docs):
        for p in range(len(w) - n + 1):
            gram_docs.setdefault(tuple(w[p : p + n]), set()).add(i)
    want = set()
    for i, w in enumerate(docs):
        dup_pos = [
            p
            for p in range(len(w) - n + 1)
            if len(gram_docs[tuple(w[p : p + n])]) >= 2
        ]
        run_start = None
        prev = None
        for p in dup_pos + [None]:
            if p is not None and prev is not None and p == prev + 1:
                prev = p
                continue
            if prev is not None:
                want.add((i, run_start, prev + n, prev - run_start + 1))
            run_start, prev = p, p
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in DD.dup_spans(df, n=n).collect()
    }
    assert got == want


_prices = st.lists(
    st.tuples(
        st.sampled_from(["1-URGENT", "2-HIGH"]),
        st.integers(0, 10**7),  # cents, up to $100k
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_prices)
@settings(**_SETTINGS)
def test_winsorized_laws(spark, rows):
    """Winsorized mean equals the brute-force clamp: bounds are the
    values at the ceil(n·bp/10000) ranks of the sorted group, every
    value clamps into [lo, hi], and the mean is the exact clamped sum
    over n."""
    df = spark.createDataFrame(
        [(p, c / 100.0) for p, c in rows],
        "o_orderpriority STRING, o_totalprice DOUBLE",
    )
    got = {
        r["o_orderpriority"]: r
        for r in R.winsorized_price_stats(df).collect()
    }
    groups: dict[str, list[int]] = {}
    for p, c in rows:
        groups.setdefault(p, []).append(c)
    for p, vals in groups.items():
        vals.sort()
        n = len(vals)
        lo = vals[max(1, -(-n * 500 // 10000)) - 1]
        hi = vals[max(1, -(-n * 9500 // 10000)) - 1]
        clamped = [min(hi, max(lo, v)) for v in vals]
        r = got[p]
        assert (r["n"], r["lo_cents"], r["hi_cents"]) == (n, lo, hi)
        assert r["winsorized_mean"] == sum(clamped) / n


_journeys = st.lists(
    st.tuples(
        st.integers(0, 3),  # user
        st.integers(0, 5000),  # minutes offset
        st.sampled_from([0, 1, 2, None]),  # page (None = unparseable)
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),  # one event per (user, minute)
)


@given(rows=_journeys)
@settings(**_SETTINGS)
def test_session_paths_laws(spark, rows):
    """Session paths equal a brute-force driver sessionizer: 30-min gap
    cuts, step cap, ordered join of pages, count per path, top-k with
    (count desc, path asc) ranking."""
    from collections import Counter

    from mapreduce_code_spark.operators import monitoring as MON
    from tests.helpers import EVENTS_SCHEMA_STR, event_row

    data = [
        event_row(i, u, "view", m, k)
        for i, (u, m, k) in enumerate(sorted(rows))
    ]
    df = spark.createDataFrame(data, EVENTS_SCHEMA_STR)
    got = [
        (r["path"], r["n_sessions"], r["rank"])
        for r in sorted(
            MON.session_paths(df).collect(), key=lambda r: r["rank"]
        )
    ]
    # brute force
    per_user: dict[int, list[tuple[int, int]]] = {}
    for u, m, k in sorted(rows):
        if k is not None:
            per_user.setdefault(u, []).append((m, k))
    counts: Counter[str] = Counter()
    for seq in per_user.values():
        sess: list[int] = []
        prev = None
        for m, k in seq:
            if prev is not None and m - prev > 30:
                counts["->".join(map(str, sess[:8]))] += 1
                sess = []
            sess.append(k)
            prev = m
        if sess:
            counts["->".join(map(str, sess[:8]))] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == [
        (p, n, i + 1) for i, (p, n) in enumerate(want)
    ]


_clickstream = st.lists(
    st.tuples(
        st.integers(0, 3),  # user
        st.integers(0, 200),  # minutes offset
        st.sampled_from(["view", "purchase", "click"]),
        st.sampled_from([0, 1, 2, None]),  # page
        st.integers(0, 10_000),  # value cents
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


@given(rows=_clickstream)
@settings(**_SETTINGS)
def test_attribution_laws(spark, rows):
    """Last-touch attribution equals a brute-force driver replay: the
    most recent valid-page view within 30 minutes gets the credit."""
    from collections import defaultdict

    from mapreduce_code_spark.operators import monitoring as MON
    from tests.helpers import EVENTS_SCHEMA_STR, event_row

    data = [
        event_row(i, u, typ, m, k, c / 100.0)
        for i, (u, m, typ, k, c) in enumerate(sorted(rows))
    ]
    df = spark.createDataFrame(data, EVENTS_SCHEMA_STR)
    got = {
        r["page"]: (r["n_purchases"], r["revenue_cents"])
        for r in MON.attribution_last_touch(df).collect()
    }
    per_user: dict[int, list] = defaultdict(list)
    for u, m, typ, k, c in sorted(rows):
        per_user[u].append((m, typ, k, c))
    agg: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for seq in per_user.values():
        lv = None  # (minute, page)
        for m, typ, k, c in seq:
            if typ == "view" and k is not None:
                lv = (m, k)
            elif typ == "purchase" and lv and m - lv[0] <= 30:
                agg[lv[1]][0] += 1
                agg[lv[1]][1] += c
    assert got == {p: tuple(v) for p, v in agg.items()}


_bpe_corpus = st.lists(
    st.text("ab", min_size=1, max_size=6),
    min_size=1,
    max_size=20,
)


def _ref_bpe(word_list, k):
    """Brute-force reference BPE (Sennrich alg. 1 semantics): overlapping
    adjacent pair counts, max count with lexicographically-smallest
    (lhs, rhs) tie-break, greedy left-to-right merge application."""
    from collections import Counter

    words: Counter[tuple[str, ...]] = Counter(
        tuple(w) for w in word_list
    )
    merges = []
    for _ in range(k):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        top = max(pairs.values())
        l, r = min(p for p, c in pairs.items() if c == top)
        merges.append((l, r, l + r, top))
        nxt: Counter[tuple[str, ...]] = Counter()
        for syms, f in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] += f
        words = nxt
    return merges


@given(word_list=_bpe_corpus, k=st.integers(1, 4))
@settings(**_SETTINGS)
def test_bpe_merges_match_bruteforce(spark, word_list, k):
    """The DataFrame BPE (spaced-symbol replace loop) equals the
    reference algorithm on ANY corpus — including merge-exhaustion
    (fewer feasible merges than rounds → fewer output rows, both
    sides)."""
    from mapreduce_code_spark.functions import text as TXT

    docs = spark.createDataFrame(
        [(0, " ".join(word_list))], "doc_id long, text string"
    )
    got = [
        (r["lhs"], r["rhs"], r["merged"], r["pair_cnt"])
        for r in TXT.bpe_merges(docs, n_merges=k)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == _ref_bpe(word_list, k)


def _ref_bpe_encode(word_list, merges):
    """Brute-force encode: apply the trained merges in training order,
    each greedily left-to-right within each word (same while-loop as
    :func:`_ref_bpe`'s application step)."""
    out = []
    for w in word_list:
        syms = list(w)
        for l, r, _merged, _cnt in merges:
            nxt: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    nxt.append(l + r)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            syms = nxt
        out.extend(syms)
    return out


@given(word_list=_bpe_corpus, k=st.integers(1, 4))
@settings(**_SETTINGS)
def test_bpe_encode_matches_bruteforce(spark, word_list, k):
    """Round-tripping the corpus through train+encode equals the
    reference encoder on ANY corpus, and the tokens concatenate back to
    the original words (no symbol lost or invented)."""
    from mapreduce_code_spark.functions import text as TXT

    docs = spark.createDataFrame(
        [(0, " ".join(word_list))], "doc_id long, text string"
    )
    merges = TXT.bpe_merges(docs, n_merges=k)
    got = [
        r["token"]
        for r in TXT.bpe_encode(docs, merges).orderBy("pos").collect()
    ]
    assert got == _ref_bpe_encode(word_list, _ref_bpe(word_list, k))
    assert "".join(got) == "".join(word_list)


# mixes the small range with 60-bit-scale ids: integral columns bucket
# in exact decimal arithmetic, so values far beyond double's 2^53
# whole-number range must still land in exact-rational buckets
_zcoord = st.one_of(
    st.integers(-1000, 1000), st.integers(-(1 << 62), 1 << 62)
)
_zpoints = st.lists(
    st.tuples(_zcoord, _zcoord),
    min_size=2,
    max_size=60,
)


def _ref_morton(points, bits):
    """Brute-force Morton keys: min/max-normalize each dimension to
    ``bits``-bit buckets, interleave (x gets the higher bit of each
    pair). Exact integer math — the engine's integral path is exact
    decimal, not double."""
    xs, ys = [p[0] for p in points], [p[1] for p in points]
    hi = (1 << bits) - 1

    def bucket(v, lo, up):
        return 0 if up == lo else (v - lo) * hi // (up - lo)

    out = []
    for x, y in points:
        bx = bucket(x, min(xs), max(xs))
        by = bucket(y, min(ys), max(ys))
        z = 0
        for b in range(bits):
            z |= ((bx >> b) & 1) << (2 * b + 1)
            z |= ((by >> b) & 1) << (2 * b)
        out.append(z)
    return out


@given(points=_zpoints, bits=st.integers(1, 12))
@settings(**_SETTINGS)
def test_zorder_key_matches_bruteforce(spark, points, bits):
    """The column-algebra Morton key equals the reference interleave on
    ANY point set (including constant dimensions and negatives) — same
    normalization, same bit placement, double math both sides."""
    from mapreduce_code_spark.sources.bucketing import zorder_key

    df = spark.createDataFrame(points, "x long, y long")
    keyed, zc = zorder_key(df, ["x", "y"], bits=bits)
    got = [
        r[zc] for r in keyed.orderBy("x", "y").collect()
    ]
    want = [
        z for _, _, z in sorted(
            (x, y, z) for (x, y), z in zip(points, _ref_morton(points, bits))
        )
    ]
    assert got == want


_shuffle_ids = st.lists(
    st.integers(0, 10**9), min_size=1, max_size=40, unique=True
)


@given(ids=_shuffle_ids, n_shards=st.integers(1, 5))
@settings(**_SETTINGS)
def test_shuffle_order_laws(spark, ids, n_shards):
    """shuffle_order is a bijective, hash-faithful layout: every row
    keeps exactly one (shard, pos); pos is 1..count(shard) within each
    shard; shards hold contiguous ascending hash ranges, so the
    (shard, pos) lexicographic order IS the global ascending-ord_key
    permutation."""
    from mapreduce_code_spark.operators.sampling import shuffle_order

    df = spark.createDataFrame([(i, "s") for i in ids], "doc_id long, source string")
    rows = shuffle_order(df, n_shards=n_shards).collect()
    assert len(rows) == len(ids)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        assert 0 <= shard < n_shards
        assert sorted(r["pos"] for r in rs) == list(range(1, len(rs) + 1))
    replay = [
        r["ord_key"]
        for shard in sorted(by_shard)
        for r in sorted(by_shard[shard], key=lambda r: r["pos"])
    ]
    assert replay == sorted(r["ord_key"] for r in rows)
