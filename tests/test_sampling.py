"""Deterministic-sampling invariants: layout independence, growth
stability, nested-rate monotonicity — the properties randomSplit/sample
do NOT have and a training pipeline needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_code_spark.operators import sampling as SMP
from mapreduce_code_spark.sources.io import load_table
from tests.helpers import assert_parity


def test_split_oracle_parity(spark, sf_dir):
    assert_parity(
        SMP.train_val_split(load_table(spark, sf_dir, "documents")),
        sf_dir,
        SMP.train_val_split_sql(),
    )


def test_split_layout_invariant(spark, sf_dir):
    """Same assignment regardless of partitioning — unlike randomSplit."""
    docs = load_table(spark, sf_dir, "documents")
    a = SMP.train_val_split(docs).toPandas().set_index("doc_id")["split"]
    b = (
        SMP.train_val_split(docs.repartition(7, "lang"))
        .toPandas()
        .set_index("doc_id")["split"]
    )
    assert a.sort_index().equals(b.sort_index())


def test_split_stable_under_growth(spark, sf_dir):
    """Assignments computed on a subset agree with the full corpus —
    appending data never moves an existing document across the split."""
    docs = load_table(spark, sf_dir, "documents")
    full = SMP.train_val_split(docs).toPandas().set_index("doc_id")["split"]
    part = (
        SMP.train_val_split(docs.filter(F.col("doc_id") % 3 == 0))
        .toPandas()
        .set_index("doc_id")["split"]
    )
    assert (full.loc[part.index] == part).all()


def test_split_proportions(spark, sf_dir):
    pdf = SMP.train_val_split(
        load_table(spark, sf_dir, "documents"), val_bp=2500
    ).toPandas()
    frac = (pdf.split == "val").mean()
    assert 0.15 < frac < 0.35  # 25% ± sampling noise at corpus size


def test_group_split_no_leakage_across_groups(spark, sf_dir):
    """key='source' makes the split group-aware: every document of a
    group lands on ONE side (the domain-leakage guard), the decision is
    a pure function of the group key (doc additions never flip a
    group), and the plan stays a narrow map — no Exchange."""
    docs = load_table(spark, sf_dir, "documents")
    split = SMP.train_val_split(
        docs.select("doc_id", "source"), val_bp=2500, key="source"
    )
    joined = (
        docs.select("doc_id", "source")
        .join(split.select("doc_id", "split"), "doc_id")
        .toPandas()
    )
    sides = joined.groupby("source")["split"].nunique()
    assert (sides == 1).all()
    # group decision is key-pure: recompute one group's bucket by hand
    import hashlib

    for src, side in joined.drop_duplicates("source")[
        ["source", "split"]
    ].itertuples(index=False):
        b = int(hashlib.md5(f"split|{src}".encode()).hexdigest()[:15], 16) % 10000
        assert ("val" if b < 2500 else "train") == side
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_nested_rates_monotone(spark, sf_dir):
    """A higher-rate sample is a superset of a lower-rate one."""
    docs = load_table(spark, sf_dir, "documents")
    small = set(
        r["doc_id"]
        for r in SMP.stratified_sample(docs, {"en": 1000}, 2000).collect()
    )
    big = set(
        r["doc_id"]
        for r in SMP.stratified_sample(docs, {"en": 3000}, 4000).collect()
    )
    assert small <= big


def test_stratified_rates_apply_per_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept = SMP.stratified_sample(docs, {"en": 0}, 10_000).toPandas()
    assert (kept.lang != "en").all()  # rate 0 drops the whole stratum
    n_non_en = docs.filter(F.col("lang") != "en").count()
    assert len(kept) == n_non_en  # rate 10000 keeps everything else


def test_pack_documents_invariants(spark, sf_dir):
    """Packing is gap-free within each shard (offsets tile exactly), the
    pack boundary math is consistent, and assignments are layout-stable."""
    docs = load_table(spark, sf_dir, "documents")
    pdf = SMP.pack_documents(docs, budget_tokens=512).toPandas()
    for _, grp in pdf.groupby("shard"):
        g = grp.sort_values("doc_id")
        # offsets are the exclusive running sum: consecutive and gap-free
        expected = g.n_tokens.cumsum().shift(fill_value=0)
        assert (g.start_offset.values == expected.values).all()
    assert (pdf.pack_id == pdf.start_offset // 512).all()
    assert (pdf.offset_in_pack == pdf.start_offset % 512).all()
    again = (
        SMP.pack_documents(docs.repartition(13), budget_tokens=512)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert again.equals(pdf.sort_values("doc_id", ignore_index=True))


def test_split_and_sample_are_independent(spark, sf_dir):
    """Purpose salts: the val fraction INSIDE a stratified sample must
    match the global val rate — without distinct salts, sample-then-split
    selects by the same bucket and the sample's low buckets would land
    ~100% in 'val'."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = SMP.stratified_sample(docs, {"en": 2000}, 2000).select("doc_id")
    split = SMP.train_val_split(docs, val_bp=1000)
    frac = (
        split.join(sampled, "doc_id")
        .toPandas()
        .split.eq("val")
        .mean()
    )
    assert 0.03 < frac < 0.25  # ~10%, NOT ~50-100%


def test_split_works_on_streams(spark, sf_dir, tmp_path):
    """The hash-split predicate is stateless and layout-free, so it runs
    unchanged on a stream and assigns exactly the batch labels."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    src = str(tmp_path / "docs_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        SMP.train_val_split(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("split_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.table("split_stream")
            .toPandas()
            .set_index("doc_id")["split"]
            .sort_index()
        )
    finally:
        q.stop()
    want = (
        SMP.train_val_split(docs)
        .toPandas()
        .set_index("doc_id")["split"]
        .sort_index()
    )
    assert got.equals(want)


def test_quality_weighted_rates(spark, sf_dir):
    """Keep rate scales with quality: zero-quality docs never kept, and
    the kept fraction of each quality tier is ~quality*max_rate."""
    from mapreduce_code_spark.functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    kept = SMP.quality_weighted_sample(docs, max_rate_bp=8000).toPandas()
    assert (kept.quality > 0).all()
    tiers = (
        quality_score(docs).toPandas().groupby("quality").size()
    )
    kept_tiers = kept.groupby("quality").size()
    for q, n_total in tiers.items():
        if q == 0 or n_total < 30:
            continue
        frac = kept_tiers.get(q, 0) / n_total
        assert abs(frac - q * 0.8) < 0.25, (q, frac)


def test_temperature_mix_parity_adversarial_frac(spark, sf_dir):
    """frac=0.07: DuckDB's exact-DECIMAL 10000.0*0.07 is 700.0 while the
    IEEE double product is 700.0000000000001 — floor() turns that ulp
    into an off-by-one threshold unless the oracle casts its literals to
    DOUBLE first. Pins the CAST(.. AS DOUBLE) oracle against Spark at a
    frac where the drift actually bites."""
    assert_parity(
        SMP.temperature_mix_sample(
            load_table(spark, sf_dir, "documents"), frac=0.07
        ),
        sf_dir,
        SMP.temperature_mix_sample_sql(frac=0.07),
        rtol=0,
    )


def test_temperature_mix_flattens_and_is_stable(spark):
    """sqrt-temperature mixture: the rare source keeps everything
    (threshold caps at 10000), the dominant source downsamples at
    exactly floor(10000·frac·sqrt(N)/sqrt(n_s)), and growing the
    dominant source never resamples the rare one (membership is a pure
    function of doc_id and the source's own threshold)."""
    import math

    def corpus(n_big):
        rows = [(i, "big") for i in range(n_big)]
        rows += [(10_000 + i, "small") for i in range(16)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    out = SMP.temperature_mix_sample(corpus(400), frac=0.25)
    rows = out.collect()
    thr = {r["source"]: r["threshold"] for r in rows}
    n_total = 416
    want_big = math.floor(10000.0 * 0.25 * math.sqrt(n_total) / math.sqrt(400))
    assert thr["big"] == want_big
    assert thr["small"] == 10_000  # rare source capped at keep-everything
    small_kept = {r["doc_id"] for r in rows if r["source"] == "small"}
    assert small_kept == {10_000 + i for i in range(16)}
    big_kept = {r["doc_id"] for r in rows if r["source"] == "big"}
    assert 0 < len(big_kept) < 400  # genuinely downsampled
    assert all(r["bucket"] < r["threshold"] for r in rows)

    # grow the dominant source: the rare source's membership is untouched,
    # and big's new threshold only moves by its own formula
    out2 = SMP.temperature_mix_sample(corpus(800), frac=0.25)
    rows2 = out2.collect()
    assert {r["doc_id"] for r in rows2 if r["source"] == "small"} == small_kept
    thr2 = {r["source"]: r["threshold"] for r in rows2}
    assert thr2["big"] == math.floor(
        10000.0 * 0.25 * math.sqrt(816) / math.sqrt(800)
    )
