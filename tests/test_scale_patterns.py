"""Scale-pattern tests: salted skew mitigation (exact-equivalence),
bucketed shuffle-free joins (plan assertion), and the SQL veneer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_code_spark import api
from mapreduce_code_spark.operators import skew
from mapreduce_code_spark.sources import bucketing
from mapreduce_code_spark.sources.io import load_table


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def skewed(spark):
    """1000 rows of one hot key + a sprinkle of 50 cold keys."""
    hot = spark.range(1000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.union(cold).persist()


def test_salted_agg_counts_exact(skewed):
    direct = _rows(skewed.groupBy("k").count().withColumnRenamed("count", "cnt"), "k", "cnt")
    salted = _rows(skew.salted_agg_counts(skewed, "k", n_salts=8), "k", "cnt")
    assert salted == direct


def test_salted_agg_sum_exact(skewed):
    direct = _rows(
        skewed.groupBy("k").agg(F.sum("v").alias("total")), "k", "total"
    )
    salted = _rows(
        skew.salted_agg_sum(skewed, "k", F.col("v"), n_salts=8), "k", "total"
    )
    assert salted == direct


def test_salted_agg_really_spreads(skewed):
    """The hot key's partials occupy several salt groups (the point)."""
    spread = (
        skewed.withColumn("_salt", skew._row_salt(skewed, 8))
        .filter(F.col("k") == "hot")
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread >= 4


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_exact(spark, skewed, how):
    small = spark.createDataFrame(
        [("hot", "H"), ("c1", "C"), ("missing", "M")], "k string, tag string"
    )
    direct = _rows(skewed.join(small, "k", how), "k", "v", "tag")
    salted = _rows(skew.salted_join(skewed, small, "k", n_salts=8, how=how), "k", "v", "tag")
    assert salted == direct


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "okey"
    )
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "okey"
    )
    bucketing.save_bucketed(orders, "b_orders", "okey", n_buckets=8)
    bucketing.save_bucketed(li.select("okey", "l_quantity"), "b_lineitem", "okey", 8)
    # force sort-merge join so the bucketing (not a broadcast) is what
    # removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(spark, "b_orders", "b_lineitem", "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the right thing
        expect = orders.join(li.select("okey", "l_quantity"), "okey").count()
        assert joined.count() == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_sql_veneer_matches_dataframe(spark, sf_dir):
    api.open_catalog(spark, sf_dir)
    via_sql = api.sql(
        spark,
        """SELECT l_returnflag, count(*) AS n
           FROM lineitem GROUP BY l_returnflag""",
    )
    via_df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _rows(via_sql, "l_returnflag", "n") == _rows(via_df, "l_returnflag", "n")


def test_sql_veneer_derived_views(spark, sf_dir):
    api.open_catalog(spark, sf_dir)
    n_baskets = api.sql(spark, "SELECT count(*) AS n FROM transactions").first()["n"]
    assert n_baskets > 0
    row = api.sql(
        spark, "SELECT y, features FROM labeled_points LIMIT 1"
    ).first()
    assert row["features"][0] == 1.0  # injected bias


def test_compaction_reduces_files(spark, sf_dir, tmp_path):
    """Many small files → few target-size files, data intact."""
    src = str(tmp_path / "fragmented")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(40).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*.parquet")) == 40
    n = bucketing.compact(spark, src, target_bytes=1 << 40)  # everything → 1
    assert n == 1
    assert len(glob.glob(f"{src}/part-*.parquet")) == 1
    assert spark.read.parquet(src).count() == orders.count()
