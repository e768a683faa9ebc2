"""SQL veneer: the engine's user-facing entry surface (SURVEY §3.4).

A reference user gets two equivalent front doors:

- the DataFrame builders in ``operators/`` / ``plans/`` (Python API), and
- plain ANSI SQL over the registered catalog (``open_catalog`` +
  ``sql``) — every test table becomes a temp view, plus the derived
  ``transactions`` and ``labeled_points`` views the reference's own
  programs consume.

Both compile to the same Catalyst plans; SQL here is a veneer, not a
second engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_code_spark.plans import prep
from mapreduce_code_spark.sources.io import TABLES, load_table


def open_catalog(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view, plus the derived
    reference-native views (``transactions``, ``labeled_points``)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    prep.transactions(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    ).createOrReplaceTempView("transactions")
    prep.labeled_points(
        load_table(spark, sf_dir, "lineitem")
    ).createOrReplaceTempView("labeled_points")


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run ANSI SQL against the opened catalog."""
    return spark.sql(query)
