"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``mapreduce_code_spark.registry`` — the engine's query
registry is the single source of truth; every operator registers a
(spark_fn, oracle_sql) pair there.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mapreduce_code_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Apriori frequent itemsets on sf0.001."""
    return registry.queries()["apriori_frequent_itemsets"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
