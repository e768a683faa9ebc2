"""Query registry: the driver contract's single source of truth.

Every implemented operator from SURVEY.md §2 registers here as a
``(name, spark_fn, oracle_sql)`` triple. ``__spark_entry__.py`` re-exports
``queries()`` / ``oracle_sql()`` from this module.

Oracle SQL runs in DuckDB over the same parquet (views: region nation
customer supplier part orders lineitem events documents embeddings).
Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_code_spark.operators import frequent
from mapreduce_code_spark.plans import prep
from mapreduce_code_spark.sources.io import load_table

SUPPORT = frequent.DEFAULT_SUPPORT

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.transactions(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


# DuckDB twin of plans.prep.transactions: distinct (basket, item) tokens.
_SQL_TOKENS = """
  SELECT DISTINCT l_orderkey AS basket_id, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
"""


@register(
    "apriori_frequent_items",
    oracle=f"""
WITH tok AS ({_SQL_TOKENS})
SELECT item, count(*) AS cnt
FROM tok
GROUP BY item
HAVING count(*) >= {SUPPORT}
""",
)
def q_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori job 1 (SURVEY §2: P1, A1, A2, P3)."""
    return frequent.frequent_items(_transactions(spark, sf_dir), SUPPORT)


@register(
    "apriori_frequent_itemsets",
    oracle=f"""
WITH tok AS ({_SQL_TOKENS}),
freq AS (SELECT item FROM tok GROUP BY item HAVING count(*) >= {SUPPORT}),
ftok AS (SELECT basket_id, item FROM tok WHERE item IN (SELECT item FROM freq)),
singles AS (SELECT item AS itemset, count(*) AS cnt FROM ftok GROUP BY item),
pairs AS (
  SELECT a.item || ' ' || b.item AS itemset, count(*) AS cnt
  FROM ftok a JOIN ftok b ON a.basket_id = b.basket_id AND a.item < b.item
  GROUP BY 1
),
triples AS (
  SELECT a.item || ' ' || b.item || ' ' || c.item AS itemset, count(*) AS cnt
  FROM ftok a
  JOIN ftok b ON a.basket_id = b.basket_id AND a.item < b.item
  JOIN ftok c ON b.basket_id = c.basket_id AND b.item < c.item
  GROUP BY 1
)
SELECT itemset, cnt
FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs
      UNION ALL SELECT * FROM triples)
WHERE cnt >= {SUPPORT}
""",
)
def q_frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori jobs 1+2, `_final` mode (SURVEY §2: T1, T2, P2, P3, J1, J2)."""
    return frequent.frequent_itemsets(
        _transactions(spark, sf_dir), frequent.AprioriConfig(support=SUPPORT)
    )
