"""Subqueries, CTEs (incl. recursive), and lateral joins.

The reference's query service answers only key-lookup and scan queries;
an analytics engine needs the full subquery taxonomy. Catalyst
decorrelates these into joins — no per-row re-execution.

Scale notes: scalar/IN/EXISTS subqueries lower to broadcast or
shuffle joins (decorrelation); the uncorrelated scalar aggregate is
computed once and broadcast as a literal. Recursive CTEs iterate
driver-scheduled batch steps — fine for hierarchy depth (here ~months),
not for row-count-deep recursion. LATERAL with an aggregate subquery
decorrelates to a join + groupBy, same budget as q_topk_pergroup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register


def _sql(spark: SparkSession, sf_dir: str, names: list[str], sql: str) -> DataFrame:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
    return spark.sql(sql)


_SCALAR = """
SELECT o_orderkey, o_totalprice,
       round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4) AS vs_avg
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
"""


@register("q_subquery_scalar", oracle=_SCALAR, tags=("subquery",))
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: computed once, broadcast as a
    literal into the filter/projection. (avg is float-order sensitive;
    the comparison threshold at 1.8x keeps the cut far from any
    boundary value and the projected delta is rounded.)"""
    return _sql(spark, sf_dir, ["orders"], _SCALAR)


_IN = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
"""


@register("q_subquery_in", oracle=_IN, tags=("subquery",))
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries -> semi/anti joins after decorrelation."""
    return _sql(spark, sf_dir, ["customer", "orders"], _IN)


_CORR = """
SELECT o1.o_orderkey, o1.o_custkey, o1.o_totalprice
FROM orders o1
WHERE o1.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                         WHERE o2.o_custkey = o1.o_custkey)
  AND EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o1.o_custkey AND c.c_acctbal > 0)
"""


@register("q_subquery_correlated", oracle=_CORR, tags=("subquery",))
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-customer max) + correlated
    EXISTS — Catalyst decorrelates both into aggregate + joins."""
    return _sql(spark, sf_dir, ["customer", "orders"], _CORR)


_LATERAL = """
SELECT c.c_custkey, t.n_orders, t.best_price
FROM customer c,
LATERAL (
  SELECT count(*) AS n_orders, max(o_totalprice) AS best_price
  FROM orders o WHERE o.o_custkey = c.c_custkey
) t
WHERE t.n_orders > 15
"""


@register("q_lateral_join", oracle=_LATERAL, tags=("subquery",))
def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table (per-customer aggregate),
    decorrelated to join + groupBy."""
    return _sql(spark, sf_dir, ["customer", "orders"], _LATERAL)


_RECURSIVE = """
WITH RECURSIVE months(m) AS (
  SELECT CAST('1995-01-01' AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < CAST('1995-12-01' AS DATE)
)
SELECT CAST(m AS STRING) AS month_start,
       (SELECT count(*) FROM orders o
        WHERE o.o_orderdate >= m AND o.o_orderdate < m + INTERVAL 1 MONTH)
         AS n_orders
FROM months
"""


@register("q_recursive_cte", oracle=_RECURSIVE, tags=("subquery",))
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 / DuckDB): generate a month spine, then a
    correlated count per month — the calendar-scaffold pattern."""
    return _sql(spark, sf_dir, ["orders"], _RECURSIVE)
