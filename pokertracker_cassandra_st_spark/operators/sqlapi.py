"""SQL front-end surface: the same engine driven through ``spark.sql``.

The rest of the package declares plans with the DataFrame API; this
module proves the equivalent ANSI-SQL text front-end (temp views +
``spark.sql``) over the same tables — the surface a BI tool or a
migrating reference user would hit first. Plans compile through the
same Catalyst pipeline, so pushdown/broadcast/AQE behavior is identical
to the DataFrame twins (tests/test_plans.py asserts on some of them).

Cross-engine numeric rules are the same as everywhere else (see
exprs.py): double sums run on exact scaled longs / decimals in BOTH
dialects so results are order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register

# Spark-side exact scaled-long of a 2-decimal double (mirrors
# exprs.slong: floor stays in primitive codegen, round() would box a
# BigDecimal per row) and the DuckDB-side twin (native round is fine
# there; both yield the same integer for 2-decimal inputs).
_S_100 = "CAST(floor({c} * 100 + 0.5) AS BIGINT)"
_O_100 = "CAST(round({c} * 100) AS BIGINT)"


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


def _q1_text(s100: str) -> str:
    """TPC-H Q1 pricing summary, parameterized on the scaled-long
    fragment so the Spark and DuckDB texts stay in lockstep."""
    qty = s100.format(c="l_quantity")
    price = s100.format(c="l_extendedprice")
    return f"""
SELECT l_returnflag,
       l_linestatus,
       CAST(CAST(SUM({qty}) AS BIGINT) AS DOUBLE) / 100 AS sum_qty,
       CAST(CAST(SUM({price}) AS BIGINT) AS DOUBLE) / 100 AS sum_base_price,
       CAST(CAST(SUM({qty}) AS BIGINT) AS DOUBLE) / 100 / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_sql_pricing_summary", oracle=_q1_text(_O_100), tags=("sql",))
def q_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape through the SQL front-end: one wide scan ->
    grouped sums; filter and column pruning push to parquet exactly as
    in the DataFrame twin (q_agg_groupby)."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_q1_text(_S_100))


_TOPCUST_TMPL = """
SELECT c.c_custkey,
       c.c_name,
       n.n_name,
       CAST(CAST(SUM({price}) AS BIGINT) AS DOUBLE) / 100 AS total_spend,
       COUNT(*) AS n_orders
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'F'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY total_spend DESC, c.c_custkey
LIMIT 25
"""


@register(
    "q_sql_top_customers",
    oracle=_TOPCUST_TMPL.format(price=_O_100.format(c="o.o_totalprice")),
    tags=("sql",),
)
def q_sql_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + deterministic top-25 (unique tie-break key)
    through the SQL front-end; the nation dim broadcasts via AQE."""
    _views(spark, sf_dir, "customer", "nation", "orders")
    return spark.sql(_TOPCUST_TMPL.format(price=_S_100.format(c="o.o_totalprice")))


_WINDOW_TEXT = """
SELECT o_custkey,
       o_orderkey,
       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            AS BIGINT) AS order_seq,
       lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
FROM orders
WHERE o_custkey < 100
"""


@register("q_sql_window", oracle=_WINDOW_TEXT, tags=("sql",))
def q_sql_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions through the SQL front-end — identical text runs
    on both engines (ANSI window syntax, unique tie-break in ORDER BY)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_WINDOW_TEXT)


_EXISTS_TEXT = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
)
ORDER BY s.s_suppkey
"""


@register("q_sql_exists", oracle=_EXISTS_TEXT, tags=("sql",))
def q_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL front-end — Catalyst rewrites
    it to the same left-semi join as the DataFrame twin (q_join_semi)."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_EXISTS_TEXT)


_CTE_TMPL = """
WITH order_value AS (
  SELECT o_custkey, {price} AS cents
  FROM orders
), spend AS (
  SELECT o_custkey, CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100 AS total
  FROM order_value
  GROUP BY o_custkey
)
SELECT c.c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(CAST(SUM({total100}) AS BIGINT) AS DOUBLE) / 100 AS segment_spend
FROM spend s
JOIN customer c ON c.c_custkey = s.o_custkey
GROUP BY c.c_mktsegment
"""


@register(
    "q_sql_cte",
    oracle=_CTE_TMPL.format(
        price=_O_100.format(c="o_totalprice"), total100=_O_100.format(c="s.total")
    ),
    tags=("sql",),
)
def q_sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs through the SQL front-end: per-customer spend CTE
    joined back to the customer dim and re-aggregated by segment."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        _CTE_TMPL.format(
            price=_S_100.format(c="o_totalprice"), total100=_S_100.format(c="s.total")
        )
    )
