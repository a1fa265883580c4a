"""Filter / predicate operators (SURVEY.md §2; Tier A8 generalized).

Scale notes: all predicates here are Catalyst-native expressions, so
they fold into the scan (PushedFilters) and stay inside whole-stage
codegen; none require a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.exprs import fmt_ts, o_fmt_ts
from pokertracker_cassandra_st_spark.registry import register


@register(
    "q_filter_eq",
    oracle=f"""
SELECT event_id, user_id, event_type, value, {o_fmt_ts('ts')} AS ts_s
FROM events
WHERE event_id = 500
""",
    tags=("filter", "tier-a"),
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key (Tier A8: GET /players/{id})."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") == F.lit(500)).select(
        "event_id", "user_id", "event_type", "value", fmt_ts("ts").alias("ts_s")
    )


@register(
    "q_filter_range",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE (l_quantity BETWEEN 10 AND 20 OR l_discount > 0.08)
  AND NOT (l_returnflag = 'A')
""",
    tags=("filter",),
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + boolean combinators (BETWEEN, OR, NOT)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity").between(10, 20) | (F.col("l_discount") > 0.08))
        & ~(F.col("l_returnflag") == "A")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "q_filter_in_like_null",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type,
       (NULLIF(p_brand, 'Brand#13') IS NULL) AS brand13_nulled
FROM part
WHERE p_type IN ('PROMO', 'ECONOMY', 'STANDARD')
  AND p_name LIKE '%wid%'
  AND NULLIF(p_type, 'LARGE') IS NOT NULL
""",
    tags=("filter",),
)
def q_filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, LIKE pattern, and NULL three-valued logic.

    The testdata has no physical NULLs, so NULLIF synthesizes them —
    exercising IS NULL / IS NOT NULL against real null semantics.
    """
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").isin("PROMO", "ECONOMY", "STANDARD")
        & F.col("p_name").like("%wid%")
        & F.nullif(F.col("p_type"), F.lit("LARGE")).isNotNull()
    ).select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_type",
        F.nullif(F.col("p_brand"), F.lit("Brand#13")).isNull().alias("brand13_nulled"),
    )
