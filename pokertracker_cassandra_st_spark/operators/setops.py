"""Set operations (SURVEY.md §2 M4): UNION [ALL] / INTERSECT / EXCEPT.

Scale notes: UNION ALL is a zero-shuffle concatenation of scans;
UNION/INTERSECT/EXCEPT add one hash-distinct shuffle on the full row.
INTERSECT/EXCEPT lower to semi/anti joins in Catalyst, so only keys
move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register

_CUT = "TIMESTAMP '1999-01-01'"


def _halves(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01").cast("timestamp")
    old = o.filter(F.col("o_orderdate") < cut)
    recent = o.filter(F.col("o_orderdate") >= cut)
    return old, recent


@register(
    "q_set_union",
    oracle=f"""
SELECT c_custkey AS custkey, 'old' AS bucket
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE o_orderdate < {_CUT}
UNION
SELECT c_custkey AS custkey, 'recent' AS bucket
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE o_orderdate >= {_CUT}
""",
    tags=("setop",),
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL then distinct (= UNION) of two tagged segments."""
    c = table(spark, sf_dir, "customer")
    old, recent = _halves(spark, sf_dir)
    a = (
        c.join(old, old.o_custkey == c.c_custkey)
        .select(F.col("c_custkey").alias("custkey"), F.lit("old").alias("bucket"))
    )
    b = (
        c.join(recent, recent.o_custkey == c.c_custkey)
        .select(F.col("c_custkey").alias("custkey"), F.lit("recent").alias("bucket"))
    )
    return a.unionByName(b).distinct()


@register(
    "q_set_intersect",
    oracle=f"""
SELECT o_custkey FROM orders WHERE o_orderdate < {_CUT}
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= {_CUT}
""",
    tags=("setop",),
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both date halves (INTERSECT distinct)."""
    old, recent = _halves(spark, sf_dir)
    return old.select("o_custkey").intersect(recent.select("o_custkey"))


@register(
    "q_set_except",
    oracle=f"""
SELECT o_custkey FROM orders WHERE o_orderdate < {_CUT}
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= {_CUT}
""",
    tags=("setop",),
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with old orders but none recent (EXCEPT distinct —
    the anti-join shape of Tier A7)."""
    old, recent = _halves(spark, sf_dir)
    return old.select("o_custkey").distinct().subtract(recent.select("o_custkey"))
