"""Scans, projection pushdown, and sink round-trip (SURVEY.md §2).

Generalizes Tier A4/A9 (partitioned scan, findAll) to parquet scans
with Catalyst column pruning and predicate pushdown.

Scale notes: both queries compile to a single ``FileSourceScanExec``
whose ReadSchema contains only the projected columns and whose
PushedFilters carry the predicates into the parquet reader (verified in
tests/test_plans.py). At 100 TB this is the difference between reading
3 columns' pages vs the whole table; with a date-partitioned layout the
shipdate filter additionally prunes entire partitions.
"""

from __future__ import annotations

import os


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register

SCRATCH = "/root/repo/.scratch"


@register(
    "q_scan_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
FROM lineitem
""",
    tags=("scan",),
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan + column projection (Tier A9/A10 generalized)."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"
    )


@register(
    "q_scan_pushdown",
    oracle="""
SELECT l_orderkey, l_quantity, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_quantity > 45
""",
    tags=("scan",),
)
def q_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered scan exercising parquet predicate pushdown."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_quantity", "l_shipdate")


@register(
    "q_sink_roundtrip",
    oracle="""
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("sink",),
)
def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a projection to parquet, read it back (Tier A1 sink).

    Oracle = the same aggregate computed directly on the source: the
    parquet round-trip must be lossless, so the post-roundtrip numbers
    equal the never-written ones. Written under the repo scratch dir
    (the only writable location per the task rules).

    Scale notes: the write is partitioned by the natural query key
    (l_returnflag) — at scale this gives partition pruning to every
    downstream reader; writer tasks stream to the sink without any
    driver collection.
    """
    os.makedirs(SCRATCH, exist_ok=True)
    out = f"{SCRATCH}/sink_roundtrip"  # overwrite mode reclaims it
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
    )


@register(
    "q_sink_partition_overwrite",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderpriority <> '1-URGENT'
GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority,
       count(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
GROUP BY o_orderpriority
""",
    tags=("sink",),
)
def q_sink_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (the partition-level reload/upsert a
    batch warehouse runs nightly): write orders partitioned by
    o_orderpriority, then re-load ONLY the '1-URGENT' partition from a
    corrected extract (here: totalprice > 150000) with
    ``partitionOverwriteMode=dynamic`` — untouched partitions must
    survive byte-for-byte. Read-back aggregate proves exactly that:
    four original partitions + the one replaced partition.

    Scale notes: dynamic mode rewrites only partitions present in the
    incoming DataFrame — a reload of one day/priority touches one
    directory, not the table; the oracle's UNION mirrors the resulting
    partition-level lineage. Writer-side the partitionBy column prunes
    to one directory per task output; no shuffle beyond the write's
    own distribution.
    """
    os.makedirs(SCRATCH, exist_ok=True)
    out = f"{SCRATCH}/sink_partition_overwrite"
    cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    o = table(spark, sf_dir, "orders").select(*cols)
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    corrected = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    (
        corrected.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )
