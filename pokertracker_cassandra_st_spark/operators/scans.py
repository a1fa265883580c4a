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
import shutil


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import scratch_dir, table
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
    out = scratch_dir(sf_dir, "sink_roundtrip")  # overwrite mode reclaims it
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
    out = scratch_dir(sf_dir, "sink_partition_overwrite")
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


_MERGE_INS_OFFSET = 1_000_000_000  # synthetic insert keys, disjoint from base


@register(
    "q_sink_merge",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
), merged AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000
              ELSE o_totalprice END AS price,
         o_orderstatus AS status
  FROM base
  WHERE o_orderkey % 1000 <> 0
  UNION ALL
  SELECT o_orderkey + {_MERGE_INS_OFFSET}, o_totalprice, 'N'
  FROM base WHERE o_orderkey % 100 = 0
)
SELECT status,
       count(*) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       max(o_orderkey) AS max_key
FROM merged
GROUP BY status
""",
    tags=("sink",),
)
def q_sink_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (the lakehouse upsert/CDC-apply): materialize a base
    table, then apply one changeset holding all three verbs — DELETE
    (key % 1000 == 0), UPDATE (key % 10 == 0: price += 1000), INSERT
    (new keys at base+1e9, status 'N') — in a single full-outer join
    pass, rewrite the table, and aggregate the read-back. This is the
    batch-side sibling of q_stream_mv_merge (foreachBatch incremental
    MV) and q_replay_cdc_diff (which *produces* such changesets).

    Scale notes: one shuffle — base and changeset co-partition on the
    merge key for the full-outer join; the apply itself is a
    stateless projection (coalesce per column + op filter). On a
    date-partitioned table the join would be preceded by partition
    pruning to the changeset's touched partitions and the rewrite
    confined to them (q_sink_partition_overwrite shows exactly that
    mechanism); the full-table rewrite here is the worst case, not the
    design.
    """
    os.makedirs(SCRATCH, exist_ok=True)
    base_dir = scratch_dir(sf_dir, "merge_base")
    out_dir = scratch_dir(sf_dir, "merge_out")
    key = F.col("o_orderkey")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    o.write.mode("overwrite").parquet(base_dir)

    deletes = o.filter(key % 1000 == 0).select(
        key.alias("c_key"),
        F.lit(None).cast("double").alias("c_price"),
        F.lit(None).cast("string").alias("c_status"),
        F.lit("D").alias("op"),
    )
    updates = o.filter((key % 10 == 0) & (key % 1000 != 0)).select(
        key.alias("c_key"),
        (F.col("o_totalprice") + 1000).alias("c_price"),
        F.col("o_orderstatus").alias("c_status"),
        F.lit("U").alias("op"),
    )
    inserts = o.filter(key % 100 == 0).select(
        (key + _MERGE_INS_OFFSET).alias("c_key"),
        F.col("o_totalprice").alias("c_price"),
        F.lit("N").alias("c_status"),
        F.lit("I").alias("op"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)

    base = spark.read.parquet(base_dir)
    merged = (
        base.join(changes, base["o_orderkey"] == changes["c_key"], "full_outer")
        .filter((F.col("op").isNull()) | (F.col("op") != "D"))
        .select(
            F.coalesce("c_key", "o_orderkey").alias("o_orderkey"),
            F.coalesce("c_price", "o_totalprice").alias("price"),
            F.coalesce("c_status", "o_orderstatus").alias("status"),
        )
    )
    merged.write.mode("overwrite").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    return back.groupBy("status").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("price").cast("decimal(18,4)")).cast("double").alias("sum_price"),
        F.max("o_orderkey").alias("max_key"),
    )


@register(
    "q_scan_dpp",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders
WHERE substr(o_orderpriority, 1, 1) IN ('1', '2')
GROUP BY o_orderpriority
""",
    tags=("scan",),
)
def q_scan_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: a fact table partitioned on
    o_orderpriority joined to a dimension whose *non-key* predicate
    (priority class '1'/'2') only determines the surviving partitions
    at runtime — Catalyst injects a DynamicPruning subquery that reuses
    the dimension broadcast to skip entire fact partitions at the
    file-source level (asserted in tests/test_plans.py).

    Scale notes: this is THE mechanism that makes star-schema joins on
    a date/tenant-partitioned 100 TB fact viable — the scan reads only
    the partitions the filtered dimension selects, so I/O scales with
    the dimension predicate's selectivity, not the fact size. The
    dimension is distinct-priority-level tiny and broadcast; no
    shuffle on the fact side before aggregation's own exchange.
    """
    os.makedirs(SCRATCH, exist_ok=True)
    out = scratch_dir(sf_dir, "dpp_orders")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    fact = spark.read.parquet(out)
    dim = (
        table(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .withColumn("prio_class", F.substring("o_orderpriority", 1, 1))
    )
    picked = dim.filter(F.col("prio_class").isin("1", "2")).select(
        F.col("o_orderpriority").alias("d_priority")
    )
    return (
        fact.join(
            F.broadcast(picked),
            fact["o_orderpriority"] == picked["d_priority"],
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "q_sink_compaction",
    oracle="""
SELECT CAST(LEAST(16, (SELECT count(*) FROM events)) AS BIGINT) AS files_before,
       CAST(LEAST(2, (SELECT count(*) FROM events)) AS BIGINT) AS files_after,
       (SELECT count(*) FROM events) AS n_rows,
       (SELECT count(DISTINCT event_id) FROM events) AS n_ids
""",
    tags=("sink",),
)
def q_sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance job every append-heavy
    event log needs (the reference's command side appends row-at-a-time
    through Cassandra, ``initial_db.sql:5-12``; a lake landing zone
    accumulates the same fragmentation as thousands of tiny files):
    write events fragmented into 16 files, compact to 2 with a
    ``repartition`` rewrite, and prove both the file-count change and
    content preservation (row + distinct-key counts) on read-back.

    Scale notes: compaction is a full rewrite of ONE partition's worth
    of data at a time in production — the repartition shuffle is sized
    by target file size (here a fixed count for determinism;
    production uses maxRecordsPerFile / AQE coalescing). Readers see
    fewer, larger row groups => fewer scan tasks, better columnar
    compression, pushdown over healthy-size footers.
    """
    os.makedirs(SCRATCH, exist_ok=True)
    frag = scratch_dir(sf_dir, "sink_compaction_frag")
    compact = scratch_dir(sf_dir, "sink_compaction_out")
    ev = table(spark, sf_dir, "events")
    ev.repartition(16).write.mode("overwrite").parquet(frag)
    files_before = len(
        [f for f in os.listdir(frag) if f.startswith("part-") and f.endswith(".parquet")]
    )
    spark.read.parquet(frag).repartition(2).write.mode("overwrite").parquet(compact)
    files_after = len(
        [
            f
            for f in os.listdir(compact)
            if f.startswith("part-") and f.endswith(".parquet")
        ]
    )
    back = spark.read.parquet(compact)
    # the fragment copy is only an input to the (already finished)
    # compact write — delete it now so the query doesn't leave two full
    # copies of events in .scratch. The compact dir must outlive this
    # function: the returned frame reads it lazily (next run overwrites).
    shutil.rmtree(frag, ignore_errors=True)
    # file counts are literals derived from the ACTUAL directory
    # listing; the oracle mirrors them as LEAST(k, n_rows) — round-robin
    # repartition(k) emits no file for an empty partition, so a sparse
    # fixture (<16 rows, possible under adversarial testdata) yields
    # n_rows files, not k, on BOTH sides instead of silently diverging.
    return back.agg(
        F.lit(files_before).cast("long").alias("files_before"),
        F.lit(files_after).cast("long").alias("files_after"),
        F.count("*").alias("n_rows"),
        F.countDistinct("event_id").alias("n_ids"),
    )


# ---- q_scan_manifest_prune -------------------------------------------- #
# Stats-manifest data skipping — the Iceberg/Delta planning pattern,
# built from primitives: a date-clustered parquet layout plus a
# per-file (min, max, rows) manifest lets a range query open only the
# files whose stat interval intersects the predicate. Partition-value
# pruning (q_scan_dpp) needs the predicate to be ALGEBRAIC in the
# partition column; a manifest prunes on what the data actually
# landed as — the mechanism that survives data-driven file boundaries.

_MANIFEST_LO = "DATE '1996-01-01'"
_MANIFEST_HI = "DATE '1996-12-31'"


@register(
    "q_scan_manifest_prune",
    oracle=f"""
SELECT count(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
       max(o_orderkey) AS max_key
FROM orders
WHERE CAST(o_orderdate AS DATE) BETWEEN {_MANIFEST_LO} AND {_MANIFEST_HI}
""",
    tags=("scan",),
)
def q_scan_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range aggregate over a date-clustered layout, planned through a
    file-stats MANIFEST: cluster orders by o_orderdate into 8 files
    (repartitionByRange + sortWithinPartitions — the write shape
    q_sort_zorder/hilbert document), derive a per-file (min, max,
    rows) manifest, keep only files whose [min, max] intersects the
    query range, and aggregate over just those files. The oracle is
    the plain range aggregate over the source table, so the pruned
    read must lose nothing.

    Planning is coordinator-side BY DESIGN — the same shape every
    table format uses: the collected frame is the MANIFEST (bounded by
    file count, 8 rows here, never row data), exactly like an Iceberg
    planner reading manifest files before task scheduling. In
    production the manifest is written once at ingest (a tiny
    side-table next to the data) rather than derived per query; the
    derivation here is itself one column-pruned scan. Scale notes: at
    100 TB with ~1e5 files, the manifest is a few MB at the planner,
    and the read opens only intersecting files — on this fixture the
    companion pytest asserts >= half the files are skipped, on top of
    the row-group min/max skipping parquet already does inside each
    opened file.
    """
    os.makedirs(SCRATCH, exist_ok=True)
    out = scratch_dir(sf_dir, "manifest_prune")
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("o_date"),
        "o_totalprice",
    )
    (
        src.repartitionByRange(8, "o_date")
        .sortWithinPartitions("o_date")
        .write.mode("overwrite")
        .parquet(out)
    )
    manifest = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.min("o_date").alias("mn"), F.max("o_date").alias("mx"))
    )
    lo, hi = _MANIFEST_LO.split("'")[1], _MANIFEST_HI.split("'")[1]
    kept = [
        r["file"]
        for r in manifest.filter(
            ~((F.col("mx") < F.lit(lo)) | (F.col("mn") > F.lit(hi)))
        ).collect()  # planner-side manifest, file-count-bounded (8 rows)
    ]
    back = spark.read.parquet(*kept).filter(
        F.col("o_date").between(F.lit(lo), F.lit(hi))
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total"),
        F.max("o_orderkey").alias("max_key"),
    )


def _manifest_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest over the layout the query just planned (test hook:
    tests/test_plans.py counts total vs range-intersecting files to
    assert the skipping is real)."""
    out = scratch_dir(sf_dir, "manifest_prune")
    lo, hi = _MANIFEST_LO.split("'")[1], _MANIFEST_HI.split("'")[1]
    return (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.min("o_date").alias("mn"), F.max("o_date").alias("mx"))
        .withColumn(
            "kept", ~((F.col("mx") < F.lit(lo)) | (F.col("mn") > F.lit(hi)))
        )
    )


# ---- q_scan_run_profile ------------------------------------------------------ #
# Storage-clustering audit: how well does each l_returnflag value RUN
# in the table's natural key order (l_orderkey, l_linenumber)? Long
# runs = better RLE/dictionary compression and tighter row-group
# min/max bounds (the property q_sort_zorder / q_sort_hilbert
# optimize FOR) — this query MEASURES it, with run detection local to
# each order's partition so no global-order window exists.


@register(
    "q_scan_run_profile",
    oracle="""
WITH flagged AS (
  SELECT l_returnflag,
         CASE WHEN lag(l_returnflag) OVER w IS DISTINCT FROM l_returnflag
              THEN 1 ELSE 0 END AS run_start
  FROM lineitem
  WINDOW w AS (PARTITION BY l_orderkey
               ORDER BY l_linenumber NULLS FIRST, l_partkey NULLS FIRST,
                        l_suppkey NULLS FIRST, l_quantity NULLS FIRST,
                        l_extendedprice NULLS FIRST,
                        l_returnflag NULLS FIRST, l_linestatus NULLS FIRST)
)
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(SUM(run_start) AS BIGINT) AS n_runs,
       (1000 * count(*)) // CAST(SUM(run_start) AS BIGINT)
         AS avg_run_len_x1000
FROM flagged GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("scan", "layout"),
)
def q_scan_run_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length profile of l_returnflag in (l_orderkey, l_linenumber)
    order: a run starts where the value differs from its predecessor
    within the order (null-safe compare makes each order's first row a
    start). Fewer runs per row = better RLE compression and more
    effective row-group skipping for that column in this layout.

    Scale notes: run detection is WITHIN l_orderkey partitions (order
    boundaries are run boundaries by definition here), so the lag
    window partitions on the natural key — no global-order
    single-task window; the rollup is a 3-row map-side-combined
    aggregate. The layout counterpart of q_sort_zorder: one measures,
    the other fixes.
    """
    li = table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    # (orderkey, linenumber) is NOT unique in the fixture; the order
    # key is extended to a total order whose FINAL components include
    # l_returnflag itself, so any residual ties are value-identical
    # and cannot change the run profile. NULLS FIRST is pinned in the
    # oracle because Spark ASC defaults to NULLS FIRST while DuckDB
    # defaults to NULLS LAST — a NULL order-key component must not
    # reorder neighbors asymmetrically
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_linestatus",
    )
    flagged = li.select(
        "l_returnflag",
        (
            ~F.lag("l_returnflag")
            .over(w)
            .eqNullSafe(F.col("l_returnflag"))
        )
        .cast("long")
        .alias("run_start"),
    )
    return (
        flagged.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("run_start").alias("n_runs"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "n_runs",
            F.expr("(1000 * n_rows) div n_runs").alias("avg_run_len_x1000"),
        )
        .orderBy("l_returnflag")
    )
