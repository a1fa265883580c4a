"""Aggregation operators (SURVEY.md §2 M2).

Scale notes: every groupBy here compiles to partial (map-side) + final
hash aggregation — the shuffle carries only group keys and partial
states, never raw rows. Group-by keys are low-cardinality category
columns, so AQE coalesces the post-shuffle partitions; for high-
cardinality keys the same plan scales by hash-spreading keys across
executors. Decimal-cast sums (see exprs.py) keep results order
independent, which is also what makes them safe under AQE re-planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.exprs import (
    davg,
    dsum,
    md5_16bit,
    md5_32bit,
    o_davg,
    o_dsum,
    o_md5_16bit,
    o_md5_32bit,
    slong,
)
from pokertracker_cassandra_st_spark.registry import register


@register(
    "q_agg_global",
    oracle=f"""
SELECT count(*) AS n_rows,
       {o_dsum('l_quantity')} AS sum_qty,
       {o_davg('l_quantity')} AS avg_qty,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
""",
    tags=("agg",),
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregate: sum/avg/min/max/count/distinct."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_quantity").alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


# Scaled-long fragments (exact integer arithmetic, see exprs.slong).
# discount/tax are 2-decimal rates, so scale 2 suffices: the charge
# product is price(1e2)*(100-disc)(1e2)*(100+tax)(1e2) <= 1.1e11/row —
# the SUM stays a pure int64 through sf~10 (documented bound; beyond
# that switch to the decimal tier). Every oracle SUM is forced through
# BIGINT before the double cast: int64->double is the same correctly-
# rounded native conversion in both engines, whereas DuckDB's
# HUGEINT->double takes a different rounding path above 2^53 (caught
# by the sf0.1 sweep).
_O_PRICE = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_O_DISC = "CAST(round(l_discount * 100) AS BIGINT)"
_O_TAX = "CAST(round(l_tax * 100) AS BIGINT)"
_O_QTY = "CAST(round(l_quantity * 100) AS BIGINT)"
_O_DISC_PRICE = f"({_O_PRICE} * (100 - {_O_DISC}))"


def _o_lsum(expr: str) -> str:
    return f"CAST(CAST(SUM({expr}) AS BIGINT) AS DOUBLE)"


@register(
    "q_agg_groupby",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_o_lsum(_O_QTY)} / 100 AS sum_qty,
       {_o_lsum(_O_PRICE)} / 100 AS sum_base_price,
       {_o_lsum(_O_DISC_PRICE)} / 10000 AS sum_disc_price,
       {_o_lsum(f"{_O_DISC_PRICE} * (100 + {_O_TAX})")} / 1000000 AS sum_charge,
       {_o_lsum(_O_QTY)} / 100 / count(l_quantity) AS avg_qty,
       {_o_lsum(_O_PRICE)} / 100 / count(l_extendedprice) AS avg_price,
       {_o_lsum(_O_DISC)} / 100 / count(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "bench"),
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: 2 keys, 8 aggregates.

    All sums run in exact scaled-integer arithmetic (exprs.slong):
    order independent and engine agnostic like the decimal path, but
    long-backed so the whole aggregation stays in codegen (~2x faster).
    See the fragment comment above for the int64 headroom bound and
    the HUGEINT->double rounding trap the oracle avoids.
    """
    li = table(spark, sf_dir, "lineitem")
    qty = slong("l_quantity", 2)
    price = slong("l_extendedprice", 2)
    disc = slong("l_discount", 2)
    tax = slong("l_tax", 2)
    disc_price = price * (100 - disc)  # scale 1e4
    charge = disc_price * (100 + tax)  # scale 1e6, pure long
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("double") / 100).alias("sum_qty"),
            (F.sum(price).cast("double") / 100).alias("sum_base_price"),
            (F.sum(disc_price).cast("double") / 10_000).alias("sum_disc_price"),
            (F.sum(charge).cast("double") / 1_000_000).alias("sum_charge"),
            (F.sum(qty).cast("double") / 100 / F.count("l_quantity")).alias("avg_qty"),
            (F.sum(price).cast("double") / 100 / F.count("l_extendedprice")).alias(
                "avg_price"
            ),
            (F.sum(disc).cast("double") / 100 / F.count("l_discount")).alias(
                "avg_disc"
            ),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_agg_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_partkey)  AS n_parts,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg",),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct aggregation (expand + two-phase)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS approx_within_tol
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg",),
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct, verified against the exact
    count inside the query: returns the exact value plus a boolean
    asserting the sketch landed within 5% relative error (HLL++ at
    rsd=0.01 is deterministic for fixed data, so the boolean is
    stable) — which makes the sketch oracle-checkable even though its
    raw estimate is engine-specific.

    At 100 TB the approx path is the default (fixed-size sketch state,
    mergeable map-side; exact distinct must shuffle every distinct
    value).

    Physical shape (optimization r13, guide §2.3/§5): mixing
    countDistinct with approx_count_distinct in ONE agg makes the
    one-distinct rewrite key the partial aggregate on
    (l_returnflag, l_orderkey) and carry the rsd=0.01 HLL buffer
    (~16 KB of registers) PER KEY PAIR — gigabytes of agg state at
    sf0.1 (measured 115 s first run / 29 s steady). Deduplicating the
    pairs first and sketching the deduped keys is value-identical
    (HLL register updates are max() — duplicate- and order-insensitive
    — and count(*) over the deduped pairs IS count(DISTINCT)), but the
    sketch buffer now exists only per GROUP: 0.5 s steady, same hash."""
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_returnflag", "l_orderkey").distinct()
    return (
        pairs.groupBy("l_returnflag")
        .agg(
            # count the KEY, not *: count(DISTINCT) ignores NULL keys,
            # so a null l_orderkey must not count as an order (ADVICE
            # r13 — a no-op on TPC-H's non-null keys, divergence guard
            # on any other input)
            F.count("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_orderkey", 0.01).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("_approx") - F.col("exact_orders"))
                / F.col("exact_orders")
                <= 0.05
            ).alias("approx_within_tol"),
        )
    )


@register(
    "q_agg_rollup",
    oracle=f"""
SELECT r.r_name, n.n_name,
       count(*) AS n_customers,
       {o_dsum('c.c_acctbal')} AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    tags=("agg",),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (region, nation) with super-aggregate rows."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"), dsum("c_acctbal").alias("sum_acctbal")
    )


@register(
    "q_agg_cube",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       {o_dsum('o_totalprice')} AS total
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
    tags=("agg",),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube over (priority, status): all 4 grouping-set combinations."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total")
    )


@register(
    "q_agg_grouping_sets",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {o_dsum('o_totalprice')} AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    tags=("agg",),
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL API (same Catalyst Expand
    operator the DataFrame cube/rollup lower to)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q_agg_having",
    oracle=f"""
SELECT l_suppkey, count(*) AS n_lines, {o_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY l_suppkey
HAVING count(*) > 550 AND {o_dsum('l_quantity')} > 10000
""",
    tags=("agg",),
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_lines"), dsum("l_quantity").alias("sum_qty"))
        .filter((F.col("n_lines") > 550) & (F.col("sum_qty") > 10000))
    )


@register(
    "q_agg_stats",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(quantile_cont(l_quantity, 0.5), 4) AS median_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg",),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/exact percentile.

    Float-order-sensitive by nature -> rounded to 4 decimals on both
    engines (noise is ~1e-10 relative; see exprs.py).
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
    )


@register(
    "q_agg_percentile_approx",
    oracle="""
SELECT l_linestatus,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
       TRUE AS approx_within_tol
FROM lineitem
GROUP BY l_linestatus
""",
    tags=("agg",),
)
def q_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK sketch) verified against the exact
    percentile inside the query: returns the exact value plus a boolean
    asserting the sketch landed within 5% relative error (the sketch is
    deterministic for fixed data + accuracy, so the boolean is stable)
    — making the sketch oracle-checkable even though its raw estimate
    is engine-specific.

    At 100 TB the sketch is the only viable path — fixed memory,
    mergeable across executors; exact percentile needs a full sort."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_approx"),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50_exact"),
        )
        .select(
            "l_linestatus",
            "p50_exact",
            (
                F.abs(F.col("_approx") - F.col("p50_exact"))
                / F.abs(F.col("p50_exact"))
                <= 0.05
            ).alias("approx_within_tol"),
        )
    )


@register(
    "q_agg_grouping_fn",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       count(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("agg",),
)
def q_agg_grouping_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers on a rollup: distinguishes 'aggregated-out'
    nulls from real null group keys — required for correct
    cube/rollup consumption when keys can be null."""
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_filtered",
    oracle=f"""
SELECT l_linestatus,
       count(*) FILTER (WHERE l_quantity > 25) AS n_big,
       count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       {o_dsum('l_quantity')} AS sum_all,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                  FILTER (WHERE l_discount > 0.05), 4) AS DOUBLE) AS sum_discounted,
       count(l_quantity) AS n_qty_nonnull
FROM lineitem
GROUP BY l_linestatus
""",
    tags=("agg",),
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (the SQL FILTER clause): conditional counts
    and sums in one pass — no self-joins, no CASE pyramids; map-side
    partials apply per filter."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        dsum("l_quantity").alias("sum_all"),
        F.round(
            F.sum(
                F.when(F.col("l_discount") > 0.05, F.col("l_quantity")).cast(
                    "decimal(18,4)"
                )
            ),
            4,
        )
        .cast("double")
        .alias("sum_discounted"),
        F.count("l_quantity").alias("n_qty_nonnull"),
    )


@register(
    "q_agg_mode",
    oracle="""
SELECT o_orderstatus, o_orderpriority AS top_priority, n
FROM (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY count(*) DESC, o_orderpriority) AS rk
  FROM orders
  GROUP BY o_orderstatus, o_orderpriority
) WHERE rk = 1
""",
    tags=("agg",),
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group with a deterministic
    tie-break — count-then-rank, the exact form of the heavy-hitters
    query (at 100 TB the first stage is the same groupBy; only the
    per-group rank layer is new)."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("top_priority"), "n")
    )


@register(
    "q_agg_collect",
    oracle="""
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
       count(*) AS n
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg",),
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set per group, sorted and joined to a canonical string
    so the comparison is order-insensitive across engines."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_bitwise",
    oracle="""
SELECT l_orderkey,
       bit_or(CAST(l_linenumber AS BIGINT))  AS lines_or,
       bit_and(CAST(l_linenumber AS BIGINT)) AS lines_and,
       bit_xor(CAST(l_linenumber AS BIGINT)) AS lines_xor,
       count(*) AS n
FROM lineitem
WHERE l_orderkey < 1000
GROUP BY l_orderkey
""",
    tags=("agg",),
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_or/bit_and/bit_xor) — the flag-set /
    bitmap-index building blocks; all three run as partial-aggregatable
    hash aggregates, so the shuffle carries one long per key."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    ln = F.col("l_linenumber").cast("long")
    return li.groupBy("l_orderkey").agg(
        F.bit_or(ln).alias("lines_or"),
        F.bit_and(ln).alias("lines_and"),
        F.bit_xor(ln).alias("lines_xor"),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_histogram",
    oracle="""
SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
       CAST(floor(l_extendedprice / 5000) AS BIGINT) * 5000.0 AS bucket_lo,
       count(*) AS n,
       min(l_extendedprice) AS lo,
       max(l_extendedprice) AS hi
FROM lineitem
GROUP BY 1
""",
    tags=("agg",),
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (5000-wide price buckets): the profiling /
    data-quality primitive. One partial-aggregated shuffle keyed by the
    bucket expression; empty buckets are naturally absent (dense
    spines come from q_ts_gapfill's sequence+join pattern when needed).
    """
    li = table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000).cast("long")
    return li.groupBy(bucket.alias("bucket")).agg(
        (bucket * 5000.0).alias("bucket_lo"),
        F.count("*").alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )


@register(
    "q_agg_heavy_hitters",
    oracle="""
WITH counts AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
), tot AS (
  SELECT CAST(SUM(n_orders) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS c
  FROM counts
)
SELECT o_custkey, n_orders, round(n_orders / n, 6) AS share
FROM counts, tot
WHERE n_orders > 1.5 * (n / c)
""",
    tags=("agg",),
)
def q_agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: customers whose order count exceeds 1.5x
    the per-customer average, with their share of all orders. The exact
    two-pass formulation of the frequent-items problem (the sketched
    one-pass alternative is Misra-Gries / SpaceSaving; the exact form
    is preferred whenever a second pass over the aggregate — not the
    data — is affordable, which at 100 TB it is: pass 2 reads the
    per-key COUNTS, a table keys-sized, not corpus-sized).

    Scale notes: one partial-aggregated shuffle builds the counts; the
    global (total, n_keys) scalar is a broadcast cross join of a 1-row
    frame, so the threshold compare never leaves the executors. The
    relative (not absolute) threshold keeps the query meaningful at
    every scale factor. Both engines compare against the identical
    IEEE double threshold, so the result set is exact.
    """
    counts = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    tot = counts.agg(
        F.sum("n_orders").cast("double").alias("n"),
        F.count("*").cast("double").alias("c"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("n_orders") > 1.5 * (F.col("n") / F.col("c")))
        .select(
            "o_custkey",
            "n_orders",
            F.round(F.col("n_orders") / F.col("n"), 6).alias("share"),
        )
    )


@register(
    "q_agg_sketch_union",
    oracle="""
SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,
       CAST(count(DISTINCT date_trunc('month', l_shipdate)) AS BIGINT) AS n_sketches,
       true AS within_tolerance
FROM lineitem
""",
    tags=("agg", "sketch"),
)
def q_agg_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Apache DataSketches HLL): build one HLL
    sketch of distinct order keys PER SHIP-MONTH, then merge the monthly
    sketches with hll_union_agg and estimate the global distinct count.
    This is the pre-aggregation pattern that makes distinct-count
    dashboards viable at 100 TB: per-partition sketches are computed
    once at ingest (bytes per month, not rows), and any time-range
    rollup is a cheap union of sketches — no re-scan of the fact table.

    Correctness contract (same as q_agg_approx_distinct): the estimate
    itself is sketch-implementation-specific, so the checked output is
    the EXACT distinct count plus a within-5%-tolerance boolean on the
    merged-sketch estimate (HLL at default lgK=12 has ~1.6% relative
    standard error, so the flag is deterministically true); the oracle
    computes the exact value and literal true.
    """
    li = table(spark, sf_dir, "lineitem")
    per_month = li.groupBy(F.date_trunc("month", "l_shipdate").alias("m")).agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = per_month.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count("*").alias("n_sketches"),
    )
    exact = li.agg(F.countDistinct("l_orderkey").alias("exact_distinct"))
    return exact.crossJoin(F.broadcast(merged)).select(
        "exact_distinct",
        "n_sketches",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.05
        ).alias("within_tolerance"),
    )


@register(
    "q_agg_percentile_exact",
    oracle="""
SELECT event_type,
       count(value) AS n,
       CAST(quantile_cont(CAST(round(value * 1000000) AS BIGINT) * 4, 0.25)
            AS BIGINT) AS p25_q4,
       CAST(quantile_cont(CAST(round(value * 1000000) AS BIGINT) * 4, 0.50)
            AS BIGINT) AS p50_q4,
       CAST(quantile_cont(CAST(round(value * 1000000) AS BIGINT) * 4, 0.75)
            AS BIGINT) AS p75_q4
FROM events
GROUP BY event_type
""",
    tags=("agg",),
)
def q_agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (percentile_cont semantics: position p*(n-1),
    linear interpolation) — the sibling of q_agg_percentile_approx's GK
    sketch. Bit-determinism across engines: values quantize to 1e-6
    longs times 4, so every interpolated value at p in {.25,.5,.75} is
    an exact integer (fractions are quarters and inputs are multiples
    of 4) — no float rounding can diverge. Output is the quantized
    numerator; consumers divide by 4e6.

    Scale notes: exact percentiles need the value multiset per group —
    Spark's ``percentile`` aggregates a per-partition buffer then
    merges (memory ~ group cardinality x distinct values, with
    map-side partial aggregation). Exact is right when groups are
    few and value domains bounded (here: 5 event types); at unbounded
    cardinality switch to q_agg_percentile_approx (GK, fixed memory) —
    the within-tolerance contract there quantifies the trade.
    """
    ev = table(spark, sf_dir, "events")
    qv4 = (slong("value", 6) * 4).alias("qv4")
    base = ev.select("event_type", F.col("value"), qv4)
    return base.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.percentile("qv4", 0.25).cast("long").alias("p25_q4"),
        F.percentile("qv4", 0.50).cast("long").alias("p50_q4"),
        F.percentile("qv4", 0.75).cast("long").alias("p75_q4"),
    )


# ---- Count-Min sketch --------------------------------------------- #
# Layout: depth x width counters; the hash family is engine-portable
# (md5 of "j:key", first 4 hex chars folded to a 16-bit int, mod width)
# so the DuckDB oracle rebuilds the identical sketch bit-for-bit.
_CMS_D = 4
_CMS_W = 64
_CMS_TOP = 20


def _cms_bucket(j: int, key: F.Column) -> F.Column:
    return F.pmod(md5_16bit(F.concat_ws(":", F.lit(str(j)), key)), F.lit(_CMS_W))


_CMS_ORACLE = f"""
WITH t AS (
  SELECT tok
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
), truec AS (
  SELECT tok, count(*) AS true_count FROM t GROUP BY tok
), top AS (
  SELECT tok, true_count FROM truec
  ORDER BY true_count DESC, tok LIMIT {_CMS_TOP}
), js AS (SELECT j FROM (VALUES (0), (1), (2), (3)) v(j)),
sketch AS (
  SELECT j, {o_md5_16bit("CAST(j AS VARCHAR) || ':' || tok")} % {_CMS_W} AS bucket,
         count(*) AS cnt
  FROM t CROSS JOIN js
  GROUP BY 1, 2
), est AS (
  SELECT top.tok, min(s.cnt) AS cms_estimate
  FROM top CROSS JOIN js
  JOIN sketch s
    ON s.j = js.j
   AND s.bucket =
       {o_md5_16bit("CAST(js.j AS VARCHAR) || ':' || top.tok")} % {_CMS_W}
  GROUP BY top.tok
)
SELECT top.tok, top.true_count, est.cms_estimate,
       est.cms_estimate - top.true_count AS overestimate
FROM top JOIN est USING (tok)
"""


@register("q_agg_countmin", oracle=_CMS_ORACLE, tags=("agg", "sketch", "llm"))
def q_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over corpus token frequencies: build a
    4 x 64 counter array (independent md5-derived hash rows), then
    estimate the count of the top-20 true-frequency tokens as the
    MIN of their 4 bucket counters — reporting estimate, truth, and
    the (provably non-negative) overestimate. The one-sided error
    contract est >= true holds by construction, so the differential
    also proves the sketch invariant, not just value equality.

    Scale notes: THE streaming/mergeable counter structure for
    unbounded key domains (token frequencies at 100 TB). The sketch
    build is a partial-aggregated groupBy on (row, bucket): each map
    task collapses its tokens into <= d*w = 256 partial counters
    before the shuffle, so bytes shuffled are O(256 x tasks),
    independent of corpus size — strictly better than exact per-token
    counts (shuffle ~ distinct tokens) once the vocabulary outgrows
    the sketch. Sketches from different partitions/days merge by
    cell-wise addition (the groupBy IS the merge), the property that
    makes CMS the pre-aggregation default for hot-key detection,
    rate limiting, and frequency-capped sampling at cluster scale.
    The estimate probe joins 20 keys against a <= 256-row broadcast
    sketch. Hash family is engine-portable md5 (not xxhash64) so the
    oracle reproduces the exact counters.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    sketch = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _cms_bucket(j, F.col("tok")).alias("bucket"),
                        )
                        for j in range(_CMS_D)
                    ]
                )
            ).alias("cell")
        )
        .groupBy(F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("tok"))
        .limit(_CMS_TOP)
    )
    probes = top.select(
        "tok",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(j, F.col("tok")).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("tok", "true_count", "cell.j", "cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("tok", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            "tok",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count")).alias("overestimate"),
        )
    )


# ---- Bloom filter -------------------------------------------------- #
# Completes the mergeable-sketch trio (HLL rollup: q_agg_sketch_union;
# Count-Min: q_agg_countmin; membership: here). Bit array size is
# chosen IN-PLAN from the insert-set size (m = smallest power of two
# with m >= 16*n -> fill <= 1-exp(-k/16) ~ 0.22 at k=4, fp ~ 2e-3)
# so the structure survives corpus growth — the same adaptive-ladder
# doctrine as SIMHASH_LAYOUTS / PLANES_LADDER.
_BLOOM_K = 4
_BLOOM_LADDER = [4096, 8192, 16384, 32768, 65536, 131072]


def _bloom_m_sql(count_expr: str) -> str:
    cases = " ".join(
        f"WHEN 16 * ({count_expr}) <= {m} THEN {m}" for m in _BLOOM_LADDER[:-1]
    )
    return f"CASE {cases} ELSE {_BLOOM_LADDER[-1]} END"


def _bloom_oracle() -> str:
    bit = o_md5_32bit("CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)")
    return f"""
WITH ins AS (
  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
), params AS (
  SELECT {_bloom_m_sql("count(*)")} AS m FROM ins
), js AS (SELECT j FROM (VALUES (0), (1), (2), (3)) v(j)),
bits AS (
  SELECT DISTINCT {bit} % m AS bit
  FROM ins CROSS JOIN js CROSS JOIN params
), probes AS (
  -- membership is undefined for NULL keys (Spark's concat_ws SKIPS
  -- nulls while SQL || nulls out: the hash families would diverge);
  -- a Bloom probe set is null-free by contract
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL
), probe_bits AS (
  SELECT k, {bit} % m AS bit
  FROM probes CROSS JOIN js CROSS JOIN params
), hits AS (
  SELECT k, count(*) = {_BLOOM_K} AS bloom_hit
  FROM probe_bits JOIN bits USING (bit) GROUP BY k
), flags AS (
  SELECT p.k,
         coalesce(h.bloom_hit, FALSE) AS bloom_hit,
         p.k IN (SELECT k FROM ins) AS is_member
  FROM probes p LEFT JOIN hits h ON p.k = h.k
)
SELECT CAST((SELECT count(*) FROM ins) AS BIGINT) AS n_inserted,
       CAST((SELECT max(m) FROM params) AS BIGINT) AS m_bits,
       CAST((SELECT count(*) FROM bits) AS BIGINT) AS n_bits_set,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS true_members,
       CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS bloom_positives,
       CAST(sum(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS false_positives,
       CAST(sum(CASE WHEN is_member AND NOT bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
         AS false_negatives
FROM flags
"""


@register("q_agg_bloom", oracle=_bloom_oracle(), tags=("agg", "sketch"))
def q_agg_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch: insert one market segment's
    custkeys (k=4 engine-portable md5 hashes into an adaptively sized
    power-of-two bit array), probe every orders custkey, and report the
    filter's confusion counts in one row — with false_negatives
    provably 0 (the Bloom contract) checked by the differential.

    Scale notes: the build is explode(k bits) + distinct — partial
    aggregation collapses each map task to <= m flags before the
    shuffle, so shuffle bytes are O(m x tasks), independent of insert
    count; the probe side joins against the <= m-row bit table
    broadcast. This is exactly the semi-join-reduction structure
    Spark's own runtime bloom joins inject (test_plans.py asserts the
    native BloomFilterAggregate elsewhere); building it as a first-
    class query makes the sketch REUSABLE — persisted bit tables merge
    across shards by union (bitwise OR == distinct of bit positions),
    the property that lets a 1000-executor cluster build per-partition
    filters and OR them in one reduce. m scales with n in-plan (1-row
    params frame, no driver round-trip), holding fp ~ 2e-3 at any SF.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    ins = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    params = ins.agg(F.count("*").alias("n_ins")).select(
        "n_ins", F.expr(_bloom_m_sql("n_ins")).alias("m")
    )
    js = F.array(*[F.lit(j) for j in range(_BLOOM_K)])

    def bloom_bits(df: DataFrame) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(params))
            .select(
                "k",
                "m",
                F.explode(js).alias("j"),
            )
            .select(
                "k",
                F.pmod(
                    md5_32bit(
                        F.concat_ws(
                            ":", F.col("j").cast("string"), F.col("k").cast("string")
                        )
                    ),
                    F.col("m"),
                ).alias("bit"),
            )
        )

    bits = bloom_bits(ins).select("bit").distinct()
    # null keys excluded by contract (see oracle comment)
    probes = (
        o.filter(F.col("o_custkey").isNotNull())
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    hits = (
        bloom_bits(probes)
        .join(F.broadcast(bits), "bit")
        .groupBy("k")
        .agg((F.count("*") == _BLOOM_K).alias("bloom_hit"))
    )
    flags = (
        probes.join(hits, "k", "left")
        .withColumn("bloom_hit", F.coalesce("bloom_hit", F.lit(False)))
        # ground-truth side NOT hinted: the insert set is unbounded at
        # scale (the bit table, capped at m rows, is the broadcast side;
        # the truth join is the audit tier and AQE picks its strategy)
        .join(ins.withColumn("is_member", F.lit(True)), "k", "left")
        .withColumn("is_member", F.coalesce("is_member", F.lit(False)))
    )
    n_ins = ins.agg(F.count("*").cast("long").alias("n_inserted"))
    m_bits = params.select(F.col("m").cast("long").alias("m_bits"))
    n_bits = bits.agg(F.count("*").cast("long").alias("n_bits_set"))
    return (
        flags.agg(
            F.count("*").cast("long").alias("n_probes"),
            F.sum(F.col("is_member").cast("long")).alias("true_members"),
            F.sum(F.col("bloom_hit").cast("long")).alias("bloom_positives"),
            F.sum(
                (F.col("bloom_hit") & ~F.col("is_member")).cast("long")
            ).alias("false_positives"),
            F.sum(
                (F.col("is_member") & ~F.col("bloom_hit")).cast("long")
            ).alias("false_negatives"),
        )
        .crossJoin(F.broadcast(n_ins))
        .crossJoin(F.broadcast(m_bits))
        .crossJoin(F.broadcast(n_bits))
        .select(
            "n_inserted",
            "m_bits",
            "n_bits_set",
            "n_probes",
            "true_members",
            "bloom_positives",
            "false_positives",
            "false_negatives",
        )
    )


@register(
    "q_agg_hll_intersection",
    oracle="""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
     b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
SELECT (SELECT count(*) FROM a) AS exact_a,
       (SELECT count(*) FROM b) AS exact_b,
       (SELECT count(*) FROM a JOIN b USING (user_id)) AS exact_intersection,
       true AS within_tolerance
""",
    tags=("agg", "sketch"),
)
def q_agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user OVERLAP between two event types estimated from
    mergeable HLL sketches by inclusion-exclusion:
    est(A∩B) = est(A) + est(B) - est(A∪B), with the union sketch from
    hll_union_agg — the composition dashboards use to answer "how many
    users did BOTH X and Y" from pre-built per-segment sketches without
    re-scanning the fact table.

    Correctness contract (same as q_agg_sketch_union): the estimate is
    sketch-implementation-specific, so the checked output is the exact
    |A|, |B|, |A∩B| plus a deterministic within-tolerance boolean on
    the inclusion-exclusion estimate. Tolerance is 10% + an absolute
    floor of 8 because subtraction compounds the ~1.6% per-sketch RSE.

    Scale: sketches aggregate map-side (bytes per group, not rows);
    the exact sides shuffle only distinct user_ids. At 100 TB the
    per-type sketches are ingest-time partials and this query touches
    only sketch bytes.
    """
    ev = table(spark, sf_dir, "events")
    per_type = (
        ev.where(F.col("event_type").isin("view", "click"))
        .groupBy("event_type")
        .agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.countDistinct("user_id").alias("exact"),
        )
    )
    est = per_type.agg(
        F.sum(F.hll_sketch_estimate("sk")).alias("sum_est"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("union_est"),
        F.max(F.when(F.col("event_type") == "view", F.col("exact"))).alias(
            "exact_a"
        ),
        F.max(F.when(F.col("event_type") == "click", F.col("exact"))).alias(
            "exact_b"
        ),
    )
    a = ev.where(F.col("event_type") == "view").select("user_id").distinct()
    b = ev.where(F.col("event_type") == "click").select("user_id").distinct()
    inter = a.join(b, "user_id").agg(
        F.count("*").alias("exact_intersection")
    )
    return est.crossJoin(F.broadcast(inter)).select(
        "exact_a",
        "exact_b",
        "exact_intersection",
        (
            F.abs(
                (F.col("sum_est") - F.col("union_est"))
                - F.col("exact_intersection")
            )
            <= F.greatest(
                0.10 * F.col("exact_intersection"), F.lit(8.0)
            )
        ).alias("within_tolerance"),
    )


_BITMAP_ORACLE = """
WITH b AS (
  SELECT event_type,
         CASE WHEN user_id <= 0 THEN 0
              ELSE (user_id - 1) // 32768 + 1 END AS bkt,
         user_id
  FROM events
)
SELECT event_type,
       count(DISTINCT user_id) AS n_distinct_users,
       count(DISTINCT bkt) AS n_buckets
FROM b
GROUP BY event_type
ORDER BY event_type
"""


@register("q_agg_bitmap", oracle=_BITMAP_ORACLE, tags=("agg", "sketch"))
def q_agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via Spark 4's bitmap aggregates — the
    mergeable middle ground between COUNT(DISTINCT) (whose Expand
    doubles the shuffle) and HLL sketches (approximate): each user_id
    maps to (bucket, bit position), per-(group, bucket) bitmaps build
    with bitmap_construct_agg (32 KiB dense bitsets), and the group's
    exact distinct count is the SUM of per-bucket popcounts.

    The oracle recomputes both the distinct count AND the bucket count
    (mirroring Spark's bucket rule: 0 for id<=0, ceil(id/32768)
    otherwise) with plain DISTINCT aggregation — agreement proves the
    bitmap path loses nothing.

    Scale notes: this is how exact-distinct rollups survive 100 TB —
    per-bucket bitmaps are MERGEABLE (bitmap_or_agg), so partial
    aggregation combines map-side, the shuffle carries (group, bucket,
    32KiB-max bitmap) rows instead of every distinct value, and
    incremental/rollup re-aggregation ORs stored bitmaps without
    touching raw data (the exact twin of q_agg_sketch_union's HLL
    contract). Key-space density decides the bitmap-vs-HLL tradeoff;
    dense int keys (ids) favor bitmaps.
    """
    ev = table(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct_users"),
            F.count("*").alias("n_buckets"),
        )
        .orderBy("event_type")
    )


# ---- q_agg_weighted_percentile ---------------------------------------- #
# Exact WEIGHTED percentiles (inverted-CDF / "lower" rule: the smallest
# value whose cumulative weight reaches p of the total) — the quantile
# a data pipeline needs when rows carry mass (tokens, bytes, quantity)
# rather than counting equally. q_agg_percentile_exact is the unweighted
# sibling; this one cannot ride percentile()/quantile_cont at all, so
# the cumulative-weight formulation IS the operator.

_WPCT_ORACLE = """
WITH v AS (
  SELECT l_returnflag AS grp,
         CAST(round((l_extendedprice) * 100) AS BIGINT) AS qv,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
), pv AS (
  SELECT grp, qv, CAST(SUM(w) AS BIGINT) AS wv FROM v GROUP BY grp, qv
), c AS (
  SELECT grp, qv, wv,
         SUM(wv) OVER (PARTITION BY grp ORDER BY qv ASC NULLS LAST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
  FROM pv
), t AS (
  SELECT grp, CAST(SUM(wv) AS BIGINT) AS total_w, COUNT(*) AS n_values
  FROM pv GROUP BY grp
)
SELECT c.grp, t.n_values, t.total_w,
       MIN(CASE WHEN 4 * cumw >= 1 * t.total_w THEN qv END) AS wp25_q2,
       MIN(CASE WHEN 4 * cumw >= 2 * t.total_w THEN qv END) AS wp50_q2,
       MIN(CASE WHEN 4 * cumw >= 3 * t.total_w THEN qv END) AS wp75_q2
FROM c JOIN t ON c.grp = t.grp
GROUP BY c.grp, t.n_values, t.total_w
"""


@register(
    "q_agg_weighted_percentile", oracle=_WPCT_ORACLE, tags=("agg", "stats")
)
def q_agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted price percentiles per return flag:
    wp(p) = min{ v : sum of weights at values <= v >= p * total } —
    integer-exact end to end (prices as x100 scaled longs, quantities
    as longs, thresholds by 4*cumw >= k*total cross-multiplication, no
    division anywhere).

    Scale notes: the raw fact table collapses FIRST to one row per
    (group, value) with map-side partial sums — the cumulative window
    then runs over a VALUE-DOMAIN-bounded frame (2-decimal prices cap
    at ~10.5M distinct per group regardless of row count), not over
    raw rows; that is what makes an exact weighted quantile viable at
    100 TB where a sort of the fact table would not be. Few-group
    window skew is bounded by the same domain cap.
    """
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("grp"),
        slong("l_extendedprice", 2).alias("qv"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    pv = v.groupBy("grp", "qv").agg(F.sum("w").alias("wv"))
    # NULLS LAST pinned explicitly: Spark ASC defaults to NULLS FIRST,
    # DuckDB to NULLS LAST — a NULL qv (NULL l_extendedprice) would
    # otherwise land its weight at opposite ends of the cumulative sum
    # and shift cumw for every real row (ADVICE r9).
    cum = pv.withColumn(
        "cumw",
        F.sum("wv").over(
            Window.partitionBy("grp")
            .orderBy(F.col("qv").asc_nulls_last())
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    tot = pv.groupBy("grp").agg(
        F.sum("wv").alias("total_w"), F.count("*").alias("n_values")
    )

    def wp(k: int, name: str) -> F.Column:
        return F.min(
            F.when(4 * F.col("cumw") >= k * F.col("total_w"), F.col("qv"))
        ).alias(name)

    return (
        cum.join(F.broadcast(tot), "grp")
        .groupBy("grp", "n_values", "total_w")
        .agg(wp(1, "wp25_q2"), wp(2, "wp50_q2"), wp(3, "wp75_q2"))
    )


# ---- q_agg_decay_sum --------------------------------------------------- #
# Exponentially time-decayed engagement score — the feature-store
# aggregate behind "recent activity" features: each event's value is
# weighted by 2^(-age_days / half_life) as of the corpus high-water
# mark, so yesterday counts ~10% more than a week ago and history
# fades smoothly instead of cliff-dropping at a window edge.
_DECAY_HALF_LIFE_DAYS = 7
_DECAY_Q = 9  # per-term quantization: |value*w| <= 500 -> 5e11 scaled;
#               ~6M rows at 100x sum to ~3e18, inside int64 (bound
#               documented here per the exprs.slong contract)


@register(
    "q_agg_decay_sum",
    oracle=f"""
WITH hw AS (
  SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS ref_s FROM events
), t AS (
  SELECT user_id,
         CAST(round(
           value * pow(0.5,
             ((hw.ref_s - CAST(floor(epoch(ts)) AS BIGINT)) // 86400)
               / {_DECAY_HALF_LIFE_DAYS}.0)
           * 1e{_DECAY_Q}
         ) AS BIGINT) AS term_q
  FROM events CROSS JOIN hw
  WHERE value IS NOT NULL
)
SELECT user_id,
       count(*) AS n_events,
       round(CAST(SUM(term_q) AS DOUBLE) / 1e{_DECAY_Q}, 6) AS decayed_score
FROM t
GROUP BY user_id
""",
    tags=("agg", "timeseries"),
)
def q_agg_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed value sum (half-life 7 days,
    anchored at the corpus high-water timestamp): the
    recency-weighted engagement feature a ranking/feature-store
    pipeline materializes per entity.

    Determinism: age is exact integer days (epoch floor-div — the
    DIV/// parity form for non-negative ages), the decay weight
    quantizes per-term to 1e-9 scaled longs before summation (order
    independence; the pow() libm last-ulp doctrine), and the per-term
    bound keeps the sum inside int64 at 100x (documented above).
    Scale notes: the high-water mark is a 1-row broadcast aggregate
    (the lazy literal-frame pattern — no driver-side max() roundtrip),
    then one partial-aggregated groupBy on user_id; mergeable, so
    incremental refresh just re-anchors and re-sums the affected
    partitions.

    The high-water mark anchors on the UNFILTERED corpus (all events,
    NULL values included) — matching the oracle's hw CTE and the
    "corpus high-water" contract above. Anchoring on the value-filtered
    frame would silently shift every decay weight whenever the globally
    latest event carries a NULL value (ADVICE r9, high).
    """
    ev_all = table(spark, sf_dir, "events")
    ev = ev_all.filter(F.col("value").isNotNull())
    hw = ev_all.agg(
        F.max(F.floor(F.unix_micros("ts") / 1_000_000))
        .cast("long")
        .alias("ref_s")
    )
    age_days = F.expr(
        "(ref_s - CAST(floor(unix_micros(ts) / 1000000) AS BIGINT)) DIV 86400"
    )
    term_q = slong(
        F.col("value")
        * F.pow(F.lit(0.5), age_days / float(_DECAY_HALF_LIFE_DAYS)),
        _DECAY_Q,
    )
    return (
        ev.crossJoin(F.broadcast(hw))
        .select("user_id", term_q.alias("term_q"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum("term_q").cast("double") / F.lit(float(10**_DECAY_Q)), 6
            ).alias("decayed_score"),
        )
    )


# ---- q_agg_winsorized_mean --------------------------------------------- #
# Winsorized (percentile-clamped) mean — the robust-statistics answer
# to "the mean is dominated by outliers": clamp every value into the
# group's exact [p25, p75] band, then average. The data-cleaning
# doctrine for 100 TB feature pipelines where a handful of corrupt
# rows would otherwise move a global feature.


@register(
    "q_agg_winsorized_mean",
    oracle="""
WITH v AS (
  SELECT l_returnflag AS grp,
         CAST(round(l_extendedprice * 1000000) AS BIGINT) * 4 AS qv4
  FROM lineitem
), b AS (
  SELECT grp,
         count(qv4) AS n,
         CAST(quantile_cont(qv4, 0.25) AS BIGINT) AS lo_q4,
         CAST(quantile_cont(qv4, 0.75) AS BIGINT) AS hi_q4
  FROM v GROUP BY grp
)
SELECT v.grp, b.n, b.lo_q4, b.hi_q4,
       CAST(SUM(least(greatest(v.qv4, b.lo_q4), b.hi_q4)) AS DOUBLE)
         / CAST(b.n * 4000000 AS DOUBLE) AS winsorized_mean
FROM v JOIN b ON v.grp IS NOT DISTINCT FROM b.grp
WHERE v.qv4 IS NOT NULL
GROUP BY v.grp, b.n, b.lo_q4, b.hi_q4
""",
    tags=("agg", "stats"),
)
def q_agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag winsorized mean of extended price: exact p25/p75
    group bounds (the q_agg_percentile_exact quarters doctrine — x1e6
    scaled longs times 4 make every interpolated quartile an exact
    integer), every value clamped into [p25, p75], then one exact
    integer sum divided once to double (identical operation order both
    engines — bit-deterministic).

    Scale notes: pass 1 is a partial-aggregated percentile per group
    (5 groups, bounded buffers); pass 2 re-scans with the bounds as a
    BROADCAST join (5 rows) — no fact-side shuffle at all for the
    clamp, and the final groupBy partial-aggregates map-side. The
    null-safe group join keeps NULL return flags (adversarial fixture)
    as a real group, matching the oracle's IS NOT DISTINCT FROM.
    """
    li = table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("grp"),
        (slong("l_extendedprice", 6) * 4).alias("qv4"),
    )
    b = v.groupBy("grp").agg(
        F.count("qv4").alias("n"),
        F.percentile("qv4", 0.25).cast("long").alias("lo_q4"),
        F.percentile("qv4", 0.75).cast("long").alias("hi_q4"),
    )
    clamped = F.least(F.greatest(F.col("qv4"), F.col("lo_q4")), F.col("hi_q4"))
    return (
        v.filter(F.col("qv4").isNotNull())
        .join(F.broadcast(b), v["grp"].eqNullSafe(b["grp"]))
        .drop(b["grp"])
        .groupBy("grp", "n", "lo_q4", "hi_q4")
        .agg(
            (
                F.sum(clamped).cast("double")
                / (F.col("n") * 4_000_000).cast("double")
            ).alias("winsorized_mean")
        )
    )


# ---- q_agg_cuped --------------------------------------------------------- #
# CUPED variance reduction (Deng et al., WSDM'13) — the experimentation
# -platform aggregate: regress the experiment-period metric on a
# pre-period covariate and report how much metric variance the
# adjustment removes (smaller variance = smaller detectable effect =
# shorter experiments). Split at the in-plan temporal midpoint (the
# q_dq_drift_psi device); covariate x = pre-period event count, metric
# y = post-period value sum quantized to 100-unit steps (DIV 10000 on
# cents) so every moment stays an exact int64: at 100x replication
# x <= ~3e5, y <= ~1.5e6 over ~2000 fixed users -> Sxx <= 1.8e14,
# Syy <= 4.5e15, Sxy <= 9e14 (documented bound per the slong
# contract). All composite statistics are computed from those exact
# longs with IDENTICAL double expressions on both engines; the
# reduction share uses floor (never a .5-tie class).


@register(
    "q_agg_cuped",
    oracle="""
WITH b AS (
  SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS mn,
         max(CAST(floor(epoch(ts)) AS BIGINT)) AS mx
  FROM events
), u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                            < b.mn + (b.mx - b.mn) // 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                            >= b.mn + (b.mx - b.mn) // 2
                        AND value IS NOT NULL
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) // 10000 AS y
  FROM events CROSS JOIN b
  GROUP BY user_id
), m AS (
  SELECT count(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM u
)
SELECT n AS n_users,
       (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
         / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
         AS theta,
       (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
         / (n - 1) AS var_y,
       ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
         / (n - 1))
       - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
            / (n - 1))
         * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
              / (n - 1))
         / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
              / (n - 1)) AS var_cuped,
       CAST(floor(
         (((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / (n - 1))
          * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
               / (n - 1))
          / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
               / (n - 1)))
         / ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
              / (n - 1))
         * 1000000) AS BIGINT) AS var_reduction_ppm
FROM m
""",
    tags=("agg", "stats"),
)
def q_agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED adjustment audit: theta = cov(x,y)/var(x) over per-user
    (pre-period activity, post-period value) pairs, the adjusted
    metric's variance, and the variance-reduction share in ppm —
    the one number an experimentation platform tracks per metric.

    Determinism: the user rollup and all five moments are exact
    int64 (bounds in the module comment); every downstream statistic
    is the same double expression evaluated on identical exact inputs
    in both engines, and the ppm share uses floor. Scale notes: one
    fact scan + per-user partial-agg groupBy (the covariate join is
    free — both periods roll up in the same pass via CASE), then a
    1-row moment aggregate. The midpoint bounds are a 1-row broadcast.
    """
    ev = table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.floor(F.unix_micros("ts") / 1_000_000)).cast("long").alias("mn"),
        F.max(F.floor(F.unix_micros("ts") / 1_000_000)).cast("long").alias("mx"),
    )
    sec = F.floor(F.unix_micros("ts") / 1_000_000).cast("long")
    mid = F.expr("mn + (mx - mn) DIV 2")
    pre = F.when(sec < mid, F.lit(1)).otherwise(F.lit(0))
    ycents = F.when(
        (sec >= mid) & F.col("value").isNotNull(), slong("value", 2)
    ).otherwise(F.lit(0))
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(pre).cast("long").alias("x"),
            F.expr(
                "CAST(sum(CASE WHEN CAST(floor(unix_micros(ts) / 1000000) AS BIGINT)"
                " >= mn + (mx - mn) DIV 2 AND value IS NOT NULL"
                " THEN CAST(signum(value) * floor(abs(value) * 100 + 0.5) AS BIGINT)"
                " ELSE 0 END) AS BIGINT) DIV 10000"
            ).alias("y"),
        )
    )
    m = u.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov = (F.col("sxy").cast("double") - sxd * syd / n) / (n - 1)
    varx = (F.col("sxx").cast("double") - sxd * sxd / n) / (n - 1)
    vary = (F.col("syy").cast("double") - syd * syd / n) / (n - 1)
    theta = (F.col("sxy").cast("double") - sxd * syd / n) / (
        F.col("sxx").cast("double") - sxd * sxd / n
    )
    return m.select(
        n.alias("n_users"),
        theta.alias("theta"),
        vary.alias("var_y"),
        (vary - cov * cov / varx).alias("var_cuped"),
        F.floor(cov * cov / varx / vary * 1_000_000)
        .cast("long")
        .alias("var_reduction_ppm"),
    )


# ---- q_agg_share_of_total -------------------------------------------------- #
# Share-of-total with an OTHER rollup — the BI "market share" report:
# top-3 suppliers per nation by revenue, everyone else collapsed into
# one OTHER row, each with its exact ppm share of the nation total.
# Revenue and totals are exact scaled longs; shares are integer floor
# divisions — no float ratio anywhere.


@register(
    "q_agg_share_of_total",
    oracle=f"""
WITH rev AS (
  SELECT n.n_name, s.s_suppkey,
         CAST(SUM({_O_DISC_PRICE}) AS BIGINT) AS rev_q4
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, s.s_suppkey
), ranked AS (
  SELECT n_name, s_suppkey, rev_q4,
         CAST(SUM(rev_q4) OVER (PARTITION BY n_name) AS BIGINT) AS total_q4,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY rev_q4 DESC, s_suppkey) AS rk
  FROM rev
)
SELECT n_name,
       CASE WHEN rk <= 3 THEN CAST(s_suppkey AS VARCHAR)
            ELSE 'OTHER' END AS who,
       CAST(SUM(rev_q4) AS BIGINT) AS rev_q4,
       -- HUGEINT intermediate: rev_q4 * 1e6 overflows int64 past ~10x
       -- (caught by the 10x gate); HUGEINT // is true floor division,
       -- matching Spark's DECIMAL(38,0) DIV
       CAST(CAST(SUM(rev_q4) AS HUGEINT) * 1000000 // max(total_q4)
            AS BIGINT) AS share_ppm
FROM ranked
GROUP BY n_name, CASE WHEN rk <= 3 THEN CAST(s_suppkey AS VARCHAR)
                      ELSE 'OTHER' END
""",
    tags=("agg",),
)
def q_agg_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share report: per nation, the top-3 suppliers by exact
    discounted revenue plus an OTHER rollup, each with its ppm share
    of the nation total (integer floor division on exact scaled-long
    sums). Rank ties break by supplier key.

    Scale notes: revenue partial-aggregates map-side on (nation,
    supplier — the ppm multiply runs in DECIMAL(38,0)/HUGEINT, int64
    overflows past ~10x); the nation total rides a window over the
    ALREADY-AGGREGATED frame (suppliers-per-nation rows, never facts);
    nation is a broadcast dim on the fact scan. Top-3 and OTHER come
    from ONE CASE-keyed rollup of the ranked frame — a single fact
    lineage (a union of rk<=3 / rk>3 branches would re-scan the fact
    table; plan-locked to one FileScan over lineitem). The report
    shape is nations x 4 rows at any corpus size.
    """
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    price = slong("l_extendedprice", 2)
    disc = slong("l_discount", 2)
    rev = (
        li.join(s.hint("shuffle_hash"), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(price * (100 - disc)).alias("rev_q4"))
    )
    wt = Window.partitionBy("n_name")
    wr = Window.partitionBy("n_name").orderBy(F.desc("rev_q4"), "s_suppkey")
    ranked = rev.select(
        "n_name",
        "s_suppkey",
        "rev_q4",
        F.sum("rev_q4").over(wt).cast("long").alias("total_q4"),
        F.row_number().over(wr).alias("rk"),
    )
    who = F.when(
        F.col("rk") <= 3, F.col("s_suppkey").cast("string")
    ).otherwise(F.lit("OTHER"))
    # DECIMAL(38,0) intermediate: rev_q4 * 1e6 overflows int64 past
    # ~10x replication (caught by the 10x gate; Spark would WRAP
    # silently where DuckDB errors); DECIMAL DIV is exact floor,
    # matching the oracle's HUGEINT //
    return (
        ranked.select("n_name", who.alias("who"), "rev_q4", "total_q4")
        .groupBy("n_name", "who")
        .agg(
            F.sum("rev_q4").cast("long").alias("rev_q4"),
            F.expr(
                "CAST((CAST(sum(rev_q4) AS DECIMAL(38,0)) * 1000000)"
                " DIV max(total_q4) AS BIGINT)"
            ).alias("share_ppm"),
        )
    )
