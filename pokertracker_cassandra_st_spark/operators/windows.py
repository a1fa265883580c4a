"""Window-function operators (SURVEY.md §2 M4).

Scale notes: a window = one shuffle on partitionBy keys + an in-
partition sort. Partition keys here (customer, user) are high-
cardinality, so partitions stay small and spread evenly at any scale;
none of these windows is unpartitioned (a global window would funnel
100 TB through one task — the sorts/topk module handles global order
with TakeOrdered instead). Running sums go through DECIMAL so frame
accumulation order can't produce engine-specific float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.dist_rank import range_row_number
from pokertracker_cassandra_st_spark.exprs import o_fmt_ts
from pokertracker_cassandra_st_spark.registry import register


@register(
    "q_win_rank",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4)     OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
    tags=("window",),
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per customer.

    The ORDER BY carries o_orderkey as a unique tie-break so every
    ranking function is deterministic.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "q_win_laglead",
    oracle=f"""
SELECT event_id, user_id, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       lag(value, 2, -1.0) OVER w AS prev2_value,
       {o_fmt_ts('ts')} AS ts_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window",),
)
def q_win_laglead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user ordered by event time (event_id tie-break)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    )


@register(
    "q_win_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS running_orders
FROM orders
""",
    tags=("window",),
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) spend per customer in order-date order."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.count("*").over(w).alias("running_orders"),
    )


@register(
    "q_win_moving",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
       / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         AS moving_avg
FROM events
""",
    tags=("window",),
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over the preceding 3 rows + current, per user.

    Expressed as decimal-sum / count so the frame arithmetic is order
    independent (a plain avg() over a frame accumulates doubles).
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg"),
    )


@register(
    "q_win_range_frame",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(coalesce(value, 0) AS DECIMAL(18,4)))
            OVER (PARTITION BY user_id
                  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS hour_sum,
       count(*) OVER (PARTITION BY user_id
                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         AS hour_events
FROM events
""",
    tags=("window",),
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per user, the trailing one-hour sum and
    count at each event — unlike ROWS frames, the window is defined by
    the ORDER-BY VALUE distance (epoch seconds), so co-timed events
    share a frame regardless of row order.

    Scale notes: same single shuffle as any partitioned window; the
    frame bound is evaluated per row against the sorted run, no extra
    pass. This is the batch twin of the streaming sliding window.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("hour_sum"),
        F.count("*").over(w).alias("hour_events"),
    )


@register(
    "q_win_pct",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
    tags=("window",),
)
def q_win_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist within each order priority."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q_win_ntile",
    oracle="""
SELECT c_custkey,
       -- NULLS FIRST spelled out: Spark's ascending default, while
       -- DuckDB defaults to NULLS LAST (diverges on null balances)
       CAST(ntile(10) OVER (ORDER BY c_acctbal NULLS FIRST, c_custkey)
            AS BIGINT) AS decile,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal NULLS FIRST, c_custkey)
            AS BIGINT) AS seg_quartile
FROM customer
""",
    tags=("win",),
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth bucketing: global account-balance deciles plus
    per-segment quartiles (ntile), tie-broken by the unique key so
    bucket assignment is deterministic.

    Scale notes: the global decile does NOT use a single-partition
    ntile window — the global rank comes from the two-phase
    distributed row_number (dist_rank.range_row_number: range
    repartition, 32-way local ranks, broadcast offsets), the total
    count from a broadcast 1-row frame, and the decile from ntile's
    exact integer rule (first n mod k buckets take ceil(n/k) rows) —
    bit-identical to the built-in at any scale. The per-segment
    quartile keeps the ordinary partitioned window, the shape that
    parallelizes natively."""
    c = table(spark, sf_dir, "customer")
    n_row = c.agg(F.count("*").alias("n"))
    ranked = range_row_number(c, ["c_acctbal", "c_custkey"], "rk").crossJoin(
        F.broadcast(n_row)
    )
    # exact ntile(k): bq = n div k, m = n mod k; the first m buckets
    # hold bq+1 rows. When bq = 0 every rank is <= m·(bq+1) = n, so
    # the ELSE branch (divide by bq) is unreachable. All integer ops.
    bq = F.expr("n DIV 10")
    m = F.expr("n % 10")
    decile = F.when(
        F.col("rk") <= m * (bq + 1),
        F.expr("(rk - 1) DIV (n DIV 10 + 1) + 1"),
    ).otherwise(
        m + F.expr("(rk - n % 10 * (n DIV 10 + 1) - 1) DIV (n DIV 10) + 1")
    )
    w_seg = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return ranked.select(
        "c_custkey",
        decile.cast("long").alias("decile"),
        F.ntile(4).over(w_seg).cast("long").alias("seg_quartile"),
    )


@register(
    "q_win_islands",
    oracle="""
WITH r AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rt
  FROM events
)
SELECT user_id, event_type,
       count(*) AS run_len,
       min(event_id) AS first_event,
       max(event_id) AS last_event
FROM r
GROUP BY user_id, event_type, rn - rt
HAVING count(*) >= 3
ORDER BY user_id, first_event
""",
    tags=("window",),
)
def q_win_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user (run length >= 3), via the classic two-row_number
    difference — the group id ``rn - rt`` is constant exactly within a
    run. The segmentation primitive behind "3 failed logins in a row" /
    "consecutive days active" analyses, with no iterative logic.

    Scale notes: two window functions over the SAME (user_id) shuffle —
    Catalyst computes both in one sort pass since the partition keys
    nest — then one partial-aggregable groupBy. No joins, no explode;
    per-key state is one sort buffer.
    """
    ev = table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(
            F.count("*").alias("run_len"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .filter(F.col("run_len") >= 3)
        .select(
            "user_id", "event_type", "run_len", "first_event", "last_event"
        )
        .orderBy("user_id", "first_event")
    )


@register(
    "q_win_pattern_match",
    oracle="""
WITH s AS (
  SELECT user_id, event_id, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
SELECT user_id,
       count(*) AS n_matches,
       min(event_id) AS first_match_id,
       max(event_id) AS last_match_id
FROM s
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
GROUP BY user_id
ORDER BY user_id
""",
    tags=("window",),
)
def q_win_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive event-pattern detection (the MATCH_RECOGNIZE shape
    Spark lacks as syntax): per user, find every STRICTLY CONSECUTIVE
    view -> click -> purchase triple in version order — the
    zero-gap complement of q_ts_funnel's any-gap ordered funnel. The
    pattern compiles to two lead() columns over ONE window pass plus a
    filter; a k-step pattern is k-1 leads of the same window, never a
    self-join per step.

    Scale: one shuffle on user_id (the window partition key); the
    pattern filter runs in codegen on the windowed rows, and the
    aggregation reuses the same partitioning — AQE coalesces the
    already-partitioned exchange away. Pattern depth adds columns, not
    passes; per-key window width is the per-user history, the same
    bound as q_replay_projection.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    s = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    return (
        s.filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("event_id").alias("first_match_id"),
            F.max("event_id").alias("last_match_id"),
        )
        .orderBy("user_id")
    )


@register(
    "q_win_pattern_var",
    oracle="""
WITH s AS (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY event_id) AS grp
  FROM events
), runs AS (
  SELECT user_id, event_type, grp,
         count(*) AS run_len,
         min(event_id) AS min_id,
         max(event_id) AS max_id
  FROM s GROUP BY user_id, event_type, grp
), seq AS (
  SELECT user_id, event_type, max_id,
         lead(event_type, 1) OVER w AS t1,
         lead(run_len, 1)    OVER w AS len1,
         lead(event_type, 2) OVER w AS t2,
         lead(min_id, 2)     OVER w AS start2
  FROM runs
  WINDOW w AS (PARTITION BY user_id ORDER BY min_id)
)
SELECT user_id,
       max_id AS view_id,
       len1 AS n_clicks,
       start2 AS purchase_id
FROM seq
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
ORDER BY user_id, view_id
""",
    tags=("window",),
)
def q_win_pattern_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIABLE-LENGTH event-pattern detection — MATCH_RECOGNIZE's
    ``A B+ C`` (view, then ONE OR MORE consecutive clicks, then
    purchase), which the fixed k-step lead() form of
    q_win_pattern_match cannot express (VERDICT r10 'Next round #6';
    the reference's own lifecycle is the variable-length
    create -> update* -> delete pattern, IT:109-190). Gaps-and-islands
    compresses each user's history into same-type RUNS (rn - rn_by_type
    island id), then a single lead() pass over the run sequence finds
    every view-run immediately followed by a click-run immediately
    followed by a purchase-run; the emitted match is the LAST view of
    the view-run, the full click-run length (the B+ count), and the
    FIRST purchase of the purchase-run — strictly consecutive by
    construction. Pattern depth in run-space adds lead() columns, not
    passes; arbitrary ``X+`` segments cost nothing extra because runs
    already collapse repetition.

    Scale: ONE shuffle on user_id — the island window, the run
    aggregation, and the run-sequence window all share the same
    partitioning, so Catalyst plans a single exchange followed by
    in-partition sorts; the run frame is strictly smaller than the
    event frame (compression >= 1), so the second window sorts less
    data than the first.
    """
    ev = table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    s = ev.select(
        "user_id",
        "event_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
    )
    runs = s.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").alias("run_len"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )
    w_run = Window.partitionBy("user_id").orderBy("min_id")
    seq = runs.select(
        "user_id",
        "event_type",
        "max_id",
        F.lead("event_type", 1).over(w_run).alias("t1"),
        F.lead("run_len", 1).over(w_run).alias("len1"),
        F.lead("event_type", 2).over(w_run).alias("t2"),
        F.lead("min_id", 2).over(w_run).alias("start2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .select(
            "user_id",
            F.col("max_id").alias("view_id"),
            F.col("len1").alias("n_clicks"),
            F.col("start2").alias("purchase_id"),
        )
        .orderBy("user_id", "view_id")
    )
