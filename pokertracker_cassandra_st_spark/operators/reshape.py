"""Reshaping operators: pivot / unpivot / deterministic sampling.

Scale notes: pivot with an explicit value list is a single groupBy with
conditional aggregates — one shuffle, no second pass to discover pivot
values (never let Spark infer them from data at 100 TB). Unpivot
(stack) is a zero-shuffle narrow fan-out. The train/val split uses a
deterministic key function, not rand() — reproducible across runs,
engines, and retries (the same property Tier A12 needs: no
monotonically_increasing_id in anything hash-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.exprs import dsum, o_dsum
from pokertracker_cassandra_st_spark.registry import register

_STATUSES = ["O", "F", "P"]


@register(
    "q_agg_pivot",
    oracle=f"""
SELECT o_orderpriority,
       {o_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS total_O,
       {o_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS total_F,
       {o_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS total_P,
       count(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg",),
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order totals by status with an explicit value list
    (single-pass conditional aggregation)."""
    o = table(spark, sf_dir, "orders")
    aggs = [
        dsum(F.when(F.col("o_orderstatus") == s, F.col("o_totalprice"))).alias(
            f"total_{s}"
        )
        for s in _STATUSES
    ]
    return o.groupBy("o_orderpriority").agg(*aggs, F.count("*").alias("n"))


@register(
    "q_unpivot",
    oracle="""
SELECT c_custkey, metric, val
FROM (
  SELECT c_custkey,
         unnest(['acctbal', 'nationkey']) AS metric,
         unnest([c_acctbal, CAST(c_nationkey AS DOUBLE)]) AS val
  FROM customer
)
""",
    tags=("agg",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) customer metrics to long form via stack —
    a narrow, shuffle-free fan-out."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', cast(c_nationkey as double))"
        ).alias("metric", "val"),
    )


@register(
    "q_win_firstlast",
    oracle="""
SELECT o_orderkey, o_custkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice)  OVER w AS latest_price,
       nth_value(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("window",),
)
def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over a running frame."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("latest_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "q_sample_split",
    oracle="""
SELECT CASE WHEN ((doc_id % 10) + 10) % 10 < 8 THEN 'train'
            WHEN ((doc_id % 10) + 10) % 10 = 8 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id
FROM documents
GROUP BY 1
""",
    tags=("llm",),
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by key modulus —
    reproducible across engines/retries, unlike rand()-based sampling.
    (For unbiased splits on non-uniform keys, hash the key first; the
    modulus form is the oracle-checkable shape.)"""
    d = table(spark, sf_dir, "documents")
    bucket = F.pmod(F.col("doc_id"), F.lit(10))
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "q_sample_stratified",
    oracle="""
SELECT lang,
       count(*) AS n_total,
       count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
                        CASE lang WHEN 'en' THEN '40' WHEN 'zh' THEN '80'
                                  ELSE 'cc' END) AS n_sampled,
       min(doc_id) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
                        CASE lang WHEN 'en' THEN '40' WHEN 'zh' THEN '80'
                                  ELSE 'cc' END) AS min_sampled_id
FROM documents
GROUP BY lang
""",
    tags=("llm",),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus rebalancing: per-language sampling at different
    rates (downsample the dominant 'en' stratum to ~25%, 'zh' to ~50%,
    others kept at ~80%) with a DETERMINISTIC inclusion rule — the first
    md5 byte of the key against a per-stratum hex threshold. Unlike
    rand()-based sampleBy, the same doc is always in or out, across
    retries, engines, and cluster re-planning — the property a 100 TB
    training-data pipeline needs for reproducible mixtures.

    Scale notes: the inclusion test is a scan-parallel expression (md5
    is JVM-side); one partial-aggregated shuffle on the stratum key."""
    d = table(spark, sf_dir, "documents")
    thresh = (
        F.when(F.col("lang") == "en", "40")
        .when(F.col("lang") == "zh", "80")
        .otherwise("cc")
    )
    picked = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < thresh
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(picked, 1)).alias("n_sampled"),
        F.min(F.when(picked, F.col("doc_id"))).alias("min_sampled_id"),
    )


@register(
    "q_sample_weighted",
    oracle="""
WITH keyed AS (
  SELECT event_id, user_id, value,
         ((event_id * 2654435761) % 1000003 + 0.5) / 1000003.0 AS u
  FROM events
  WHERE value > 0
), pri AS (
  SELECT event_id, user_id, round(value, 2) AS value,
         -ln(u) / value AS priority
  FROM keyed
)
SELECT event_id, user_id, value
FROM pri
ORDER BY priority, event_id
LIMIT 100
""",
    tags=("sample",),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (exponential-jitter /
    A-ES): each row draws a deterministic pseudo-uniform u from a
    Knuth-hash of its id and gets priority -ln(u)/w; the k smallest
    priorities are a weighted sample without replacement — the
    standard distributed trick (one scan + top-k, no sequential pass,
    no rejection loop), here with value as the weight.

    Determinism: u is exact integer arithmetic (id·2654435761 mod
    1000003 stays far inside int64), identical in both engines; the
    ln/divide is the same IEEE expression, and adjacent priorities in
    a 10k-row pool are ~1e-8 apart — 7 orders of magnitude above
    cross-engine libm noise — with event_id as the final tiebreak.

    Scale notes: TakeOrderedAndProject keeps a k-row heap per
    partition; no shuffle of the full data, no driver-side RNG state —
    the sample is reproducible under any partitioning/AQE re-plan.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    u = (
        (F.col("event_id") * F.lit(2654435761)) % F.lit(1000003) + F.lit(0.5)
    ) / F.lit(1000003.0)
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
            (-F.log(u) / F.col("value")).alias("priority"),
        )
        .orderBy("priority", "event_id")
        .limit(100)
        .select("event_id", "user_id", "value")
    )


@register(
    "q_sample_reservoir",
    oracle="""
WITH keyed AS (
  SELECT event_type, event_id,
         md5('rsv_' || CAST(event_id AS VARCHAR)) AS sample_key
  FROM events
), ranked AS (
  SELECT event_type, event_id, sample_key,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY sample_key, event_id) AS rk
  FROM keyed
)
SELECT event_type, event_id, sample_key, rk
FROM ranked WHERE rk <= 5
""",
    tags=("sample",),
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group 'reservoir' sample: the k=5 events with
    the smallest seeded-hash key per event type — the data-inspection
    primitive every 100 TB pipeline runs ('show me 5 random rows per
    source').

    A true streaming reservoir is stateful and run-order-dependent;
    ranking a seeded md5 of the row key gives the SAME uniform
    marginal distribution while staying reproducible across runs,
    engines, and retries (the no-rand() doctrine every hash-checked
    sampler here follows). The plan is one exchange on the group key +
    WindowGroupLimit: each task keeps a 5-row heap map-side, so the
    shuffle carries ~k rows per group per task, never the table.
    """
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.md5(F.concat(F.lit("rsv_"), F.col("event_id").cast("string"))).alias(
            "sample_key"
        ),
    )
    w = Window.partitionBy("event_type").orderBy("sample_key", "event_id")
    return (
        ev.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
    )


@register(
    "q_sample_systematic",
    oracle="""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (ORDER BY doc_id) AS i
  FROM documents
)
SELECT doc_id, source, i
FROM r WHERE i % 20 = 7 ORDER BY i
""",
    tags=("sample",),
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every k-th) sampling: rank the corpus in stable
    doc_id order and keep ranks ≡ 7 (mod 20) — the evenly-spaced 5%
    audit sample QA teams pull when random sampling could miss
    periodic structure (and the one sampling design that GUARANTEES
    coverage of every corpus region). Completes the sampling tier:
    split (hash), stratified, weighted, reservoir, systematic.

    Scale notes: the global rank is the two-phase distributed
    row_number (dist_rank.range_row_number — range-partition on
    doc_id, local ranks, broadcast bucket offsets); the modulus filter
    is codegen'd. No global window, no collect.
    """
    from pokertracker_cassandra_st_spark.dist_rank import range_row_number

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    r = range_row_number(d, ["doc_id"], "i")
    return r.filter(F.col("i") % 20 == 7).select(
        "doc_id", "source", "i"
    ).orderBy("i")


# ---- q_sample_balanced ------------------------------------------------------ #


@register(
    "q_sample_balanced",
    oracle="""
WITH r AS (
  SELECT event_type, event_id,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
         ) AS rk
  FROM events
), sz AS (
  SELECT min(n) AS k FROM (
    SELECT count(*) AS n FROM events GROUP BY event_type
  )
)
SELECT r.event_type,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(min(r.event_id) AS BIGINT) AS min_kept_id,
       CAST(max(r.event_id) AS BIGINT) AS max_kept_id,
       CAST(SUM(r.event_id) AS BIGINT) AS sum_kept_id
FROM r CROSS JOIN sz
WHERE r.rk <= sz.k
GROUP BY r.event_type
ORDER BY r.event_type
""",
    tags=("sampling",),
)
def q_sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every event_type keeps EXACTLY the
    minority class's row count, rows chosen by seeded md5 order (the
    engine-portable shuffle — reproducible across engines and retries,
    never rand()).  The class-imbalance fix applied before training on
    categorical targets; reported as per-class keep summaries with an
    id-sum fingerprint so the oracle pins the exact kept SET, not just
    its size.

    Determinism: the keep rank orders by (md5(event_id), event_id) —
    md5 of the decimal string is byte-identical in both engines and the
    unique id breaks any hash tie.

    Scale notes: the ranked branch pays ONE fact exchange partitioned
    by event_type; the minority size k comes from a SEPARATE pruned
    (event_type)-only scan + map-side count — deliberately NOT derived
    from the ranked frame, because a second reference to it would
    re-execute the window subtree (the re-reference-rescan trap), and
    the count branch is strictly cheaper than the windowed one.  The
    per-type window is the family's documented skew point: a single
    giant class serializes its partition; the cluster-scale upgrade is
    the two-phase dist_rank bucketing with (type, md5-prefix) keys,
    same contract.
    """
    ev = table(spark, sf_dir, "events").select("event_type", "event_id")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    r = ev.select("event_type", "event_id", F.row_number().over(w).alias("rk"))
    # minority size from a pruned count-only scan (see scale notes)
    sz = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .agg(F.min("n").alias("k"))
    )
    return (
        r.crossJoin(F.broadcast(sz))
        .filter(F.col("rk") <= F.col("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("event_id").alias("min_kept_id"),
            F.max("event_id").alias("max_kept_id"),
            F.sum("event_id").alias("sum_kept_id"),
        )
        .orderBy("event_type")
    )
