"""Behavioral event analytics: ordered funnels and cohort retention.

The reference's event log (events table; cf. the CQRS event store the
reference replays — `PlayerCommandResource.java`, `initial_db.sql`)
supports the two canonical product-analytics questions every event
engine ships: "how many users progress through an ordered sequence of
steps?" (funnel) and "of the users who first appeared in week W, how
many were still active k weeks later?" (cohort retention).

Scale notes: both queries reduce the event stream to narrow per-user
aggregates FIRST (min-timestamp per step / distinct active weeks), so
every shuffle moves (user_id, timestamp) pairs, never event payloads;
all joins after the first reduction are on the same user_id key, so one
hash partitioning is reused across stages. Conversion ratios are
integer parts-per-million (no float rounding boundary between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register

_FUNNEL_ORACLE = """
WITH fv AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), fc AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'click' AND e.ts > fv.t_view
  GROUP BY e.user_id
), fp AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fc.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
       (SELECT count(*) FROM fv) AS n_view,
       (SELECT count(*) FROM fc) AS n_view_click,
       (SELECT count(*) FROM fp) AS n_full_funnel,
       (SELECT count(*) FROM fp) * 1000000
         // (SELECT count(*) FROM fv) AS conv_ppm
"""


@register("q_ts_funnel", oracle=_FUNNEL_ORACLE, tags=("timeseries", "behavior"))
def q_ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel view -> click -> purchase: each step
    counts users whose FIRST qualifying event strictly follows their
    entry into the previous step (first view, then first click after
    that view, then first purchase after that click).

    Each stage is a per-user min-timestamp aggregate joined to the
    previous stage — the standard "sequence match via staged min-ts"
    formulation that avoids any per-user event sorting or session
    reassembly.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    fc = (
        ev.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    nv = fv.agg(F.count("*").alias("n_view"))
    nc = fc.agg(F.count("*").alias("n_view_click"))
    np_ = fp.agg(F.count("*").alias("n_full_funnel"))
    return (
        n_users.crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_users",
            "n_view",
            "n_view_click",
            "n_full_funnel",
            F.expr("n_full_funnel * 1000000 DIV n_view").alias("conv_ppm"),
        )
    )


_RETENTION_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
), cohort AS (
  SELECT user_id, min(wk) AS wk0 FROM act GROUP BY user_id
)
SELECT CAST(c.wk0 AS STRING) AS cohort_week,
       (CAST(epoch(a.wk) AS BIGINT) - CAST(epoch(c.wk0) AS BIGINT))
         // 604800 AS week_offset,
       count(*) AS n_users
FROM act a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


@register(
    "q_ts_retention", oracle=_RETENTION_ORACLE, tags=("timeseries", "behavior")
)
def q_ts_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: users are cohorted by the week
    of their first activity; each (cohort_week, week_offset) cell
    counts users from that cohort active in that later week.

    Week offsets are exact integer epoch arithmetic over
    week-truncated timestamps (both engines truncate to the same
    Monday), so no date-diff dialect divergence.
    """
    ev = table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("wk0"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            F.col("wk0").cast("string").alias("cohort_week"),
            (
                (
                    F.unix_timestamp(F.col("wk").cast("timestamp"))
                    - F.unix_timestamp(F.col("wk0").cast("timestamp"))
                )
                / 604800
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


# ---- q_agg_rfm --------------------------------------------------------------- #
# RFM (recency / frequency / monetary) segmentation — the classic
# customer-lifecycle rollup. Quintile membership uses the explicit
# 5 - ((i-1)*5) div n formula over a deterministic total order
# (metric, custkey), NOT ntile(), whose remainder placement we refuse
# to depend on cross-engine.

_RFM_ORACLE = """
WITH clean AS (
  SELECT o_custkey, o_orderdate, o_totalprice FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_totalprice IS NOT NULL
), base AS (
  SELECT o_custkey,
         CAST(max(o_orderdate) AS DATE) AS last_d,
         count(*) AS freq,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM clean GROUP BY o_custkey
), anchor AS (
  SELECT CAST(max(o_orderdate) AS DATE) AS a, count(DISTINCT o_custkey) AS n
  FROM clean
), scored AS (
  SELECT date_diff('day', last_d, a) AS rec_days, freq, cents, n,
         row_number() OVER (ORDER BY date_diff('day', last_d, a), o_custkey)
           AS ir,
         row_number() OVER (ORDER BY freq DESC, o_custkey) AS if_,
         row_number() OVER (ORDER BY cents DESC, o_custkey) AS im
  FROM base, anchor
)
SELECT concat('R', 5 - ((ir - 1) * 5) // n,
              'F', 5 - ((if_ - 1) * 5) // n,
              'M', 5 - ((im - 1) * 5) // n) AS segment,
       count(*) AS n_customers,
       round(CAST(SUM(cents) AS DOUBLE) / 100 / count(*), 6)
         AS avg_monetary,
       CAST(SUM(freq) AS BIGINT) AS total_orders
FROM scored GROUP BY segment ORDER BY segment
"""


@register("q_agg_rfm", oracle=_RFM_ORACLE, tags=("agg", "behavior"))
def q_agg_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segments over the orders fact: per-customer recency (days
    since last order vs the corpus max date), frequency (order count)
    and monetary (exact cents), each ranked into quintiles with the
    engine-portable ``5 - ((i-1)*5) div n`` formula, then segment-level
    counts / average spend.

    Scale notes: one o_custkey groupBy reduces the fact table to one
    narrow row per customer; the three global ranks run as dist_rank's
    two-phase bucketed row_number (value-derived buckets + a 32-row
    offset broadcast — no single-task window at any rank); the anchor
    (max date, customer count) is a broadcast 1-row frame. Segment
    cardinality is bounded at 125.
    """
    from pokertracker_cassandra_st_spark.dist_rank import range_row_number
    from pokertracker_cassandra_st_spark.exprs import slong

    o = table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
        & F.col("o_orderdate").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    base = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        F.count("*").alias("freq"),
        F.sum(slong("o_totalprice", 2)).alias("cents"),
    )
    anchor = o.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("a"),
        F.countDistinct("o_custkey").alias("n"),
    )
    scored = base.crossJoin(F.broadcast(anchor)).withColumn(
        "rec_days", F.datediff("a", "last_d")
    )
    scored = range_row_number(scored, ["rec_days", "o_custkey"], "ir")
    scored = scored.withColumn("negf", -F.col("freq"))
    scored = range_row_number(scored, ["negf", "o_custkey"], "if_")
    scored = scored.withColumn("negm", -F.col("cents"))
    scored = range_row_number(scored, ["negm", "o_custkey"], "im")
    seg = F.concat(
        F.lit("R"), F.expr("5 - ((ir - 1) * 5) div n"),
        F.lit("F"), F.expr("5 - ((if_ - 1) * 5) div n"),
        F.lit("M"), F.expr("5 - ((im - 1) * 5) div n"),
    )
    return (
        scored.groupBy(seg.alias("segment"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum("cents").cast("double") / 100 / F.count("*"), 6
            ).alias("avg_monetary"),
            F.sum("freq").alias("total_orders"),
        )
        .orderBy("segment")
    )


# ---- q_ts_cohort_ltv --------------------------------------------------------- #
# Cohort lifetime-value curve — the revenue twin of q_ts_retention:
# users cohorted by first-activity week, purchase revenue accumulated
# per (cohort, week offset) and normalized per cohort member. Week
# offsets reuse retention's exact epoch arithmetic; money rides exact
# integer cents until the final per-user division.

_LTV_ORACLE = """
WITH act AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk, event_type,
         value
  FROM events
), cohort AS (
  SELECT user_id, min(wk) AS wk0 FROM act GROUP BY user_id
), size_ AS (
  SELECT wk0, count(*) AS cohort_size FROM cohort GROUP BY wk0
), purch AS (
  SELECT c.wk0,
         (CAST(epoch(a.wk) AS BIGINT) - CAST(epoch(c.wk0) AS BIGINT))
           // 604800 AS week_offset,
         count(DISTINCT a.user_id) AS n_buyers,
         SUM(CAST(round(a.value * 100) AS BIGINT)) AS cents
  FROM act a JOIN cohort c ON a.user_id = c.user_id
  WHERE a.event_type = 'purchase' AND a.value IS NOT NULL
  GROUP BY 1, 2
)
SELECT CAST(p.wk0 AS STRING) AS cohort_week,
       p.week_offset,
       s.cohort_size,
       p.n_buyers,
       CAST(p.cents AS DOUBLE) / 100 AS revenue,
       round(CAST(SUM(p.cents) OVER (PARTITION BY p.wk0
                                     ORDER BY p.week_offset) AS DOUBLE)
             / 100 / s.cohort_size, 6) AS cum_ltv_per_user
FROM purch p JOIN size_ s ON p.wk0 = s.wk0
ORDER BY cohort_week, week_offset
"""


@register(
    "q_ts_cohort_ltv", oracle=_LTV_ORACLE, tags=("timeseries", "behavior")
)
def q_ts_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-cohort LTV curve: purchase revenue per (cohort_week,
    week_offset) cell in exact integer cents, then the cumulative
    per-member LTV via a window over each cohort's bounded offset list
    (offsets are calendar-bounded, never data-sized).

    Scale notes: one user_id-keyed first-activity aggregate, one
    user_id join to attach cohorts to purchases (same key — one
    partitioning reused), then a (cohort, offset) groupBy whose output
    is calendar-bounded; the cumulative window partitions by cohort
    over those bounded rows. Identical shape to q_ts_retention with a
    money dimension added — cf. reference replay semantics
    (initial_db.sql event envelope) for the first-seen fold.
    """
    from pokertracker_cassandra_st_spark.exprs import slong

    ev = table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("wk"),
        "event_type",
        "value",
    )
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("wk0"))
    size = cohort.groupBy("wk0").agg(F.count("*").alias("cohort_size"))
    purch = (
        act.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .join(cohort, "user_id")
        .groupBy(
            "wk0",
            (
                (
                    F.unix_timestamp(F.col("wk").cast("timestamp"))
                    - F.unix_timestamp(F.col("wk0").cast("timestamp"))
                )
                / 604800
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_buyers"),
            F.sum(slong("value", 2)).alias("cents"),
        )
    )
    w = (
        Window.partitionBy("wk0")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        purch.join(size, "wk0")
        .select(
            F.col("wk0").cast("string").alias("cohort_week"),
            "week_offset",
            "cohort_size",
            "n_buyers",
            (F.col("cents").cast("double") / 100).alias("revenue"),
            F.round(
                F.sum("cents").over(w).cast("double")
                / 100
                / F.col("cohort_size"),
                6,
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---- q_ts_survival ----------------------------------------------------------- #
# User-lifetime survival curve: S(w) = fraction of users whose
# observed lifetime (first to last event) spans at least w weeks —
# the aggregated companion to q_ts_retention's cohort triangle.
# Counts and ppm shares are exact integers; the week spine is bounded
# by the calendar, so the curve is a two-phase suffix sum over a
# handful of rows.

_SURVIVAL_ORACLE = """
WITH life AS (
  SELECT user_id,
         (CAST(epoch(CAST(date_trunc('week', max(ts)) AS DATE)) AS BIGINT)
          - CAST(epoch(CAST(date_trunc('week', min(ts)) AS DATE)) AS BIGINT))
           // 604800 AS weeks
  FROM events GROUP BY user_id
), d AS (
  SELECT weeks, count(*) AS n_at FROM life GROUP BY weeks
)
SELECT weeks AS lifetime_weeks,
       n_at AS n_exact,
       CAST(SUM(n_at) OVER (ORDER BY weeks DESC) AS BIGINT)
         AS n_surviving,
       (1000000 * CAST(SUM(n_at) OVER (ORDER BY weeks DESC) AS BIGINT))
         // CAST(SUM(n_at) OVER () AS BIGINT) AS survival_ppm
FROM d
ORDER BY lifetime_weeks
"""


@register(
    "q_ts_survival", oracle=_SURVIVAL_ORACLE, tags=("timeseries", "behavior")
)
def q_ts_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve over user lifetimes: per-user first/last activity
    weeks collapse to an integer lifetime; the suffix-cumulative count
    at each lifetime value is the number of users surviving >= w weeks,
    reported with its exact integer-ppm share.

    Scale notes: one user_id groupBy (min/max ts only — no payload),
    then a calendar-bounded lifetime histogram; the suffix sum windows
    over those bounded rows. The curve an activation team reads daily,
    at one shuffle.
    """
    ev = table(spark, sf_dir, "events")
    wk = lambda c: F.unix_timestamp(  # noqa: E731
        F.date_trunc("week", c).cast("date").cast("timestamp")
    )
    life = ev.groupBy("user_id").agg(
        ((wk(F.max("ts")) - wk(F.min("ts"))) / 604800)
        .cast("long")
        .alias("weeks")
    )
    d = life.groupBy("weeks").agg(F.count("*").alias("n_exact"))
    w = Window.orderBy(F.desc("weeks")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return d.select(
        F.col("weeks").alias("lifetime_weeks"),
        "n_exact",
        F.sum("n_exact").over(w).alias("n_surviving"),
        F.expr(
            "(1000000 * sum(n_exact) over (order by weeks desc"
            " rows between unbounded preceding and current row))"
            " div sum(n_exact) over ()"
        ).alias("survival_ppm"),
    ).orderBy("lifetime_weeks")


# ---- q_ts_churn -------------------------------------------------------------- #
# Calendar churn: of the users active in week w, how many are absent
# in week w+1 — the rolled-up (non-cohort) twin of retention. The
# absent set is a left-anti self-join of the distinct activity frame
# on (user, week+1); rates are exact integer ppm.

_CHURN_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
), nxt AS (
  SELECT a.user_id, a.wk
  FROM act a LEFT JOIN act b
    ON a.user_id = b.user_id AND b.wk = a.wk + INTERVAL 7 DAY
  WHERE b.user_id IS NULL
), last_wk AS (
  SELECT max(wk) AS mw FROM act
)
SELECT CAST(a.wk AS STRING) AS week,
       count(DISTINCT a.user_id) AS n_active,
       CAST(count(DISTINCT n.user_id) AS BIGINT) AS n_churned,
       (1000000 * CAST(count(DISTINCT n.user_id) AS BIGINT))
         // count(DISTINCT a.user_id) AS churn_ppm
FROM act a
LEFT JOIN nxt n ON a.user_id = n.user_id AND a.wk = n.wk
CROSS JOIN last_wk
WHERE a.wk < (SELECT mw FROM last_wk)
GROUP BY a.wk ORDER BY a.wk
"""


@register(
    "q_ts_churn", oracle=_CHURN_ORACLE, tags=("timeseries", "behavior")
)
def q_ts_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly churn rate: users active in week w with no activity in
    week w+1 (the final observed week is excluded — churn there is
    right-censored). Anti-join on (user, week+1) marks the churners;
    rates are exact integer ppm.

    Scale notes: the distinct activity frame shuffles once on user_id
    (both join sides share that partitioning); week arithmetic is
    date-typed on both engines; the rollup output is calendar-bounded.
    """
    ev = table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    b = act.select(
        F.col("user_id").alias("uid_b"), F.col("wk").alias("wk_b")
    )
    churned = (
        act.join(
            b,
            (F.col("user_id") == F.col("uid_b"))
            & (F.col("wk_b") == F.date_add("wk", 7)),
            "left",
        )
        .filter(F.col("uid_b").isNull())
        .select("user_id", "wk")
    )
    last_wk = act.agg(F.max("wk").alias("mw"))
    marked = act.join(
        churned.withColumn("is_churn", F.lit(1)), ["user_id", "wk"], "left"
    )
    return (
        marked.crossJoin(F.broadcast(last_wk))
        .filter(F.col("wk") < F.col("mw"))
        .groupBy(F.col("wk").cast("string").alias("week"))
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.countDistinct(
                F.when(F.col("is_churn") == 1, F.col("user_id"))
            ).alias("n_churned"),
        )
        .select(
            "week",
            "n_active",
            "n_churned",
            F.expr("(1000000 * n_churned) div n_active").alias("churn_ppm"),
        )
        .orderBy("week")
    )


# ---- q_ts_conversion_lag ----------------------------------------------------- #
# Time-to-convert distribution: seconds between each user's FIRST view
# and their FIRST purchase after it (q_ts_funnel's staged-min-ts
# semantics), summarized with exact integer seconds and the x4-
# quantized exact-quartile device from q_agg_percentile_exact (integer
# inputs x4 make the .25/.5/.75 interpolation land on exact integers).

_CONV_LAG_ORACLE = """
WITH fv AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), fp AS (
  SELECT e.user_id,
         CAST(floor(epoch(min(e.ts))) AS BIGINT)
           - CAST(floor(epoch(fv.t_view)) AS BIGINT) AS lag_s
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fv.t_view
  GROUP BY e.user_id, fv.t_view
)
SELECT count(*) AS n_converted,
       min(lag_s) AS min_s,
       max(lag_s) AS max_s,
       round(CAST(SUM(lag_s) AS DOUBLE) / count(*), 6) AS avg_s,
       CAST(quantile_cont(lag_s * 4, 0.25) AS BIGINT) AS p25_q4,
       CAST(quantile_cont(lag_s * 4, 0.50) AS BIGINT) AS p50_q4,
       CAST(quantile_cont(lag_s * 4, 0.75) AS BIGINT) AS p75_q4
FROM fp
"""


@register(
    "q_ts_conversion_lag",
    oracle=_CONV_LAG_ORACLE,
    tags=("timeseries", "behavior"),
)
def q_ts_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase latency distribution: per converting user, the
    integer seconds from first view to the first purchase after it;
    min/max/mean plus exact quartiles on x4-quantized integer seconds
    (the interpolated quantile of 4k-integers is itself an exact
    integer — no float boundary between engines).

    Scale notes: two user_id-keyed min-aggregates and one same-key
    join (q_ts_funnel's shape), then a single global aggregate whose
    percentile runs over per-user scalars, not events. The latency
    histogram every growth team reads next to the funnel counts.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(
            (
                F.unix_timestamp(F.min("ts"))
                - F.unix_timestamp(F.col("t_view"))
            ).alias("lag_s")
        )
    )
    return fp.agg(
        F.count("*").alias("n_converted"),
        F.min("lag_s").alias("min_s"),
        F.max("lag_s").alias("max_s"),
        F.round(F.sum("lag_s").cast("double") / F.count("*"), 6).alias(
            "avg_s"
        ),
        F.percentile(F.col("lag_s") * 4, F.lit(0.25))
        .cast("long")
        .alias("p25_q4"),
        F.percentile(F.col("lag_s") * 4, F.lit(0.50))
        .cast("long")
        .alias("p50_q4"),
        F.percentile(F.col("lag_s") * 4, F.lit(0.75))
        .cast("long")
        .alias("p75_q4"),
    )
