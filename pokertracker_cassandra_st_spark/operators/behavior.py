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

from pyspark.sql import DataFrame, SparkSession
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
