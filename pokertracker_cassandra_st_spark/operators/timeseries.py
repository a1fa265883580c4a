"""Time-series operators: spine generation, gap filling, forward fill.

Training-data and analytics pipelines constantly need "regularize this
irregular event stream onto a fixed grid": generate a per-key calendar
spine, join observations onto it, and carry the last observation
forward. All declarative — sequence+explode for the spine, an as-of
style last(ignorenulls) window for the fill.

Scale notes: the spine explode multiplies rows by days-per-key (bounded
by the date range, not data size); the fill is one shuffle on the key.
No driver-side date loops, no UDFs. For sparse keys over long ranges,
generate the spine from per-key min/max (as here) rather than a global
calendar cross join — the output stays proportional to the per-key
span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register


@register(
    "q_ts_gapfill",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         (list(value ORDER BY event_id DESC))[1] AS day_last_value,
         count(*) AS n_events
  FROM events
  GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT s.user_id, CAST(gs.g AS DATE) AS day
  FROM spans s, LATERAL unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS gs(g)
)
SELECT sp.user_id,
       CAST(sp.day AS STRING) AS day,
       coalesce(d.n_events, 0) AS n_events,
       last_value(d.day_last_value IGNORE NULLS)
         OVER (PARTITION BY sp.user_id ORDER BY sp.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM spine sp LEFT JOIN daily d ON sp.user_id = d.user_id AND sp.day = d.day
""",
    tags=("timeseries",),
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily grid per user over each user's own [min, max] span, event
    counts on observed days, last observed value carried forward across
    gap days."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.max_by("value", "event_id").alias("day_last_value"),
        F.count("*").alias("n_events"),
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("day_last_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )
