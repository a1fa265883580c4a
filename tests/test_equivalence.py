"""Cross-formulation equivalence (hypothesis): the engine offers
several physically-different plans for "latest state per key" — the
window fold (WindowGroupLimit), the max_by aggregate, and the streaming
stateful fold. They must agree on ANY slice of the log, not just the
full fixture.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.operators.replay import TOMBSTONE

SF = "/root/testdata/sf0.001"


@given(
    mod=st.integers(min_value=2, max_value=7),
    rem=st.integers(min_value=0, max_value=6),
    max_id=st.integers(min_value=50, max_value=1000),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_window_fold_equals_maxby(spark, mod, rem, max_id):
    ev = table(spark, SF, "events").filter(
        (F.pmod("user_id", F.lit(mod)) == rem % mod) & (F.col("event_id") < max_id)
    )
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    via_window = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != TOMBSTONE))
        .select("user_id", "event_id", "event_type", "value")
    )
    via_maxby = (
        ev.groupBy("user_id")
        .agg(
            F.max("event_id").alias("event_id"),
            F.max_by("event_type", "event_id").alias("event_type"),
            F.max_by("value", "event_id").alias("value"),
        )
        .filter(F.col("event_type") != TOMBSTONE)
        .select("user_id", "event_id", "event_type", "value")
    )
    a = sorted(tuple(r) for r in via_window.collect())
    b = sorted(tuple(r) for r in via_maxby.collect())
    assert a == b


def test_holt_closed_form_oracle_equals_recursive_replay():
    """The round-8 closed-form Holt oracle (matrix-power weight table +
    one weighted SUM) must agree with the round-7 recursive-CTE literal
    replay of the fold — on the real fixtures AND on adversarial
    synthetic series (constant, linear ramp, alternating spike, a
    series longer than HOLT_TAIL so the truncated head actually
    drops)."""
    import duckdb

    from pokertracker_cassandra_st_spark.operators.timeseries import (
        _HOLT_ORACLE,
        _HOLT_ORACLE_RECURSIVE,
        HOLT_TAIL,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        new = con.execute(_HOLT_ORACLE).fetchdf().sort_values("event_type")
        old = (
            con.execute(_HOLT_ORACLE_RECURSIVE).fetchdf().sort_values("event_type")
        )
        assert new.reset_index(drop=True).equals(old.reset_index(drop=True)), sf

    # synthetic: one event per (type, hour) slot drawn from patterned
    # series; the 'long' type spans 2x HOLT_TAIL hours
    con = duckdb.connect()
    n_long = 2 * HOLT_TAIL + 7
    con.execute(
        f"""
        CREATE VIEW events AS
        WITH slots AS (
          SELECT 'const' AS event_type, unnest(range(0, 48)) AS h, 5 AS reps
          UNION ALL
          SELECT 'ramp', unnest(range(0, 96)), 1
          UNION ALL
          SELECT 'spike', unnest(range(0, 64)), 1
          UNION ALL
          SELECT 'long', unnest(range(0, {n_long})), 1
        ), expanded AS (
          SELECT event_type, h,
                 unnest(range(0, CASE event_type
                     WHEN 'const' THEN reps
                     WHEN 'ramp' THEN 1 + h % 7
                     WHEN 'spike' THEN CASE WHEN h % 2 = 0 THEN 9 ELSE 1 END
                     ELSE 1 + (h * h) % 13 END)) AS r
          FROM slots
        )
        SELECT CAST('2024-01-01'::TIMESTAMP
                 + to_microseconds(h * 3600000000 + r) AS TIMESTAMP) AS ts,
               event_type
        FROM expanded
        """
    )
    new = con.execute(_HOLT_ORACLE).fetchdf().sort_values("event_type")
    old = con.execute(_HOLT_ORACLE_RECURSIVE).fetchdf().sort_values("event_type")
    assert new.reset_index(drop=True).equals(old.reset_index(drop=True))
