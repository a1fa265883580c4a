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
