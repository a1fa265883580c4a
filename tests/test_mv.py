"""Materialized-view maintenance invariant (hypothesis property test):

    incremental_update(full_refresh(log[:k]), log[k:])
        == full_refresh(log)          -- for any split point k

i.e. the projection never depends on HOW it was maintained — the
reference's read-your-writes invariant, generalized.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.plans.mv import (
    full_refresh,
    incremental_update,
    read_model,
)

SF = "/root/testdata/sf0.001"


def _mv_rows(spark, path):
    df = read_model(spark.read.parquet(path))
    return sorted(tuple(r) for r in df.collect())


@given(split=st.integers(min_value=1, max_value=999))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_equals_full(spark, tmp_path_factory, split):
    events = table(spark, SF, "events")
    base = tmp_path_factory.mktemp("mv")
    inc_path = str(base / f"inc_{split}")
    full_path = str(base / f"full_{split}")

    full_refresh(events.filter(F.col("event_id") < split), inc_path)
    incremental_update(
        spark, inc_path, events.filter(F.col("event_id") >= split)
    )
    full_refresh(events, full_path)

    assert _mv_rows(spark, inc_path) == _mv_rows(spark, full_path)


def test_tombstone_shadowing(spark, tmp_path):
    # a tombstone arriving in the delta must hide a key that was live
    # in the base MV (Tier A7 via the merge path)
    events = table(spark, SF, "events")
    path = str(tmp_path / "mv")
    # find a user whose LAST event is a tombstone but whose event just
    # before it is NOT — so the key is provably live in the base MV
    # before the tombstone merges in
    pair = events.groupBy("user_id").agg(
        F.max_by("event_type", "event_id").alias("last_t"),
        F.max("event_id").alias("last_id"),
    )
    prev = (
        events.alias("e")
        .join(pair.alias("p"), F.col("e.user_id") == F.col("p.user_id"))
        .filter(F.col("e.event_id") < F.col("p.last_id"))
        .groupBy(F.col("e.user_id").alias("user_id"))
        .agg(F.max_by("e.event_type", "e.event_id").alias("prev_t"))
    )
    cand = (
        pair.join(prev, "user_id")
        .filter((F.col("last_t") == "error") & (F.col("prev_t") != "error"))
        .first()
    )
    assert cand is not None, "fixture assumes a tombstoned user with a live prior event"
    uid, last_id = cand["user_id"], cand["last_id"]
    full_refresh(events.filter(F.col("event_id") < last_id), path)
    # the key must be VISIBLE pre-merge for the post-merge check to mean
    # anything (its latest base event is non-tombstone by construction)
    assert read_model(spark.read.parquet(path)).filter(F.col("user_id") == uid).count() == 1
    incremental_update(spark, path, events.filter(F.col("event_id") >= last_id))
    after = read_model(spark.read.parquet(path))
    assert after.filter(F.col("user_id") == uid).count() == 0
