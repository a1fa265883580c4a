"""Materialized-view maintenance for the read-model projection.

The reference's query service IS a maintained materialized view: the
projection is updated per event from the stream and must always equal
a full replay of the log (the read-your-writes invariant its system
test asserts, ``PlayerResourceIT.java:126-171``). This module gives
that lifecycle a batch API:

  * ``full_refresh``  — recompute the projection from the whole log;
  * ``incremental_update`` — merge a new event slice into the existing
    MV without rescanning the history.

Incremental merge is last-write-wins by event_id: union (current MV,
folded delta) -> keep max event_id per key -> drop tombstones. The
invariant ``incremental(full(log_a), log_b) == full(log_a + log_b)``
is property-tested in tests/test_mv.py.

Scale notes: the delta fold touches only new events; the merge shuffles
(n_keys_in_mv + n_keys_in_delta) projection rows — independent of log
length. On a lakehouse table format this becomes MERGE INTO; here the
rewrite is a partitioned parquet overwrite. This is the batch face of
q_stream_replay's stateful fold — same semantics, same single-shuffle
budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.operators.replay import TOMBSTONE

MV_COLS = ("user_id", "last_event_id", "last_event_type", "last_value")


def _fold(events: DataFrame) -> DataFrame:
    """Latest event per key, tombstones KEPT (they must shadow older
    live rows during a merge; dropped only at read time)."""
    return events.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.max_by("value", "event_id").alias("last_value"),
    )


def read_model(mv: DataFrame) -> DataFrame:
    """The queryable view: tombstoned keys hidden (Tier A7)."""
    return mv.filter(F.col("last_event_type") != TOMBSTONE)


def full_refresh(events: DataFrame, path: str) -> None:
    _fold(events).write.mode("overwrite").parquet(path)


def incremental_update(spark: SparkSession, path: str, delta_events: DataFrame) -> None:
    current = spark.read.parquet(path)
    delta = _fold(delta_events)
    merged = (
        current.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.max("last_event_id").alias("last_event_id"),
            F.max_by("last_event_type", "last_event_id").alias("last_event_type"),
            F.max_by("last_value", "last_event_id").alias("last_value"),
        )
    )
    # parquet can't overwrite the path it is being read from: write the
    # merge beside it, then swap directories (a lakehouse table format
    # does this transactionally via MERGE INTO)
    import os
    import shutil

    tmp = path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
