"""Custom Python DataSource: determinism, partition-parallelism, and
compatibility with the replay fold."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.sources.event_gen import register_event_log


def _load(spark, partitions):
    register_event_log(spark)
    return (
        spark.read.format("player_event_log")
        .option("numPlayers", 40)
        .option("eventsPerPlayer", 6)
        .option("partitions", partitions)
        .load()
    )


def test_deterministic_and_partition_invariant(spark):
    a = sorted(tuple(r) for r in _load(spark, 2).collect())
    b = sorted(tuple(r) for r in _load(spark, 2).collect())
    assert a == b  # same seed -> same data
    # partition-local RNG: same partitioning => identical output
    assert len(a) == 40 * 6
    assert len({(r[0], r[2]) for r in a}) == 240  # (ID, VERSION) unique


def test_feeds_replay_fold(spark):
    df = _load(spark, 4)
    w = Window.partitionBy("ID").orderBy(F.col("VERSION").desc())
    proj = (
        df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("NAME") != "PlayerDeleted"))
        .select(
            "ID",
            F.get_json_object("DATA", "$.firstName").alias("firstName"),
        )
    )
    rows = proj.collect()
    assert 0 < len(rows) <= 40
    assert all(r.firstName is not None for r in rows)
