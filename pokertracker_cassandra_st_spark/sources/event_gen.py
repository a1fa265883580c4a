"""Custom Python DataSource: a deterministic event-envelope generator.

Spark 4's Python DataSource API lets the engine register first-class
sources without JVM code. This one synthesizes the reference's event
envelope (ID, NAME, VERSION, DATE, DATA — ``initial_db.sql:5-12``) as
a partitioned, seeded generator: the load-generator face of the event
store, useful for soak-testing the replay fold at arbitrary scale
without materializing input files.

Usage::

    from pokertracker_cassandra_st_spark.sources.event_gen import register_event_log
    register_event_log(spark)
    df = (spark.read.format("player_event_log")
          .option("numPlayers", 100).option("eventsPerPlayer", 50)
          .option("partitions", 8).load())

Scale notes: generation is partition-parallel (one seeded RNG per
partition — deterministic regardless of scheduling); 1000 partitions on
a cluster generate billions of events with no input I/O at all. The
reader streams tuples; nothing is collected driver-side.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ENVELOPE = StructType(
    [
        StructField("ID", LongType(), False),
        StructField("NAME", StringType(), False),
        StructField("VERSION", LongType(), False),
        StructField("DATE", TimestampType(), False),
        StructField("DATA", StringType(), True),
    ]
)

_FIRST = ["Robert", "Ada", "Grace", "Linus", "Barbara", "Edsger"]
_LAST = ["Brem", "Lovelace", "Hopper", "Torvalds", "Liskov", "Dijkstra"]


class PlayerEventLogDataSource(DataSource):
    """``format("player_event_log")`` — seeded synthetic event log."""

    @classmethod
    def name(cls) -> str:
        return "player_event_log"

    def schema(self) -> StructType:
        return ENVELOPE

    def reader(self, schema: StructType) -> "PlayerEventLogReader":
        return PlayerEventLogReader(self.options)


class PlayerEventLogReader(DataSourceReader):
    def __init__(self, options):
        self.num_players = int(options.get("numPlayers", 100))
        self.events_per_player = int(options.get("eventsPerPlayer", 10))
        self.num_partitions = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        import random

        pidx = partition.value
        rng = random.Random(self.seed * 1_000_003 + pidx)  # per-partition determinism
        base = datetime(2024, 1, 1)
        # players are range-partitioned across readers
        for pid in range(pidx, self.num_players, self.num_partitions):
            first = rng.choice(_FIRST)
            last = rng.choice(_LAST)
            for version in range(self.events_per_player):
                if version == 0:
                    name = "PlayerCreated"
                elif version == self.events_per_player - 1 and rng.random() < 0.2:
                    name = "PlayerDeleted"
                else:
                    name = "PlayerUpdated"
                    first = rng.choice(_FIRST)
                payload = (
                    None
                    if name == "PlayerDeleted"
                    else json.dumps({"firstName": first, "lastName": last})
                )
                ts = base + timedelta(
                    minutes=pid * 7 + version * 11 + rng.randint(0, 5)
                )
                yield (pid, name, version, ts, payload)


def register_event_log(spark: SparkSession) -> None:
    """Idempotently register the data source with the session."""
    try:
        spark.dataSource.register(PlayerEventLogDataSource)
    except Exception:
        pass  # already registered in this session
