"""Production connector adapters: Cassandra (event store) and Kafka
(event bus) — the reference's actual infrastructure.

The reference wires ``CASSANDRA_ADDRESS`` into the command service and
``KAFKA_ADDRESS`` into both sides (``start_container.sh:80-81,95``);
table DDL at ``initial_db.sql:5-12``, topic ``pokertracker:1:1`` at
``start_container.sh:56``. This container ships neither connector jar,
so these builders raise a clear error unless the jars are on the
classpath — the option wiring is the production-exact part; tests cover
the graceful-failure path and the parquet-backed equivalents cover the
semantics (catalog.py events table / streaming/runner.py).

Public wiring per the Spark Cassandra Connector and Structured
Streaming Kafka integration docs (both Apache-2.0, documented at
spark.apache.org and github.com/datastax/spark-cassandra-connector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"
KAFKA_FORMAT = "kafka"


class ConnectorUnavailable(RuntimeError):
    """Raised when a connector jar is absent from the classpath."""


def _has_class(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_event_store(
    spark: SparkSession,
    host: str,
    keyspace: str = "pokertracker",
    table: str = "events",
) -> DataFrame:
    """Batch-read the Cassandra EVENTS table (the reference's event
    store, initial_db.sql:5-12). Partition-key filters on ID push down
    to token-range scans via the connector."""
    if not _has_class(spark, "com.datastax.spark.connector.CassandraSparkExtensions"):
        raise ConnectorUnavailable(
            "spark-cassandra-connector not on classpath; submit with "
            "--packages com.datastax.spark:spark-cassandra-connector_2.13:3.5.1 "
            f"and spark.cassandra.connection.host={host}"
        )
    return (
        spark.read.format(CASSANDRA_FORMAT)
        .options(keyspace=keyspace, table=table)
        .option("spark.cassandra.connection.host", host)
        .load()
    )


def stream_event_bus(
    spark: SparkSession,
    brokers: str,
    topic: str = "pokertracker",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Subscribe to the Kafka event topic (start_container.sh:56) as a
    streaming source; value is the serialized event JSON (Tier A2/A3).
    Swap for streaming/runner.stream_events() in tests — the downstream
    fold is identical."""
    if not _has_class(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    ):
        raise ConnectorUnavailable(
            "spark-sql-kafka not on classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        )
    return (
        spark.readStream.format(KAFKA_FORMAT)
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
