"""Connector adapters: graceful failure without the jars, with the
production wiring intact (the semantics are covered by the parquet
equivalents in catalog.py / streaming/runner.py)."""

from __future__ import annotations

import pytest

from pokertracker_cassandra_st_spark.sources.connectors import (
    ConnectorUnavailable,
    read_event_store,
    stream_event_bus,
)


def test_cassandra_unavailable_raises_actionable_error(spark):
    with pytest.raises(ConnectorUnavailable, match="--packages"):
        read_event_store(spark, host="cassandra.example")


def test_kafka_adapter(spark):
    # the kafka source jar may or may not ship with pyspark; either a
    # streaming DataFrame comes back or the actionable error raises
    try:
        df = stream_event_bus(spark, brokers="broker:9092")
        assert df.isStreaming
    except ConnectorUnavailable as e:
        assert "--packages" in str(e)
