"""pokertracker_cassandra_st_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
system ``robertBrem/pokertracker-cassandra-st`` (an event-sourced CQRS
poker tracker: append-only Cassandra event log + Kafka stream + a
materialized read-model projection) as an idiomatic Spark DataFrame/SQL
engine, then generalizes that surface to full relational analytics and
LLM-data-pipeline operators designed for 100 TB scale.

Layout:
    session.py    SparkSession factory + runtime tuning (AQE, UTC, shuffle)
    catalog.py    parquet table loader for the driver testdata layout
    registry.py   query registry: name -> (spark fn, duckdb oracle SQL)
    operators/    relational operators (scans, filters, joins, aggs, ...)
    functions/    scalar function families + UDF/UDAF/UDTF surface
    streaming/    Structured Streaming pipelines (replay fold, windows, ...)
    llm/          dedup / similarity / text-analysis / multimodal operators
"""

from pokertracker_cassandra_st_spark.registry import REGISTRY, get_queries, get_oracles

__all__ = ["REGISTRY", "get_queries", "get_oracles"]
