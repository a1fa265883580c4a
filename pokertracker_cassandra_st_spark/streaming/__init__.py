"""Structured Streaming pipelines (SURVEY.md §2 M6)."""

from pokertracker_cassandra_st_spark.streaming import runner, stream_queries  # noqa: F401
