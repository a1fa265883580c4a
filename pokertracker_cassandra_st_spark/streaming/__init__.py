"""Structured Streaming pipelines (SURVEY.md §2 M6)."""

from pokertracker_cassandra_st_spark.streaming import (  # noqa: F401
    mv_sink,
    runner,
    stream_queries,
    tws_replay,
)
