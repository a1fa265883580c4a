"""LLM-data-pipeline operators: dedup, similarity, text, multimodal."""

from pokertracker_cassandra_st_spark.llm import (  # noqa: F401
    curation,
    dedup,
    multimodal,
    pipeline,
    shaping,
    similarity,
    text,
)
