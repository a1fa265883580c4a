"""LLM-data-pipeline operators: dedup, similarity, text, multimodal."""

from pokertracker_cassandra_st_spark.llm import dedup, similarity, text, multimodal  # noqa: F401
