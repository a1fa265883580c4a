"""Relational operator surface (SURVEY.md §2 Tier A/B).

Importing this package registers every operator query in the registry.
"""

from pokertracker_cassandra_st_spark.operators import (  # noqa: F401
    replay,
    scans,
    filters,
    joins,
    aggregates,
    windows,
    sorts,
    setops,
    reshape,
    subqueries,
    analytics,
    tpch,
    timeseries,
    behavior,
    graph,
    sqlapi,
    statistics,
    spatial,
    quality,
)
