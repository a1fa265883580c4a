"""Sources & sinks: file formats + production connector adapters."""

from pokertracker_cassandra_st_spark.sources import connectors, formats  # noqa: F401
