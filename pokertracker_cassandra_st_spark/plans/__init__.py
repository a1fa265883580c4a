"""Plan-level utilities: inspection helpers and materialized-view
maintenance patterns."""

from pokertracker_cassandra_st_spark.plans.inspect import explain_str  # noqa: F401
