"""Scalar function families + UDF/UDAF/UDTF surface (SURVEY.md §2 M5/M7)."""

from pokertracker_cassandra_st_spark.functions import modern, scalar, udfs  # noqa: F401
