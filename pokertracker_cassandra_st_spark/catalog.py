"""Table loader for the driver testdata layout (one parquet per table).

The reference's "catalog" is a single Cassandra keyspace with one table
(``/root/reference/src/test/resources/initial_db.sql:1-12``); here the
catalog is the set of parquet tables the driver materializes
(TESTDATA.md). Loading is lazy — ``spark.read.parquet`` only binds the
schema; Catalyst prunes columns and pushes predicates into the scan, so
each query's plan reads only what it needs (checked in tests/test_plans).

Scale notes: at 100 TB each logical table would be a directory of many
parquet files (possibly partitioned by date/bucket); ``spark.read
.parquet(path)`` handles both layouts identically, and partition-column
pruning comes for free when the layout is hive-partitioned.
"""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast when joined against a
# fact table. region/nation are bounded (25/5 rows at any scale factor);
# supplier/part grow with sf but stay well under the broadcast threshold
# at test scale — join code uses F.broadcast() explicitly only for the
# truly bounded dims and lets AQE decide for the sf-scaled ones.
BOUNDED_DIMS = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from an sf directory.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's reader
    rejects; we read it as raw int64 nanos (legacy conf) and rebuild a
    microsecond timestamp with integer division — lossless here (the
    generator emits µs-precision values) and matching DuckDB's µs
    internal representation. The cast stays inside the scan's project,
    so no extra pass over the data.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tables(spark: SparkSession, sf_dir: str, *names: str) -> SimpleNamespace:
    """Load several tables at once: ``t = tables(spark, d, 'orders', ...)``."""
    return SimpleNamespace(**{n: table(spark, sf_dir, n) for n in (names or TABLES)})
