"""Query registry — the single source of truth for the engine surface.

Every operator from SURVEY.md §2 registers here with:
  * a Spark callable ``fn(spark, sf_dir) -> DataFrame`` (the engine), and
  * optionally a DuckDB oracle SQL string (the differential-correctness
    gate; ``None`` => rows-only check, used for ops ANSI SQL can't
    express — approx sketches, streaming state, LSH, ...).

``__spark_entry__.py`` exposes this registry to the driver.

Cross-engine determinism rules (every query follows these — see
SURVEY.md §7.5):
  * double SUM/AVG go through DECIMAL(18,4) so the result is
    summation-order independent, then cast back to double;
  * inherently float-order-sensitive stats (stddev, corr, ...) are
    rounded to a tolerance far above double noise;
  * ns-precision timestamps are never returned raw (Spark truncates
    ns->us); they are formatted or truncated to seconds;
  * every ORDER BY feeding row_number/limit has a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from pokertracker_cassandra_st_spark.session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir)`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, wrapped, oracle, fn.__doc__ or "", tuple(tags))
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import pokertracker_cassandra_st_spark.operators  # noqa: F401
    import pokertracker_cassandra_st_spark.functions  # noqa: F401
    import pokertracker_cassandra_st_spark.streaming  # noqa: F401
    import pokertracker_cassandra_st_spark.llm  # noqa: F401
    import pokertracker_cassandra_st_spark.sources  # noqa: F401


def get_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: q.fn for name, q in REGISTRY.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
