"""Differential correctness: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 gate at the same scale factor (sf0.01), so
a green run here predicts a green CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from pokertracker_cassandra_st_spark import REGISTRY
from pokertracker_cassandra_st_spark.registry import get_queries

from tests.differ import assert_frames_match, duck_connection

get_queries()  # force registration
ALL = sorted(REGISTRY)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    pdf = sdf.toPandas()
    if q.oracle is None:
        # rows-only: runs, has a schema, and is non-degenerate
        assert len(pdf.columns) > 0, f"{name}: no columns"
        assert len(pdf) >= 0
    else:
        odf = duck.execute(q.oracle).fetchdf()
        assert_frames_match(pdf, odf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "user_id",
        "last_event_type",
        "last_value",
        "last_ts",
        "last_k",
    }


def test_registry_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(REGISTRY)
