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


def test_geo_signed_zero_bearing(spark, sf_dir, duck):
    """Round-9 driver red, pinned: lon=0, lat<0 rows (event_ids
    540/1260/1620/1980 at sf0.01) must emit a POSITIVE-zero bearing
    through the full hash path in BOTH engines. DuckDB's double round
    preserves atan2(-0.0, x>0) = -0.0 while Spark's F.round BigDecimal
    path normalizes to +0.0 — the `+ 0.0` epilogue after the CASE
    collapses both engines to +0.0 (IEEE: -0.0 + 0.0 = +0.0)."""
    import math

    from tests.differ import _canon

    q = REGISTRY["q_fn_geo"]
    pdf = q.fn(spark, sf_dir).toPandas()
    edge = pdf[(pdf["lon"] == 0.0) & (pdf["lat"] < 0)]
    assert len(edge) > 0, "fixture must contain lon=0, lat<0 rows"
    for v in edge["bearing_to_origin_deg"]:
        assert v == 0.0
        assert math.copysign(1.0, v) == 1.0, "Spark bearing must be +0.0"
        assert _canon(float(v)) == "0.0"  # the strict differ's rendering
    odf = duck.execute(q.oracle).fetchdf()
    oedge = odf[(odf["lon"] == 0.0) & (odf["lat"] < 0)]
    assert len(oedge) == len(edge)
    for v in oedge["bearing_to_origin_deg"]:
        assert math.copysign(1.0, v) == 1.0, "oracle bearing must be +0.0"
        assert _canon(float(v)) == "0.0"
