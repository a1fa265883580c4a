"""Every registered query must RUN at sf0.001 too (the driver's smoke
scale) — catches scale-specific literals or empty-input crashes.
Streaming queries are exercised at sf0.01 elsewhere and are slow to
re-chunk, so they're smoke-checked via the replay representative only.
"""

from __future__ import annotations

import pytest

from pokertracker_cassandra_st_spark.registry import REGISTRY, get_queries

get_queries()

SMOKE_SF = "/root/testdata/sf0.001"
BATCH = sorted(n for n, q in REGISTRY.items() if "stream" not in q.tags)
STREAM_REP = ["q_stream_replay"]


@pytest.mark.parametrize("name", BATCH + STREAM_REP)
def test_runs_at_smoke_sf(spark, name):
    pdf = REGISTRY[name].fn(spark, SMOKE_SF).toPandas()
    assert len(pdf.columns) > 0
