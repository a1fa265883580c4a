"""Pin Spark's append-mode watermark eviction comparator.

The streaming oracles (q_stream_latedata, q_stream_chained) express the
emitted set as "windows whose end is at-or-before the final watermark"
(<=). If Spark's eviction predicate were strict (<), a max(ts) landing
EXACTLY on a window end would emit one window fewer than the oracle —
an off-by-one-window mismatch only adversarial timestamps reveal.

This test constructs exactly that alignment: 15-minute windows, a
10-minute watermark delay, and max(ts) = 10:40:00 so the final
watermark (10:30:00) coincides with the end of window [10:15, 10:30).
Empirically Spark DOES emit that window — eviction is window.end <=
watermark — which is the comparator every oracle uses.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.streaming.runner import (
    SCRATCH,
    run_to_table,
    stream_events,
)

FX = f"{SCRATCH}/boundary_fixture"


@pytest.fixture(scope="module")
def fixture_dir() -> str:
    os.makedirs(FX, exist_ok=True)
    base = pd.Timestamp("2024-01-01 10:00:00").value  # ns
    mins = [0, 5, 20, 40]  # max = 10:40 -> watermark 10:30 == end of [10:15, 10:30)
    df = pd.DataFrame(
        {
            "event_id": range(len(mins)),
            "ts": [base + m * 60_000_000_000 for m in mins],
            "user_id": [1] * len(mins),
            "event_type": ["click"] * len(mins),
            "value": [1.0] * len(mins),
            "props": ["{}"] * len(mins),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), f"{FX}/events.parquet")
    return FX


def test_window_ending_exactly_at_watermark_is_emitted(spark, fixture_dir):
    ev = stream_events(spark, fixture_dir, n_files=2)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"))
        .agg(F.count("*").alias("n"))
    )
    sink = run_to_table(agg, "append")
    got = {
        (r.ws, r.n)
        for r in sink.select(
            F.date_format("window.start", "HH:mm").alias("ws"), "n"
        ).collect()
    }
    # [10:00,10:15): 2 events, end < watermark -> emitted.
    # [10:15,10:30): 1 event, end == watermark -> EMITTED (<=, the pin).
    # [10:30,10:45): open -> withheld.
    assert got == {("10:00", 2), ("10:15", 1)}, got
