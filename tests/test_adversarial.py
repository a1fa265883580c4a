"""Second differential sweep on ADVERSARIAL data: heavy key skew and
injected NULLs.

The driver's fixture is clean (no nulls, mild skew); real 100 TB data
is not. This builds a sibling table set where:
  * user 0 owns ~60% of all events (celebrity-key skew),
  * ~10% of props and ~5% of value are NULL,
  * one user has a single event, one window partition is huge;
then re-runs EVERY oracle-checked query that reads `events` against the
same DuckDB oracle on the same files. Equivalence must hold on ugly
data too — null three-valued logic, null-safe aggregation, skewed
window partitions.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from pokertracker_cassandra_st_spark.catalog import TABLES
from pokertracker_cassandra_st_spark.registry import REGISTRY, get_queries

from tests.differ import assert_frames_match, duck_connection

get_queries()

BASE = "/root/testdata/sf0.001"
ADV = "/root/repo/.scratch/adversarial"

# batch queries over events that must survive skew+nulls
EVENT_QUERIES = [
    "q_filter_eq",
    "q_agg_maxby",
    "q_replay_projection",
    "q_replay_tombstone_anti",
    "q_scd2_history",
    "q_win_laglead",
    "q_win_moving",
    "q_join_asof",
    "q_fn_json",
    "q_udf_python",
    "q_udf_pandas",
    "q_udaf_pandas",
]


@pytest.fixture(scope="module")
def adv_dir():
    os.makedirs(ADV, exist_ok=True)
    rng = np.random.RandomState(7)
    n = 4000
    uid = np.where(rng.rand(n) < 0.6, 0, rng.randint(1, 40, size=n)).astype("int64")
    uid[0] = 999  # a user with exactly one event
    ts = pd.Timestamp("2024-02-01") + pd.to_timedelta(
        np.sort(rng.randint(0, 30 * 24 * 3600, size=n)), unit="s"
    )
    value = np.round(rng.uniform(0.01, 500, size=n), 2)
    value[rng.rand(n) < 0.05] = np.nan
    props = np.array([f'{{"k": {int(k)}}}' for k in rng.randint(0, 100, size=n)], dtype=object)
    props[rng.rand(n) < 0.10] = None
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts,
            "user_id": uid,
            "event_type": rng.choice(
                ["click", "view", "purchase", "signup", "error"], size=n
            ),
            "value": value,
            "props": props,
        }
    )
    ev.to_parquet(f"{ADV}/events.parquet", index=False)
    for t in TABLES:
        if t == "events":
            continue
        dst = f"{ADV}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{BASE}/{t}.parquet", dst)
    yield ADV


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duck_connection(adv_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_oracle_holds_on_adversarial_events(spark, adv_dir, adv_duck, name):
    q = REGISTRY[name]
    assert q.oracle is not None
    pdf = q.fn(spark, adv_dir).toPandas()
    odf = adv_duck.execute(q.oracle).fetchdf()
    assert_frames_match(pdf, odf, f"{name}[adversarial]")
