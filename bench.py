#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink (full execution, no
driver collection) on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

HEADLINE = [
    "q_replay_projection",  # the reference's core pipeline
    "q_agg_groupby",        # TPC-H Q1 shape
    "q_join_sortmerge",     # large-large join
    "q_join_broadcast",     # dim enrichment
    "q_win_running",        # windowed cumulative
    "q_topk",               # TakeOrderedAndProject
    "q_udtf_explode",       # token fan-out + count
    "q_dedup_exact",        # content-hash dedup
    "q_text_tfidf",         # tokenize + join + window
    "q_sim_topk",           # brute-force vector top-k
    "q_tpch_q3_shape",      # 3-way join + top-k
    "q_tpch_q5_shape",      # 6-way star join
    "q_pipeline_curate",    # fused LLM curation pipeline
]

# measured once, reported separately — a full stateful streaming run
# (4 micro-batches, state store, checkpointing) is a different axis
# than batch SQL throughput and would swamp the headline total
STREAMING_EXTRA = "q_stream_replay"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0.1)

    from pokertracker_cassandra_st_spark.registry import REGISTRY, get_queries
    from pokertracker_cassandra_st_spark.session import get_spark

    get_queries()
    spark = get_spark("pokertracker-bench")
    # warm the JVM + file listing so query timings measure execution
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        # one warmup run (JIT/classloading/parquet footer cache), then
        # report the best of two measured runs — the steady-state
        # throughput a long-lived cluster session would see.
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):  # best-of-3: rides out stray GC pauses
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    # same methodology as batch: one warmup (materializes the split
    # cache, JITs the state-store/python-worker path), then measure the
    # steady-state run a long-lived session would see
    REGISTRY[STREAMING_EXTRA].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # per-micro-batch wall instrumentation (VERDICT r12 'Next round
    # #5'): BENCH_r12 recorded stream_replay at 11.8 s vs a 4.4 s
    # five-run floor with no per-batch visibility.  A listener records
    # each progress event's batchId + triggerExecution wall so the
    # artifact itself shows WHICH micro-batch stalls (scheduler stall
    # vs code regression) instead of needing a rerun to diagnose.
    from pyspark.sql.streaming import StreamingQueryListener

    batch_walls: list[dict] = []

    class _BatchWallListener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            batch_walls.append(
                {
                    "batch_id": p.batchId,
                    "trigger_ms": p.durationMs.get("triggerExecution"),
                    "add_batch_ms": p.durationMs.get("addBatch"),
                    "rows": p.numInputRows,
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _BatchWallListener()
    spark.streams.addListener(listener)
    try:
        t0 = time.perf_counter()
        REGISTRY[STREAMING_EXTRA].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        stream_sec = round(time.perf_counter() - t0, 3)
        # progress events are delivered async on the listener bus —
        # give the tail event a moment to land before reading
        deadline = time.time() + 5.0
        while time.time() < deadline and not batch_walls:
            time.sleep(0.1)
        time.sleep(0.3)
    finally:
        spark.streams.removeListener(listener)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "stream_replay_sec": stream_sec,
                "stream_replay_batches": sorted(
                    batch_walls, key=lambda b: b["batch_id"]
                ),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
