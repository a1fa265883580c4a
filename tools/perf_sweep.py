"""Per-query wall-clock + plan-shape sweep over the registry (guide §1).

For every registry query (or a named subset) this times the noop-sink
materialization (full execution, no driver collection — guide §1.4) and
records plan-shape counters from ``explain("formatted")``: Exchange
count, join strategies, Python-boundary nodes, scan count.  Results are
appended as JSON lines so a partial sweep still yields data.

Usage:
  python tools/perf_sweep.py [--sf DIR] [--out FILE] [--runs N] [names...]

This is a measurement tool: it never changes what a query computes.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PLAN_COUNTERS = {
    "exchange": r"\bExchange\b",
    "broadcast_exchange": r"\bBroadcastExchange\b",
    "aqe_shuffle_read": r"\bAQEShuffleRead\b",
    "sort_merge_join": r"\bSortMergeJoin\b",
    "shuffled_hash_join": r"\bShuffledHashJoin\b",
    "broadcast_hash_join": r"\bBroadcastHashJoin\b",
    "broadcast_nested_loop": r"\bBroadcastNestedLoopJoin\b",
    "cartesian": r"\bCartesianProduct\b",
    "batch_eval_python": r"\bBatchEvalPython\b",
    "arrow_eval_python": r"\bArrowEvalPython\b",
    "map_in_pandas": r"\bMapInPandas|FlatMapGroupsInPandas|MapInArrow\b",
    "python_udtf": r"\bBatchEvalPythonUDTF|ArrowEvalPythonUDTF\b",
    "file_scan": r"Scan parquet|FileScan",
    "window": r"\bWindow\b",
    "sort": r"^\s*[*+:\- ]*Sort\b",
    "existing_rdd": r"\bScan ExistingRDD\b",
}


def plan_stats(text: str) -> dict:
    return {
        k: len(re.findall(pat, text, flags=re.MULTILINE)) for k, pat in PLAN_COUNTERS.items()
    }


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = str(REPO / ".scratch" / "perf_sweep.jsonl")
    runs = 2
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--out":
            out_path = argv[i + 1]
            i += 2
        elif argv[i] == "--runs":
            runs = int(argv[i + 1])
            i += 2
        else:
            names.append(argv[i])
            i += 1

    from pokertracker_cassandra_st_spark.plans.inspect import explain_str
    from pokertracker_cassandra_st_spark.registry import REGISTRY, get_queries
    from pokertracker_cassandra_st_spark.session import get_spark

    get_queries()
    targets = names or list(REGISTRY)
    spark = get_spark("perf-sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    done: set[str] = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass

    sink = open(out_path, "a")
    for idx, name in enumerate(targets):
        if name in done:
            continue
        q = REGISTRY[name]
        rec: dict = {"name": name, "sf_dir": sf_dir}
        t_start = time.perf_counter()
        try:
            spark.sparkContext.setJobDescription(f"sweep:{name}")
            df = q.fn(spark, sf_dir)
            rec["plan"] = plan_stats(explain_str(df))
            walls = []
            for _ in range(runs):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                walls.append(round(time.perf_counter() - t0, 3))
            rec["walls"] = walls
            rec["best"] = min(walls)
        except Exception as e:  # noqa: BLE001 — record and move on
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
        finally:
            spark.sparkContext.setJobDescription(None)
        rec["total"] = round(time.perf_counter() - t_start, 3)
        sink.write(json.dumps(rec) + "\n")
        sink.flush()
        print(f"[{idx + 1}/{len(targets)}] {name}: {rec.get('best', rec.get('err'))}", flush=True)
    sink.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
