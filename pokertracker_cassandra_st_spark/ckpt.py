"""Shared one-per-invocation materialization barrier (optimization r13).

``materialized(df)`` is a LAZY local checkpoint: the subtree is
compiled once and its partitions persist (memory+disk) on first action,
so every downstream reference shares ONE physical build instead of
re-executing the whole lineage per reference — Catalyst has no
cross-branch common-subplan reuse, and exchange reuse only dedups
byte-identical exchange subtrees, which multi-branch pipelines
(self-joins over derived frames, count+join fan-outs) rarely produce
(guide §5: "localCheckpoint() is a cheaper way to cut lineage").

Properties relied on throughout:
  * eager=False — query CONSTRUCTION and explain/plan_of stay job-free
    (the r12 ADVICE note on similarity.py's eager checkpoint);
  * per-invocation — a fresh call builds a fresh RDD; the CacheManager
    is never involved, so nothing persists across bench/driver runs
    (no cross-run result caching);
  * explain renders the checkpointed subtree as ``Scan ExistingRDD`` —
    plan-shape tests stub the per-module ``_materialized`` seams to
    assert on the pre-checkpoint tree (tests/test_plans.py
    ``plan_of_unmaterialized``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialized(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=False)
