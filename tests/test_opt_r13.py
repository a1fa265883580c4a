"""Focused locks for the round-13 optimization changes.

Each test pins the MECHANISM an optimization introduced (guide §5
materialization barriers, §1.2 expression restructures), so a regression
re-introducing the pathology fails loudly — and the no-cross-run-caching
property the round's rules demand is asserted, not just claimed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.plans.inspect import explain_str
from pokertracker_cassandra_st_spark.registry import REGISTRY, get_queries

get_queries()


def plan_of(spark, name, sf_dir, mode="formatted"):
    return explain_str(REGISTRY[name].fn(spark, sf_dir), mode)


def test_materialized_is_fresh_per_invocation_and_never_caches(spark, sf_dir):
    # the r13 lazy-localCheckpoint barrier must (a) recompute from the
    # parquet inputs on every invocation — two fresh calls wrap two
    # DIFFERENT checkpoint RDDs — and (b) never register anything with
    # the CacheManager (plan-keyed cache entries would survive across
    # bench/oracle runs = cross-run result caching)
    fn = REGISTRY["q_graph_triangle_count"].fn
    df1, df2 = fn(spark, sf_dir), fn(spark, sf_dir)
    rdd_ids_1 = {m.group(0) for m in _rdd_refs(df1)}
    rdd_ids_2 = {m.group(0) for m in _rdd_refs(df2)}
    assert rdd_ids_1 and rdd_ids_2 and rdd_ids_1.isdisjoint(rdd_ids_2)
    r1 = sorted(map(tuple, df1.collect()))
    r2 = sorted(map(tuple, df2.collect()))
    assert r1 == r2 and len(r1) > 0
    # CacheManager untouched: nothing persists across invocations
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _rdd_refs(df):
    import re

    # LogicalRDD leaves print as "Scan ExistingRDD[...]#<exprIds>"; the
    # expression ids differ per wrapped RDD instance
    return re.finditer(r"ExistingRDD\[[^\]]*\]", explain_str(df, "extended"))


def test_oriented_triangles_match_id_oriented_enumeration(spark, sf_dir):
    # the degree-oriented wedge enumeration must produce exactly the
    # same per-node counts and total as the classic a<b<c ID-oriented
    # three-way join it replaced (corner labels may permute; the vertex
    # multiset may not)
    import pokertracker_cassandra_st_spark.operators.graph as G

    edges = G._copurchase_edges(spark, sf_dir)
    new_tri = G._oriented_triangles(edges)
    new_pn = (
        new_tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n"))
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    old_tri = (
        e1.join(e2, F.col("e1.p2") == F.col("e2.p1"))
        .join(
            e3,
            (F.col("e3.p1") == F.col("e1.p1"))
            & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .select(
            F.col("e1.p1").alias("a"),
            F.col("e1.p2").alias("b"),
            F.col("e2.p2").alias("c"),
        )
    )
    old_pn = (
        old_tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, new_pn.collect())) == sorted(
        map(tuple, old_pn.collect())
    )


def test_approx_distinct_dedups_before_sketching(spark, sf_dir):
    # the HLL buffer must exist only per GROUP: the plan dedups
    # (l_returnflag, l_orderkey) pairs first (an aggregate with NO
    # functions), then sketches — the one-distinct rewrite that carried
    # a ~16 KB HLL buffer per key pair is the regression this locks out
    # ADVICE r13: don't pin the TOTAL exchange count (AQE/version
    # changes can alter rendering) — assert the pair-dedup aggregate
    # itself: an aggregate keyed on BOTH columns with NO functions
    # (the distinct) must exist below the sketching aggregate
    plan = plan_of(spark, "q_agg_approx_distinct", sf_dir)
    lines = [l.strip() for l in plan.splitlines()]
    dedup_keys = [
        i
        for i, l in enumerate(lines)
        if l.startswith("Keys [2]")
        and "l_returnflag" in l
        and "l_orderkey" in l
    ]
    assert dedup_keys and any(
        lines[i + 1].startswith("Functions: []") for i in dedup_keys
    )
    assert "partial_approx_count_distinct" in plan
    # the pair-dedup exchange keys on both columns
    assert any(
        "hashpartitioning(l_returnflag" in l and "l_orderkey" in l
        for l in plan.splitlines()
    )


def test_winnow_filter_carries_no_fingerprint_expression(spark, sf_dir):
    # the O(tokens^2) trap: the row filter must be the cheap token-count
    # gate, never the inlined fps/kg expression (md5 inside a Filter
    # condition is the signature of the regression)
    plan = plan_of(spark, "q_text_winnow", sf_dir)
    filter_lines = [
        l for l in plan.splitlines() if l.strip().startswith("Condition")
    ]
    assert filter_lines, "expected a Filter in the winnow plan"
    for l in filter_lines:
        assert "md5" not in l


def test_lexical_diversity_tokenizes_once_per_row(spark, sf_dir):
    # split(text) must appear in exactly one Project slot (the named
    # token column); the bigram lambda references the attribute
    plan = plan_of(spark, "q_text_lexical_diversity", sf_dir)
    project_lines = [
        l
        for l in plan.splitlines()
        if l.strip().startswith("Output") or "Project" in l
    ]
    n_splits = sum(l.count("split(text") for l in project_lines)
    assert n_splits <= 1, plan


def test_lsh_hyperplane_projections_are_named_columns(spark, sf_dir):
    # each of the 32 plane projections must be evaluated once per row:
    # the aggregate(zip_with(...)) trees live in their own Project and
    # the rung CASE arithmetic references them as attributes
    plan = plan_of(spark, "q_sim_lsh_hyperplane", sf_dir, mode="simple")
    assert plan.count("aggregate(zip_with") <= 32
