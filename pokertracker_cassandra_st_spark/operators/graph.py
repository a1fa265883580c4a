"""Graph operator: unrolled PageRank over the customer-supplier
bipartite trade graph.

Iterative graph algorithms on Spark are expressed as REPEATED JOINS
against a stable edge table (the Pregel-as-joins pattern: each
iteration is contribution-scatter = edges ⋈ ranks, then
gather = groupBy(dst).sum). This module unrolls two propagation steps
of PageRank (customers -> suppliers -> customers, damping 0.85) so the
whole computation is ONE Catalyst plan the optimizer can pipeline —
the shape an iterative driver loop would produce per step, minus the
per-step job-submission overhead.

Determinism: ranks are scaled longs (1e9 = rank 1.0) and every
division is integer division, mirrored exactly in the oracle — no
float accumulation order to diverge. dedup.py's connected-components
query (llm/dedup.py) is the other graph op in the engine; both use the
same edges-as-DataFrame representation.

Scale notes: the edge table shuffles once per direction on its join
key; contributions are (node, long) pairs — narrow. Degree tables are
per-node aggregates (broadcastable below ~100M nodes). An iterative
version at 100 TB would checkpoint ranks between steps to truncate
lineage; unrolling two steps keeps this a single exchange-reusing plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register

_R0 = 1_000_000_000  # initial rank 1.0, scaled 1e9
_BASE = 150_000_000  # (1 - 0.85) scaled

_PAGERANK_ORACLE = f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), deg_c AS (
  SELECT c, count(*) AS dc FROM edges GROUP BY c
), deg_s AS (
  SELECT s, count(*) AS ds FROM edges GROUP BY s
), rank_s AS (
  SELECT e.s,
         {_BASE} + CAST(850 * sum({_R0} // d.dc) // 1000 AS BIGINT) AS rs
  FROM edges e JOIN deg_c d ON e.c = d.c
  GROUP BY e.s
), rank_c AS (
  SELECT e.c,
         {_BASE} + CAST(850 * sum(r.rs // d.ds) // 1000 AS BIGINT) AS rank_scaled
  FROM edges e JOIN rank_s r ON e.s = r.s JOIN deg_s d ON e.s = d.s
  GROUP BY e.c
)
SELECT c AS custkey, rank_scaled
FROM rank_c
ORDER BY rank_scaled DESC, custkey
LIMIT 100
"""


@register("q_graph_pagerank", oracle=_PAGERANK_ORACLE, tags=("graph",))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled PageRank propagation steps over the distinct
    customer->supplier edge set derived from orders ⋈ lineitem,
    returning the 100 highest-ranked customers (ties broken by key).

    Step 1 pushes uniform initial rank from customers to suppliers
    (scatter rank/out-degree along edges, gather by supplier, damp);
    step 2 pushes the supplier ranks back to customers the same way.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg_c = edges.groupBy("c").agg(F.count("*").alias("dc"))
    deg_s = edges.groupBy("s").agg(F.count("*").alias("ds"))

    rank_s = (
        edges.join(deg_c, "c")
        .groupBy("s")
        .agg(
            (
                F.lit(_BASE)
                + F.expr(f"850 * sum({_R0} DIV dc) DIV 1000")
            ).alias("rs")
        )
    )
    rank_c = (
        edges.join(rank_s, "s")
        .join(deg_s, "s")
        .groupBy("c")
        .agg(
            (
                F.lit(_BASE) + F.expr("850 * sum(rs DIV ds) DIV 1000")
            ).alias("rank_scaled")
        )
    )
    return (
        rank_c.select(F.col("c").alias("custkey"), "rank_scaled")
        .orderBy(F.desc("rank_scaled"), "custkey")
        .limit(100)
    )
