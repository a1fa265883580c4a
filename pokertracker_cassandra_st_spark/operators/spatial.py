"""Spatial/proximity join via grid bucketing.

"All pairs of points within distance r" is the 2-D cousin of the
dedup/ANN bucket joins in llm/: a naive formulation is an O(n²) cross
join, the scalable one hashes each point into an r-sized grid cell and
only compares a point against the 3×3 neighborhood of cells that could
possibly hold a match. Same pattern a 100 TB geo/embedding pipeline
uses (uber H3 / S2 cell joins): the candidate set per point is bounded
by local density, not dataset size.

Scale notes: one explode (×9, bounded) + one equi-join on cell key —
shuffle is on cell, so spatial locality becomes shuffle locality; dense
cells are the skew axis (mitigate with AQE skew join or finer grid).
No UDFs; the distance predicate is whole-stage-codegen arithmetic.
Reference: the engine's generic join surface (SURVEY.md §2 join family)
— the reference itself has no spatial ops, this is part of the
beyond-reference training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register

_R = 0.02  # radius in embedding-coordinate units


@register(
    "q_join_spatial_grid",
    oracle=f"""
WITH pts AS (
  SELECT vec_id,
         CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
)
SELECT a.vec_id AS a_id,
       b.vec_id AS b_id,
       round(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6)
         AS dist
FROM pts a JOIN pts b ON a.vec_id < b.vec_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) < {_R * _R}
ORDER BY a_id, b_id
""",
    tags=("join", "spatial"),
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within L2 distance r of each other, over the
    first two embedding dimensions, via grid-cell bucketing.

    Each point lands in cell (⌊x/r⌋, ⌊y/r⌋); any pair within r is in
    the same or an adjacent cell, so side A explodes to its 3×3
    neighborhood and equi-joins side B's exact cell — each qualifying
    pair matches exactly once (the 9 offsets are distinct), no DISTINCT
    pass needed. The oracle is the O(n²) brute-force form, proving the
    bucketed plan loses no pairs. Floats are cast to double identically
    on both sides, so the strict < r² predicate and the rounded
    distance are bit-deterministic.
    """
    emb = table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    r = F.lit(_R)
    with_cell = pts.withColumn("cx", F.floor(F.col("x") / r)).withColumn(
        "cy", F.floor(F.col("y") / r)
    )
    offsets = F.expr(
        "array(-1,0,1)"
    )
    a = (
        with_cell.withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            F.col("vec_id").alias("a_id"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            (F.col("cx") + F.col("dx")).alias("jcx"),
            (F.col("cy") + F.col("dy")).alias("jcy"),
        )
    )
    b = with_cell.select(
        F.col("vec_id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jcx"),
        F.col("cy").alias("jcy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, ["jcx", "jcy"])
        .filter((F.col("a_id") < F.col("b_id")) & (d2 < F.lit(_R * _R)))
        .select(
            "a_id",
            "b_id",
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
        .orderBy("a_id", "b_id")
    )
