"""Sort / limit / top-k operators (SURVEY.md §2 M4).

Scale notes: a global ORDER BY + LIMIT k compiles to
TakeOrderedAndProject — each task keeps a k-row heap, the driver merges
ntasks*k rows; no global sort, no single-task funnel, which is the only
acceptable shape for top-k at 100 TB. A full global sort (q_sort_
multikey without limit) uses range partitioning from a sampled
distribution — valid at scale, but reserved for when total order is
actually required. Per-group top-k is a partitioned window (shuffle on
the group key only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register


@register(
    "q_sort_multikey",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       NULLIF(c_mktsegment, 'MACHINERY') AS seg_nullable
FROM customer
ORDER BY seg_nullable ASC NULLS LAST, c_acctbal DESC, c_custkey
""",
    tags=("sort",),
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort: asc NULLS LAST, then desc, then unique key.

    (The driver's compare is order-insensitive; the sort itself is the
    operator under test and is asserted ordered in tests/test_plans.)
    """
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg_nullable"),
    ).orderBy(
        F.col("seg_nullable").asc_nulls_last(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey"),
    )


@register(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    tags=("sort", "bench"),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 orders by totalprice (TakeOrderedAndProject);
    o_orderkey tie-break makes the cutoff deterministic."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q_topk_pergroup",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    tags=("sort",),
)
def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranked window."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


def _z_interleave(xe: str, ye: str, div: str) -> str:
    """16+16-bit Morton (Z-order) interleave as portable integer
    arithmetic; ``div`` is the dialect's integer-division token
    (Spark ``DIV``, DuckDB ``//``). Pure +/*/div/mod keeps the
    expression bit-identical across engines without relying on
    dialect-specific shift operators."""
    terms = []
    for i in range(16):
        terms.append(f"((({xe}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({ye}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


_Z_X = "o_custkey % 65536"
# greatest(..., 0) lower clamp: a pre-anchor date would otherwise make
# the day offset negative, where Spark DIV (truncate toward zero) and
# DuckDB // (floor) diverge — the walk must be total on ANY date
_Z_Y_SPARK = "greatest(least(datediff(o_orderdate, DATE '1995-01-01'), 65535), 0)"
_Z_Y_DUCK = (
    "greatest(least(date_diff('day', DATE '1995-01-01',"
    " CAST(o_orderdate AS DATE)), 65535), 0)"
)

_ZORDER_ORACLE = f"""
SELECT o_orderkey,
       CAST({_Z_X} AS BIGINT) AS zx,
       CAST({_Z_Y_DUCK} AS BIGINT) AS zy,
       CAST({_z_interleave(_Z_X, _Z_Y_DUCK, "//")} AS BIGINT) AS zvalue
FROM orders
ORDER BY zvalue, o_orderkey
LIMIT 200
"""


@register("q_sort_zorder", oracle=_ZORDER_ORACLE, tags=("sort", "layout"))
def q_sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering key over (customer, order
    date): interleave the low 16 bits of each dimension so rows close
    in BOTH dimensions sort near each other — the multi-dimensional
    data-layout trick behind Delta/Iceberg OPTIMIZE ZORDER. Returns
    the curve's first 200 rows as a deterministic probe of the order.

    At 100 TB the use is `df.repartitionByRange(N, zvalue)
    .sortWithinPartitions(zvalue).write...`: min/max parquet column
    stats then prune on BOTH o_custkey and o_orderdate predicates
    (a 1-D sort only prunes its leading column). The key is pure
    integer codegen arithmetic — no UDF, no shuffle of its own.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.expr(_Z_X).cast("long").alias("zx"),
            F.expr(_Z_Y_SPARK).cast("long").alias("zy"),
            F.expr(_z_interleave(_Z_X, _Z_Y_SPARK, "DIV"))
            .cast("long")
            .alias("zvalue"),
        )
        .orderBy("zvalue", "o_orderkey")
        .limit(200)
    )


# ---- Hilbert-curve layout key ---------------------------------------- #
# Z-order's weakness at scale: the Morton curve takes long diagonal
# jumps, so a range of z-values can span distant regions of the key
# space and parquet min/max pruning admits extra files. The Hilbert
# curve is fully locality-preserving (adjacent curve positions are
# always adjacent cells), which is why Delta Lake's liquid clustering
# moved from Z-order to Hilbert. The classic xy2d walk (8 halving
# steps over a 256x256 grid) is a LINEAR chain of integer CASE/div/mod
# steps — expressed as 8 chained projections in Spark (all inside one
# whole-stage-codegen span, no UDF, no shuffle) and 8 chained
# subqueries in the DuckDB oracle, generated from the same Python
# template so the arithmetic is token-identical.
_H_N = 256  # grid side; 8 bits per dimension, 16-bit curve index


def _hilbert_step(s: int, div: str) -> dict[str, str]:
    """One xy2d halving step at cell size ``s``: expressions for the
    quadrant term added to d, and the rotated/reflected (x, y) fed to
    the next step. Pure +,-,*,div,% on previous-step columns hx/hy —
    ((3*rx) XOR ry) unfolded into arithmetic via rx*2+ry lookup
    (0->0, 1->1, 2->3, 3->2), so no dialect-specific xor is needed."""
    rx = f"((hx {div} {s}) % 2)"
    ry = f"((hy {div} {s}) % 2)"
    quad = (
        f"CASE ({rx}) * 2 + ({ry}) WHEN 0 THEN 0 WHEN 1 THEN 1 "
        f"WHEN 2 THEN 3 ELSE 2 END"
    )
    return {
        "hd": f"hd + {s * s} * ({quad})",
        # ry == 0: reflect by n-1 when rx == 1, then swap x/y
        "hx": (
            f"CASE WHEN ({ry}) = 0 THEN "
            f"(CASE WHEN ({rx}) = 1 THEN {_H_N - 1} - hy ELSE hy END) "
            f"ELSE hx END"
        ),
        "hy": (
            f"CASE WHEN ({ry}) = 0 THEN "
            f"(CASE WHEN ({rx}) = 1 THEN {_H_N - 1} - hx ELSE hx END) "
            f"ELSE hy END"
        ),
    }


_H_X = "o_custkey % 256"
# greatest(..., 0) lower clamp, same rationale as the zorder key: keep
# the quad CASE's rx*2+ry in range for dates before the anchor
_H_Y_SPARK = "greatest(least(datediff(o_orderdate, DATE '1995-01-01'), 255), 0)"
_H_Y_DUCK = (
    "greatest(least(date_diff('day', DATE '1995-01-01',"
    " CAST(o_orderdate AS DATE)), 255), 0)"
)


def _hilbert_oracle() -> str:
    inner = (
        f"SELECT o_orderkey, CAST({_H_X} AS BIGINT) AS hx0,"
        f" CAST({_H_Y_DUCK} AS BIGINT) AS hy0,"
        f" CAST({_H_X} AS BIGINT) AS hx,"
        f" CAST({_H_Y_DUCK} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f" FROM orders"
    )
    q = inner
    s = _H_N // 2
    while s > 0:
        e = _hilbert_step(s, "//")
        q = (
            f"SELECT o_orderkey, hx0, hy0, {e['hd']} AS hd,"
            f" {e['hx']} AS hx, {e['hy']} AS hy FROM ({q})"
        )
        s //= 2
    return (
        f"SELECT o_orderkey, hx0 AS hx, hy0 AS hy, hd AS hvalue FROM ({q}) "
        # NULLS LAST explicitly: a NULL o_custkey nulls the whole walk,
        # and Spark's default (NULLS FIRST) would pull those rows into
        # the top-200 probe while DuckDB's default keeps them out
        f"ORDER BY hvalue ASC NULLS LAST, o_orderkey LIMIT 200"
    )


@register("q_sort_hilbert", oracle=_hilbert_oracle(), tags=("sort", "layout"))
def q_sort_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over (customer, order date): the
    locality-preserving sibling of q_sort_zorder on the same
    dimensions, returning the curve's first 200 rows as a
    deterministic probe of the order.

    At 100 TB the use is identical to zorder's —
    `repartitionByRange(N, hvalue).sortWithinPartitions(hvalue)` at
    write time so min/max column stats prune on BOTH dimensions — but
    with tighter value-range-to-region mapping (no Morton diagonal
    jumps), i.e. fewer false-positive files per predicate box. The 8
    chained integer steps all fuse into one codegen span: no UDF, no
    extra shuffle beyond the final order-by's range exchange.
    """
    o = table(spark, sf_dir, "orders")
    df = o.select(
        "o_orderkey",
        F.expr(_H_X).cast("long").alias("hx0"),
        F.expr(_H_Y_SPARK).cast("long").alias("hy0"),
        F.expr(_H_X).cast("long").alias("hx"),
        F.expr(_H_Y_SPARK).cast("long").alias("hy"),
        F.lit(0).cast("long").alias("hd"),
    )
    s = _H_N // 2
    while s > 0:
        e = _hilbert_step(s, "DIV")
        df = df.select(
            "o_orderkey",
            "hx0",
            "hy0",
            F.expr(e["hd"]).alias("hd"),
            F.expr(e["hx"]).alias("hx"),
            F.expr(e["hy"]).alias("hy"),
        )
        s //= 2
    return (
        df.select(
            "o_orderkey",
            F.col("hx0").alias("hx"),
            F.col("hy0").alias("hy"),
            F.col("hd").alias("hvalue"),
        )
        .orderBy(F.col("hvalue").asc_nulls_last(), "o_orderkey")
        .limit(200)
    )
