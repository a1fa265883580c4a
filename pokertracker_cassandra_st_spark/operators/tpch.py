"""TPC-H-shaped composite queries beyond the q1/q3/q5/q7/q10/q18 set
in :mod:`analytics` — the remaining decision-support shapes over the
fixture schema.  The fixture ships no ``partsupp`` table, so the five
shapes that need one (Q2/Q9/Q11/Q16/Q20) run over a DERIVED partsupp:
a deterministic part x {0..3} expansion in the spirit of dbgen's
public 4-suppliers-per-part generator (see :func:`derived_partsupp`),
built identically by both engines from the part and supplier tables —
completing all 22 TPC-H query shapes.

Each query is a SHAPE: the join/agg/subquery structure of the TPC-H
original over this repo's TPC-H-ish fixture tables, with exact
scaled-long arithmetic (the :func:`exprs.slong` doctrine) so the two
engines agree bit-for-bit.

Scale notes: these are the canonical optimizer workouts — semi/anti
joins that must NOT expand rows (Q4, Q22), disjunctive predicates that
must still prune (Q19), outer-join fan-in distributions (Q13), and
dimension-broadcast conditional aggregates (Q12, Q14). Every plan here
is asserted by a lock test in tests/test_plans.py: facts never
broadcast, dims always do, and the semi/anti forms plan as one hash
join each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table, tables
from pokertracker_cassandra_st_spark.exprs import slong
from pokertracker_cassandra_st_spark.registry import register

# discounted revenue as an exact scale-4 long (price_cents * (100-disc_cents));
# same fragment family as analytics._REV.
_REV = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def _rev_col():
    return slong("l_extendedprice", 2) * (100 - slong("l_discount", 2))


# ---- q_tpch_q6_shape ------------------------------------------------------ #


@register(
    "q_tpch_q6_shape",
    oracle=f"""
SELECT CAST(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
            AS DOUBLE) / 10000 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    tags=("analytics",),
)
def q_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the forecasting-revenue-change scan — four
    pushable predicates, one global sum, zero joins. The pure
    predicate-pushdown benchmark: all four filters and the 3-column
    projection must reach the parquet scan (locked in test_plans).

    Determinism: the discount band compares the RAW parquet doubles to
    IEEE-exact literals (0.05/0.07 parse to the same double in both
    engines; the values under comparison are byte-identical parquet
    reads), and the summed product is cents x cents — exact int64.
    Int64 headroom: price_cents*disc_cents <= ~7e7; the global sum
    wraps past ~1.3e11 qualifying rows — at that scale widen the
    partial to DECIMAL(38,0), no plan change (same doctrine as
    q_tpch_q1_shape).

    Scale: map-side partial collapses every task to one (long, long)
    pair; the single-row exchange is bounded. This is the 100 TB plan.
    """
    li = table(spark, sf_dir, "lineitem")
    rev = slong("l_extendedprice", 2) * slong("l_discount", 2)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(rev).cast("double") / 10_000).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---- q_tpch_q4_shape ------------------------------------------------------ #


@register(
    "q_tpch_q4_shape",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    tags=("analytics",),
)
def q_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — a quarter of orders,
    counted by priority, keeping only orders with at least one
    late-shipping lineitem. The fixture has no l_commitdate /
    l_receiptdate, so "late" is adapted to l_shipdate more than 30
    days after the order date (same correlated-EXISTS structure).

    The EXISTS is a LEFT SEMI hash join on l_orderkey with the
    date comparison as a residual — the semi join NEVER expands rows
    (an order with 7 late lineitems counts once), which is the whole
    point of the shape: a naive inner-join + distinct pays an extra
    exchange on the fact. Locked as a semi join in test_plans.

    Scale: the quarter filter prunes orders at the scan; lineitem
    shuffles on l_orderkey only for the semi probe (no payload
    columns survive pruning beyond the key + shipdate).
    """
    t = tables(spark, sf_dir, "orders", "lineitem")
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(t.lineitem, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---- q_tpch_q12_shape ----------------------------------------------------- #


@register(
    "q_tpch_q12_shape",
    oracle="""
SELECT l.l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND l.l_shipdate > o.o_orderdate
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
    tags=("analytics",),
)
def q_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipping-priority split — lineitems shipped in
    a year, joined back to their orders, counting urgent vs non-urgent
    order lines per class. The fixture has no l_shipmode, so the
    grouping class is l_returnflag; "received late" is adapted to
    shipped-after-ordered (l_shipdate > o_orderdate residual).

    The CASE pair uses IN / the same IN negated via THEN 0 ELSE 1 so a
    NULL priority lands in the ELSE branch identically in both engines
    (NULL IN (...) is NULL -> not matched -> ELSE).

    Scale: the year filter prunes the fact scan; the join shuffles both
    sides on the order key with only (priority, orderdate) surviving
    from orders; partial aggregation collapses to |flags| rows.
    """
    t = tables(spark, sf_dir, "orders", "lineitem")
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# ---- q_tpch_q13_shape ----------------------------------------------------- #


@register(
    "q_tpch_q13_shape",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("analytics",),
)
def q_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT join
    customers to their (non-default-priority) orders, count per
    customer INCLUDING the zero-order customers, then histogram the
    counts. The fixture has no o_comment, so the original's
    NOT LIKE '%special%requests%' becomes a priority exclusion (same
    join-side-filter structure: the predicate belongs in the join's ON
    clause / pre-join filter, NOT the WHERE, or zero-order customers
    vanish).

    count(o_orderkey) — not count(*) — so customers whose only orders
    were excluded (or whose join found nothing) count 0, identically
    in both engines; orphan orders with NULL o_custkey never match the
    equi key.

    Scale: both aggregations partial-aggregate; the second groupBy runs
    over customer-count rows (already one per customer). The outer join
    shuffles on the customer key — the canonical fan-in distribution
    query.
    """
    t = tables(spark, sf_dir, "customer", "orders")
    o = t.orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        t.customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---- q_tpch_q14_shape ----------------------------------------------------- #


@register(
    "q_tpch_q14_shape",
    oracle=f"""
WITH m AS (
  SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV}
                       ELSE 0 END) AS BIGINT) AS promo_q4,
         CAST(SUM({_REV}) AS BIGINT) AS total_q4
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
    AND l.l_shipdate <  TIMESTAMP '1997-10-01'
)
SELECT CAST(promo_q4 AS DOUBLE) / 10000 AS promo_revenue,
       CAST(total_q4 AS DOUBLE) / 10000 AS total_revenue,
       CAST(CAST(promo_q4 AS HUGEINT) * 1000000 // total_q4 AS BIGINT)
         AS promo_share_ppm
FROM m
""",
    tags=("analytics",),
)
def q_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion effect — one month of lineitems
    joined to the part dimension, promo revenue as an exact ppm share
    of total. The fixture's p_type is a single word, so the original's
    LIKE 'PROMO%%' is an equality.

    The part dimension BROADCASTS (2k rows locally, dim-sized at any
    scale); the fact never shuffles — the month filter prunes the scan
    and the conditional sums collapse map-side to one row. The ppm
    share is DECIMAL(38,0)/HUGEINT floor division on exact q4 longs
    (int64 would wrap past ~10x — the share_of_total lesson).
    """
    t = tables(spark, sf_dir, "lineitem", "part")
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    rev = _rev_col()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    m = (
        li.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).alias("promo_q4"),
            F.sum(rev).alias("total_q4"),
        )
    )
    return m.select(
        (F.col("promo_q4").cast("double") / 10_000).alias("promo_revenue"),
        (F.col("total_q4").cast("double") / 10_000).alias("total_revenue"),
        F.expr(
            "CAST((CAST(promo_q4 AS DECIMAL(38,0)) * 1000000)"
            " DIV total_q4 AS BIGINT)"
        ).alias("promo_share_ppm"),
    )


# ---- q_tpch_q22_shape ----------------------------------------------------- #


@register(
    "q_tpch_q22_shape",
    oracle="""
WITH stats AS (
  SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         count(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, count(*) AS numcust,
       CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM customer c, stats
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * stats.n > stats.s
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
    tags=("analytics",),
)
def q_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global sales opportunity — customers with an
    above-average positive balance and NO RECENT orders (none since
    2000-01-01 — every fixture customer has SOME order, so the
    original's "no orders in 5 years" intent needs the date scope to
    produce a non-degenerate set), counted and summed per nation. The
    fixture has no phone country codes, so the group key is
    c_nationkey and the country-code prefilter is dropped; the two
    defining structures survive intact: a scalar aggregate subquery
    feeding a filter, and a NOT EXISTS anti join.

    Determinism: "above average" avoids the float average entirely —
    cents * n > sum_cents cross-multiplies in exact int64 (headroom:
    max cents ~1e9 x n up to ~9e9 customers stays under 2^63; past
    that widen to DECIMAL, no plan change). The balance stats row
    cross-joins as a broadcast (1 row); the anti join is a hash join
    on the customer key that never expands rows. NULL balances fail
    c_acctbal > 0 and the cross-multiply filter identically in both
    engines.

    Scale: orders prunes to the single o_custkey column for the anti
    probe; customer shuffles once on c_custkey. Locked: one broadcast
    nested-loop for the 1-row stats attach, one anti hash join, no
    cartesian on data-sized frames.
    """
    t = tables(spark, sf_dir, "customer", "orders")
    cents = slong("c_acctbal", 2)
    stats = (
        t.customer.filter(F.col("c_acctbal") > 0)
        .agg(F.sum(cents).alias("s"), F.count("*").alias("n"))
    )
    rich = (
        t.customer.crossJoin(F.broadcast(stats))
        .filter(cents * F.col("n") > F.col("s"))
    )
    return (
        rich.join(
            t.orders.filter(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(cents).alias("bal_cents"),
        )
        .orderBy("c_nationkey")
    )


# ---- q_tpch_q15_shape ----------------------------------------------------- #


@register(
    "q_tpch_q15_shape",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_REV}) AS BIGINT) AS total_q4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(total_q4 AS DOUBLE) / 10000 AS total_revenue
FROM supplier s
JOIN rev ON s.s_suppkey = rev.l_suppkey
WHERE total_q4 = (SELECT max(total_q4) FROM rev)
ORDER BY s.s_suppkey
""",
    tags=("analytics",),
)
def q_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier — quarterly revenue per supplier,
    keeping every supplier tied at the maximum (the original's
    revenue-view + scalar-max structure). The max comparison runs on
    the exact q4 LONG, so ties are exact equality, not float fuzz.

    Scale: the quarter filter prunes the fact scan; revenue
    partial-aggregates to one row per supplier; the scalar max is a
    partition-less window over the POST-AGGREGATE frame (|suppliers|
    rows — the one place a SinglePartition pass is bounded by a
    dimension's cardinality, documented trade: a separate 1-row max
    aggregate would re-reference the fact subtree and Spark would scan
    lineitem TWICE, which loses at any scale); the supplier name join
    broadcasts the dim. Locked: one fact FileScan only.
    """
    t = tables(spark, sf_dir, "lineitem", "supplier")
    from pyspark.sql.window import Window

    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_col()).alias("total_q4"))
    )
    w = Window.partitionBy()
    return (
        rev.withColumn("mx", F.max("total_q4").over(w))
        .filter(F.col("total_q4") == F.col("mx"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_q4").cast("double") / 10_000).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---- q_tpch_q17_shape ----------------------------------------------------- #


@register(
    "q_tpch_q17_shape",
    oracle="""
WITH cand AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#23' AND p.p_size <= 25
), st AS (
  SELECT *,
         SUM(CAST(round(l_quantity) AS BIGINT))
           OVER (PARTITION BY l_partkey) AS sq,
         count(*) OVER (PARTITION BY l_partkey) AS cnt
  FROM cand
)
SELECT CAST(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
            AS DOUBLE) / 100 AS total_revenue,
       count(*) AS n_lines
FROM st
WHERE CAST(round(l_quantity) AS BIGINT) * 5 * cnt < sq
""",
    tags=("analytics",),
)
def q_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — for one brand's
    parts (no p_container in the fixture; p_size <= 25 stands in),
    revenue of lineitems whose quantity is below 20%% of that part's
    average quantity. The correlated per-part average is a WINDOW over
    the part key after the dim semi-filter — ONE fact scan where the
    textbook form self-joins lineitem twice.

    Determinism: "qty < 0.2 * avg" is cross-multiplied to exact
    integers (qty * 5 * cnt < sum_qty; quantities are integral
    doubles, rounded to exact longs) — no float average, identical
    strictness both engines. NULL quantities drop from the comparison
    (NULL compare) and from sq (sum skips) identically; cnt counts
    them in both engines (count(*) over the partition).

    Scale: part is broadcast; the window partitions by l_partkey —
    bounded per-part row sets (lineitems per part is a per-key
    constant, no skew blowup); one exchange total.
    """
    t = tables(spark, sf_dir, "lineitem", "part")
    from pyspark.sql.window import Window

    p = t.part.filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 25)
    )
    cand = t.lineitem.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    qty = slong("l_quantity", 0)
    st = cand.select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        F.sum(qty).over(w).alias("sq"),
        F.count("*").over(w).alias("cnt"),
    )
    return st.filter(qty * 5 * F.col("cnt") < F.col("sq")).agg(
        (F.sum(slong("l_extendedprice", 2)).cast("double") / 100).alias(
            "total_revenue"
        ),
        F.count("*").alias("n_lines"),
    )


# ---- q_tpch_q19_shape ----------------------------------------------------- #


@register(
    "q_tpch_q19_shape",
    oracle=f"""
SELECT CAST(CAST(SUM({_REV}) AS BIGINT) AS DOUBLE) / 10000 AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
    tags=("analytics",),
)
def q_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under a DISJUNCTION of three
    (brand, size-band, quantity-band) conjunctions — the classic
    optimizer test for OR-predicate handling (no p_container /
    l_shipmode in the fixture; brand+size+quantity carry the shape).

    The win to lock: Catalyst derives the IMPLIED per-side predicates
    from the disjunction — p_brand IN (three brands) pushes into the
    part scan and the l_quantity envelope (>= 1, <= 30) into the
    lineitem scan — so both sides prune BEFORE the join even though no
    single conjunct applies globally. The full disjunction evaluates
    post-join as a residual.

    Scale: part broadcasts; the fact scan is pruned by the derived
    quantity envelope; one conditional aggregate row out.
    """
    t = tables(spark, sf_dir, "lineitem", "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        t.lineitem.join(
            F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey")
        )
        .filter(cond)
        .agg(
            (F.sum(_rev_col()).cast("double") / 10_000).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---- q_tpch_q21_shape ----------------------------------------------------- #


@register(
    "q_tpch_q21_shape",
    oracle="""
SELECT s.s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
""",
    tags=("analytics",),
)
def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept orders waiting — for
    finished orders with 2+ suppliers, find the SOLE supplier whose
    lineitems shipped late (no l_commitdate/l_receiptdate in the
    fixture; late = shipped >60 days after the order date), and count
    delayed orders per supplier, top 10.

    The textbook form (the oracle) probes lineitem THREE times —
    the base join, an EXISTS, and a correlated NOT EXISTS. The Spark
    plan replaces both subqueries with ONE per-order aggregate over the
    same joined frame: n_supp distinct suppliers, n_late distinct late
    suppliers, and the late supplier's key — an order qualifies iff
    n_supp >= 2 AND n_late = 1 (l1 is late and no OTHER supplier is,
    which is exactly EXISTS ^ NOT-EXISTS). The DuckDB differential
    proves the rewrite equivalent on every fixture. One fact scan and
    one orderkey exchange instead of three fact probes — the 100 TB
    difference.

    Scale: orders' status filter prunes at the scan; the per-order
    aggregate is bounded by lineitems-per-order; the supplier name
    attaches by broadcast; top-10 is TakeOrdered (no global sort).
    """
    t = tables(spark, sf_dir, "lineitem", "orders", "supplier")
    o = t.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lo = (
        t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    # optimization r14 (guide §2.3): the twin countDistincts planned an
    # Expand that doubled every joined fact row through the orderkey
    # exchange, followed by the two-phase distinct machinery. The
    # explicit (orderkey, suppkey) dedup computes the same quantities
    # with NO Expand and half the exchanged rows: after the dedup each
    # supplier appears once per order (late = "any of its items late",
    # exactly what countDistinct(when(late, suppkey)) counted), so
    # n_supp is a plain count, n_late a filtered count, and
    # late_suppkey the same max. Values identical — the DuckDB
    # differential pins the rewrite like the r12 one it extends.
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.count(F.when(F.col("late"), F.lit(1))).alias("n_late"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "late_suppkey"
        ),
    )
    blamed = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    )
    return (
        blamed.join(
            F.broadcast(t.supplier),
            F.col("late_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        # blamed carries one row per orderkey (it is a groupBy output),
        # so the distinct-orderkey count is a plain count — no second
        # Expand/two-phase distinct (r14)
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# ---- q_tpch_q8_shape ------------------------------------------------------ #


@register(
    "q_tpch_q8_shape",
    oracle=f"""
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS yr,
         {_REV} AS rev,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'AMERICA'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
)
SELECT yr,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN rev ELSE 0 END)
            AS BIGINT) AS nation_q4,
       CAST(SUM(rev) AS BIGINT) AS total_q4,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN rev ELSE 0 END)
                 AS HUGEINT) * 1000000 // SUM(rev) AS BIGINT) AS mkt_share_ppm
FROM vol
GROUP BY yr
ORDER BY yr
""",
    tags=("analytics",),
)
def q_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — of all PROMO-type parts
    sold to AMERICA-region customers, what ppm of each year's revenue
    came from NATION_6 suppliers (the fixture's nation names are
    synthetic; NATION_6 is in AMERICA). 8-table star, the widest join
    tree in the suite.

    Join order is selectivity-first (the q5 doctrine): the part filter
    broadcasts into the fact FIRST (PROMO is ~1/6 of parts — the
    biggest single pruner), then orders by key, then the
    customer->nation->region reduction broadcasts onto the customer
    join, then supplier+nation broadcast for the share dimension. The
    facts shuffle on join keys only; no fact is ever broadcast or
    sorted. The ppm share is HUGEINT/DECIMAL floor division on exact
    q4 longs.

    Scale: every dimension (part-filtered, nation, region, supplier)
    is bounded; the two fact shuffles (orderkey, custkey) are the
    irreducible data movement. Locked: >= 4 broadcast joins, no
    SortMergeJoin, no fact broadcast.
    """
    t = tables(
        spark,
        sf_dir,
        "lineitem",
        "part",
        "orders",
        "customer",
        "supplier",
        "nation",
        "region",
    )
    p = t.part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    n1 = t.nation.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    r = t.region.filter(F.col("r_name") == "AMERICA")
    amer_cust = (
        t.customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    n2 = t.nation.select("n_nationkey", "n_name")
    supp = (
        t.supplier.select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = (
        t.lineitem.join(
            F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(
            t.orders.select("o_orderkey", "o_orderdate", "o_custkey").hint(
                "shuffle_hash"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(amer_cust.hint("shuffle_hash"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("yr"),
            _rev_col().alias("rev"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_6", F.col("rev")).otherwise(
        F.lit(0)
    )
    return (
        vol.groupBy("yr")
        .agg(
            F.sum(nat).alias("nation_q4"),
            F.sum("rev").alias("total_q4"),
            F.expr(
                "CAST((CAST(sum(CASE WHEN supp_nation = 'NATION_6' THEN rev"
                " ELSE 0 END) AS DECIMAL(38,0)) * 1000000)"
                " DIV sum(rev) AS BIGINT)"
            ).alias("mkt_share_ppm"),
        )
        .orderBy("yr")
    )


# ---- derived partsupp (Q2/Q9/Q11/Q16/Q20) --------------------------------- #
# The fixture ships no partsupp table (TESTDATA.md), so the five shapes
# that need one derive it deterministically from part x supplier-count,
# in the spirit of dbgen's public generator (each part supplied by 4
# suppliers at a fixed stride; qty/cost from arithmetic on the keys):
#
#   stride        = S div 4 + 1            (S = count(supplier))
#   ps_suppkey_i  = (p_partkey + i*stride) % S          for i in 0..3
#   ps_availqty   = (p_partkey*7  + i*1009) % 9999  + 1
#   ps_supplycost = (p_partkey*31 + i*641 ) % 99900 + 100   [CENTS]
#
# stride is collision-free for the fixture's supplier counts (S = 10 /
# 100 / 1000: k*stride % S != 0 for k in 1..3 — asserted by a test at
# every sf), so each part gets 4 DISTINCT suppliers.  Supply cost stays
# an exact cents BIGINT end-to-end; no float ever enters the derived
# table, so both engines build bit-identical rows from the same parquet
# keys.  Cost: one part scan + a broadcast 1-row supplier count — the
# expansion is a row-local generator, no shuffle.

_PARTSUPP_CTE = """
  SELECT p.p_partkey AS ps_partkey,
         (p.p_partkey + i.i * (sc.S // 4 + 1)) % sc.S AS ps_suppkey,
         (p.p_partkey * 7 + i.i * 1009) % 9999 + 1 AS ps_availqty,
         (p.p_partkey * 31 + i.i * 641) % 99900 + 100 AS ps_supplycost_cents
  FROM part p
  CROSS JOIN (SELECT count(*) AS S FROM supplier) sc
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp frame (see module comment): 4 deterministic
    supplier rows per part, supply cost in exact cents.  One part scan,
    one broadcast 1-row supplier count, row-local explode — partsupp
    inherits part's partitioning and never shuffles to build."""
    s_cnt = table(spark, sf_dir, "supplier").agg(F.count("*").alias("S"))
    return (
        table(spark, sf_dir, "part")
        .select("p_partkey")
        .crossJoin(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            "S",
            F.explode(F.expr("array(0, 1, 2, 3)")).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr("(p_partkey + i * (S div 4 + 1)) % S").alias("ps_suppkey"),
            F.expr("(p_partkey * 7 + i * 1009) % 9999 + 1").alias(
                "ps_availqty"
            ),
            F.expr("(p_partkey * 31 + i * 641) % 99900 + 100").alias(
                "ps_supplycost_cents"
            ),
        )
    )


# ---- q_tpch_q2_shape ------------------------------------------------------ #


@register(
    "q_tpch_q2_shape",
    oracle=f"""
WITH partsupp AS ({_PARTSUPP_CTE}
), rs AS (
  SELECT ps.ps_partkey, ps.ps_supplycost_cents,
         s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
), mn AS (
  SELECT rs.*, min(ps_supplycost_cents) OVER (PARTITION BY ps_partkey)
           AS min_cost
  FROM rs
)
SELECT m.s_acctbal, m.s_name, m.n_name, p.p_partkey, p.p_type,
       m.ps_supplycost_cents
FROM mn m
JOIN part p ON p.p_partkey = m.ps_partkey
WHERE p.p_type = 'ECONOMY' AND p.p_size <= 10
  AND m.ps_supplycost_cents = m.min_cost
ORDER BY m.s_acctbal DESC, m.n_name, m.s_name, p.p_partkey
LIMIT 100
""",
    tags=("analytics",),
)
def q_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier — for each small ECONOMY
    part, the ASIA-region supplier offering the lowest supply cost,
    ranked by account balance.  The textbook form is a correlated
    scalar-min subquery re-scanning partsupp; this plan computes the
    regional partsupp frame ONCE and takes min(cost) OVER the part
    partition (the q_tpch_q15/q17 window-over-post-join doctrine) —
    no second fact pass.

    Determinism: supply costs are exact cents (derived, see module
    comment) and DISTINCT within a part (641*k % 99900 != 0), so the
    min row is unique per part; the final order has p_partkey as a
    unique tie-break, making LIMIT 100 stable.  s_acctbal is compared
    and output raw (byte-identical parquet doubles, never summed).

    Scale notes: partsupp derives row-locally from part (no shuffle);
    supplier/nation/region are broadcast dims; the only exchange is
    the ps_partkey hash for the window.  At 100 TB partsupp scales
    with part (4 rows each) — the window stays 4-rows-per-key.
    """
    ps = derived_partsupp(spark, sf_dir)
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rs = (
        ps.join(
            F.broadcast(
                sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
                .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
                .select("s_suppkey", "s_name", "s_acctbal", "n_name")
            ),
            F.col("s_suppkey") == F.col("ps_suppkey"),
        )
    )
    w = Window.partitionBy("ps_partkey")
    mn = rs.withColumn(
        "min_cost", F.min("ps_supplycost_cents").over(w)
    ).filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10)
    )
    return (
        mn.join(
            F.broadcast(p.select("p_partkey", "p_type")),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            "ps_supplycost_cents",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---- q_tpch_q9_shape ------------------------------------------------------ #


@register(
    "q_tpch_q9_shape",
    oracle=f"""
WITH partsupp AS ({_PARTSUPP_CTE}
)
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(SUM(
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
         - ps.ps_supplycost_cents * CAST(round(l.l_quantity) AS BIGINT) * 100
       ) AS BIGINT) AS DOUBLE) / 10000 AS profit
FROM lineitem l
JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                AND ps.ps_suppkey = l.l_suppkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, o_year DESC
""",
    tags=("analytics",),
)
def q_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit measure — per supplier
    nation per order year, the profit (discounted revenue minus supply
    cost) on '%red%' parts.  The 6-way join workout: lineitem joins
    the derived partsupp on the COMPOUND (partkey, suppkey) key plus
    part / supplier / nation / orders.

    Determinism: profit accumulates as exact scale-4 longs — revenue
    is cents x (100 - disc_cents), the cost term is cents x integral
    quantity x 100 — one cast to double at the very end.  Int64
    headroom: |term| <= ~1e9, safe past 1e9 rows; at larger scales the
    partial widens to DECIMAL(38,0) with no plan change.

    Scale notes: part ('%red%' pushdown), supplier, and nation
    broadcast; partsupp derives row-locally from part and is small
    enough to broadcast at fixture scale but is hash-joined on the
    compound key so the plan survives a partsupp that scales with a
    100 TB part table; lineitem/orders meet in a shuffle-hash join on
    orderkey — facts never broadcast.
    """
    li = table(spark, sf_dir, "lineitem")
    ps = derived_partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = _rev_col() - F.col("ps_supplycost_cents") * slong(
        "l_quantity", 0
    ) * F.lit(100)
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(
            ps.hint("shuffle_hash"),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(amount).cast("double") / 10_000).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---- q_tpch_q11_shape ----------------------------------------------------- #


@register(
    "q_tpch_q11_shape",
    oracle=f"""
WITH partsupp AS ({_PARTSUPP_CTE}
), v AS (
  SELECT ps.ps_partkey,
         CAST(SUM(ps.ps_supplycost_cents * ps.ps_availqty) AS BIGINT)
           AS value_cents
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_13')
  GROUP BY ps.ps_partkey
), t AS (
  SELECT v.*,
         CAST(SUM(CAST(value_cents AS HUGEINT)) OVER () AS HUGEINT)
           AS total_cents,
         count(*) OVER () AS n_parts
  FROM v
)
SELECT ps_partkey, value_cents
FROM t
WHERE CAST(value_cents AS HUGEINT) * n_parts
      > 2 * total_cents
ORDER BY value_cents DESC, ps_partkey
""",
    tags=("analytics",),
)
def q_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important stock identification — per part, the
    total supply value (cost x available qty) held by suppliers of a
    nation group, keeping parts whose value exceeds a corpus-relative
    threshold.  The spec's fraction is scale-dependent (0.0001/SF);
    this shape uses the scale-free equivalent "more than 2x the mean
    part value", so the output stays non-degenerate at every fixture
    sf.

    The textbook form computes the grand total in a second scalar
    subquery over partsupp — a full re-scan; this plan attaches
    total AND group count to the post-aggregate via an empty-frame
    window (the q_tpch_q15 doctrine): the threshold compare
    value * n_parts > 2 * total is exact integer arithmetic routed
    through DECIMAL(38,0)/HUGEINT (value_cents <= ~1e9 x 4, total up
    to parts x 4e9 — the product exceeds int64 past ~2k parts).

    Scale notes: partsupp derives row-locally; supplier/nation
    broadcast; ONE hash exchange on ps_partkey for the aggregate; the
    window runs over the parts-sized post-aggregate, not the fact.
    """
    ps = derived_partsupp(spark, sf_dir)
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13")
    )
    v = (
        ps.join(
            F.broadcast(
                sup.join(
                    F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
                ).select("s_suppkey")
            ),
            F.col("s_suppkey") == F.col("ps_suppkey"),
        )
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents") * F.col("ps_availqty")
            ).alias("value_cents")
        )
    )
    w_all = Window.partitionBy()
    t = v.select(
        "ps_partkey",
        "value_cents",
        F.sum(F.col("value_cents").cast("decimal(38,0)"))
        .over(w_all)
        .alias("total_cents"),
        F.count("*").over(w_all).alias("n_parts"),
    )
    return (
        t.filter(
            F.expr(
                "CAST(value_cents AS DECIMAL(38,0)) * n_parts"
                " > 2 * total_cents"
            )
        )
        .select("ps_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "ps_partkey")
    )


# ---- q_tpch_q16_shape ----------------------------------------------------- #


@register(
    "q_tpch_q16_shape",
    oracle=f"""
WITH partsupp AS ({_PARTSUPP_CTE}
)
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#2'
  AND p.p_type NOT LIKE 'PRO%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    tags=("analytics",),
)
def q_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: parts/supplier relationship — how many distinct
    suppliers can deliver each (brand, type, size) combination,
    excluding one brand, one type prefix, and a supplier denylist.
    The fixture has no s_comment, so the spec's complaints exclusion
    is adapted to s_acctbal < 0 (same NOT IN anti-join structure; the
    denylist key is never NULL, so the NOT IN stays a plain anti
    join — no null-aware expansion).

    Scale notes: partsupp derives row-locally from part; the part
    predicate trio prunes at the scan and broadcasts; the denylist is
    a broadcast LEFT ANTI join; the distinct-count shuffles once on
    the (brand, type, size) group key.  No fact-sized exchange beyond
    the single distinct aggregation.
    """
    ps = derived_partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").like("PRO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    deny = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .join(
            F.broadcast(deny),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---- q_tpch_q20_shape ----------------------------------------------------- #


@register(
    "q_tpch_q20_shape",
    oracle=f"""
WITH partsupp AS ({_PARTSUPP_CTE}
), sq AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
), excess AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM partsupp ps
  JOIN part p ON p.p_partkey = ps.ps_partkey
  JOIN sq ON sq.l_partkey = ps.ps_partkey
         AND sq.l_suppkey = ps.ps_suppkey
  WHERE p.p_name LIKE 'small%'
    AND 2 * ps.ps_availqty > sq.sum_qty
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN excess e ON e.ps_suppkey = s.s_suppkey
WHERE n.n_nationkey < 13
ORDER BY s.s_name
""",
    tags=("analytics",),
)
def q_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: potential part promotion — suppliers in a
    nation group holding MORE stock of 'small%' parts than half of
    what they actually shipped in 1996 (over-stocked suppliers worth
    a promotion).  The spec's correlated half-sum subquery becomes
    one (partkey, suppkey) aggregate of the year's lineitem joined
    against the derived partsupp; the comparison 2*availqty > sum_qty
    stays exact integer (quantities are integral doubles -> slong 0).

    As in the spec, a (part, supplier) pair with NO shipments drops
    out (the scalar subquery yields NULL there): the aggregate join
    is INNER, so unshipped stock never qualifies.

    Scale notes: the year filter prunes lineitem at the scan; ONE
    fact exchange on the compound (partkey, suppkey) key with
    map-side combine; partsupp derives row-locally, the 'small%'
    part filter broadcasts, the final supplier/nation attach is a
    broadcast over the DISTINCT excess suppliers (bounded by the
    supplier table).
    """
    li = table(spark, sf_dir, "lineitem")
    sq = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(slong("l_quantity", 0)).alias("sum_qty"))
    )
    ps = derived_partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    excess = (
        ps.join(
            F.broadcast(p.select("p_partkey")),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .join(
            sq.hint("shuffle_hash"),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(2 * F.col("ps_availqty") > F.col("sum_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    # nation group = the lower half of the key space: at sf0.001 only
    # 10 suppliers exist across 25 nations, so a 3-nation list (the
    # spec's single-nation selectivity) degenerates to 0 output rows —
    # the same shape, wider slice.
    nat = table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 13)
    return (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name")
    )
