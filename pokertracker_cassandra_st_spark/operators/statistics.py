"""Statistical aggregates: closed-form regression, entropy, crosstab.

The reference's read model is a plain projection (PlayerResourceIT.java:
131-139 asserts current state only), but any analytics engine serving
that projection also gets asked "how does Y move with X" — these
queries cover the descriptive-statistics tier: ordinary-least-squares
fits from exact co-moments, Shannon entropy of categorical
distributions, and contingency (crosstab) counts.

Cross-engine determinism: the regression is NOT computed with the
engines' regr_* aggregates (whose double accumulation order differs
between Spark and DuckDB in the last ulps); both sides aggregate the
five co-moments n, Σx, Σy, Σxy, Σxx in DECIMAL (exact, order
independent — x is an integral quantity, y a 2-decimal price, so the
products are exact 2-decimal values), then evaluate the identical
closed-form slope/intercept/r² expression in double. Same inputs, same
written expression tree => bit-identical IEEE results.

Scale notes: all three are single-pass groupBy aggregations with
map-side partial aggregation — the shuffle carries one row per group,
not per input row; no UDFs, everything in whole-stage codegen. The
crosstab pivot has a bounded column set (event types are an enum), so
the pivot is a fixed-width conditional aggregation, not a dynamic
explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table, tables
from pokertracker_cassandra_st_spark.dist_rank import range_prefix, range_row_number
from pokertracker_cassandra_st_spark.exprs import slong
from pokertracker_cassandra_st_spark.registry import register

# Co-moment sums: l_quantity is an integer-valued double (1..50),
# l_extendedprice a 2-decimal money value (< 1e6); x*y < 5e7 with 2
# decimals, and 6M rows at sf1 keep Σxy < 3e14 — DECIMAL(28,4) sums
# (Spark's promotion of DECIMAL(18,4)) have 10^24 headroom.
_DEC = "decimal(18,4)"


@register(
    "q_agg_regression",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(22,4))) AS DOUBLE) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m
ORDER BY l_returnflag
""",
    tags=("agg", "statistics"),
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of extendedprice ~ quantity per return flag, from exact
    decimal co-moments (slope, intercept, r²).

    One pass, one shuffle carrying five numbers per group; the
    closed-form arithmetic runs on bit-identical doubles in both
    engines, so the compare is exact, not tolerance-based.
    """
    li = table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sx"),
        F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast(_DEC))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(_DEC))
        .cast("double")
        .alias("sxx"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(
                "decimal(22,4)"
            )
        )
        .cast("double")
        .alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    ).orderBy("l_returnflag")


@register(
    "q_agg_entropy",
    oracle="""
WITH c AS (
  SELECT user_id % 10 AS cohort, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
), cp AS (
  SELECT cohort, event_type,
         CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY cohort) AS p
  FROM c
), t AS (
  SELECT cohort,
         count(*) AS n_types,
         list(p ORDER BY event_type) AS ps
  FROM cp
  GROUP BY cohort
)
SELECT cohort,
       n_types,
       round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ps),
                          (acc, x) -> acc + x * ln(x)), 6) AS entropy
FROM t
ORDER BY cohort
""",
    tags=("agg", "statistics"),
)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each cohort's event-type distribution.

    Counts are exact longs; the -Σ p·ln p reduction runs over at most
    |event_type| (an enum, 5 here) doubles, summed in event_type order
    on BOTH sides — Spark folds a sorted collected struct array with
    ``aggregate`` (deterministic left fold), DuckDB uses ordered-set
    SUM(... ORDER BY) — so the float result is bit-identical, rounded
    once for display. The bounded per-group array (enum-sized, not
    row-sized) keeps this safe at any row count.
    """
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy((F.col("user_id") % 10).alias("cohort"), "event_type").agg(
        F.count("*").alias("cnt")
    )
    t = c.groupBy("cohort").agg(
        F.sum("cnt").alias("total"),
        F.count("*").alias("n_types"),
        # entropy from a sorted, bounded (enum-sized) term list => the
        # double additions happen in one defined order on both engines
        F.array_sort(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("terms"),
    )
    p = lambda cnt, total: cnt.cast("double") / total  # noqa: E731
    return t.select(
        "cohort",
        "n_types",
        F.round(
            -F.aggregate(
                "terms",
                F.lit(0.0),
                lambda acc, s: acc
                + p(s["cnt"], F.col("total")) * F.log(p(s["cnt"], F.col("total"))),
            ),
            6,
        ).alias("entropy"),
    ).orderBy("cohort")


@register(
    "q_agg_crosstab",
    oracle="""
SELECT event_type,
       count(*) FILTER (WHERE value < 50) AS v_low,
       count(*) FILTER (WHERE value >= 50 AND value < 150) AS v_mid,
       count(*) FILTER (WHERE value >= 150 AND value < 300) AS v_high,
       count(*) FILTER (WHERE value >= 300) AS v_top,
       count(*) AS total
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("agg", "statistics"),
)
def q_agg_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table event_type × value band — the crosstab shape
    as fixed-width conditional counts (exact, enum-bounded columns; a
    dynamic pivot would make the schema data-dependent, which neither a
    100 TB plan nor a stable API wants).
    """
    ev = table(spark, sf_dir, "events")
    band = lambda lo, hi: F.count(  # noqa: E731
        F.when(
            (F.col("value") >= lo) & (F.col("value") < hi) if hi else F.col("value") >= lo,
            1,
        )
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.when(F.col("value") < 50, 1)).alias("v_low"),
            band(50, 150).alias("v_mid"),
            band(150, 300).alias("v_high"),
            band(300, None).alias("v_top"),
            F.count("*").alias("total"),
        )
        .orderBy("event_type")
    )


@register(
    "q_agg_ttest",
    oracle="""
WITH m AS (
  SELECT event_type,
         count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value * value AS DECIMAL(22,4))) AS DOUBLE) AS sxx
  FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
  GROUP BY event_type
), w AS (
  SELECT
    max(CASE WHEN event_type = 'click' THEN n END) AS n1,
    max(CASE WHEN event_type = 'click' THEN sx END) AS sx1,
    max(CASE WHEN event_type = 'click' THEN sxx END) AS sxx1,
    max(CASE WHEN event_type = 'view' THEN n END) AS n2,
    max(CASE WHEN event_type = 'view' THEN sx END) AS sx2,
    max(CASE WHEN event_type = 'view' THEN sxx END) AS sxx2
  FROM m
)
SELECT n1, n2,
       round(sx1 / n1, 6) AS mean1,
       round(sx2 / n2, 6) AS mean2,
       round((sx1 / n1 - sx2 / n2)
             / sqrt(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
                    + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2), 6) AS t_stat
FROM w
""",
    tags=("agg", "statistics"),
)
def q_agg_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic (click vs view values) from exact
    decimal co-moments — the A/B-test primitive, computed in one pass
    with map-side partial aggregation and evaluated as the identical
    closed-form expression in both engines (bit-exact, no tolerance).

    Scale notes: the shuffle carries three numbers per group; the pivot
    to one row is a bounded conditional aggregate. The same shape
    serves millions of experiment arms — group by (experiment, arm)
    instead of the two literals.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    )
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(22,4)"))
        .cast("double")
        .alias("sxx"),
    )
    pick = lambda t, c: F.max(F.when(F.col("event_type") == t, F.col(c)))  # noqa: E731
    w = m.agg(
        pick("click", "n").alias("n1"),
        pick("click", "sx").alias("sx1"),
        pick("click", "sxx").alias("sxx1"),
        pick("view", "n").alias("n2"),
        pick("view", "sx").alias("sx2"),
        pick("view", "sxx").alias("sxx2"),
    )
    n1, sx1, sxx1 = F.col("n1"), F.col("sx1"), F.col("sxx1")
    n2, sx2, sxx2 = F.col("n2"), F.col("sx2"), F.col("sxx2")
    var1 = (sxx1 - sx1 * sx1 / n1) / (n1 - 1)
    var2 = (sxx2 - sx2 * sx2 / n2) / (n2 - 1)
    return w.select(
        "n1",
        "n2",
        F.round(sx1 / n1, 6).alias("mean1"),
        F.round(sx2 / n2, 6).alias("mean2"),
        F.round((sx1 / n1 - sx2 / n2) / F.sqrt(var1 / n1 + var2 / n2), 6).alias(
            "t_stat"
        ),
    )


@register(
    "q_agg_gini",
    oracle="""
WITH spend AS (
  SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id
), ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i,
         count(*) OVER () AS n
  FROM spend
)
SELECT max(n) AS n_users,
       round(CAST(SUM((2 * i - n - 1) * CAST(round(x * 10000) AS BIGINT))
                  AS DOUBLE)
             / (max(n) * SUM(CAST(round(x * 10000) AS BIGINT))), 6) AS gini
FROM ranked
""",
    tags=("agg", "statistics"),
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user total value — the concentration /
    inequality measure behind "do 1% of users generate 90% of events"
    capacity questions, via the exact rank formula
    G = Σ (2i − n − 1)·xᵢ / (n·Σxᵢ) over ascending-ranked totals.

    Per-user totals are exact decimal sums quantized to scaled longs,
    so the big Σ runs in exact integers on both engines (order
    independent); the single divide at the end is the only float op.
    Ranking ties break on user_id.

    Scale notes: one groupBy shuffle, then the global rank runs as the
    TWO-PHASE distributed row_number (dist_rank.range_row_number:
    range-repartition on (x, user_id), 32-way parallel local ranks,
    broadcast bucket offsets) — no single-partition window anywhere;
    the total count rides a broadcast 1-row frame. Survives billions
    of keys with the cost profile of one extra small shuffle.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    spend = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("x")
    )
    n_row = spend.agg(F.count("*").alias("n"))
    ranked = range_row_number(spend, ["x", "user_id"], "i").crossJoin(
        F.broadcast(n_row)
    )
    xq = F.floor(F.col("x") * 10000 + F.lit(0.5)).cast("long")
    return ranked.agg(
        F.max("n").alias("n_users"),
        F.round(
            F.sum((2 * F.col("i") - F.col("n") - 1) * xq).cast("double")
            / (F.max("n") * F.sum(xq)),
            6,
        ).alias("gini"),
    )


@register(
    "q_agg_chisq",
    oracle="""
WITH cells AS (
  SELECT event_type,
         CASE WHEN value < 50 THEN 0 WHEN value < 150 THEN 1
              WHEN value < 300 THEN 2 ELSE 3 END AS band,
         count(*) AS o
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT SUM(o) AS n FROM cells
), rows_ AS (
  SELECT event_type, SUM(o) AS ro FROM cells GROUP BY event_type
), cols_ AS (
  SELECT band, SUM(o) AS co FROM cells GROUP BY band
), terms AS (
  SELECT c.event_type, c.band,
         (CAST(c.o AS DOUBLE) - CAST(r.ro * co.co AS DOUBLE) / t.n)
         * (CAST(c.o AS DOUBLE) - CAST(r.ro * co.co AS DOUBLE) / t.n)
         / (CAST(r.ro * co.co AS DOUBLE) / t.n) AS term
  FROM cells c
  JOIN rows_ r USING (event_type)
  JOIN cols_ co USING (band)
  CROSS JOIN tot t
), folded AS (
  SELECT list(term ORDER BY event_type, band) AS ts,
         count(*) AS n_cells
  FROM terms
)
SELECT n_cells,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ts),
                         (acc, x) -> acc + x), 6) AS chi_sq
FROM folded
""",
    tags=("agg", "statistics"),
)
def q_agg_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for event_type × value band:
    observed counts are exact longs, expected = row·col/total evaluated
    as the identical double expression, and the Σ(o−e)²/e reduction
    folds a SORTED, grid-bounded term list — same addition order on
    both engines, so the float result is bit-identical (the q_agg_ttest
    / q_agg_entropy doctrine applied to a two-margin test).

    Scale notes: three aggregations over the same cells CTE (cells,
    row margins, column margins) — Catalyst reuses the scan; margins
    are enum-bounded broadcasts. The fold is over ≤ |types|·|bands|
    terms regardless of row count.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    band = (
        F.when(F.col("value") < 50, 0)
        .when(F.col("value") < 150, 1)
        .when(F.col("value") < 300, 2)
        .otherwise(3)
    )
    cells = ev.groupBy("event_type", band.alias("band")).agg(
        F.count("*").alias("o")
    )
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("ro"))
    cols_ = cells.groupBy("band").agg(F.sum("o").alias("co"))
    tot = cells.agg(F.sum("o").alias("n"))
    e = (F.col("ro") * F.col("co")).cast("double") / F.col("n")
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    terms = (
        cells.join(rows_, "event_type")
        .join(F.broadcast(cols_), "band")
        .crossJoin(F.broadcast(tot))
        .select("event_type", "band", term.alias("term"))
    )
    folded = terms.agg(
        F.array_sort(
            F.collect_list(F.struct("event_type", "band", "term"))
        ).alias("ts"),
        F.count("*").alias("n_cells"),
    )
    return folded.select(
        "n_cells",
        F.round(
            F.aggregate("ts", F.lit(0.0), lambda acc, s: acc + s["term"]),
            6,
        ).alias("chi_sq"),
    )


@register(
    "q_agg_mannwhitney",
    oracle="""
WITH s AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
), mid AS (
  -- tie-corrected midrank × 2 stays integral: 2·mid = 2·rank + (ties−1)
  SELECT event_type,
         2 * rank() OVER (ORDER BY value) - 1
           + count(*) OVER (PARTITION BY value) AS midrank2
  FROM s
), u AS (
  SELECT
    count(*) FILTER (WHERE event_type = 'click') AS n1,
    count(*) FILTER (WHERE event_type = 'view') AS n2,
    SUM(midrank2) FILTER (WHERE event_type = 'click') AS r1x2
  FROM mid
)
SELECT n1, n2,
       CAST(r1x2 AS DOUBLE) / 2 AS rank_sum_click,
       CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u_click
FROM u
""",
    tags=("agg", "statistics"),
)
def q_agg_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) for click vs view values — the
    nonparametric twin of q_agg_ttest. Tie groups get the textbook
    midrank, carried as 2·midrank = 2·rank + (ties−1) so the whole
    computation is EXACT INTEGERS until the final display divide; no
    float comparison anywhere.

    Scale notes: NO row-level global sort — the sample first collapses
    to per-distinct-value counts (c_click, c_total: one partial-agg
    shuffle), and rank() of a tie group is just 1 + (rows strictly
    below), a distributed prefix sum over the value-ordered count frame
    (dist_rank.range_prefix, two-phase, 32-way parallel). The rank-sum
    is then Σ c_click(v) · midrank2(v) — a plain aggregate. Shuffled
    bytes track DISTINCT values, not sample size.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    )
    g = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c1"),
        F.count("*").alias("ct"),
    )
    # rows strictly below each value -> rank = before + 1;
    # 2·midrank = 2·rank − 1 + ties = 2·before + 1 + ties
    pre = range_prefix(g, ["value"], {"ct": "before"}, inclusive=False)
    midrank2 = 2 * F.col("before") + 1 + F.col("ct")
    u = pre.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("ct") - F.col("c1")).alias("n2"),
        F.sum(F.col("c1") * midrank2).alias("r1x2"),
    )
    return u.select(
        "n1",
        "n2",
        (F.col("r1x2").cast("double") / 2).alias("rank_sum_click"),
        ((F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)).cast("double") / 2).alias(
            "u_click"
        ),
    )


@register(
    "q_agg_kstest",
    oracle="""
WITH s AS (
  SELECT value, event_type = 'click' AS is1 FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
), n AS (
  SELECT count(*) FILTER (WHERE is1) AS n1,
         count(*) FILTER (WHERE NOT is1) AS n2
  FROM s
), steps AS (
  -- counts of each sample at-or-below every observed value via a
  -- RANGE frame (ties fully included -> deterministic regardless of
  -- intra-tie row order): D = max |c1*n2 - c2*n1| / (n1*n2), exact ints
  SELECT value,
         SUM(CASE WHEN is1 THEN 1 ELSE 0 END)
           OVER (ORDER BY value RANGE UNBOUNDED PRECEDING) AS c1,
         SUM(CASE WHEN is1 THEN 0 ELSE 1 END)
           OVER (ORDER BY value RANGE UNBOUNDED PRECEDING) AS c2
  FROM s
)
SELECT max(n1) AS n1, max(n2) AS n2,
       round(CAST(max(abs(c1 * (SELECT n2 FROM n) - c2 * (SELECT n1 FROM n)))
                  AS DOUBLE)
             / ((SELECT n1 FROM n) * (SELECT n2 FROM n)), 6) AS ks_d
FROM steps CROSS JOIN n
""",
    tags=("agg", "statistics"),
)
def q_agg_kstest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (click vs view value
    distributions): D = max |F̂₁ − F̂₂| over the pooled sorted sample,
    computed as max |c₁·n₂ − c₂·n₁| / (n₁·n₂) — EXACT integers until
    the one display divide, so no float comparison anywhere (same
    doctrine as q_agg_mannwhitney). RANGE frames make every row carry
    its full tie group's counts, so each row is a valid CDF evaluation
    point and intra-tie row order cannot perturb the max.

    Scale notes: NO row-level global sort — the pooled sample first
    collapses to per-distinct-value counts (one partial-agg shuffle:
    each value is its own tie group, so the grouped frame IS the set of
    valid CDF evaluation points), then both running counts come from
    ONE two-phase distributed prefix sum over the value order
    (dist_rank.range_prefix, 32-way parallel). Shuffled bytes track
    DISTINCT values, not sample size. The KS distance is the standard
    distribution-drift monitor a feature pipeline runs between
    snapshots.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    )
    s = ev.select("value", (F.col("event_type") == "click").alias("is1"))
    g = s.groupBy("value").agg(
        F.sum(F.when(F.col("is1"), 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("is1"), 0).otherwise(1)).alias("d2"),
    )
    steps = range_prefix(g, ["value"], {"d1": "c1", "d2": "c2"}, inclusive=True)
    n = g.agg(
        F.sum("d1").alias("n1"),
        F.sum("d2").alias("n2"),
    )
    return (
        steps.crossJoin(F.broadcast(n))
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.round(
                F.max(
                    F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
                ).cast("double")
                / (F.max("n1") * F.max("n2")),
                6,
            ).alias("ks_d"),
        )
    )


@register(
    "q_agg_skewkurt",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity
                       AS DECIMAL(22,4))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity
                       AS DECIMAL(26,4))) AS DOUBLE) AS s4
  FROM lineitem
  GROUP BY l_returnflag
), c AS (
  SELECT l_returnflag, n,
         s2 - s1 * s1 / n AS m2c,
         -- n-powers through DOUBLE: n*n*n overflows INT64 once a
         -- group passes ~2.1M rows (found by the round-12 100x sweep:
         -- DuckDB errors loudly, Spark non-ANSI would wrap silently).
         -- Both engines build the identical double from the same n.
         s3 - 3 * s1 * s2 / n
            + 2 * s1 * s1 * s1 / (CAST(n AS DOUBLE) * n) AS m3c,
         s4 - 4 * s1 * s3 / n
            + 6 * s1 * s1 * s2 / (CAST(n AS DOUBLE) * n)
            - 3 * s1 * s1 * s1 * s1 / (CAST(n AS DOUBLE) * n * n) AS m4c
  FROM m
)
SELECT l_returnflag, n,
       round((m3c / n) / pow(m2c / n, 1.5), 6) AS skewness,
       round(n * m4c / (m2c * m2c) - 3, 6) AS excess_kurtosis
FROM c
ORDER BY l_returnflag
""",
    tags=("agg", "statistics"),
)
def q_agg_skewkurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis of l_quantity per return flag from
    exact decimal raw moments (same doctrine as q_agg_regression: the
    engines' own skewness/kurtosis aggregates accumulate doubles in
    different orders AND disagree on sample-vs-population definitions,
    so both sides sum s1..s4 exactly in DECIMAL and evaluate the
    identical central-moment closed form in double — bit-identical).

    Scale: one pass, one shuffle carrying four decimal sums + a count
    per group (map-side partial agg); q^4 <= 6.25e6 with 2 decimals, so
    DECIMAL(26,4) holds the sf1e5 sum with orders of magnitude to spare.
    """
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q.cast("decimal(18,4)")).cast("double").alias("s1"),
        F.sum((q * q).cast("decimal(18,4)")).cast("double").alias("s2"),
        F.sum((q * q * q).cast("decimal(22,4)")).cast("double").alias("s3"),
        F.sum((q * q * q * q).cast("decimal(26,4)")).cast("double").alias("s4"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s3, s4 = F.col("s3"), F.col("s4")
    # n-powers through DOUBLE — mirrors the oracle exactly; n*n*n in
    # LONG wraps silently past ~2.1M rows per group (100x sweep find)
    n_d = n.cast("double")
    m2c = s2 - s1 * s1 / n
    m3c = s3 - 3 * s1 * s2 / n + 2 * s1 * s1 * s1 / (n_d * n)
    m4c = (
        s4
        - 4 * s1 * s3 / n
        + 6 * s1 * s1 * s2 / (n_d * n)
        - 3 * s1 * s1 * s1 * s1 / (n_d * n * n)
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round((m3c / n) / F.pow(m2c / n, F.lit(1.5)), 6).alias("skewness"),
        F.round(n * m4c / (m2c * m2c) - 3, 6).alias("excess_kurtosis"),
    ).orderBy("l_returnflag")


@register(
    "q_agg_corr_matrix",
    oracle="""
WITH m AS (
  SELECT count(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sq,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sd,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sqq,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(22,4))) AS DOUBLE) AS spp,
         CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sdd,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sqp,
         CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sqd,
         CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS spd
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL
)
SELECT p.x_col, p.y_col, m.n,
       round((m.n * p.sxy - p.sx * p.sy)
             / sqrt((m.n * p.sxx - p.sx * p.sx) * (m.n * p.syy - p.sy * p.sy)),
             6) AS pearson_r
FROM m, LATERAL (
  VALUES ('quantity', 'extendedprice', sq, sp, sqq, spp, sqp),
         ('quantity', 'discount',      sq, sd, sqq, sdd, sqd),
         ('extendedprice', 'discount', sp, sd, spp, sdd, spd)
) AS p(x_col, y_col, sx, sy, sxx, syy, sxy)
ORDER BY p.x_col, p.y_col
""",
    tags=("agg", "statistics"),
)
def q_agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over three lineitem measures
    (quantity, extendedprice, discount) — the feature-correlation
    diagnostic run before any model fit, computed like q_agg_regression
    from exact decimal co-moments instead of the engines' corr()
    (whose double accumulation order diverges cross-engine in the last
    ulps).

    Scale shape: ONE pass over the fact table aggregating 9 co-moment
    sums + n into a single row (map-side partials, codegen), then the
    3 pair rows are unpivoted from that broadcast-size frame and the
    closed-form r evaluates per pair — adding measures grows the
    aggregate row quadratically (k²/2 sums) but never adds a pass or a
    shuffle. NULL rows are excluded wholesale (listwise deletion) so
    every pair sees the same n, as an adversarial fixture with NULLs
    requires.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_discount").isNotNull()
    )
    dec = lambda c: F.sum(c.cast(_DEC)).cast("double")
    m = li.agg(
        F.count("*").alias("n"),
        dec(F.col("l_quantity")).alias("sq"),
        dec(F.col("l_extendedprice")).alias("sp"),
        dec(F.col("l_discount")).alias("sd"),
        dec(F.col("l_quantity") * F.col("l_quantity")).alias("sqq"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(
                "decimal(22,4)"
            )
        )
        .cast("double")
        .alias("spp"),
        dec(F.col("l_discount") * F.col("l_discount")).alias("sdd"),
        dec(F.col("l_quantity") * F.col("l_extendedprice")).alias("sqp"),
        dec(F.col("l_quantity") * F.col("l_discount")).alias("sqd"),
        dec(F.col("l_extendedprice") * F.col("l_discount")).alias("spd"),
    )
    pairs = m.select(
        "n",
        F.expr(
            "stack(3, "
            "'quantity', 'extendedprice', sq, sp, sqq, spp, sqp, "
            "'quantity', 'discount',      sq, sd, sqq, sdd, sqd, "
            "'extendedprice', 'discount', sp, sd, spp, sdd, spd) "
            "AS (x_col, y_col, sx, sy, sxx, syy, sxy)"
        ),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return pairs.select(
        "x_col",
        "y_col",
        "n",
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("pearson_r"),
    ).orderBy("x_col", "y_col")


# ---- q_agg_wilson ----------------------------------------------------------- #
# Wilson score interval — the binomial confidence interval an A/B or
# quality dashboard should use instead of the normal approximation
# (which collapses at small n or extreme rates). Inputs are exact
# integer (successes, trials) per group; the interval is the same
# closed-form double expression on both engines (z = 1.96), rounded
# at 1e-6 with the signed-zero-safe epilogue (lower bounds clamp at
# 0 exactly where -0.0 could appear).


@register(
    "q_agg_wilson",
    oracle="""
WITH c AS (
  SELECT event_type,
         count(*) AS n,
         CAST(SUM(CASE WHEN value > 250 THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n, k,
       round(CAST(k AS DOUBLE) / n, 6) + 0.0 AS rate,
       round(greatest(0.0,
         (CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
          - 1.96 * sqrt((CAST(k AS DOUBLE) / n * (1 - CAST(k AS DOUBLE) / n)
                         + 1.96 * 1.96 / (4 * n)) / n))
         / (1 + 1.96 * 1.96 / n)), 6) + 0.0 AS wilson_lo,
       round(least(1.0,
         (CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
          + 1.96 * sqrt((CAST(k AS DOUBLE) / n * (1 - CAST(k AS DOUBLE) / n)
                         + 1.96 * 1.96 / (4 * n)) / n))
         / (1 + 1.96 * 1.96 / n)), 6) + 0.0 AS wilson_hi
FROM c
""",
    tags=("agg", "stats"),
)
def q_agg_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 'high-value' rate (value > 250) with its 95% Wilson
    score interval: exact integer (k, n) from one aggregation pass,
    then the closed-form interval — identical double expression both
    engines, 6dp round with the `+ 0.0` signed-zero epilogue, bounds
    clamped into [0, 1].

    Scale notes: one map-side-combined groupBy over 5 types; the
    interval math runs on the aggregated rows. This is the
    uncertainty-aware twin of the plain rates in q_dq_expectations —
    at 100 TB the extra cost over a raw rate is zero.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") > 250).cast("long")).alias("k"),
    )
    p = F.col("k").cast("double") / F.col("n")
    z2 = 1.96 * 1.96
    n = F.col("n")
    center = p + z2 / (2 * n)
    margin = 1.96 * F.sqrt((p * (1 - p) + z2 / (4 * n)) / n)
    denom = 1 + z2 / n
    return c.select(
        "event_type",
        "n",
        "k",
        (F.round(p, 6) + F.lit(0.0)).alias("rate"),
        (
            F.round(F.greatest(F.lit(0.0), (center - margin) / denom), 6)
            + F.lit(0.0)
        ).alias("wilson_lo"),
        (
            F.round(F.least(F.lit(1.0), (center + margin) / denom), 6)
            + F.lit(0.0)
        ).alias("wilson_hi"),
    )


# ---- q_agg_pareto ------------------------------------------------------------ #
# Revenue concentration (Pareto / "80-20") by customer decile: rank
# customers by lifetime spend, split into 10 equal-count tiers with the
# EXPLICIT integer formula 1 + ((i-1)*10) div n (identical in both
# engines — ntile() remainder placement is engine-defined lore we avoid
# relying on), then per-decile revenue and the cumulative share curve.


@register(
    "q_agg_pareto",
    oracle="""
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY o_custkey
), rk AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents DESC, o_custkey) AS i,
         count(*) OVER () AS n,
         SUM(cents) OVER () AS tot
  FROM rev
), d AS (
  SELECT 1 + ((i - 1) * 10) // n AS decile, cents, tot FROM rk
)
SELECT decile,
       count(*) AS n_customers,
       CAST(SUM(cents) AS DOUBLE) / 100 AS decile_revenue,
       round(100.0 * CAST(SUM(SUM(cents)) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(max(tot) AS DOUBLE), 6) AS cum_share_pct
FROM d GROUP BY decile ORDER BY decile
""",
    tags=("agg", "stats"),
)
def q_agg_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-revenue concentration curve: per-customer spend in
    exact integer cents, global rank via the two-phase distributed
    row_number (no single-task window), decile membership from the
    explicit ``1 + ((i-1)*10) div n`` formula (engine-portable, unlike
    ntile's remainder rule), then a 10-row cumulative-share window.

    Scale notes: the only per-row shuffle is the o_custkey groupBy;
    the rank is dist_rank's bucketed two-phase pass (value-derived
    buckets, a 32-row offset broadcast); everything after lives on 10
    rows. Cents stay inside int64 up to ~9e16 dollars of total
    revenue — documented headroom for 100 TB fact tables.
    """
    rev = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .groupBy("o_custkey")
        .agg(F.sum(slong("o_totalprice", 2)).alias("cents"))
        .withColumn("neg", -F.col("cents"))
    )
    stats = rev.agg(
        F.count("*").alias("n"), F.sum("cents").alias("tot")
    )
    ranked = range_row_number(rev, ["neg", "o_custkey"], "i").crossJoin(
        F.broadcast(stats)
    )
    d = ranked.withColumn("decile", F.expr("1 + ((i - 1) * 10) div n"))
    g = d.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("dc"),
        F.max("tot").alias("tot"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        "decile",
        "n_customers",
        (F.col("dc").cast("double") / 100).alias("decile_revenue"),
        F.round(
            F.lit(100.0)
            * F.sum("dc").over(w).cast("double")
            / F.col("tot").cast("double"),
            6,
        ).alias("cum_share_pct"),
    ).orderBy("decile")


# ---- q_agg_hhi --------------------------------------------------------------- #
# Herfindahl-Hirschman concentration index per market (region): the
# sum of squared revenue shares x 10000. Computed EXACTLY as
# 10000 * sum(cents^2) / tot^2 — integer cents squared in DECIMAL (no
# double accumulation across participants, whose ordering differs
# between engines), one double division at the end.


@register(
    "q_agg_hhi",
    oracle="""
WITH nat AS (
  SELECT r.r_name, n.n_name,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE o.o_totalprice IS NOT NULL
  GROUP BY r.r_name, n.n_name
)
SELECT r_name,
       count(*) AS n_nations,
       CAST(SUM(cents) AS DOUBLE) / 100 AS total_revenue,
       round(10000 * CAST(SUM(CAST(cents AS DECIMAL(19,0))
                               * CAST(cents AS DECIMAL(19,0))) AS DOUBLE)
             / (CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)),
             6) AS hhi
FROM nat GROUP BY r_name ORDER BY r_name
""",
    tags=("agg", "stats"),
)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration HHI per region over nation revenue shares:
    10000 * sum(share^2), where share = nation_cents / region_cents.
    The squared terms are exact DECIMAL(38,0) products of int64 cents
    (sums over participants are order-independent); the single final
    division is the only double step, so both engines agree bitwise.

    Scale notes: one fact shuffle (orders x customer; AQE broadcasts
    customer at fixture scale, sort-merge at 100 TB), nation/region
    broadcast, then two tiny aggregations (25 -> 5 rows). cents^2 fits
    DECIMAL(38,0) up to ~1e19 dollars per nation.
    """
    t = tables(spark, sf_dir, "orders", "customer", "nation", "region")
    nat = (
        t.orders.filter(F.col("o_totalprice").isNotNull())
        .join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .join(
            F.broadcast(t.nation),
            t.customer.c_nationkey == t.nation.n_nationkey,
        )
        .join(
            F.broadcast(t.region),
            t.nation.n_regionkey == t.region.r_regionkey,
        )
        .groupBy("r_name", "n_name")
        .agg(F.sum(slong("o_totalprice", 2)).alias("cents"))
    )
    sq = F.col("cents").cast("decimal(19,0)")
    return (
        nat.groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            (F.sum("cents").cast("double") / 100).alias("total_revenue"),
            F.round(
                F.lit(10000)
                * F.sum(sq * sq).cast("double")
                / (
                    F.sum("cents").cast("double")
                    * F.sum("cents").cast("double")
                ),
                6,
            ).alias("hhi"),
        )
        .orderBy("r_name")
    )


# ---- q_agg_ratio_ci ---------------------------------------------------------- #
# Delta-method confidence interval for a RATIO metric (effective
# discount rate = sum(discount dollars)/sum(gross dollars)) — the
# experimentation-platform staple that plain mean CIs get wrong. All
# five co-moments accumulate in EXACT decimal (price is 2-decimal,
# discount 2-decimal, so every product is a <= 8-decimal exact value);
# the closed-form ratio/variance expression is the identical double
# tree on both engines afterwards.


@register(
    "q_agg_ratio_ci",
    oracle="""
WITH rows_ AS (
  SELECT l_returnflag,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(6,4)) AS DECIMAL(12,4)) AS y
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
), m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(25,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(25,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(y * y AS DECIMAL(25,8))) AS DOUBLE) AS syy
  FROM rows_ GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(sy / sx, 6) AS disc_rate,
       round(sqrt(((syy - 2 * (sy / sx) * sxy
                    + (sy / sx) * (sy / sx) * sxx) / (n - 1)) / n)
             / (sx / n), 8) AS se,
       round(sy / sx - 1.96 * (sqrt(((syy - 2 * (sy / sx) * sxy
                    + (sy / sx) * (sy / sx) * sxx) / (n - 1)) / n)
             / (sx / n)), 6) AS ci_lo,
       round(sy / sx + 1.96 * (sqrt(((syy - 2 * (sy / sx) * sxy
                    + (sy / sx) * (sy / sx) * sxx) / (n - 1)) / n)
             / (sx / n)), 6) AS ci_hi
FROM m ORDER BY l_returnflag
""",
    tags=("agg", "stats"),
)
def q_agg_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective discount rate per return flag with its 95% delta-method
    CI. The ratio-of-sums estimator R = Σy/Σx has
    Var(R) ≈ s²/(n·x̄²) with s² = (Σy² − 2RΣxy + R²Σx²)/(n−1) (the
    residual y−Rx has exact zero mean by construction). Co-moments are
    exact decimals; R, s², SE evaluate as the same written double
    expression both engines — bit-identical before the final rounds.

    Scale notes: one map-side-combined groupBy carrying six numbers
    per group; decimal partials stay in whole-stage codegen. The CI
    adds zero shuffle cost over the plain rate.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_discount").isNotNull()
    )
    x = F.col("l_extendedprice").cast("decimal(12,2)")
    y = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * F.col("l_discount").cast("decimal(6,4)")
    ).cast("decimal(12,4)")
    m = li.select(
        "l_returnflag", x.alias("x"), y.alias("y")
    ).groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(25,4)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(25,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(25,8)"))
        .cast("double")
        .alias("syy"),
    )
    r = F.col("sy") / F.col("sx")
    s2 = (
        F.col("syy") - 2 * r * F.col("sxy") + r * r * F.col("sxx")
    ) / (F.col("n") - 1)
    se = F.sqrt(s2 / F.col("n")) / (F.col("sx") / F.col("n"))
    return m.select(
        "l_returnflag",
        "n",
        F.round(r, 6).alias("disc_rate"),
        F.round(se, 8).alias("se"),
        F.round(r - 1.96 * se, 6).alias("ci_lo"),
        F.round(r + 1.96 * se, 6).alias("ci_hi"),
    ).orderBy("l_returnflag")


# ---- q_agg_theil ------------------------------------------------------------- #
# Theil T inequality index per market segment — the decomposable
# entropy-based companion to q_agg_gini. Each customer's term
# (x/mu)*ln(x/mu) is quantized to a 1e-12 scaled long (the KL / PSI
# doctrine: double sums over many rows are not associative) and summed
# in DECIMAL(38,0) so the aggregate is exact and order-independent at
# any customer count.


@register(
    "q_agg_theil",
    oracle="""
WITH spend AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_totalprice IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT segment, count(*) AS n,
         CAST(SUM(cents) AS DOUBLE) / count(*) AS mu
  FROM spend GROUP BY segment
), terms AS (
  SELECT s.segment, m.n,
         CAST(round((CAST(s.cents AS DOUBLE) / m.mu)
                    * ln(CAST(s.cents AS DOUBLE) / m.mu)
                    * 1e12) AS BIGINT) AS tq
  FROM spend s JOIN m ON s.segment = m.segment
)
SELECT segment, max(n) AS n_customers,
       round(CAST(SUM(CAST(tq AS DECIMAL(38,0))) AS DOUBLE) / 1e12
             / max(n), 6) AS theil_t
FROM terms GROUP BY segment ORDER BY segment
""",
    tags=("agg", "stats"),
)
def q_agg_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of customer-spend inequality per market segment:
    T = (1/n) sum (x/mu) ln(x/mu). Spend is exact integer cents; the
    segment mean is one deterministic double division; each customer's
    term quantizes at 1e-12 before an exact DECIMAL(38,0) sum, so the
    cross-engine compare never meets an associativity-ordered double
    sum (same doctrine as q_text_kl_divergence / q_dq_drift_psi).

    Scale notes: one fact shuffle (custkey groupBy), one broadcastable
    segment-means frame (5 rows), one map-side-combined segment
    aggregate. Unlike q_agg_gini this needs NO global rank — Theil is
    the inequality measure you can compute in a single pass, which is
    why pipelines prefer it at 100 TB.
    """
    t = tables(spark, sf_dir, "orders", "customer")
    spend = (
        t.orders.filter(F.col("o_totalprice").isNotNull())
        .join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.sum(slong("o_totalprice", 2)).alias("cents"))
    )
    m = spend.groupBy("segment").agg(
        F.count("*").alias("n"),
        (F.sum("cents").cast("double") / F.count("*")).alias("mu"),
    )
    x = F.col("cents").cast("double") / F.col("mu")
    tq = (
        F.signum(x * F.log(x))
        * F.floor(F.abs(x * F.log(x)) * 1e12 + F.lit(0.5))
    ).cast("long")
    terms = spend.join(F.broadcast(m), "segment").select(
        "segment", "n", tq.alias("tq")
    )
    return (
        terms.groupBy("segment")
        .agg(
            F.max("n").alias("n_customers"),
            F.round(
                F.sum(F.col("tq").cast("decimal(38,0)")).cast("double")
                / 1e12
                / F.max("n"),
                6,
            ).alias("theil_t"),
        )
        .orderBy("segment")
    )


@register(
    "q_agg_lorenz",
    oracle="""
WITH spend AS (
  SELECT user_id,
         CAST(round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                    * 10000) AS BIGINT) AS xq
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id
), ranked AS (
  SELECT xq, row_number() OVER (ORDER BY xq, user_id) AS i,
         count(*) OVER () AS n
  FROM spend
), dec AS (
  SELECT 1 + ((i - 1) * 10) // n AS decile,
         count(*) AS n_users,
         CAST(SUM(xq) AS BIGINT) AS dx
  FROM ranked GROUP BY 1
), cum AS (
  SELECT decile, n_users, dx,
         CAST(SUM(dx) OVER (ORDER BY decile) AS BIGINT) AS cx,
         (SELECT CAST(SUM(dx) AS BIGINT) FROM dec) AS tot
  FROM dec
)
SELECT decile, n_users,
       (1000000 * dx) // tot AS spend_ppm,
       (1000000 * cx) // tot AS cum_ppm
FROM cum ORDER BY decile
""",
    tags=("agg", "statistics"),
)
def q_agg_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve by spend decile: users ascending-ranked by total
    value, cut into ten EXACT rank deciles, each reporting its share
    and cumulative share of total spend in integer ppm — the curve
    behind q_agg_gini's single coefficient ("the bottom 50% hold 9%,
    the top decile holds 41%").

    Determinism: per-user totals are exact decimal sums quantized to
    scaled longs; decile assignment uses the explicit
    1 + ((i-1)*10) div n formula (ntile's remainder placement is
    engine lore — the q_win_ntile lesson); every share is integer
    arithmetic, no floats anywhere.

    Scale notes: one groupBy shuffle, then the global rank runs as the
    TWO-PHASE distributed row_number (dist_rank.range_row_number) — no
    single-partition window over data-sized rows; the decile rollup
    carries 10 rows, where the cumulative window is free.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    spend = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("x")
    )
    xq = F.floor(F.col("x") * 10000 + F.lit(0.5)).cast("long")
    spend = spend.select("user_id", xq.alias("xq"))
    n_row = spend.agg(F.count("*").alias("n"))
    ranked = range_row_number(spend, ["xq", "user_id"], "i").crossJoin(
        F.broadcast(n_row)
    )
    dec = (
        ranked.select(
            # integral div, not double `/`: at >2^53 users the double
            # quotient loses ulps and truncation lands in the wrong tile
            F.expr("1 + ((i - 1) * 10) div n").alias("decile"),
            "xq",
        )
        .groupBy("decile")
        .agg(F.count("*").alias("n_users"), F.sum("xq").alias("dx"))
    )
    tot = dec.agg(F.sum("dx").alias("tot"))
    w = Window.orderBy("decile")
    return (
        dec.withColumn("cx", F.sum("dx").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            F.expr("(1000000 * dx) div tot").alias("spend_ppm"),
            F.expr("(1000000 * cx) div tot").alias("cum_ppm"),
        )
        .orderBy("decile")
    )


# ---- q_agg_jackknife_ci ----------------------------------------------------- #
# Error bars without resampling: the delete-one-block jackknife is the
# production way to put a CI on a metric over 100 TB — one extra
# grouping key, zero extra scans, no RNG to keep in sync across
# engines (a bootstrap's resampling draws are engine lore; the
# jackknife is a closed formula over block partials).


@register(
    "q_agg_jackknife_ci",
    oracle="""
WITH b AS (
  SELECT event_type, user_id % 20 AS blk,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s_b,
         count(*) AS n_b
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, user_id % 20
), g AS (
  SELECT event_type,
         CAST(SUM(s_b) AS BIGINT) AS s,
         CAST(SUM(n_b) AS BIGINT) AS n,
         count(*) AS k
  FROM b GROUP BY event_type
), loo AS (
  SELECT b.event_type,
         CAST(round(1000000 * (CAST(g.s - b.s_b AS DOUBLE) / 100.0)
                    / CAST(g.n - b.n_b AS DOUBLE)) AS BIGINT) AS q
  FROM b JOIN g ON b.event_type = g.event_type
  WHERE g.k >= 2
), jk AS (
  SELECT event_type,
         CAST(SUM(q) AS BIGINT) AS sq,
         CAST(SUM(CAST(q AS HUGEINT) * q) AS BIGINT) AS sq2,
         count(*) AS k
  FROM loo GROUP BY event_type
)
SELECT g.event_type, g.n AS n_events, g.k AS n_blocks,
       CAST(g.s AS DOUBLE) / 100.0 / g.n AS mean_value,
       sqrt((jk.k - 1.0) / jk.k
            * (CAST(jk.sq2 AS DOUBLE)
               - CAST(jk.sq AS DOUBLE) * CAST(jk.sq AS DOUBLE) / jk.k)
            ) / 1000000.0 AS se_jack,
       CAST(g.s AS DOUBLE) / 100.0 / g.n
         - 1.96 * (sqrt((jk.k - 1.0) / jk.k
                        * (CAST(jk.sq2 AS DOUBLE)
                           - CAST(jk.sq AS DOUBLE) * CAST(jk.sq AS DOUBLE)
                             / jk.k)) / 1000000.0) AS ci_lo,
       CAST(g.s AS DOUBLE) / 100.0 / g.n
         + 1.96 * (sqrt((jk.k - 1.0) / jk.k
                        * (CAST(jk.sq2 AS DOUBLE)
                           - CAST(jk.sq AS DOUBLE) * CAST(jk.sq AS DOUBLE)
                             / jk.k)) / 1000000.0) AS ci_hi
FROM g JOIN jk ON g.event_type = jk.event_type
ORDER BY g.event_type
""",
    tags=("agg", "statistics"),
)
def q_agg_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-block jackknife confidence interval for the mean
    event value per type: split users into 20 hash blocks, compute each
    block's exact (sum_cents, count) partial, derive the 20
    leave-one-out means from the per-type total MINUS the block — a
    closed-form variance estimate with no resampling and no RNG,
    the production error bar at any scale.

    Determinism: block partials are exact scaled longs; each
    leave-one-out mean is the SAME int64 pair divided in DOUBLE on both
    engines, then quantized to exact micro-units (q). The jackknife
    variance runs on Σq and Σq² — Σq² accumulates through
    DECIMAL(38,0)/HUGEINT (q up to ~5e8 squared is ~2.4e17; 20 blocks
    approaches int64's edge — the cast-first doctrine) and lands back
    in BIGINT, so every output double derives from the same exact
    integers by the same IEEE expression. Blocks have n_b >= 1 by
    construction, so k >= 2 guarantees N - n_b >= 1 (no zero
    denominator); single-block types drop (se undefined).

    Scale notes: ONE fact scan and one (type, block) exchange with
    map-side combine; the <=20 block partials per type collect into an
    array on the types-sized frame and every downstream term (totals,
    leave-one-out means, Σq, Σq²) is row-local higher-order-function
    arithmetic — no self-referencing subtree for Spark to rescan, no
    joins, nothing data-sized after the first partial aggregate.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # `%`, not pmod: Spark's % follows the dividend's sign exactly like
    # DuckDB's %, so negative user_ids land in the SAME block on both
    # engines (pmod is always non-negative and would silently diverge;
    # ADVICE r11).  Current fixtures have non-negative ids either way.
    b = ev.groupBy(
        "event_type", F.expr("user_id % 20").alias("blk")
    ).agg(
        F.sum(slong("value", 2)).alias("s_b"),
        F.count("*").alias("n_b"),
    )
    # collect the <=20 block partials per type: every downstream term is
    # row-local array arithmetic on a types-sized frame — ONE fact scan,
    # two bounded exchanges, no self-referencing subtrees to rescan.
    g = b.groupBy("event_type").agg(
        F.collect_list(F.struct("s_b", "n_b")).alias("parts")
    )
    g = g.select(
        "event_type",
        F.expr(
            "aggregate(parts, CAST(0 AS BIGINT), (a, x) -> a + x.s_b)"
        ).alias("s"),
        F.expr(
            "aggregate(parts, CAST(0 AS BIGINT), (a, x) -> a + x.n_b)"
        ).alias("n"),
        F.size("parts").cast("long").alias("k"),
        F.col("parts"),
    ).filter(F.col("k") >= 2)
    # leave-one-out means quantized to exact micro-units (the slong
    # rounding inlined: signum * floor(|x| * 1e0 + 0.5) on the SAME
    # IEEE double both engines compute from the same int64 pair)
    g = g.select(
        "event_type",
        "s",
        "n",
        "k",
        F.expr(
            # association pinned to the ORACLE's parse tree
            # (1000000 * X / Y == (1000000 * X) / Y, left-to-right):
            # multiply-then-divide, NOT 1e6 * (X / Y) — the two
            # associations land ~1 in 75k (S, N) pairs on opposite
            # sides of the .5 rounding boundary (ADVICE r11).
            "transform(parts, x -> CAST(signum("
            "(1000000.0 * (CAST(s - x.s_b AS DOUBLE) / 100.0))"
            " / CAST(n - x.n_b AS DOUBLE))"
            " * floor(abs((1000000.0 * (CAST(s - x.s_b AS DOUBLE) / 100.0))"
            " / CAST(n - x.n_b AS DOUBLE)) + 0.5D) AS BIGINT))"
        ).alias("q_arr"),
    )
    jk = g.select(
        "event_type",
        "s",
        "n",
        "k",
        F.expr(
            "aggregate(q_arr, CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("sq"),
        F.expr(
            "CAST(aggregate(q_arr, CAST(0 AS DECIMAL(38,0)),"
            " (a, x) -> a + CAST(x AS DECIMAL(38,0)) * x) AS BIGINT)"
        ).alias("sq2"),
    )
    var = (
        (F.col("k") - 1.0)
        / F.col("k")
        * (
            F.col("sq2").cast("double")
            - F.col("sq").cast("double")
            * F.col("sq").cast("double")
            / F.col("k")
        )
    )
    se = F.sqrt(var) / 1_000_000.0
    mean = F.col("s").cast("double") / 100.0 / F.col("n")
    return jk.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.col("k").alias("n_blocks"),
        mean.alias("mean_value"),
        se.alias("se_jack"),
        (mean - 1.96 * se).alias("ci_lo"),
        (mean + 1.96 * se).alias("ci_hi"),
    ).orderBy("event_type")


# ---- q_agg_power_mde -------------------------------------------------------- #


@register(
    "q_agg_power_mde",
    oracle="""
WITH m AS (
  SELECT event_type, count(*) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ss
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type HAVING count(*) >= 2
)
SELECT event_type, n AS n_events,
       CAST(s AS DOUBLE) / 100.0 / n AS mean_value,
       sqrt((CAST(ss AS DOUBLE)
             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
            / (n - 1)) / 100.0 AS stddev_value,
       2.8016 * (2.0 * (sqrt((CAST(ss AS DOUBLE)
                              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                             / (n - 1)) / 100.0)
                 / sqrt(CAST(n AS DOUBLE))) AS mde_abs,
       CAST(round(1000000 * (2.8016 * (2.0 * (sqrt((CAST(ss AS DOUBLE)
                              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                             / (n - 1)) / 100.0)
                 / sqrt(CAST(n AS DOUBLE))))
                  / (CAST(s AS DOUBLE) / 100.0 / n)) AS BIGINT)
         AS mde_rel_ppm
FROM m ORDER BY event_type
""",
    tags=("agg", "statistics"),
)
def q_agg_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-planning table: per event type, the minimal
    detectable effect of a 50/50 A/B test at alpha=0.05 / power=0.80
    given the metric's observed variance — MDE = (z_a/2 + z_b) * 2s /
    sqrt(n) with the z-sum as the exact literal 2.8016. The planning
    companion to q_agg_ttest (read it before the test, not after) and
    q_agg_cuped (whose variance reduction shrinks this number).

    Determinism: n, sum and sum-of-squares are exact integers (the
    square accumulates through DECIMAL(38,0)/HUGEINT — cents² x rows
    passes int64 around ~4e9 rows/type — then lands in BIGINT), and
    every output double derives from those integers by the SAME IEEE
    expression tree in both engines, association pinned down to the
    parenthesis. Groups need n >= 2 (sample variance).

    Scale notes: one scan, one map-side-combined (type) aggregate
    carrying three numbers per group; the MDE math runs on the
    types-sized frame. The 100 TB plan is this plan.
    """
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", slong("value", 2).alias("c"))
    )
    m = (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("s"),
            F.expr(
                "CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT)"
            ).alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    ss_d = F.col("ss").cast("double")
    mean = s_d / 100.0 / F.col("n")
    sd = F.sqrt((ss_d - s_d * s_d / F.col("n")) / (F.col("n") - 1)) / 100.0
    mde = 2.8016 * (2.0 * sd / F.sqrt(n_d))
    return (
        m.select(
            "event_type",
            F.col("n").alias("n_events"),
            mean.alias("mean_value"),
            sd.alias("stddev_value"),
            mde.alias("mde_abs"),
            slong(F.lit(1_000_000) * mde / mean, 0).alias("mde_rel_ppm"),
        )
        .orderBy("event_type")
    )


# ---- q_agg_srm -------------------------------------------------------------- #
# Sample-ratio mismatch: the first health check of every A/B system.
# Units (users) are hashed into two arms; a 50/50 design whose
# realized split fails the chi-square test marks broken assignment
# (bot filtering, logging loss, triggering bias) before any metric
# is read.  Assignment is a deterministic md5 bucket — reproducible
# across engines and replays, never rand().


@register(
    "q_agg_srm",
    oracle="""
WITH u AS (
  SELECT DISTINCT event_type, user_id,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS arm
  FROM events
), c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM u GROUP BY event_type
)
SELECT event_type, n0, n1,
       CAST((1000000 * CAST((n0 - n1) AS HUGEINT) * (n0 - n1))
            // (n0 + n1) AS BIGINT) AS chi2_ppm,
       CAST((1000000 * CAST((n0 - n1) AS HUGEINT) * (n0 - n1))
            // (n0 + n1) > 3841459 AS BOOLEAN) AS srm_flag
FROM c
ORDER BY event_type
""",
    tags=("agg", "statistics"),
)
def q_agg_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check per experiment (event_type as the
    experiment key): users hash-assigned 50/50 into arms by their md5
    first hex digit, the realized per-arm DISTINCT-user counts tested
    with the one-degree chi-square ((n0-n1)^2/(n0+n1), exact integer
    micro-units) against the 0.05 critical value 3.841459.

    Determinism: assignment is md5 on the decimal string of user_id —
    byte-identical in both engines; the chi-square statistic never
    leaves integer arithmetic (the squared difference is routed
    through DECIMAL(38,0)/HUGEINT before the ppm divide — (n0-n1)^2
    times 1e6 exceeds int64 once an arm passes ~3e6 users).

    Scale notes: ONE exchange on (event_type, user_id) for the exact
    distinct (map-side partial dedup), then a types-sized conditional
    rollup — the chi-square math runs on the bounded frame.  At
    extreme user cardinality the distinct swaps for HLL per the
    q_agg_approx_distinct contract with no shape change.
    """
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", 0
    ).otherwise(1)
    u = (
        table(spark, sf_dir, "events")
        .select("event_type", "user_id", arm.alias("arm"))
        .distinct()
    )
    c = u.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
    )
    chi2 = F.expr(
        "CAST((1000000 * CAST((n0 - n1) AS DECIMAL(38,0)) * (n0 - n1))"
        " DIV (n0 + n1) AS BIGINT)"
    )
    return c.select(
        "event_type",
        "n0",
        "n1",
        chi2.alias("chi2_ppm"),
        (chi2 > 3_841_459).alias("srm_flag"),
    ).orderBy("event_type")


# ---- q_agg_delta_ratio_var --------------------------------------------------- #
# Delta-method SE for a ratio metric with users as the randomization
# unit — the correct error bar when the metric's denominator is itself
# random (revenue per event, CTR, items per session).  Naive SE over
# event rows ignores within-user correlation and understates variance.
#
# Cross-engine doctrine: the entire float tail is ONE SQL expression
# string shared verbatim by both engines (Spark F.expr and DuckDB parse
# the same text with the same precedence), over exact integer moments —
# the strongest form of the association-pinning lesson (ADVICE r11 on
# the jackknife).

_DELTA_SE_EXPR = (
    "sqrt(GREATEST("
    "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)"
    " - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))"
    " * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))"
    " + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))"
    " * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))"
    " * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)))"
    " / CAST(n AS DOUBLE), 0.0))"
    " / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0"
)

_DELTA_RATIO_EXPR = (
    "CAST(sx AS DOUBLE) / 100.0 / CAST(sy AS DOUBLE)"
)


@register(
    "q_agg_delta_ratio_var",
    oracle=f"""
WITH u AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, user_id
), m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM u GROUP BY event_type HAVING count(*) >= 2
)
SELECT event_type, n AS n_users,
       {_DELTA_RATIO_EXPR} AS ratio,
       {_DELTA_SE_EXPR} AS se_delta,
       {_DELTA_RATIO_EXPR} - 1.96 * ({_DELTA_SE_EXPR}) AS ci_lo,
       {_DELTA_RATIO_EXPR} + 1.96 * ({_DELTA_SE_EXPR}) AS ci_hi
FROM m ORDER BY event_type
""",
    tags=("agg", "statistics"),
)
def q_agg_delta_ratio_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for mean event value with USERS
    as the randomization unit: ratio = sum(value)/count(events) but
    the SE treats each user's (sum, count) pair as one observation —
    Var(X/Y) ~ (var_x - 2R cov + R^2 var_y) / (n * mean_y^2), the
    standard A/B ratio-metric correction (Deng et al., WSDM'18 is the
    public reference).  The jackknife (q_agg_jackknife_ci) is the
    resampling-free empirical twin; this is the closed form.

    Determinism: per-user (x, y) partials are exact ints; the five
    moments accumulate through DECIMAL(38,0)/HUGEINT; every output
    double then derives from the SAME SQL expression STRING evaluated
    by both engines — identical text, identical precedence, identical
    IEEE tree (the module's association-pinning doctrine, strongest
    form).  The sqrt argument is clamped at 0 (GREATEST) so float
    cancellation near zero variance cannot produce engine-lore NaNs.

    Scale notes: ONE fact exchange on (type, user) with map-side
    combine, then a types-sized moment rollup — same shuffle budget as
    q_agg_power_mde; all delta arithmetic runs on the bounded frame.
    """
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "user_id", slong("value", 2).alias("c"))
    )
    u = ev.groupBy("event_type", "user_id").agg(
        F.sum("c").alias("x"), F.count("*").alias("y")
    )
    m = (
        u.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.expr(
                "CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))"
            ).alias("sxx"),
            F.expr(
                "CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))"
            ).alias("syy"),
            F.expr(
                "CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))"
            ).alias("sxy"),
        )
        .filter(F.col("n") >= 2)
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.expr(_DELTA_RATIO_EXPR).alias("ratio"),
        F.expr(_DELTA_SE_EXPR).alias("se_delta"),
        F.expr(f"{_DELTA_RATIO_EXPR} - 1.96 * ({_DELTA_SE_EXPR})").alias(
            "ci_lo"
        ),
        F.expr(f"{_DELTA_RATIO_EXPR} + 1.96 * ({_DELTA_SE_EXPR})").alias(
            "ci_hi"
        ),
    ).orderBy("event_type")


# ---- q_agg_effect_size ------------------------------------------------------- #
# Cohen's d / Hedges' g for each event type's value distribution vs the
# REST of the corpus — the standardized effect size read next to the
# t-test's p-value (significance without magnitude is how experiment
# review goes wrong).  Float tail = ONE SQL expression string shared
# verbatim by both engines over exact integer moments (the
# delta_ratio_var doctrine).

_ES_V1 = (
    "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    " / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0))"
)
_ES_V0 = (
    "((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)"
    " / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))"
)
_ES_D = (
    "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    " / sqrt(GREATEST(((CAST(n1 AS DOUBLE) - 1.0) * " + _ES_V1 +
    " + (CAST(n0 AS DOUBLE) - 1.0) * " + _ES_V0 +
    ") / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 2.0), 0.0))"
)
_ES_G = (
    "(" + _ES_D + ") * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE)"
    " + CAST(n0 AS DOUBLE)) - 9.0))"
)
_ES_MEANDIFF = (
    "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100.0"
)


@register(
    "q_agg_effect_size",
    oracle=f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), t AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n1,
         CAST(SUM(cents) AS BIGINT) AS s1,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q1
  FROM c GROUP BY 1
), g AS (
  SELECT event_type, n1, s1, q1,
         CAST(SUM(n1) OVER () - n1 AS BIGINT) AS n0,
         CAST(SUM(s1) OVER () - s1 AS BIGINT) AS s0,
         SUM(q1) OVER () - q1 AS q0
  FROM t
)
SELECT event_type, n1 AS n_type, n0 AS n_rest,
       round({_ES_MEANDIFF}, 6) + 0.0 AS mean_diff,
       round({_ES_D}, 6) + 0.0 AS cohens_d,
       round({_ES_G}, 6) + 0.0 AS hedges_g
FROM g ORDER BY event_type
""",
    tags=("agg", "statistics"),
)
def q_agg_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect size (Cohen's d, Hedges' g small-sample
    correction) of each event type's value distribution against the
    pooled REST of the corpus — magnitude to pair with q_agg_ttest's
    significance. d is unit-free, so the exact-cents moments cancel
    the currency scale; the pooled-variance denominator uses the
    classic (n1-1)v1 + (n0-1)v0 over n1+n0-2.

    Cross-engine determinism: per-type moments n, Σcents, Σcents² are
    exact integers (cents² through DECIMAL(38,0)/HUGEINT); the rest-
    of-corpus complement derives from the SAME rollup via an empty-
    frame window (types-sized, bounded); the whole float tail is ONE
    expression string parsed by both engines.

    Scale notes: one (event_type) partial-aggregated exchange over the
    fact; everything after runs on the types-sized frame (the empty-
    partition window is bounded by the enum cardinality, the
    q_tpch_q15 post-aggregate-window doctrine — never a second fact
    scan for the complement).
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    t = ev.groupBy("event_type").agg(
        F.count("*").alias("n1"),
        F.sum(cents).alias("s1"),
        F.sum(
            cents.cast("decimal(38,0)") * cents
        ).alias("q1"),
    )
    w = Window.partitionBy()
    g = t.select(
        "event_type",
        "n1",
        "s1",
        "q1",
        (F.sum("n1").over(w) - F.col("n1")).alias("n0"),
        (F.sum("s1").over(w) - F.col("s1")).alias("s0"),
        (F.sum("q1").over(w) - F.col("q1")).alias("q0"),
    )
    return g.select(
        "event_type",
        F.col("n1").alias("n_type"),
        F.col("n0").alias("n_rest"),
        # + 0.0: signed-zero epilogue (IEEE -0.0 + 0.0 = +0.0) — the
        # q_fn_geo/wilson doctrine; a ~-1e-9 mean_diff rounds to -0.0
        # in DuckDB but +0.0 in Spark without it
        F.expr(f"round({_ES_MEANDIFF}, 6) + 0.0").alias("mean_diff"),
        F.expr(f"round({_ES_D}, 6) + 0.0").alias("cohens_d"),
        F.expr(f"round({_ES_G}, 6) + 0.0").alias("hedges_g"),
    ).orderBy("event_type")


# ---- q_agg_fdr_bh ------------------------------------------------------------ #

_BH_Z2 = (
    "(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
    " * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
    " / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))"
)
# GREATEST(.., 1.0): a == b zeroes z^2, where Spark non-ANSI float
# division returns NULL while DuckDB gives +Inf — the guard caps the
# Chebyshev bound at its a == b value p = 1 identically on both.
_BH_P = (
    "LEAST(1.0, (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))"
    " / GREATEST((CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
    " * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)), 1.0))"
)


@register(
    "q_agg_fdr_bh",
    oracle=f"""
WITH t AS (
  SELECT event_type,
         CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS a,
         CAST(count(*) FILTER (user_id % 2 = 1) AS BIGINT) AS b
  FROM events GROUP BY 1
), r AS (
  SELECT event_type, a, b,
         CAST(row_number() OVER (
           ORDER BY {_BH_P}, event_type) AS BIGINT) AS k,
         CAST((SELECT count(*) FROM t) AS BIGINT) AS m
  FROM t
), s AS (
  SELECT *, 20 * m * (a + b) <= k * (a - b) * (a - b) AS ok FROM r
), mx AS (
  SELECT *, max(CASE WHEN ok THEN k END) OVER () AS kmax FROM s
)
SELECT event_type, a AS n_even, b AS n_odd, k AS p_rank, m AS n_tests,
       round({_BH_Z2}, 6) + 0.0 AS z2,
       round({_BH_P}, 6) + 0.0 AS p_chebyshev,
       COALESCE(k <= kmax, FALSE) AS rejected
FROM mx ORDER BY event_type
""",
    tags=("agg", "statistics"),
)
def q_agg_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR gate over per-type sample-ratio tests:
    each event type tests user-parity balance (even vs odd user_id)
    with the distribution-free Chebyshev bound p <= (a+b)/(a-b)^2 =
    1/z^2, then the BH step-up procedure at alpha = 0.05 decides which
    types' imbalances survive multiple-comparison correction — the
    guardrail an experimentation platform runs over MANY simultaneous
    srm checks (q_agg_srm is the single-test form).

    Cross-engine determinism: the ENTIRE rejection decision is exact
    integer arithmetic — p_(k) <= alpha*k/m at alpha = 1/20 rewrites
    to 20*m*(a+b) <= k*(a-b)^2 (BIGINT products; (a-b)^2 < 2^53 past
    the 100x rung), so no float ever decides the rejection boolean.
    The p-ascending RANK orders by the double p itself — safe because
    p derives from exact integers through ONE shared expression string
    (identical bit patterns on both engines; cross-type exact-ratio
    comparison has no single-column integer rewrite), with the type
    name as the unique tie-break; z2/p are reported through the same
    shared strings with the signed-zero epilogue, and the a == b
    degenerate (z2 = 0) caps p at 1 via an in-expression GREATEST
    guard instead of tripping Spark's NULL-on-/0 vs DuckDB's +Inf.

    Scale notes: one (event_type) partial-aggregated exchange with
    row-local parity CASEs; ranking, the step-up cummax, and the
    scalar m all ride the TYPES-SIZED frame (empty-frame windows
    bounded by the enum cardinality — never a second fact scan).
    """
    t = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("user_id") % 2 == 0, F.lit(1))).alias("a"),
            F.count(F.when(F.col("user_id") % 2 == 1, F.lit(1))).alias("b"),
        )
    )
    w_all = Window.partitionBy()
    r = t.select(
        "event_type",
        "a",
        "b",
        F.count("*").over(w_all).alias("m"),
    )
    # rank by p ascending: the double p derives from exact integers
    # through ONE shared expression string, so both engines order the
    # IDENTICAL bit patterns; event_type is the unique tie-break
    r = r.withColumn(
        "k",
        F.row_number().over(
            Window.orderBy(F.expr(_BH_P), F.col("event_type"))
        ).cast("long"),
    )
    s = r.withColumn(
        "ok",
        F.expr("20 * m * (a + b) <= k * (a - b) * (a - b)"),
    )
    mx = s.withColumn(
        "kmax", F.max(F.when(F.col("ok"), F.col("k"))).over(w_all)
    )
    return mx.select(
        "event_type",
        F.col("a").alias("n_even"),
        F.col("b").alias("n_odd"),
        F.col("k").alias("p_rank"),
        F.col("m").alias("n_tests"),
        F.expr(f"round({_BH_Z2}, 6) + 0.0").alias("z2"),
        F.expr(f"round({_BH_P}, 6) + 0.0").alias("p_chebyshev"),
        F.coalesce(F.col("k") <= F.col("kmax"), F.lit(False)).alias(
            "rejected"
        ),
    ).orderBy("event_type")
