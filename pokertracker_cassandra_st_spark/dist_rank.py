"""Two-phase distributed global ranking / prefix sums.

A ``Window.orderBy(...)`` with no partition key collapses the whole
frame into ONE task (Spark warns "No Partition Defined for Window
operation") — the classic global-order scale trap. The remedy is the
two-phase shape of Spark's own global sort:

  1. split rows into ORDERED, NON-OVERLAPPING buckets of the sort key;
  2. running sums / row_numbers WITHIN each bucket (parallel);
  3. a per-bucket-total table, prefix-summed and broadcast back:
     global value = bucket offset + local value.

Bucketing is NOT ``repartitionByRange``: the sampled range partitioner
draws a fresh RNG seed per exchange, and this algorithm references the
bucket assignment from TWO plan branches (the window and the totals
aggregate) — at the 10x sweep the branches materialized different
sampled boundaries (exchange reuse is not guaranteed under AQE) and the
offsets silently mismatched the local ranks (q_win_ntile emitted an
11th decile). Buckets are instead computed FROM ROW VALUES:

    b(x) = floor((x - min) * K / (max - min))   (clamped to K-1)

with min/max from a broadcast 1-row extrema aggregate — monotone in x
(IEEE subtraction/division/floor by shared constants preserve order),
deterministic wherever it is evaluated, so every branch agrees by
construction and no cross-stage reuse is load-bearing. Cost: one cheap
extrema pass (parquet min/max stats answer it at scan level) instead of
the range partitioner's sampling pass.

Skew: linear interpolation gives equal-WIDTH, not equal-COUNT buckets;
a pathological key distribution concentrates rows in few buckets and
serializes within them (correctness unaffected). At cluster scale the
upgrade is deterministic quantile boundaries (coarse fixed-grid counts,
one refine round) — same algorithm, different b(x).

Used by q_agg_gini / q_agg_mannwhitney / q_agg_kstest / q_win_ntile
(global-order statistics) — the same pattern q_pipeline_shuffle and
q_pipeline_pack apply with hash-bucket keys. The K-row offset window
is itself global, but over exactly ``n_buckets`` rows — bounded by
construction, never by data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_RANGE_BUCKETS = 32


def _materialized(df: DataFrame) -> DataFrame:
    """Lazy local checkpoint (optimization r13, guide §5) — see the
    range_prefix comment. A module-level seam so plan-shape tests can
    stub it to identity and assert on the full pre-checkpoint tree
    (explain renders a checkpointed subtree as Scan ExistingRDD)."""
    return df.localCheckpoint(eager=False)


def _with_bucket(df: DataFrame, primary: str, n_buckets: int) -> DataFrame:
    """Add ``_b``: an ordered bucket id computed from the row's value
    of ``primary`` (numeric; nulls sort first as bucket -1) and the
    frame's broadcast min/max — deterministic, branch-consistent."""
    ext = df.agg(
        F.min(primary).alias("_mn"), F.max(primary).alias("_mx")
    )
    width_rank = (F.col(primary) - F.col("_mn")) * n_buckets / (
        F.col("_mx") - F.col("_mn")
    )
    bucket = (
        F.when(F.col(primary).isNull(), F.lit(-1))
        .when(F.col("_mx") == F.col("_mn"), F.lit(0))
        .otherwise(F.least(F.lit(n_buckets - 1), F.floor(width_rank).cast("int")))
    )
    return (
        df.crossJoin(F.broadcast(ext))
        .withColumn("_b", bucket)
        .drop("_mn", "_mx")
    )


def range_prefix(
    df: DataFrame,
    order_cols: list[str],
    sums: dict[str, str],
    inclusive: bool,
    n_buckets: int = N_RANGE_BUCKETS,
    totals: dict[str, str] | None = None,
) -> DataFrame:
    """For each row, the sum of each ``sums`` source column over all
    rows at-or-before (``inclusive=True``) or strictly before it in
    the total order given by ``order_cols`` — without a global window.

    ``sums`` maps source column name -> output column name.
    ``order_cols[0]`` must be numeric (it drives the bucketing; ties
    on it stay within one bucket, so secondary tiebreak columns never
    cross bucket boundaries). The caller must pass order columns
    forming a TOTAL order (or operate on a frame whose order keys are
    unique, e.g. grouped-by-value), so the result is well-defined.

    ``totals`` (optional) maps source column name -> output column
    name for GRAND totals over the whole frame, attached to every row
    for free: the per-bucket totals frame already holds them, so a
    caller needing "n = count(*)" alongside a global row_number must
    NOT re-aggregate the input — that re-references the source and
    Spark re-executes the whole scan subtree (the documented
    re-reference-rescan trap; ADVICE r11 on q_pipeline_quality_curve).
    """
    if totals:
        missing = [s for s in totals if s not in sums]
        if missing:
            raise ValueError(f"totals sources must be in sums: {missing}")
    # output-name collision guard: a sums/totals destination that
    # already exists on the frame, duplicates another destination, or
    # matches the internal helper-name pattern (_b, _<dst>_loc/_off/
    # _tot) would silently produce duplicate/ambiguous columns.
    dsts = [*sums.values(), *(totals or {}).values()]
    dupes = sorted({d for d in dsts if dsts.count(d) > 1})
    if dupes:
        raise ValueError(f"duplicate output column names: {dupes}")
    clashes = sorted(set(dsts) & set(df.columns))
    if clashes:
        raise ValueError(
            f"output columns already exist on the frame: {clashes}"
        )
    helpers = {"_b"} | {
        f"_{d}_{suf}" for d in dsts for suf in ("loc", "off", "tot")
    }
    helper_clash = sorted(
        (set(dsts) | set(df.columns)) & helpers
    )
    if helper_clash:
        raise ValueError(
            f"column names collide with range_prefix helpers: {helper_clash}"
        )
    # Optimization r13 (guide §5): materialize the input ONCE per call
    # (lazy local checkpoint — job-free at construction/explain time).
    # The algorithm references df from three branches (the extrema
    # 1-row aggregate, the bucketed window pass, and the per-bucket
    # totals aggregate); Catalyst has no common-subplan reuse across
    # branches, so the un-checkpointed form re-executed the whole input
    # lineage ~3x per call — and CHAINED calls (q_agg_rfm ranks three
    # metrics back-to-back) compounded that geometrically (measured
    # 8.8 s / a 425 KB plan at sf0.1; 1.1 s after). Values unchanged:
    # the checkpoint is per-invocation, nothing persists across runs.
    df = _materialized(df)
    part = _with_bucket(df, order_cols[0], n_buckets)
    end = 0 if inclusive else -1
    w_local = (
        Window.partitionBy("_b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    out = part
    for src, dst in sums.items():
        out = out.withColumn(f"_{dst}_loc", F.coalesce(F.sum(src).over(w_local), F.lit(0)))
    tot = part.groupBy("_b").agg(
        *[F.sum(src).alias(f"_{dst}_tot") for src, dst in sums.items()]
    )
    # n_buckets-row frame: the only global window, bounded by construction
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = tot.select(
        "_b",
        *[
            F.coalesce(F.sum(f"_{dst}_tot").over(w_off), F.lit(0)).alias(f"_{dst}_off")
            for dst in sums.values()
        ],
        *[
            F.sum(f"_{sums[src]}_tot").over(w_all).alias(dst)
            for src, dst in (totals or {}).items()
        ],
    )
    res = out.join(F.broadcast(off), "_b")
    for dst in sums.values():
        res = res.withColumn(dst, F.col(f"_{dst}_off") + F.col(f"_{dst}_loc")).drop(
            f"_{dst}_off", f"_{dst}_loc"
        )
    return res.drop("_b")


def range_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    n_buckets: int = N_RANGE_BUCKETS,
    total_col: str | None = None,
) -> DataFrame:
    """Global row_number over a total order, two-phase (see module doc).

    ``total_col``: optionally also attach the frame's total row count
    to every row — derived from the per-bucket totals the algorithm
    already aggregates, NOT a second scan of ``df``.
    """
    out = range_prefix(
        df.withColumn("_one", F.lit(1)),
        order_cols,
        {"_one": out_col},
        inclusive=True,
        n_buckets=n_buckets,
        totals={"_one": total_col} if total_col else None,
    )
    return out.drop("_one")
