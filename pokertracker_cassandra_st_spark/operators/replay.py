"""Event replay / projection fold — the reference's core pipeline.

The reference's query service materializes "current state per player"
by folding an ordered event log (create -> update -> delete) into a
read model; evidence: Cassandra ``EVENTS`` DDL
(``/root/reference/src/test/resources/initial_db.sql:5-12``, PRIMARY
KEY(ID, NAME, VERSION)) and the CRUD lifecycle the system test asserts
(``/root/reference/src/test/java/.../PlayerResourceIT.java:109-190``):
update replaces prior state (IT:148-161), delete tombstones the entity
idempotently (IT:174-188).

Here the driver's ``events`` table plays the event-log role
(user_id <-> aggregate id, event_id <-> global version sequence,
event_type <-> event name, 'error' <-> tombstone) and the fold is a
declarative window: latest event per key, then drop tombstoned keys.

Scale notes: the fold is one shuffle on the aggregate key (hash
partition by user_id), then a per-partition sort — the same layout a
1000-executor cluster would use; no driver-side iteration, no UDF. With
a log bucketed/partitioned by user_id on disk, the shuffle disappears
entirely (bucketed scan). The ``max_by`` variant below is even cheaper:
partial max per map task, tiny final merge — optimal for "latest state"
at any scale because it never materializes the per-key sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.exprs import fmt_ts, o_fmt_ts
from pokertracker_cassandra_st_spark.registry import register

TOMBSTONE = "error"  # plays the role of PlayerDeleted (IT:174-188)

_PROJECTION_ORACLE = f"""
WITH numbered AS (
  SELECT user_id, event_type, value, ts,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       event_type AS last_event_type,
       value      AS last_value,
       {o_fmt_ts('ts')} AS last_ts,
       k          AS last_k
FROM numbered
WHERE rn = 1 AND event_type <> '{TOMBSTONE}'
"""


def projection_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state-per-user projection (Tier A4+A5+A6+A7+A10+A11)."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != TOMBSTONE))
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            fmt_ts("ts").alias("last_ts"),
            F.col("k").alias("last_k"),
        )
    )


@register("q_replay_projection", oracle=_PROJECTION_ORACLE, tags=("flagship", "tier-a"))
def q_replay_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: fold the event log into the current-state read model."""
    return projection_df(spark, sf_dir)


@register(
    "q_agg_maxby",
    oracle=f"""
SELECT user_id,
       max_by(event_type, event_id) AS last_event_type,
       (list(value ORDER BY event_id DESC))[1] AS last_value,
       max(event_id)                AS last_event_id
FROM events
GROUP BY user_id
""",
    tags=("agg", "tier-a"),
)
def q_agg_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest state per user via max_by — A5/A6 as one aggregate.

    Unlike the window fold this needs no per-key sort: partial max_by
    runs map-side, so it scales as a plain aggregation.
    """
    events = table(spark, sf_dir, "events")
    # note: Spark's max_by RETURNS the latest row's value even when it
    # is NULL, while DuckDB's max_by/arg_max SKIPS null values — the
    # oracle uses an ordered list to mirror Spark's null-preserving
    # "latest value" semantics (caught by tests/test_adversarial.py)
    return events.groupBy("user_id").agg(
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.max_by("value", "event_id").alias("last_value"),
        F.max("event_id").alias("last_event_id"),
    )


@register(
    "q_scd2_history",
    oracle=f"""
SELECT user_id,
       event_type,
       event_id AS valid_from_seq,
       {o_fmt_ts('ts')} AS valid_from,
       coalesce({o_fmt_ts('lead(ts) OVER w')}, '9999-12-31 00:00:00') AS valid_to,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
""",
    tags=("replay", "tier-a"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history from the event log: every event becomes a
    versioned row with [valid_from, valid_to) and an is_current flag —
    the event store already IS the type-2 history (the projection is
    just its is_current slice), which is the CQRS/event-sourcing take
    on slowly-changing dimensions.

    Scale notes: one shuffle on the entity key + lead() — same budget
    as the projection fold; no MERGE needed because the log is append
    only.
    """
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return events.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("valid_from_seq"),
        fmt_ts("ts").alias("valid_from"),
        F.coalesce(
            fmt_ts(F.lead("ts").over(w)), F.lit("9999-12-31 00:00:00")
        ).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "q_replay_tombstone_anti",
    oracle=f"""
SELECT e.user_id, count(*) AS n_events
FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM events t
  WHERE t.user_id = e.user_id AND t.event_type = '{TOMBSTONE}'
)
GROUP BY e.user_id
""",
    tags=("join", "tier-a"),
)
def q_replay_tombstone_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone semantics as an anti-join (Tier A7): drop every user
    that ever emitted a tombstone, count surviving events per user.

    Idempotency of DELETE (IT:174-179) is free in this declarative
    form: deleting an absent key changes nothing.
    """
    events = table(spark, sf_dir, "events")
    tombstoned = events.filter(F.col("event_type") == TOMBSTONE).select("user_id")
    return (
        events.join(tombstoned, "user_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )


_CDC_ORACLE = f"""
WITH split AS (
  -- integer floor division: CAST(x/2 AS BIGINT) would ROUND-half-even
  -- while the engine's Python // floors
  SELECT max(event_id) // 2 AS s FROM events
),
old_model AS (
  SELECT user_id, event_id AS last_event_id, value AS last_value
  FROM (SELECT user_id, event_id, value, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id <= (SELECT s FROM split))
  WHERE rn = 1 AND event_type <> '{TOMBSTONE}'
),
new_model AS (
  SELECT user_id, event_id AS last_event_id, value AS last_value
  FROM (SELECT user_id, event_id, value, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events)
  WHERE rn = 1 AND event_type <> '{TOMBSTONE}'
)
SELECT coalesce(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       o.last_event_id AS old_event_id,
       n.last_event_id AS new_event_id,
       n.last_value    AS new_value
FROM old_model o
FULL OUTER JOIN new_model n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL
   OR o.last_event_id <> n.last_event_id
"""


@register("q_replay_cdc_diff", oracle=_CDC_ORACLE, tags=("replay", "tier-a"))
def q_replay_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two read-model snapshots: fold the
    log up to its midpoint and in full, then emit the per-key delta —
    insert (key only in the new model), delete (tombstoned since the
    split), update (newer last_event_id). This is the changefeed a
    downstream consumer of the reference's read model would subscribe
    to, derived purely from the log.

    Scale notes: both folds share one shuffle layout on user_id and the
    diff is a co-partitioned full outer join on the same key — three
    same-key operations, no second shuffle key. The midpoint scalar
    enters the plan as a broadcast 1-row aggregate frame (the lazy
    literal-frame pattern of the as-of snapshot below) — no driver-side
    .first() roundtrip, no extra job.
    """
    events = table(spark, sf_dir, "events")
    # Spark SQL `div` floors for non-negative ints, matching the
    # oracle's `//` (CAST(x/2 AS BIGINT) would round half-even)
    split = events.agg(F.expr("max(event_id) div 2").alias("split_id"))

    def model(ev: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
        return (
            ev.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("event_type") != TOMBSTONE))
            .select("user_id", "event_id", "value")
        )

    old = model(
        events.crossJoin(F.broadcast(split))
        .filter(F.col("event_id") <= F.col("split_id"))
        .drop("split_id")
    ).select(
        F.col("user_id").alias("o_user"),
        F.col("event_id").alias("old_event_id"),
    )
    new = model(events).select(
        F.col("user_id").alias("n_user"),
        F.col("event_id").alias("new_event_id"),
        F.col("value").alias("new_value"),
    )
    joined = old.join(new, old.o_user == new.n_user, "full_outer")
    return (
        joined.filter(
            F.col("o_user").isNull()
            | F.col("n_user").isNull()
            | (F.col("old_event_id") != F.col("new_event_id"))
        )
        .select(
            F.coalesce("o_user", "n_user").alias("user_id"),
            F.when(F.col("o_user").isNull(), "insert")
            .when(F.col("n_user").isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
            "old_event_id",
            "new_event_id",
            "new_value",
        )
    )


@register(
    "q_replay_asof_snapshot",
    oracle=f"""
WITH cutoff AS (
  SELECT min(epoch_us(ts))
         + (max(epoch_us(ts)) - min(epoch_us(ts))) // 2 AS t_us
  FROM events
), ranked AS (
  SELECT user_id, event_type, value, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY event_id DESC) AS rn
  FROM events, cutoff WHERE epoch_us(ts) <= cutoff.t_us
)
SELECT user_id,
       event_type AS last_event_type,
       round(value, 2) AS last_value,
       event_id AS last_event_id
FROM ranked
WHERE rn = 1 AND event_type <> '{TOMBSTONE}'
""",
    tags=("replay", "tier-a"),
)
def q_replay_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: the read model AS OF the midpoint of the log's time
    range — replay the fold over only events at-or-before the cutoff.
    The reference's read-your-writes projection (PlayerResourceIT.java:
    131-139) generalized to "what did the projection say at time T",
    i.e. the event-sourcing superpower the Cassandra log enables
    (initial_db.sql:5-12 keeps every version).

    Scale notes: the cutoff predicate prunes at the scan (row-group
    min/max on ts); the fold itself is the same single-shuffle
    WindowGroupLimit plan as q_replay_projection — snapshot cost is
    proportional to |log ≤ T|, never to table count × versions. The
    cutoff scalar is one tiny aggregate broadcast into the predicate.
    """
    ev = table(spark, sf_dir, "events")
    # one global (min, max) scalar — computed by Spark, not the driver,
    # then folded into the filter as a scalar subquery via crossJoin of
    # a 1-row frame (keeps the whole plan lazy; no .first() roundtrip).
    # Cutoff is exact integer epoch-MICROS in both engines (a
    # timestamp->long cast would be seconds in Spark but µs interval
    # math in DuckDB — off-by-subsecond row sets).
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(
        F.expr(
            "min(unix_micros(ts))"
            " + (max(unix_micros(ts)) - min(unix_micros(ts))) div 2"
        ).alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        ev.crossJoin(F.broadcast(bounds))
        .filter(us <= F.col("t_us"))
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != TOMBSTONE))
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.round("value", 2).alias("last_value"),
            F.col("event_id").alias("last_event_id"),
        )
    )


@register(
    "q_replay_bitemporal",
    oracle=f"""
WITH cuts AS (
  SELECT max(event_id) // 2 AS s_cut,
         min(epoch_us(ts))
         + (max(epoch_us(ts)) - min(epoch_us(ts))) // 2 AS v_us
  FROM events
), ranked AS (
  SELECT user_id, event_type, value, event_id, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events, cuts
  WHERE event_id <= cuts.s_cut AND epoch_us(ts) <= cuts.v_us
)
SELECT user_id,
       event_type AS believed_event_type,
       round(value, 2) AS believed_value,
       event_id AS system_seq,
       {o_fmt_ts('ts')} AS valid_ts
FROM ranked
WHERE rn = 1 AND event_type <> '{TOMBSTONE}'
""",
    tags=("replay",),
)
def q_replay_bitemporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal snapshot: "what did the system BELIEVE (as of system
    sequence S) about each entity's state AS AT valid time V" — the
    two-axis generalization of q_replay_asof_snapshot. System time is
    the append sequence (event_id: which facts had been recorded),
    valid time is the event timestamp (when the fact held in the
    world); both cutoffs are the midpoints of their axes. Because the
    log contains out-of-order arrivals (late facts recorded after
    in-world time passed), the two filters prune DIFFERENT row sets —
    the answer differs from either single-axis snapshot, which is the
    point of bitemporal modeling (retroactive corrections are visible
    only after their system time, applied at their valid time).

    Scale notes: identical budget to the as-of snapshot — both cutoff
    scalars ride one broadcast 1-row aggregate frame into a scan
    predicate (event_id and ts row-group min/max both prune), then one
    shuffle on the entity key with the rank-1 WindowGroupLimit fold.
    A bitemporal table at 100 TB is just the append log plus this
    query shape; no second storage copy of "current" vs "historic"
    rows is ever maintained.
    """
    ev = table(spark, sf_dir, "events")
    cuts = ev.agg(
        F.expr("max(event_id) div 2").alias("s_cut"),
        F.expr(
            "min(unix_micros(ts))"
            " + (max(unix_micros(ts)) - min(unix_micros(ts))) div 2"
        ).alias("v_us"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")).desc(), F.col("event_id").desc()
    )
    return (
        ev.crossJoin(F.broadcast(cuts))
        .filter(
            (F.col("event_id") <= F.col("s_cut"))
            & (F.unix_micros(F.col("ts")) <= F.col("v_us"))
        )
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != TOMBSTONE))
        .select(
            "user_id",
            F.col("event_type").alias("believed_event_type"),
            F.round("value", 2).alias("believed_value"),
            F.col("event_id").alias("system_seq"),
            fmt_ts("ts").alias("valid_ts"),
        )
    )


@register(
    "q_replay_snapshot_incremental",
    oracle=_PROJECTION_ORACLE,
    tags=("flagship", "tier-a"),
)
def q_replay_snapshot_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot + incremental replay — THE production event-sourcing
    optimization (a rebuilding read model must not refold the full
    history): materialize the fold state as of a cutoff version to a
    durable snapshot, then recover the CURRENT projection by folding
    only snapshot ∪ log-tail. The oracle is q_replay_projection's full
    replay — the differential IS the proof that snapshot + tail loses
    nothing, including the tombstone edge (a user whose last
    pre-cutoff event is a delete stays tombstoned in the snapshot so a
    tail-less user still vanishes from the final state).

    Scale notes: the cutoff is a broadcast 1-row aggregate (no driver
    scalar); the snapshot fold shuffles only the pre-cutoff slice and
    WRITES one row per user (the state, not the history) — so the
    recovery fold reads |users| + |tail| rows instead of |history|.
    In production the snapshot is re-materialized on a schedule and
    the tail is the stream since the last snapshot; this query is one
    full cycle of that loop, and the snapshot parquet is partition-
    pruned by the same user_id key the fold shuffles on.
    """
    from pokertracker_cassandra_st_spark.catalog import scratch_dir

    events = table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("bigint")
    )
    cutoff = events.agg(
        F.floor(F.max("event_id") / 2).cast("long").alias("cut")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    # snapshot: latest state per user as of the cutoff, TOMBSTONES KEPT
    # (state must remember deletions to mask earlier versions)
    snap_path = scratch_dir(sf_dir, "replay_snapshot")
    (
        events.crossJoin(F.broadcast(cutoff))
        .filter(F.col("event_id") <= F.col("cut"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value", "ts", "k")
        .write.mode("overwrite")
        .parquet(snap_path)
    )
    snapshot = spark.read.parquet(snap_path)
    tail = (
        events.crossJoin(F.broadcast(cutoff))
        .filter(F.col("event_id") > F.col("cut"))
        .select("user_id", "event_id", "event_type", "value", "ts", "k")
    )
    return (
        snapshot.unionByName(tail)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != TOMBSTONE))
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            fmt_ts("ts").alias("last_ts"),
            F.col("k").alias("last_k"),
        )
    )


# ---- q_replay_version_audit -------------------------------------------------- #
# Version-chain integrity audit — the event-store health check behind
# replay correctness: for each aggregate (user), does its observed
# version sequence (event_id, the envelope's VERSION analog —
# initial_db.sql:5-12 clusters on (ID, NAME, VERSION)) cover the
# min..max span contiguously, and how large are the holes? A replay
# fold is only trustworthy when missing versions are known.


@register(
    "q_replay_version_audit",
    oracle="""
WITH chain AS (
  SELECT user_id,
         count(*) AS n_events,
         max(event_id) - min(event_id) + 1 - count(*) AS missing,
         max(event_id) - min(event_id) + 1 AS span
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_aggregates,
       CAST(SUM(CASE WHEN missing = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contiguous,
       CAST(SUM(missing) AS BIGINT) AS total_missing,
       CAST(max(missing) AS BIGINT) AS max_missing,
       (1000000 * CAST(SUM(n_events) AS BIGINT))
         // CAST(SUM(span) AS BIGINT) AS density_ppm
FROM chain
""",
    tags=("replay",),
)
def q_replay_version_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-aggregate version-chain audit rolled up to one row: each
    user's event_id span vs its event count gives the number of
    missing versions (holes) in that aggregate's chain; the summary
    reports contiguous-chain count, total/max holes, and overall chain
    density in exact integer ppm.

    Scale notes: one map-side-combined user_id groupBy carrying three
    longs, then a 1-row rollup — the cheapest possible integrity sweep
    over an event log, which is why it can run before EVERY replay at
    100 TB. Cf. reference `initial_db.sql:5-12` (VERSION clustering)
    and the replay fold's per-aggregate order contract (SURVEY Tier
    A13).
    """
    ev = table(spark, sf_dir, "events")
    chain = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (
            F.max("event_id") - F.min("event_id") + 1 - F.count("*")
        ).alias("missing"),
        (F.max("event_id") - F.min("event_id") + 1).alias("span"),
    )
    return chain.agg(
        F.count("*").alias("n_aggregates"),
        F.sum((F.col("missing") == 0).cast("long")).alias("n_contiguous"),
        F.sum("missing").alias("total_missing"),
        F.max("missing").alias("max_missing"),
        F.expr("(1000000 * sum(n_events)) div sum(span)").alias(
            "density_ppm"
        ),
    )
