"""Modern Spark-4 scalar/agg surfaces: VARIANT, URL parsing, extended
regexp, ordered LISTAGG.

The reference stores its event payload as a JSON text column
(initial_db.sql:5-12 ``DATA text``; PlayerResourceIT.java:117-119 shows
the JSON body) — Spark 4's VARIANT type is the modern engine answer to
that column: parse once into a binary-encoded semi-structured value,
then path-extract without re-parsing per access. ``q_fn_variant``
exercises that tier; the other three widen the scalar-function surface
(SURVEY.md §2 "Scalar functions") with families every analytics user
reaches for: URL decomposition, the regexp_count/instr/substr quartet,
and deterministic ordered string aggregation.

Scale notes: all four are narrow per-row expressions or single-shuffle
aggregations in whole-stage codegen — no UDFs, no driver round-trips.
VARIANT parse is a JVM-side binary encoding (cheaper than repeated
get_json_object string scans when several paths are extracted).
LISTAGG concentrates each group's values onto one output row — bounded
here by design (groups are (segment, nation) with ~group-size strings);
at 100 TB the same query holds as long as per-group cardinality is
bounded, which the docstring contract states explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register


@register(
    "q_fn_variant",
    oracle="""
SELECT event_id,
       CAST(CASE WHEN json_valid(props)
                 THEN json_extract_string(props, '$.k') END AS BIGINT) AS k_val,
       CAST(CASE WHEN json_valid(props)
                 THEN json_extract_string(props, '$.missing') END AS BIGINT)
         AS k_missing,
       coalesce(json_valid(props) AND json_type(props) = 'OBJECT', FALSE)
         AS is_obj,
       CASE WHEN json_valid(props)
            THEN CAST(json(props) AS VARCHAR) END AS canonical
FROM events
""",
    tags=("fn", "variant"),
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT tier over the event payload: ``parse_json`` once,
    then path-extract typed values without string re-parsing.

    Columns: the extracted ``$.k`` as bigint, a missing path (NULL via
    ``try_variant_get``), an is-object probe (``schema_of_variant``
    starts with OBJECT), and the canonical re-encoding
    (``to_json(variant)`` — both engines emit minified ``{"k":N}``).
    ``try_parse_json`` keeps the plan total on malformed payloads where
    DuckDB's json() would error (guarded by json_valid in the oracle).

    At scale this is the winning layout for semi-structured columns:
    one binary parse feeding N path extractions, all codegen'd — the
    pattern that replaces repeated ``get_json_object`` string scans.
    """
    ev = table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_val"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
        F.coalesce(
            F.schema_of_variant(v).startswith("OBJECT"), F.lit(False)
        ).alias("is_obj"),
        F.to_json(v).alias("canonical"),
    )


@register(
    "q_fn_url",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || lang || '/' ||
         CAST(doc_id AS VARCHAR) || '?ref=' || source || '&page=' ||
         CAST(doc_id % 7 AS VARCHAR) AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?([^#]*)', 1) AS query,
       regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto
FROM u
""",
    tags=("fn", "url"),
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via ``parse_url`` (HOST / PATH / QUERY / one
    query key / PROTOCOL) over deterministic synthetic URLs built from
    document attributes.

    The differential is genuine: Spark runs its native ``parse_url``
    expression, the oracle decomposes the same strings with ANSI regex
    — agreement pins the parsing semantics, not just string plumbing.
    Narrow per-row expressions, no shuffle at all.
    """
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("source"),
        F.lit("&page="),
        (F.col("doc_id") % 7).cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).alias("page"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
    )


@register(
    "q_fn_regexp2",
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, 'merge')) AS n_merge,
       -- NULL-propagating like Spark's regexp_instr (NULL text -> NULL,
       -- not 0); the ELSE 0 branch covers only present-but-no-match
       CASE WHEN text IS NULL THEN NULL
            WHEN text LIKE '%join%'
            THEN length(regexp_replace(text, 'join.*$', '', 's')) + 1
            ELSE 0 END AS join_pos,
       nullif(regexp_extract(text, 'j[a-z]+'), '') AS first_jword,
       len(regexp_extract_all(text, '[a-z]+[0-9]|[0-9][a-z]+')) AS n_alnum_mix,
       regexp_matches(text, '^the ') AS starts_the
FROM documents
""",
    tags=("fn", "regexp"),
)
def q_fn_regexp2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended regexp quartet: ``regexp_count`` (occurrences),
    ``regexp_instr`` (1-based first-match position, 0 when absent),
    ``regexp_substr`` (first matching token, NULL when absent), an
    alternation count, and an anchored ``rlike``.

    The oracle reproduces instr with a prefix-erase length trick and
    substr with ``nullif(regexp_extract, '')`` — cross-engine agreement
    pins the position/NULL semantics. Pure narrow map, codegen'd.
    """
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("merge")).cast("long").alias("n_merge"),
        F.regexp_instr("text", F.lit("join")).cast("long").alias("join_pos"),
        F.regexp_substr("text", F.lit("j[a-z]+")).alias("first_jword"),
        F.regexp_count("text", F.lit("[a-z]+[0-9]|[0-9][a-z]+"))
        .cast("long")
        .alias("n_alnum_mix"),
        F.col("text").rlike("^the ").alias("starts_the"),
    )


@register(
    "q_agg_listagg",
    oracle="""
SELECT c_mktsegment,
       c_nationkey,
       count(*) AS n,
       string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey)
         AS members
FROM customer
WHERE c_acctbal > 9000
GROUP BY c_mktsegment, c_nationkey
ORDER BY c_mktsegment, c_nationkey
""",
    tags=("agg", "listagg"),
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered LISTAGG: comma-joined member ids per
    (segment, nation), ordered within group — Spark 4's ``listagg ...
    WITHIN GROUP`` vs DuckDB's ordered ``string_agg``.

    One hash-aggregate shuffle; output width is bounded by per-group
    cardinality (the acctbal gate keeps groups small by construction —
    the contract any LISTAGG carries at scale). The WITHIN GROUP sort
    is per-group, never global.
    """
    c = table(spark, sf_dir, "customer")
    c.where(F.col("c_acctbal") > 9000).createOrReplaceTempView(
        "listagg_custs"
    )
    return spark.sql(
        """
        SELECT c_mktsegment,
               c_nationkey,
               count(*) AS n,
               listagg(CAST(c_custkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY c_custkey) AS members
        FROM listagg_custs
        GROUP BY c_mktsegment, c_nationkey
        ORDER BY c_mktsegment, c_nationkey
        """
    )


@register(
    "q_fn_tz",
    oracle="""
WITH t AS (
  SELECT event_id, ts,
         timezone('America/New_York', timezone('UTC', ts)) AS ny,
         timezone('Asia/Tokyo',       timezone('UTC', ts)) AS tk
  FROM events
)
SELECT event_id,
       strftime(ny, '%Y-%m-%d %H:%M:%S') AS ny_wall,
       CAST(hour(tk) AS BIGINT) AS tokyo_hour,
       CAST((epoch(ny) - epoch(ts)) / 60 AS BIGINT) AS ny_offset_min,
       -- a fall-back wall clock occurs TWICE; engines legitimately pick
       -- different instants (Spark: earlier offset, ICU: later), so the
       -- round trip is asserted only where it is well-defined and the
       -- ambiguous hour is accepted via the same portable predicate:
       -- shifting the chosen instant +1h re-localizes to the SAME wall
       -- clock iff the hour is repeated
       timezone('UTC', timezone('America/New_York', ny)) = ts
       OR timezone('America/New_York',
                   timezone('America/New_York', ny) + INTERVAL 1 HOUR) = ny
       OR timezone('America/New_York',
                   timezone('America/New_York', ny) - INTERVAL 1 HOUR) = ny
         AS roundtrip_ok
FROM t
ORDER BY event_id
""",
    tags=("fn", "tz"),
)
def q_fn_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone scalar surface: UTC instants rendered as New York /
    Tokyo wall clocks (``from_utc_timestamp``), the NY UTC-offset in
    minutes (-300 EST / -240 EDT — the fixture's Feb-Mar span crosses
    the 2024-03-10 DST jump, so BOTH offsets appear and the nonexistent
    02:00-03:00 hour is skipped identically by both engines), and a
    ``to_utc_timestamp`` round-trip check. The round trip is asserted
    EXCEPT in the fall-back repeated hour, where the wall clock maps to
    two instants and the engines legitimately disambiguate differently
    (Spark picks the earlier offset, ICU the later) — the 100x sweep
    caught exactly this at 2024-11-03 01:xx, invisible at 1x whose span
    only crosses the spring GAP (which has no ambiguity, only a hole).
    Both sides accept either instant via the same portable
    repeated-hour predicate, probed in BOTH directions (+1h catches an
    earlier-instant picker, -1h a later-instant one; ordinary hours
    re-localize to a different wall clock under either shift). The oracle pins the naive->tz
    interpretation explicitly (``timezone('UTC', ts)``) so it is
    independent of either engine's session timezone.

    Scale: pure narrow per-row expressions in codegen — timezone
    conversion is a lookup in the JVM/ICU tz database, no shuffle, no
    UDF. The deterministic-output rule still applies: wall clocks are
    FORMATTED (never returned as raw shifted timestamps, which would
    re-shift under a different reader session tz).
    """
    ev = table(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    tk = F.from_utc_timestamp("ts", "Asia/Tokyo")
    return ev.select(
        "event_id",
        F.date_format(ny, "yyyy-MM-dd HH:mm:ss").alias("ny_wall"),
        F.hour(tk).cast("long").alias("tokyo_hour"),
        ((F.unix_timestamp(ny) - F.unix_timestamp("ts")) / 60)
        .cast("long")
        .alias("ny_offset_min"),
        # ambiguous fall-back hour: either of the two instants is a
        # correct inverse — accept both (predicate mirrors the oracle)
        (
            (F.to_utc_timestamp(ny, "America/New_York") == F.col("ts"))
            | (
                F.from_utc_timestamp(
                    F.to_utc_timestamp(ny, "America/New_York")
                    + F.expr("INTERVAL 1 HOUR"),
                    "America/New_York",
                )
                == ny
            )
            | (
                F.from_utc_timestamp(
                    F.to_utc_timestamp(ny, "America/New_York")
                    - F.expr("INTERVAL 1 HOUR"),
                    "America/New_York",
                )
                == ny
            )
        ).alias("roundtrip_ok"),
    ).orderBy("event_id")


@register(
    "q_fn_ip",
    oracle="""
WITH ips AS (
  SELECT event_id,
         (10 + (event_id * 131) % 213) || '.' ||
         ((user_id * 17) % 256)        || '.' ||
         ((event_id * 7) % 256)        || '.' ||
         (1 + (event_id * 31) % 254) AS ip
  FROM events
), o AS (
  SELECT event_id, ip,
         CAST(split_part(ip, '.', 1) AS BIGINT) AS o1,
         CAST(split_part(ip, '.', 2) AS BIGINT) AS o2,
         CAST(split_part(ip, '.', 3) AS BIGINT) AS o3,
         CAST(split_part(ip, '.', 4) AS BIGINT) AS o4
  FROM ips
)
SELECT event_id, ip,
       o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_u32,
       o1 || '.' || o2 || '.' || o3 || '.0/24' AS net24,
       (o1 = 10
        OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
        OR (o1 = 192 AND o2 = 168)) AS is_private,
       (o1 * 16777216 + o2 * 65536 + o3 * 256 + o4)
         BETWEEN 10 * 16777216 + 42 * 65536
             AND 10 * 16777216 + 42 * 65536 + 65535 AS in_blocklist
FROM o
""",
    tags=("fn", "ip"),
)
def q_fn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 scalar family over deterministic synthetic addresses (log
    analytics staple): dotted-quad round-trip (string -> octets ->
    uint32), /24 network rollup key, RFC-1918 private-range
    classification, and containment in a fixed 10.42.0.0/16 block.

    The differential is genuine on the parse: both engines SPLIT the
    same dotted string back apart (Spark ``split``/element_at, DuckDB
    ``split_part``) rather than reusing the generating arithmetic, so
    agreement pins string-split + cast semantics. All narrow codegen'd
    per-row expressions; ``ip_u32`` is the sortable/joinable form
    (q_join_cidr builds its range join on exactly this) and ``net24``
    the groupBy rollup key a 100 TB flow-log pipeline would
    pre-aggregate on.
    """
    ev = table(spark, sf_dir, "events")
    ip = F.concat_ws(
        ".",
        (10 + (F.col("event_id") * 131) % 213).cast("string"),
        ((F.col("user_id") * 17) % 256).cast("string"),
        ((F.col("event_id") * 7) % 256).cast("string"),
        (1 + (F.col("event_id") * 31) % 254).cast("string"),
    )
    o = ev.select("event_id", ip.alias("ip"))
    parts = F.split(F.col("ip"), "\\.")
    for i in (1, 2, 3, 4):
        o = o.withColumn(f"o{i}", F.element_at(parts, i).cast("long"))
    u32 = (
        F.col("o1") * 16_777_216
        + F.col("o2") * 65_536
        + F.col("o3") * 256
        + F.col("o4")
    )
    lo = 10 * 16_777_216 + 42 * 65_536
    return o.select(
        "event_id",
        "ip",
        u32.alias("ip_u32"),
        F.concat_ws(
            ".",
            F.col("o1").cast("string"),
            F.col("o2").cast("string"),
            F.col("o3").cast("string"),
            F.lit("0/24"),
        ).alias("net24"),
        (
            (F.col("o1") == 10)
            | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
            | ((F.col("o1") == 192) & (F.col("o2") == 168))
        ).alias("is_private"),
        u32.between(lo, lo + 65_535).alias("in_blocklist"),
    )
