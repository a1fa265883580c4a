"""Scalar function families (SURVEY.md §2 M5).

Generalizes the reference's JSON encode/decode surface (Tier A11,
``PlayerResourceIT.java:116-120,131-139``; javax.json deps at
``pom.xml:34-43``) to the full built-in function surface an analytics
engine needs. Every expression is a Catalyst built-in — JVM-side,
whole-stage-codegen'd, no Python in the hot path.

Scale notes: scalar functions are embarrassingly parallel; the only
scale concerns are (a) staying inside codegen (all built-ins do) and
(b) not forcing a regex engine over 100 TB when a cheaper predicate
would prune first — filters are ordered cheap-first where it matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register


@register(
    "q_fn_string",
    oracle=r"""
SELECT p_partkey,
       upper(p_name) AS name_up,
       lower(p_brand) AS brand_lo,
       substring(p_name, 2, 5) AS name_sub,
       concat(p_brand, ':', p_type) AS brand_type,
       trim(concat('  ', p_name, '  ')) AS name_trim,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_pad,
       regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
       string_split(p_name, ' ')[1] AS first_word,
       length(p_name) AS name_len,
       levenshtein(p_type, 'STANDARD') AS type_dist
FROM part
""",
    tags=("fn",),
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.substring("p_name", 2, 5).alias("name_sub"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_pad"),
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devowel"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.length("p_name").cast("long").alias("name_len"),
        F.levenshtein("p_type", F.lit("STANDARD")).cast("long").alias("type_dist"),
    )


@register(
    "q_fn_date",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)  AS y,
       month(o_orderdate) AS m,
       day(o_orderdate)   AS d,
       dayofweek(o_orderdate) + 1 AS dow,
       CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       CAST(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS month_start,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
FROM orders
""",
    tags=("fn",),
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family over orders.

    Dialect notes: DuckDB dayofweek is 0-based Sunday, Spark is
    1-based Sunday (oracle adds 1); date arithmetic returns dates,
    stringified in both engines to dodge date-vs-timestamp typing.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).cast("long").alias(
            "days_to_2002"
        ),
        F.date_trunc("month", "o_orderdate").cast("string").alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("string").alias("month_end"),
    )


@register(
    "q_fn_date2",
    oracle="""
SELECT o_orderkey,
       quarter(o_orderdate) AS q,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS STRING) AS plus3m,
       CAST(CAST(CAST(o_orderdate AS DATE)
                 + INTERVAL 1 DAY * (CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0
                                          THEN 7 ELSE (8 - isodow(o_orderdate)) % 7 END)
                 AS DATE) AS STRING) AS next_monday,
       (2002 - year(o_orderdate)) * 12 - month(o_orderdate) + 1 AS months_to_2002
FROM orders
""",
    tags=("fn",),
)
def q_fn_date2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date family: quarter/week/day-of-year, add_months,
    next_day, whole-month distance.

    Dialect notes: DuckDB has no next_day — the oracle derives the
    strictly-next Monday from isodow; both engines use ISO week
    numbering for weekofyear.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.weekofyear("o_orderdate").cast("long").alias("woy"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).cast("string").alias(
            "plus3m"
        ),
        F.next_day(F.col("o_orderdate").cast("date"), "Mon").cast("string").alias(
            "next_monday"
        ),
        (
            (F.lit(2002) - F.year("o_orderdate")) * 12
            - F.month("o_orderdate")
            + 1
        )
        .cast("long")
        .alias("months_to_2002"),
    )


@register(
    "q_fn_math",
    oracle="""
SELECT p_partkey,
       abs(p_size - 25) AS size_dev,
       CAST(ceil(p_retailprice) AS BIGINT)  AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(pow(p_size, 2) AS DOUBLE) AS size_sq,
       sqrt(p_size) AS size_sqrt,
       round(ln(p_size + 1), 6) AS size_ln,
       round(exp(p_size / 100.0), 6) AS size_exp,
       ((p_partkey % 7) + 7) % 7 AS key_mod7,
       CAST(sign(p_retailprice - 1000) AS DOUBLE) AS price_sign
FROM part
""",
    tags=("fn",),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family over part.

    sqrt is IEEE-correctly-rounded everywhere; ln/exp are not, so they
    are rounded to 6 decimals on both engines.
    """
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.pow("p_size", F.lit(2)).alias("size_sq"),
        F.sqrt("p_size").alias("size_sqrt"),
        F.round(F.log(F.col("p_size") + 1), 6).alias("size_ln"),
        F.round(F.exp(F.col("p_size") / 100.0), 6).alias("size_exp"),
        F.pmod("p_partkey", F.lit(7)).alias("key_mod7"),
        F.signum(F.col("p_retailprice") - 1000).alias("price_sign"),
    )


@register(
    "q_fn_bitwise_hash",
    oracle="""
SELECT p_partkey,
       p_partkey & 255 AS band,
       p_partkey | 4096 AS orred,
       xor(p_partkey, 21845) AS xored,
       p_partkey << 2 AS shl,
       p_partkey >> 3 AS shr,
       CAST(bit_count(CAST(p_partkey AS BIGINT)) AS BIGINT) AS popcount,
       md5(p_name) AS name_md5,
       sha256(p_name) AS name_sha256
FROM part
""",
    tags=("fn",),
)
def q_fn_bitwise_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (&, |, xor, shifts, popcount) + cryptographic
    hashes (md5/sha256 — engine-portable, unlike xxhash64/crc32)."""
    p = table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        "p_partkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("orred"),
        k.bitwiseXOR(F.lit(0x5555)).alias("xored"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).cast("long").alias("popcount"),
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_name", 256).alias("name_sha256"),
    )


@register(
    "q_fn_string2",
    oracle="""
SELECT c_custkey,
       concat(upper(substring(lower(c_mktsegment), 1, 1)),
              substring(lower(c_mktsegment), 2)) AS seg_title,
       reverse(c_name) AS name_rev,
       repeat('ab', 3) AS repeated,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
       strpos(c_name, '#') AS hash_pos,
       left(c_name, 8) AS name_left,
       right(c_name, 4) AS name_right,
       contains(c_name, '0000') AS has_zeros,
       starts_with(c_name, 'Customer') AS is_customer,
       ends_with(c_name, '7') AS ends_7
FROM customer
""",
    tags=("fn",),
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: initcap/reverse/repeat/translate/
    position/left/right/contains/startswith/endswith."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
        F.reverse("c_name").alias("name_rev"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.substring("c_name", 1, 8).alias("name_left"),
        F.substring(F.col("c_name"), -4, 4).alias("name_right"),
        F.contains("c_name", F.lit("0000")).alias("has_zeros"),
        F.startswith("c_name", F.lit("Customer")).alias("is_customer"),
        F.endswith("c_name", F.lit("7")).alias("ends_7"),
    )


@register(
    "q_fn_trig",
    oracle="""
SELECT p_partkey,
       round(sin(radians(p_size)), 6) AS sin_sz,
       round(cos(radians(p_size)), 6) AS cos_sz,
       round(tan(radians(p_size % 89)), 6) AS tan_sz,
       round(atan(p_size / 50.0), 6) AS atan_sz,
       round(atan2(p_size, 50), 6) AS atan2_sz,
       round(degrees(atan(1)) * 4, 6) AS pi_deg,
       round((exp(p_size / 50.0) - exp(-(p_size / 50.0))) / 2, 6) AS sinh_sz,
       round((exp(2 * (p_size / 50.0)) - 1) / (exp(2 * (p_size / 50.0)) + 1), 6) AS tanh_sz
FROM part
""",
    tags=("fn",),
)
def q_fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / hyperbolic family — libm implementations differ
    in the last ulps across engines, so everything is rounded to 6
    decimals on both sides."""
    p = table(spark, sf_dir, "part")
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        F.round(F.sin(F.radians(sz)), 6).alias("sin_sz"),
        F.round(F.cos(F.radians(sz)), 6).alias("cos_sz"),
        F.round(F.tan(F.radians(sz % 89)), 6).alias("tan_sz"),
        F.round(F.atan(sz / 50.0), 6).alias("atan_sz"),
        F.round(F.atan2(sz.cast("double"), F.lit(50.0)), 6).alias("atan2_sz"),
        F.round(F.degrees(F.atan(F.lit(1))) * 4, 6).alias("pi_deg"),
        F.round(F.sinh(sz / 50.0), 6).alias("sinh_sz"),
        F.round(F.tanh(sz / 50.0), 6).alias("tanh_sz"),
    )


@register(
    "q_fn_cond",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'rich' END AS bal_band,
       coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       greatest(c_acctbal, 0.0) AS bal_floor0,
       least(c_acctbal, 1000.0) AS bal_cap1k,
       (c_acctbal > 0 AND c_mktsegment = 'MACHINERY') AS rich_machinist,
       if(c_acctbal >= 9000, 1, 0) AS vip
FROM customer
""",
    tags=("fn",),
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE/when, coalesce, nullif, greatest/least."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_acctbal", F.lit(1000.0)).alias("bal_cap1k"),
        ((F.col("c_acctbal") > 0) & (F.col("c_mktsegment") == "MACHINERY")).alias(
            "rich_machinist"
        ),
        F.when(F.col("c_acctbal") >= 9000, 1).otherwise(0).alias("vip"),
    )


@register(
    "q_fn_array",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       string_split(text, ' ')[1] AS first_tok,
       list_contains(string_split(text, ' '), 'spark') AS has_spark,
       array_to_string(list_slice(string_split(text, ' '), 1, 5), ',') AS head5,
       array_to_string(list_sort(string_split(text, ' ')), ',') AS sorted_toks,
       array_to_string(list_transform(string_split(text, ' '), t -> upper(t)), ',') AS up_toks,
       len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long,
       CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS tok_chars
FROM documents
""",
    tags=("fn",),
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order functions (transform / filter /
    aggregate), canonicalized to strings/scalars for cross-engine
    comparison."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        toks.getItem(0).alias("first_tok"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 5), ",").alias("head5"),
        F.array_join(F.sort_array(toks), ",").alias("sorted_toks"),
        F.array_join(F.transform(toks, lambda t: F.upper(t)), ",").alias("up_toks"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("long").alias("tok_chars"),
    )


_SW = "['the', 'a', 'of', 'and', 'to', 'in']"


@register(
    "q_fn_array2",
    oracle=f"""
SELECT doc_id,
       coalesce(array_to_string(list_sort(list_distinct(
           list_intersect(string_split(text, ' '), {_SW}))), ','), '')
         AS stop_hits,
       coalesce(array_to_string(list_sort(list_distinct(
           list_filter(string_split(text, ' '), t -> NOT list_contains({_SW}, t)))), ','), '')
         AS content_words,
       len(list_intersect(string_split(text, ' '), {_SW})) > 0 AS has_stopword,
       CAST(coalesce(list_position(string_split(text, ' '), 'the'), 0) AS BIGINT) AS first_the,
       coalesce(array_to_string(list_filter(string_split(text, ' '), t -> t <> 'the'), ','), '')
         AS the_removed,
       array_to_string(flatten([string_split(text, ' ')[1:2], ['|'],
                                string_split(text, ' ')[1:2]]), ',') AS flat_echo
FROM documents
""",
    tags=("fn",),
)
def q_fn_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations: intersect / except / overlap / position /
    remove / flatten, canonicalized to sorted joined strings.

    Dialect notes: DuckDB list_intersect returns distinct elements in
    arbitrary order (Spark array_intersect preserves first-occurrence
    order), hence sort+distinct canonicalization on both sides;
    except/remove are expressed with list_filter.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sw = F.array(*[F.lit(s) for s in ["the", "a", "of", "and", "to", "in"]])
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(F.array_intersect(toks, sw))), ",").alias(
            "stop_hits"
        ),
        F.array_join(F.array_sort(F.array_distinct(F.array_except(toks, sw))), ",").alias(
            "content_words"
        ),
        F.arrays_overlap(toks, sw).alias("has_stopword"),
        F.coalesce(F.array_position(toks, "the"), F.lit(0)).cast("long").alias(
            "first_the"
        ),
        F.array_join(F.array_remove(toks, "the"), ",").alias("the_removed"),
        F.array_join(
            F.flatten(
                F.array(F.slice(toks, 1, 2), F.array(F.lit("|")), F.slice(toks, 1, 2))
            ),
            ",",
        ).alias("flat_echo"),
    )


@register(
    "q_fn_map",
    oracle="""
SELECT event_id,
       coalesce(array_to_string(json_keys(props), ','), '') AS keys,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       coalesce(len(json_keys(props)), -1) AS n_entries
FROM events
""",
    tags=("fn",),
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: parse the JSON payload to MapType, then keys /
    element_at / cardinality — canonicalized to strings and scalars
    (DuckDB mirrors via json_keys)."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.coalesce(F.array_join(F.map_keys(m), ","), F.lit("")).alias("keys"),
        F.element_at(m, "k").cast("bigint").alias("k_val"),
        F.coalesce(F.size(F.map_entries(m)).cast("long"), F.lit(-1)).alias(
            "n_entries"
        ),
    )


@register(
    "q_fn_json",
    oracle="""
SELECT event_id,
       k_str,
       CAST(k_str AS BIGINT) AS k_num,
       CAST(CASE WHEN json_valid(props)
                 THEN json_extract_string(props, '$.missing') END AS BIGINT) AS k_missing,
       coalesce(json_valid(props), FALSE) AS is_json,
       CASE WHEN k_str IS NULL THEN NULL
            ELSE concat('{"k":', k_str, '}') END AS rebuilt
FROM (
  -- json_valid guard keeps the oracle total: DuckDB json_extract_string
  -- ERRORS on malformed JSON, while Spark get_json_object yields NULL
  SELECT event_id, props,
         CASE WHEN json_valid(props)
              THEN json_extract_string(props, '$.k') END AS k_str
  FROM events
)
""",
    tags=("fn", "tier-a"),
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (Tier A11 generalized): extract, typed cast, missing
    path -> NULL, validity, re-encode.

    Validity is a real parse check (``try_parse_json`` -> NULL on
    malformed input), mirroring DuckDB ``json_valid`` — NOT presence of
    a particular key, so valid JSON lacking 'k' still reports true.
    ``rebuilt`` re-encodes from the extracted value and is NULL when
    '$.k' is missing (Spark concat propagates NULL; the oracle states
    it with an explicit CASE because DuckDB concat swallows NULLs)."""
    ev = table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k_str.alias("k_str"),
        k_str.cast("bigint").alias("k_num"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("k_missing"),
        F.try_parse_json("props").isNotNull().alias("is_json"),
        F.concat(F.lit('{"k":'), k_str, F.lit("}")).alias("rebuilt"),
    )


@register(
    "q_fn_cast",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
       CAST(o_orderkey AS DOUBLE) AS key_dbl,
       CAST(concat(CAST(year(o_orderdate) AS VARCHAR), '-01-01') AS DATE) IS NOT NULL AS year_parses,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
       CAST('42' AS BIGINT) AS lit_int,
       CAST(TRY_CAST('not_a_number' AS BIGINT) AS BIGINT) AS bad_cast,
       CAST(o_orderstatus = 'O' AS INTEGER) AS is_open
FROM orders
""",
    tags=("fn",),
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family: double->decimal(12,2) rounding, int<->double,
    string<->date, failed cast -> NULL (non-ANSI mode), bool->int."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.concat(F.year("o_orderdate").cast("string"), F.lit("-01-01"))
        .cast("date")
        .isNotNull()
        .alias("year_parses"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.lit("42").cast("bigint").alias("lit_int"),
        F.lit("not_a_number").cast("bigint").alias("bad_cast"),
        (F.col("o_orderstatus") == "O").cast("int").alias("is_open"),
    )


@register(
    "q_fn_struct",
    oracle="""
SELECT c_custkey,
       struct_pack(nk := c_nationkey, seg := c_mktsegment).nk AS s_nk,
       struct_pack(nk := c_nationkey, seg := c_mktsegment).seg AS s_seg,
       struct_pack(outer_k := c_custkey,
                   inner_s := struct_pack(nk := c_nationkey,
                                          bal_cents := CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                  ).inner_s.bal_cents AS nested_bal_cents,
       (struct_pack(a := c_nationkey, b := c_mktsegment) =
        struct_pack(a := c_nationkey, b := 'BUILDING')) AS seg_is_building,
       CASE WHEN c_nationkey < 12
            THEN struct_pack(tag := 'low',  k := c_nationkey)
            ELSE struct_pack(tag := 'high', k := c_nationkey)
       END.tag AS branch_tag
FROM customer
""",
    tags=("fn",),
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct (row-type) family: named_struct construction, dot-path
    field access, nesting, whole-struct equality comparison, and struct
    values flowing through conditionals — the composite type surface
    the engine's replay/event payloads rely on (events.props is a
    struct-shaped JSON; q_join_asof carries its matched click as a
    struct column).

    c_acctbal is compared as integer cents (floor(x*100+0.5)) so the
    nested-field check has no float formatting divergence.
    """
    c = table(spark, sf_dir, "customer")
    s = F.struct(
        F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg")
    )
    nested = F.struct(
        F.col("c_custkey").alias("outer_k"),
        F.struct(
            F.col("c_nationkey").alias("nk"),
            F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("bal_cents"),
        ).alias("inner_s"),
    )
    eq = F.struct(
        F.col("c_nationkey").alias("a"), F.col("c_mktsegment").alias("b")
    ) == F.struct(
        F.col("c_nationkey").alias("a"), F.lit("BUILDING").alias("b")
    )
    branch = F.when(
        F.col("c_nationkey") < 12,
        F.struct(F.lit("low").alias("tag"), F.col("c_nationkey").alias("k")),
    ).otherwise(
        F.struct(F.lit("high").alias("tag"), F.col("c_nationkey").alias("k"))
    )
    return c.select(
        "c_custkey",
        s.getField("nk").alias("s_nk"),
        s.getField("seg").alias("s_seg"),
        nested.getField("inner_s").getField("bal_cents").alias("nested_bal_cents"),
        eq.alias("seg_is_building"),
        branch.getField("tag").alias("branch_tag"),
    )


@register(
    "q_fn_binary",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       to_base64(encode(substr(text, 1, 12))) AS head_b64,
       lower(hex(encode(substr(text, 1, 6)))) AS head_hex,
       substr(sha256(text), 1, 16) AS sha_prefix,
       octet_length(encode(text)) - length(text) AS multibyte_overhead
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
    tags=("function",),
)
def q_fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary scalar-function surface over opaque payload bytes:
    octet length, base64/hex encodings of byte slices, digest prefix,
    and the utf-8 multibyte overhead (bytes − chars). The byte-level
    toolkit multimodal metadata columns are built from; every function
    stays JVM-side on BINARY values.

    Both engines slice CHARACTERS then encode (substr-then-encode), so
    multibyte boundaries are handled identically; hex is lowercased on
    both sides (Spark uppercases, DuckDB doesn't).
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    enc = lambda c: F.encode(c, "utf-8")  # noqa: E731
    return d.select(
        "doc_id",
        F.octet_length(enc(F.col("text"))).cast("long").alias("n_bytes"),
        F.base64(enc(F.substring("text", 1, 12))).alias("head_b64"),
        F.lower(F.hex(enc(F.substring("text", 1, 6)))).alias("head_hex"),
        F.substring(F.sha2(enc(F.col("text")), 256), 1, 16).alias("sha_prefix"),
        (F.octet_length(enc(F.col("text"))) - F.length("text"))
        .cast("long")
        .alias("multibyte_overhead"),
    ).orderBy("doc_id")


# ---- q_fn_geo --------------------------------------------------------- #
# Geospatial scalar family: haversine great-circle distance, initial
# bearing, and a Morton-interleaved integer geocell — the three
# primitives behind q_join_spatial_grid's blocking and any
# geo-partitioned layout. Coordinates are derived deterministically
# from event columns (the fixture has no geo data); trig goes through
# the q_fn_trig doctrine (round 6 on both sides — libm last-ulp
# divergence), while the geocell is pure integer arithmetic and exact.
_GEO_R_KM = 6371.0


def _geocell_interleave(lat_e: str, lon_e: str, div: str) -> str:
    """8+9-bit Morton interleave of quantized lat/lon degrees (1-degree
    cells) — portable +,*,div,% arithmetic, the q_sort_zorder helper
    shape specialized to geo. Latitude spans [0, 180) = 8 bits; the
    longitude domain [0, 360) needs a 9th bit (without it, lon in
    [256, 359] would alias onto [0, 103] — distant cells colliding),
    which lands at position 16, just above the interleaved pairs."""
    terms = []
    for i in range(9):
        if i < 8:
            terms.append(
                f"((({lat_e}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}"
            )
        terms.append(f"((({lon_e}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


_LAT = "(CAST(user_id AS DOUBLE) * 7 % 180) - 90"
_LON = "(CAST(event_id AS DOUBLE) * 13 % 360) - 180"
_QLAT = "CAST((user_id * 7) % 180 AS BIGINT)"
_QLON = "CAST((event_id * 13) % 360 AS BIGINT)"


@register(
    "q_fn_geo",
    oracle=f"""
WITH pts AS (
  SELECT event_id,
         {_LAT} AS lat, {_LON} AS lon,
         {_QLAT} AS qlat, {_QLON} AS qlon
  FROM events WHERE event_id < 2000
)
SELECT event_id,
       round(lat, 6) AS lat, round(lon, 6) AS lon,
       round(2 * {_GEO_R_KM} * asin(sqrt(
         pow(sin(radians(lat) / 2), 2) +
         cos(radians(lat)) * cos(radians(0)) *
         pow(sin(radians(lon) / 2), 2)
       )), 6) AS dist_km,
       (CASE WHEN round(degrees(atan2(
         sin(radians(-lon)) * cos(radians(0)),
         cos(radians(lat)) * sin(radians(0)) -
         sin(radians(lat)) * cos(radians(0)) * cos(radians(-lon))
       )), 6) = -180 THEN 180 ELSE round(degrees(atan2(
         sin(radians(-lon)) * cos(radians(0)),
         cos(radians(lat)) * sin(radians(0)) -
         sin(radians(lat)) * cos(radians(0)) * cos(radians(-lon))
       )), 6) END) + 0.0 AS bearing_to_origin_deg,
       CAST({_geocell_interleave('qlat', 'qlon', '//')} AS BIGINT) AS geocell
FROM pts
""",
    tags=("fn",),
)
def q_fn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo scalar family over synthetic event coordinates: haversine
    distance to the origin, initial bearing toward the origin, and a
    1-degree Morton geocell id.

    All three stay in whole-stage codegen: the trig pair rounds to 6dp
    both sides (q_fn_trig doctrine), the geocell is exact integer
    interleave — the key you'd repartitionByRange on to co-locate
    spatial neighbors at 100 TB (q_join_spatial_grid consumes exactly
    this blocking; q_sort_hilbert is the locality upgrade when range
    predicates dominate).
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    lat = F.expr(_LAT)
    lon = F.expr(_LON)
    lat_r = F.radians(lat)
    lon_r = F.radians(lon)
    dist = (
        F.lit(2.0)
        * _GEO_R_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(lat_r / 2), 2)
                + F.cos(lat_r) * F.cos(F.radians(F.lit(0.0)))
                * F.pow(F.sin(lon_r / 2), 2)
            )
        )
    )
    # the TO-ORIGIN longitude delta is (0 - lon): sin flips sign with
    # it, cos does not — sin(-x)/cos(-x) are exact IEEE reflections, so
    # engine parity is unaffected. The due-south edge (lon = 0, lat > 0)
    # rides on the SIGN OF ZERO through atan2(±0, x<0) = ±pi, and the
    # engines disagree on which zero -lon produces — canonicalize the
    # antimeridian bearing to +180 after rounding, on both sides.
    # The due-NORTH twin (lon = 0, lat < 0) hits the other zero edge:
    # DuckDB's round preserves atan2(-0.0, x>0) = -0.0 while Spark's
    # F.round BigDecimal path normalizes to +0.0 (driver hash-red,
    # round 9) — the final `+ 0.0` collapses both engines to +0.0
    # (IEEE 754 round-to-nearest: -0.0 + 0.0 = +0.0, all other values
    # unchanged), applied after the CASE on both sides.
    dlon_r = F.radians(-lon)
    bearing = F.degrees(
        F.atan2(
            F.sin(dlon_r) * F.cos(F.radians(F.lit(0.0))),
            F.cos(lat_r) * F.sin(F.radians(F.lit(0.0)))
            - F.sin(lat_r) * F.cos(F.radians(F.lit(0.0))) * F.cos(dlon_r),
        )
    )
    bearing6 = F.round(bearing, 6)
    bearing6 = F.when(bearing6 == -180, F.lit(180.0)).otherwise(bearing6) + F.lit(0.0)
    return ev.select(
        "event_id",
        F.round(lat, 6).alias("lat"),
        F.round(lon, 6).alias("lon"),
        F.round(dist, 6).alias("dist_km"),
        bearing6.alias("bearing_to_origin_deg"),
        F.expr(
            _geocell_interleave(
                f"CAST((user_id * 7) % 180 AS BIGINT)",
                f"CAST((event_id * 13) % 360 AS BIGINT)",
                "DIV",
            )
        )
        .cast("long")
        .alias("geocell"),
    )
