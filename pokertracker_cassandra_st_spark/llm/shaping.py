"""Training-data shaping operators round 3: deterministic global
shuffle, domain-mixture resampling, overlapping token chunking,
repetition filtering, int8 embedding quantization.

These are the remaining standard stages of a pre-training data build
after curation/dedup/packing (llm/curation.py, llm/dedup.py):

  * deterministic SHUFFLE — randomize training order with a seeded
    hash so the shard layout is reproducible run-to-run (the "global
    shuffle" every epoch-0 data build performs);
  * domain-MIXTURE resampling — downsample each source domain to hit
    target mixture weights (the DoReMi/Pile-style mixture step);
  * token CHUNKING — split documents into fixed-size overlapping
    context windows (the example-construction step before packing);
  * REPETITION filter — Gopher-style duplicate-word / top-bigram
    ratios (the intra-document quality gate complementing the
    inter-document dedup tiers);
  * int8 QUANTIZATION — symmetric per-vector embedding quantization
    with reconstruction-error audit (the storage/serving compression
    step for similarity search at scale).

All pure Catalyst (no Python in the hot path), all differentially
verified against DuckDB. Cross-engine determinism follows SURVEY §7.5:
randomness comes from md5 / multiplicative hashing (bit-identical in
both engines), ratios are reported as integer parts-per-million via
integer division (no float rounding boundary), and float folds are
scaled to longs before summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.dist_rank import range_row_number
from pokertracker_cassandra_st_spark.registry import register

# ---------------------------------------------------------------- #
# deterministic global shuffle                                      #
# ---------------------------------------------------------------- #

_SHUFFLE_SEED = "seed42"
_N_SHARDS = 8

_SHUFFLE_ORACLE = f"""
WITH k AS (
  SELECT doc_id,
         md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
), r AS (
  SELECT doc_id, shuffle_key,
         row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS rn
  FROM k
)
SELECT doc_id, shuffle_key,
       rn % {_N_SHARDS} AS shard,
       rn // {_N_SHARDS} AS pos
FROM r
"""


@register("q_pipeline_shuffle", oracle=_SHUFFLE_ORACLE, tags=("llm", "pipeline"))
def q_pipeline_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle into training shards.

    Every document gets a pseudo-random but reproducible rank
    (md5 over seed:doc_id), then round-robins into ``_N_SHARDS``
    shards with an in-shard position — the epoch-0 training-order
    randomization, reproducible across runs and engines.

    Scale notes: the global rank is computed WITHOUT a global sort.
    The md5 key's first hex digit range-partitions rows into 16
    buckets whose string order equals the key order, so the window
    ranks within buckets only (16-way parallel); bucket offsets are a
    16-row aggregate broadcast back. At 100 TB this is one shuffle on
    the bucket key plus a broadcast — the same two-phase
    distributed-rank pattern as q_pipeline_pack's prefix sum.
    """
    d = table(spark, sf_dir, "documents").select("doc_id")
    keyed = d.select(
        "doc_id",
        F.md5(
            F.concat(F.lit(f"{_SHUFFLE_SEED}:"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    ).withColumn("b", F.substring("shuffle_key", 1, 1))

    local_rn = F.row_number().over(
        Window.partitionBy("b").orderBy("shuffle_key", "doc_id")
    )
    ranked = keyed.withColumn("local_rn", local_rn)

    # 16-row bucket-offset table: rows in buckets strictly before b
    counts = keyed.groupBy("b").agg(F.count("*").alias("c"))
    off = counts.select(
        "b",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )

    rn = (F.col("off") + F.col("local_rn") - 1).alias("rn")
    return (
        ranked.join(F.broadcast(off), "b")
        .select("doc_id", "shuffle_key", rn)
        .select(
            "doc_id",
            "shuffle_key",
            (F.col("rn") % _N_SHARDS).alias("shard"),
            (F.col("rn") / _N_SHARDS).cast("long").alias("pos"),
        )
    )


# ---------------------------------------------------------------- #
# domain-mixture resampling                                         #
# ---------------------------------------------------------------- #

# Knuth multiplicative hash: exact in int64 for doc_id < 3.5e9, a
# reproducible uniform u32 both engines compute identically (no
# hex-string parsing needed).
_MIX_MULT = 2654435761
_U32 = 4294967296

_MIXTURE_ORACLE = f"""
WITH w AS (
  SELECT source, count(*) AS n_src,
         100 + 50 * (CAST(substr(source, 4) AS INT) % 5) AS wgt
  FROM documents GROUP BY source
), tot AS (
  SELECT SUM(n_src) AS n_total, SUM(wgt) AS sum_w FROM w
), tgt AS (
  SELECT w.source, w.n_src, w.wgt,
         CAST((w.wgt * (tot.n_total // 2)) // tot.sum_w AS BIGINT) AS target_n
  FROM w, tot
), kept AS (
  SELECT d.source, count(*) AS n_kept
  FROM documents d JOIN tgt ON d.source = tgt.source
  WHERE CAST((d.doc_id * {_MIX_MULT}) % {_U32} AS HUGEINT) * tgt.n_src
        < CAST(tgt.target_n AS HUGEINT) * {_U32}
  GROUP BY d.source
)
SELECT tgt.source, tgt.n_src, tgt.wgt, tgt.target_n,
       COALESCE(kept.n_kept, 0) AS n_kept
FROM tgt LEFT JOIN kept ON tgt.source = kept.source
"""


@register("q_pipeline_mixture", oracle=_MIXTURE_ORACLE, tags=("llm", "pipeline"))
def q_pipeline_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: deterministic per-source downsampling
    to target mixture weights.

    Each source domain gets a weight (derived here from its numeric
    suffix; in production a config table), a target row count
    proportional to weight within a global budget of half the corpus,
    and a keep-decision per document: keep iff
    ``u32(doc_id) / 2^32 < target_n / n_src``, evaluated as an exact
    integer cross-multiplication (decimal(38,0) / HUGEINT) so both
    engines agree bit-for-bit and clamping at rate 1 is implicit.
    Output is the per-source audit (actual kept vs target).

    Scale notes: the weight/target side is a per-source aggregate
    (tiny — broadcast); the keep-decision is a stateless map over the
    corpus (no shuffle of document text); the audit is one groupBy on
    source. Sampling never materializes an intermediate corpus copy.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    w = d.groupBy("source").agg(F.count("*").alias("n_src")).select(
        "source",
        "n_src",
        (
            100 + 50 * (F.expr("CAST(substring(source, 4) AS INT)") % 5)
        ).alias("wgt"),
    )
    tot = w.agg(
        F.sum("n_src").alias("n_total"), F.sum("wgt").alias("sum_w")
    )
    tgt = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_src",
        "wgt",
        ((F.col("wgt") * (F.col("n_total") / 2).cast("long")) / F.col("sum_w"))
        .cast("long")
        .alias("target_n"),
    )

    u32 = (F.col("doc_id") * _MIX_MULT) % _U32
    kept = (
        d.join(F.broadcast(tgt), "source")
        .filter(
            u32.cast("decimal(38,0)") * F.col("n_src")
            < F.col("target_n").cast("decimal(38,0)") * _U32
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return tgt.join(kept, "source", "left").select(
        "source",
        "n_src",
        "wgt",
        "target_n",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


# ---------------------------------------------------------------- #
# overlapping token chunking                                        #
# ---------------------------------------------------------------- #

_CHUNK = 32  # context window, tokens
_STRIDE = 24  # window stride (8-token overlap)

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, (len(toks) + {_STRIDE - 1}) // {_STRIDE} - 1))
           AS chunk_idx
  FROM t WHERE len(toks) > 0
)
SELECT doc_id, chunk_idx,
       len(list_slice(toks, chunk_idx * {_STRIDE} + 1,
                      chunk_idx * {_STRIDE} + {_CHUNK})) AS n_tokens,
       array_to_string(list_slice(toks, chunk_idx * {_STRIDE} + 1,
                       chunk_idx * {_STRIDE} + {_CHUNK}), ' ') AS chunk_text
FROM c
"""


@register("q_text_chunk", oracle=_CHUNK_ORACLE, tags=("llm", "text"))
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping context-window chunking: every document
    becomes ceil(n_tokens / stride) chunks of up to ``_CHUNK`` tokens
    starting every ``_STRIDE`` tokens (8-token overlap carries context
    across boundaries) — the example-construction step between
    curation and sequence packing.

    Scale notes: pure narrow operation — posexplode of a per-row
    index sequence, then array slices; no shuffle at all, and chunk
    fan-out is bounded by document length. Chunk text is built from
    the already-loaded token array (the document is read once).
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).filter(F.size("toks") > 0)
    n_chunks = ((F.size("toks") + _STRIDE - 1) / _STRIDE).cast("long")
    chunked = toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    sl = F.slice(
        F.col("toks"), F.col("chunk_idx") * _STRIDE + 1, F.lit(_CHUNK)
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size(sl).cast("long").alias("n_tokens"),
        F.array_join(sl, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------- #
# repetition filter (Gopher-style intra-document quality gate)      #
# ---------------------------------------------------------------- #

# thresholds in parts-per-million (integer division — no float
# rounding boundary between engines; see module docstring)
_DUP_WORD_MAX_PPM = 700_000  # reject if >70% duplicate words
_TOP_BIGRAM_MAX_PPM = 180_000  # reject if top bigram >18% of bigrams

_REPETITION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2)
), bc AS (
  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
), top AS (
  SELECT doc_id, max(c) AS top_c, sum(c) AS n_bigrams
  FROM bc GROUP BY doc_id
), dw AS (
  SELECT doc_id, len(toks) AS n_words,
         len(list_distinct(toks)) AS n_distinct
  FROM t
)
SELECT dw.doc_id, dw.n_words,
       (dw.n_words - dw.n_distinct) * 1000000 // dw.n_words AS dup_word_ppm,
       CAST(top.top_c * 1000000 // top.n_bigrams AS BIGINT) AS top_bigram_ppm,
       ((dw.n_words - dw.n_distinct) * 1000000 // dw.n_words
          <= {_DUP_WORD_MAX_PPM}
        AND top.top_c * 1000000 // top.n_bigrams
          <= {_TOP_BIGRAM_MAX_PPM}) AS keep
FROM dw JOIN top ON dw.doc_id = top.doc_id
"""


@register("q_text_repetition", oracle=_REPETITION_ORACLE, tags=("llm", "text"))
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document: duplicate-word
    fraction and most-frequent-bigram share, with a keep flag — the
    intra-document quality gate that catches boilerplate/spam text
    the inter-document dedup tiers can't see.

    Ratios are integer parts-per-million via integer division, so the
    compare has no float rounding boundary (a share like 1/128 =
    0.0078125 would otherwise flip between half-even and half-away
    rounding at 6 decimals).

    Scale notes: the duplicate-word side is per-row HOFs (no
    shuffle); the bigram side explodes (doc_id, bigram) pairs and
    aggregates twice on doc_id — narrow pairs shuffle, never the
    document text, and map-side partial aggregation collapses
    repeated bigrams before the exchange.
    """
    t = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    bg = (
        t.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("bigram"),
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams"))
    )
    dw = t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
    )
    dup_ppm = F.expr("(n_words - n_distinct) * 1000000 DIV n_words")
    top_ppm = F.expr("top_c * 1000000 DIV n_bigrams")
    return dw.join(bg, "doc_id").select(
        "doc_id",
        "n_words",
        dup_ppm.alias("dup_word_ppm"),
        top_ppm.alias("top_bigram_ppm"),
        (
            (dup_ppm <= _DUP_WORD_MAX_PPM) & (top_ppm <= _TOP_BIGRAM_MAX_PPM)
        ).alias("keep"),
    )


# ---------------------------------------------------------------- #
# int8 embedding quantization                                       #
# ---------------------------------------------------------------- #

_QUANT_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), s AS (
  SELECT vec_id, e,
         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
  FROM v
), q AS (
  SELECT vec_id, scale,
         list_transform(e, x -> greatest(-127, least(127,
           CASE WHEN x < 0
                THEN -CAST(floor(abs(x) / scale + 0.5) AS BIGINT)
                ELSE  CAST(floor(abs(x) / scale + 0.5) AS BIGINT)
           END))) AS qv,
         e
  FROM s WHERE scale > 0
), err AS (
  SELECT vec_id, scale,
         list_transform(list_zip(e, qv),
                        p -> abs(p[1] - p[2] * scale)) AS errs
  FROM q
)
SELECT vec_id,
       CAST(floor(scale * 1000000000 + 0.5) AS BIGINT) AS scale_ppb,
       CAST(list_max(list_transform(errs,
              x -> CAST(floor(x * 1000000000 + 0.5) AS BIGINT)))
            AS BIGINT) AS max_err_ppb,
       CAST(list_sum(list_transform(errs,
              x -> CAST(floor(x * x * 1000000000000 + 0.5) AS BIGINT)))
            AS BIGINT) AS sse_e12
FROM err
"""


@register("q_sim_quantize", oracle=_QUANT_ORACLE, tags=("llm", "similarity"))
def q_sim_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization with reconstruction-error
    audit: scale = max|v|/127, q_i = round-half-away(v_i/scale) clamped
    to [-127,127], reporting per-vector scale, max abs error and sum of
    squared errors — the 4x storage/bandwidth compression applied to
    embedding columns before similarity serving.

    Determinism: error metrics are scaled to longs BEFORE aggregation
    (max is order-independent; the squared-error sum becomes an exact
    integer sum), and half-away rounding is explicit floor(|x|+0.5) on
    both engines — no float fold order or rounding-mode divergence.

    Scale notes: entirely per-row HOFs over the vector column — no
    shuffle, no Python; at 100 TB this is a narrow map stage that
    pipelines with the scan writing quantized vectors + scale.
    """
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    s = e.select(
        "vec_id",
        "e",
        (F.array_max(F.transform("e", F.abs)) / 127.0).alias("scale"),
    ).filter(F.col("scale") > 0)

    def _q(x):
        mag = F.floor(F.abs(x) / F.col("scale") + 0.5).cast("long")
        return F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.when(x < 0, -mag).otherwise(mag)),
        )

    q = s.select(
        "vec_id", "scale", "e", F.transform("e", _q).alias("qv")
    )
    errs = F.zip_with(
        "e", "qv", lambda x, qi: F.abs(x - qi * F.col("scale"))
    )
    w = q.select("vec_id", "scale", errs.alias("errs"))
    return w.select(
        "vec_id",
        F.floor(F.col("scale") * 1e9 + 0.5).cast("long").alias("scale_ppb"),
        F.array_max(
            F.transform("errs", lambda x: F.floor(x * 1e9 + 0.5).cast("long"))
        ).alias("max_err_ppb"),
        F.aggregate(
            F.transform(
                "errs", lambda x: F.floor(x * x * 1e12 + 0.5).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sse_e12"),
    )


# ---------------------------------------------------------------- #
# deterministic source interleaving                                 #
# ---------------------------------------------------------------- #

_ILV_SEED = "ilv42"

_INTERLEAVE_ORACLE = f"""
WITH k AS (
  SELECT doc_id, source,
         md5('{_ILV_SEED}:' || CAST(doc_id AS VARCHAR)) AS key
  FROM documents
), sdim AS (
  SELECT source, row_number() OVER (ORDER BY source) - 1 AS src_idx
  FROM (SELECT DISTINCT source FROM documents)
), ns AS (
  SELECT count(*) AS n_src FROM sdim
), r AS (
  SELECT k.doc_id, k.source, sdim.src_idx, key,
         row_number() OVER (PARTITION BY k.source ORDER BY key, doc_id) - 1
           AS src_rank
  FROM k JOIN sdim USING (source)
)
SELECT r.doc_id, r.source, r.src_rank,
       r.src_rank * ns.n_src + r.src_idx AS pos
FROM r, ns
"""


@register(
    "q_pipeline_interleave", oracle=_INTERLEAVE_ORACLE, tags=("llm", "pipeline")
)
def q_pipeline_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin interleaving of sources into one
    training order: document i of every source lands before document
    i+1 of any source (pos = src_rank * n_slots + src_idx), with the
    within-source order seeded-shuffled — the epoch layout that keeps
    a mixture's domains evenly spread instead of concatenated.

    Scale notes: the per-source rank is two-phase like
    q_pipeline_shuffle — rows window-rank within (source, first hex
    digit of the md5 key) buckets, and a (sources x 16)-row offset
    table (an aggregate, broadcast back) lifts local ranks to
    per-source ranks. No global sort, no single-partition window over
    the data; the slot index comes from a dense rank over the DISTINCT
    sources (a tiny dim — its single-partition window is bounded by
    the source count, not the corpus), so the layout is independent of
    how sources are NAMED (round-5 fix: the old substr-parse of
    'srcN' silently NULLed on other naming schemes).
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    sdim = (
        d.select("source")
        .distinct()
        .withColumn(
            "src_idx",
            F.row_number().over(Window.orderBy("source")) - 1,
        )
    )
    keyed = d.select(
        "doc_id",
        "source",
        F.md5(
            F.concat(F.lit(f"{_ILV_SEED}:"), F.col("doc_id").cast("string"))
        ).alias("key"),
    ).withColumn("b", F.substring("key", 1, 1))

    local_rn = F.row_number().over(
        Window.partitionBy("source", "b").orderBy("key", "doc_id")
    )
    ranked = keyed.withColumn("local_rn", local_rn)

    counts = keyed.groupBy("source", "b").agg(F.count("*").alias("c"))
    off = counts.select(
        "source",
        "b",
        F.coalesce(
            F.sum("c").over(
                Window.partitionBy("source")
                .orderBy("b")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )

    slots = sdim.agg(F.count("*").alias("n_slots"))
    return (
        ranked.join(F.broadcast(off), ["source", "b"])
        .join(F.broadcast(sdim), "source")
        .crossJoin(F.broadcast(slots))
        .select(
            "doc_id",
            "source",
            (F.col("off") + F.col("local_rn") - 1).alias("src_rank"),
            (
                (F.col("off") + F.col("local_rn") - 1) * F.col("n_slots")
                + F.col("src_idx")
            ).alias("pos"),
        )
    )


# ---------------------------------------------------------------- #
# curriculum staging                                                #
# ---------------------------------------------------------------- #

# Length-curriculum: stage 0 = shortest quartile ... stage 3 =
# longest (the classic easy-to-hard axis); within a stage the order
# is a seeded deterministic shuffle, so an epoch walks stages in
# order but documents within a stage randomly — reproducibly.
_CUR_SEED = "cur42"
_CUR_STAGES = 4

_CURRICULUM_ORACLE = f"""
WITH base AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
), r AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS rn0,
         count(*) OVER () AS n
  FROM base
), st AS (
  SELECT doc_id, n_tokens,
         CAST((rn0 * {_CUR_STAGES}) // n AS INT) AS stage,
         md5('{_CUR_SEED}:' || CAST(doc_id AS VARCHAR)) AS key
  FROM r
)
SELECT doc_id, n_tokens, stage,
       row_number() OVER (PARTITION BY stage ORDER BY key, doc_id) AS position
FROM st
"""


@register("q_pipeline_curriculum", oracle=_CURRICULUM_ORACLE, tags=("llm", "pipeline"))
def q_pipeline_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: quartile the corpus by token count (exact
    global quartiles: stage = floor(rank*4/n), no ntile remainder
    ambiguity), then a seeded deterministic shuffle order WITHIN each
    stage — the training-order plan for easy-to-hard curricula.

    Scale notes: both global orders avoid single-partition windows.
    The length rank is dist_rank.range_row_number (value-bucketed
    two-phase); the within-stage position is the q_pipeline_shuffle
    pattern with the partition extended to (stage, first-hex-digit):
    windows rank 4 x 16 parallel slices, and a 64-row offset table
    (prefix-summed over the hex buckets within each stage) broadcasts
    back. One shuffle per phase, nothing data-sized on one task.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    ranked = range_row_number(d, ["n_tokens", "doc_id"], "rn")
    n = d.agg(F.count("*").alias("n"))
    st = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"CAST(((rn - 1) * {_CUR_STAGES}) DIV n AS INT)").alias("stage"),
            F.md5(
                F.concat(F.lit(f"{_CUR_SEED}:"), F.col("doc_id").cast("string"))
            ).alias("key"),
        )
        .withColumn("b", F.substring("key", 1, 1))
    )
    local_rn = F.row_number().over(
        Window.partitionBy("stage", "b").orderBy("key", "doc_id")
    )
    counts = st.groupBy("stage", "b").agg(F.count("*").alias("c"))
    off = counts.select(
        "stage",
        "b",
        F.coalesce(
            F.sum("c").over(
                Window.partitionBy("stage")
                .orderBy("b")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    return (
        st.withColumn("local_rn", local_rn)
        .join(F.broadcast(off), ["stage", "b"])
        .select(
            "doc_id",
            "n_tokens",
            "stage",
            (F.col("off") + F.col("local_rn")).alias("position"),
        )
    )


# ---------------------------------------------------------------- #
# epoch planning under a token budget                               #
# ---------------------------------------------------------------- #

# Data-constrained mixing (Muennighoff et al. 2023, arXiv:2305.16264):
# when the token budget exceeds a source's share, repeat it — up to a
# diminishing-returns epoch cap — and report the unfillable deficit.
# Weights reuse the q_pipeline_mixture convention; every quantity is
# exact int64 arithmetic (floor-div shares), so both engines plan the
# identical schedule.
_EPOCH_CAP = 4
_BUDGET_X = 2  # token budget = 2x the corpus

_EPOCH_PLAN_ORACLE = f"""
WITH src AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens,
         CAST(100 + 50 * (COALESCE(TRY_CAST(substr(source, 4) AS INT), 0) % 5)
              AS BIGINT) AS wgt
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(avail_tokens) AS BIGINT) AS n_total,
         CAST(SUM(wgt) AS BIGINT) AS sum_w
  FROM src
), plan AS (
  SELECT s.source, s.avail_tokens, s.wgt,
         CAST((s.wgt * (t.n_total * {_BUDGET_X})) // t.sum_w AS BIGINT)
           AS target_tokens
  FROM src s, tot t
)
SELECT source, avail_tokens, wgt, target_tokens,
       CAST(least({_EPOCH_CAP},
             (target_tokens + avail_tokens - 1) // avail_tokens) AS BIGINT)
         AS epochs,
       CAST(least(target_tokens, {_EPOCH_CAP} * avail_tokens) AS BIGINT)
         AS planned_tokens,
       CAST(target_tokens
            - least(target_tokens, {_EPOCH_CAP} * avail_tokens) AS BIGINT)
         AS deficit_tokens
FROM plan
"""


@register("q_pipeline_epoch_plan", oracle=_EPOCH_PLAN_ORACLE, tags=("llm", "pipeline"))
def q_pipeline_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch plan for a 2x-corpus token budget: each source's weighted
    target, the repeat count needed (capped at 4 epochs —
    the data-constrained-scaling diminishing-returns cap), the
    resulting planned tokens, and the deficit the cap leaves unfilled.

    One grouped token-count pass (map-side partials over per-doc
    int64s), a 1-row broadcast total, and pure int64 floor arithmetic
    after that — the plan itself is a sources-sized frame, so at
    100 TB this costs one narrow fact pass regardless of corpus size.
    """
    src = (
        table(spark, sf_dir, "documents")
        .select(
            "source",
            F.size(F.split("text", " ")).cast("long").alias("tok"),
        )
        .groupBy("source")
        .agg(F.sum("tok").alias("avail_tokens"))
        .withColumn(
            # TRY_CAST + 0-default keeps the weight total on arbitrary
            # source names (the q_pipeline_mixture convention, made
            # robust: a name with no numeric suffix weighs 100).
            # try_cast of the FULL suffix — not a digit-capped
            # to_number — so both engines share INT32
            # overflow-to-NULL semantics on long numeric suffixes
            # (ADVICE r7: a 7+-digit suffix parsed NULL here but fine
            # in the DuckDB TRY_CAST(substr(source, 4) AS INT) twin)
            "wgt",
            (
                F.lit(100)
                + F.lit(50)
                * (
                    F.coalesce(
                        F.expr("try_cast(substring(source, 4) as int)"),
                        F.lit(0),
                    )
                    % 5
                )
            ).cast("long"),
        )
    )
    tot = src.agg(
        F.sum("avail_tokens").alias("n_total"), F.sum("wgt").alias("sum_w")
    )
    target = F.expr(f"(wgt * (n_total * {_BUDGET_X})) DIV sum_w")
    return (
        src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "avail_tokens",
            "wgt",
            target.alias("target_tokens"),
            F.least(
                F.lit(_EPOCH_CAP),
                F.expr(
                    f"((wgt * (n_total * {_BUDGET_X})) DIV sum_w"
                    " + avail_tokens - 1) DIV avail_tokens"
                ),
            ).alias("epochs"),
            F.least(
                target, F.lit(_EPOCH_CAP) * F.col("avail_tokens")
            ).alias("planned_tokens"),
            (
                target
                - F.least(target, F.lit(_EPOCH_CAP) * F.col("avail_tokens"))
            ).alias("deficit_tokens"),
        )
    )


# ---------------------------------------------------------------- #
# temperature-resampled source mixture                              #
# ---------------------------------------------------------------- #

# p_i ∝ n_i^alpha with alpha < 1 (T5/multilingual-LM mixing): small
# sources are upsampled toward uniform, big ones damped. alpha=0.3 is
# the published multilingual default. q_pipeline_mixture is the
# fixed-weight sibling; this derives the weights from corpus counts.
_TEMP_ALPHA = "0.3"
_TEMP_Q = 6  # pow() output quantized to 1e-6 scaled longs (exprs doctrine)

_TEMPERATURE_ORACLE = f"""
WITH w AS (
  SELECT source, count(*) AS n_src,
         CAST(round(pow(count(*), {_TEMP_ALPHA}) * {10**_TEMP_Q}) AS BIGINT)
           AS w_q6
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_src) AS BIGINT) AS n_total,
         CAST(SUM(w_q6) AS BIGINT) AS sum_w FROM w
)
SELECT w.source, w.n_src, w.w_q6,
       CAST((w.w_q6 * {10**_TEMP_Q}) // tot.sum_w AS BIGINT) AS p_q6,
       CAST(((w.w_q6 * {10**_TEMP_Q}) // tot.sum_w) * tot.n_total // w.n_src
            AS BIGINT) AS epochs_q6
FROM w, tot
"""


@register(
    "q_pipeline_temperature", oracle=_TEMPERATURE_ORACLE, tags=("llm", "pipeline")
)
def q_pipeline_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled domain mixture: per-source sampling
    probability p_i ∝ n_i^0.3 and the implied per-source epoch factor
    (how many passes over source i a one-corpus-sized budget makes:
    >1e6 means upsampled). The knob every multilingual / multi-domain
    pre-training mix is tuned with; q_pipeline_mixture applies a given
    weight table, this DERIVES one from the corpus.

    Determinism: pow(n, 0.3) quantizes to 1e-6 scaled longs at the
    agg boundary (the q_text_kl_divergence doctrine — libm last-ulp
    noise cannot flip a 6dp quantization off a tie for these count
    inputs), and every downstream step is integer arithmetic (// on
    non-negative longs ≡ Spark DIV).

    Scale notes: ONE per-source aggregate (map-side partials) over a
    single pruned corpus scan; the totals ride a global window over
    the already-aggregated sources-bounded frame (a separate aggregate
    branch would re-scan the corpus — the plan test pins one scan).
    The derived table would broadcast straight into
    q_pipeline_mixture's keep-decision map at any corpus size.
    """
    d = table(spark, sf_dir, "documents").select("source")
    w = d.groupBy("source").agg(
        F.count("*").alias("n_src"),
        F.floor(
            F.pow(F.count("*"), F.lit(float(_TEMP_ALPHA))) * (10**_TEMP_Q)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w_q6"),
    )
    # global window over the ~n_sources-row frame (post-aggregation —
    # the SinglePartition here holds one row per SOURCE, never corpus)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    totd = w.select(
        "source",
        "n_src",
        "w_q6",
        F.sum("n_src").over(wall).cast("long").alias("n_total"),
        F.sum("w_q6").over(wall).cast("long").alias("sum_w"),
    )
    return totd.select(
        "source",
        "n_src",
        "w_q6",
        F.expr(f"(w_q6 * {10**_TEMP_Q}) DIV sum_w").cast("long").alias("p_q6"),
        F.expr(f"((w_q6 * {10**_TEMP_Q}) DIV sum_w) * n_total DIV n_src")
        .cast("long")
        .alias("epochs_q6"),
    )
