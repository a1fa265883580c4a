"""Corpus-curation operators round 3: decontamination, token-budget
packing, PII scrubbing.

These are the remaining standard stages of a pre-training data build
that the dedup/quality/split operators (llm/dedup.py, llm/pipeline.py)
don't yet cover:

  * benchmark DEcontamination — find training documents sharing long
    n-grams with an evaluation set, the standard train/test-leakage
    check run before every pre-training job;
  * token-budget packing — assign documents to fixed-token-budget
    training shards in a deterministic order (the sharding step before
    sequence packing proper, which is a per-shard local operation);
  * PII scrubbing — regex redaction with per-document audit counts.

All three are pure Catalyst (no Python in the hot path) and
differentially verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.llm.dedup import (
    _AUG_ORACLE,
    AUG_OFFSET,
    augmented_corpus,
)
from pokertracker_cassandra_st_spark.registry import register

# ---------------------------------------------------------------- #
# decontamination                                                   #
# ---------------------------------------------------------------- #

_NGRAM = 8

_CONTAMINATION_ORACLE = f"""
WITH corpus AS ({_AUG_ORACLE}),
toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM corpus
),
shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i, i + {_NGRAM - 1}), ' ') AS sh
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {_NGRAM - 1})) AS i
        FROM toks)
),
ev AS (
  SELECT doc_id, sh FROM shingles
  WHERE doc_id % 20 = 0 AND doc_id < {AUG_OFFSET}
),
tr AS (
  SELECT doc_id, sh FROM shingles WHERE doc_id >= {AUG_OFFSET}
)
SELECT tr.doc_id AS train_id,
       count(DISTINCT tr.sh) AS n_shared_shingles,
       count(DISTINCT ev.doc_id) AS n_eval_docs
FROM tr JOIN ev ON tr.sh = ev.sh
GROUP BY tr.doc_id
"""


@register("q_text_contamination", oracle=_CONTAMINATION_ORACLE, tags=("llm", "text"))
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents that share at least
    one word-8-gram with the evaluation set, with the count of shared
    8-grams and of eval documents hit.

    The fixture corpus is all-distinct, so the check runs over the same
    augmented corpus the dedup tiers use (llm/dedup.augmented_corpus):
    eval = original docs with doc_id % 20 == 0, train = the mutated
    copies (doc_id >= AUG_OFFSET) — every eval doc's near-copy in train
    is a guaranteed leak, exactly the scenario decontamination exists to
    catch.

    Scale notes: only (shingle, doc_id) pairs shuffle — never text; the
    eval side of the join is the benchmark suite (tiny vs a 100 TB
    corpus), so Spark broadcasts it and the train side never shuffles.
    In production the shingle would be hashed to 8 bytes
    (xxhash64) before the join; here it stays a string so the DuckDB
    differential is engine-independent.
    """
    corpus = augmented_corpus(spark, sf_dir)
    toks = F.split("text", " ")
    sh = (
        corpus.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= _NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    # greatest(...,1): totality guard (see llm/dedup.py)
                    F.sequence(F.lit(1), F.greatest(F.size("t") - (_NGRAM - 1), F.lit(1))),
                    lambda i: F.array_join(F.slice("t", i, _NGRAM), " "),
                )
            ).alias("sh"),
        )
        .distinct()
    )
    ev = sh.filter((F.col("doc_id") % 20 == 0) & (F.col("doc_id") < AUG_OFFSET)).select(
        F.col("doc_id").alias("eval_id"), "sh"
    )
    tr = sh.filter(F.col("doc_id") >= AUG_OFFSET).select(
        F.col("doc_id").alias("train_id"), "sh"
    )
    return (
        tr.join(F.broadcast(ev), "sh")
        .groupBy("train_id")
        .agg(
            F.countDistinct("sh").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


# ---------------------------------------------------------------- #
# token-budget packing                                              #
# ---------------------------------------------------------------- #

_PACK_BUDGET = 2000  # tokens per shard
_PACK_BUCKET = 64  # docs per phase-1 range bucket

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
),
c AS (
  SELECT doc_id, n,
         SUM(n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
           AS tokens_before
  FROM t
)
SELECT CAST(tokens_before // {_PACK_BUDGET} AS BIGINT) AS shard,
       count(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM c
GROUP BY 1
"""


@register("q_pipeline_pack", oracle=_PACK_ORACLE, tags=("llm", "pipeline"))
def q_pipeline_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment: walk documents in doc_id order,
    cut a new training shard every {budget} tokens (shard = exclusive
    running token count // budget), report per-shard stats. This is the
    sharding stage of sequence packing — the subsequent pack-into-
    context-windows step is a per-shard local operation.

    Scale notes: a naive global-window cumsum would move the corpus
    through ONE partition. Implemented instead as the classic two-phase
    distributed prefix sum: (1) bucket docs into ordered doc_id ranges
    and aggregate per-bucket token sums (partial agg, fully parallel);
    (2) the per-bucket sums — corpus_size / bucket_size rows, tiny —
    get an exclusive cumsum and broadcast back as offsets; (3) each
    bucket computes its local cumsum in parallel and adds its offset.
    Identical result to the single-window oracle, but the wide table
    only ever shuffles on the bucket key. Token counts are exact
    integers, so cross-engine equality is exact.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    bucketed = d.withColumn("bkt", F.floor(F.col("doc_id") / _PACK_BUCKET))
    # phase 1: per-bucket totals (tiny output)
    sums = bucketed.groupBy("bkt").agg(F.sum("n").alias("bkt_n"))
    # phase 2: exclusive prefix over the bucket sums — row count is
    # n_docs / bucket_size, so the single-partition window is on a
    # provably tiny frame (thousands of rows even at 100 TB)
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = sums.select(
        "bkt", (F.sum("bkt_n").over(wb) - F.col("bkt_n")).alias("offset")
    )
    # phase 3: local cumsum within each bucket + broadcast offset
    wl = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        bucketed.join(F.broadcast(offsets), "bkt")
        .withColumn(
            "tokens_before", F.col("offset") + F.sum("n").over(wl) - F.col("n")
        )
        .withColumn("shard", F.floor(F.col("tokens_before") / _PACK_BUDGET))
    )
    return packed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


# ---------------------------------------------------------------- #
# PII scrubbing                                                     #
# ---------------------------------------------------------------- #

# shared Java-regex / RE2 subset (no lookaround, no backrefs)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_PII_ORACLE = f"""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN concat('contact_', CAST(doc_id AS VARCHAR),
                          '@example.com ', text)
              ELSE text END AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g') AS clean
  FROM seeded
)
SELECT doc_id, n_emails,
       CAST(len(clean) AS BIGINT) AS clean_len,
       substr(clean, 1, 40) AS clean_head
FROM scrubbed
"""


@register("q_text_pii_scrub", oracle=_PII_ORACLE, tags=("llm", "text"))
def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing with audit counts: redact email addresses to
    [EMAIL], report per-document redaction count and scrubbed length.
    Every fifth document gets a deterministic synthetic email prepended
    (identically in both engines) so the redaction path provably fires
    on the otherwise email-free fixture corpus.

    The pattern stays inside the Java-regex ∩ RE2 common subset (no
    lookaround/backrefs) so Spark and DuckDB agree byte-for-byte —
    which is also the production posture: RE2-compatible patterns keep
    the option of pushing the scrub into native scanners.

    Scale notes: pure per-row projection — no shuffle at all; Catalyst
    fuses seed + count + replace into the scan. At 100 TB this is the
    cheapest kind of operator there is.
    """
    d = table(spark, sf_dir, "documents")
    seeded = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit("contact_"), F.col("doc_id").cast("string"),
                 F.lit("@example.com "), F.col("text")),
    ).otherwise(F.col("text"))
    clean = F.regexp_replace(seeded, _EMAIL_RE, "[EMAIL]")
    return d.select(
        "doc_id",
        F.regexp_count(seeded, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.length(clean).cast("long").alias("clean_len"),
        F.substring(clean, 1, 40).alias("clean_head"),
    )


# ---------------------------------------------------------------- #
# per-source token budget cap                                       #
# ---------------------------------------------------------------- #

_CAP_BUDGET = 3000  # tokens admitted per source
_CAP_SEED = "cap7"

_CAP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n,
         md5('{_CAP_SEED}:' || CAST(doc_id AS VARCHAR)) AS key
  FROM documents
), c AS (
  SELECT doc_id, source, n,
         SUM(n) OVER (PARTITION BY source ORDER BY key, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
           AS tokens_before
  FROM t
)
SELECT source,
       count(*) AS n_docs,
       count(*) FILTER (WHERE tokens_before < {_CAP_BUDGET}) AS n_kept,
       count(*) FILTER (WHERE tokens_before >= {_CAP_BUDGET}) AS n_dropped,
       CAST(SUM(n) FILTER (WHERE tokens_before < {_CAP_BUDGET}) AS BIGINT)
         AS tokens_kept,
       CAST(SUM(n) AS BIGINT) AS tokens_total
FROM c
GROUP BY source
ORDER BY source
"""


@register("q_pipeline_budget_cap", oracle=_CAP_ORACLE, tags=("llm", "pipeline"))
def q_pipeline_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budget admission — the mixture-building stage
    that caps every domain's contribution (a source stops admitting
    documents once {budget} tokens are taken, in a seeded-random but
    DETERMINISTIC priority order, so over-represented domains are
    down-sampled by truncation rather than rate): per source, the
    admission waterfall n_docs / n_kept / n_dropped / tokens.

    A doc is admitted iff the EXCLUSIVE running token count before it
    is still under budget (so the crossing document is kept — the
    budget is a low-water admission mark, matching q_pipeline_pack's
    shard-cut rule).

    Scale notes: the running count is the same two-phase distributed
    prefix sum as q_pipeline_pack, but partitioned per source: phase 1
    aggregates per (source, 16 md5-digit buckets); phase 2's exclusive
    cumsum windows over 16 rows PER SOURCE (bounded, never corpus-
    sized); phase 3 cumsums locally within each bucket and adds the
    broadcast offset. No global or per-source full-width window ever
    materializes.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n"),
        F.md5(
            F.concat(F.lit(f"{_CAP_SEED}:"), F.col("doc_id").cast("string"))
        ).alias("key"),
    ).withColumn("b", F.substring("key", 1, 1))
    sums = d.groupBy("source", "b").agg(F.sum("n").alias("bn"))
    wb = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = sums.select(
        "source", "b", (F.sum("bn").over(wb) - F.col("bn")).alias("off")
    )
    wl = (
        Window.partitionBy("source", "b")
        .orderBy("key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = (
        d.join(F.broadcast(offsets), ["source", "b"])
        .withColumn(
            "tokens_before", F.col("off") + F.sum("n").over(wl) - F.col("n")
        )
    )
    kept = F.col("tokens_before") < _CAP_BUDGET
    return (
        c.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.count(F.when(~kept, 1)).alias("n_dropped"),
            F.sum(F.when(kept, F.col("n"))).alias("tokens_kept"),
            F.sum("n").alias("tokens_total"),
        )
        .orderBy("source")
    )


# ---- quality-priority dedup (keep-best) ----------------------------- #
# Truncation duplicates — the same document captured at different
# lengths — are the crawl-dedup case where "keep the FIRST copy seen"
# (q_dedup_exact's min-id rule) is wrong: the right policy keeps the
# HIGHEST-QUALITY member of each duplicate cluster. Cluster key: the
# first-8-token prefix fingerprint (truncation preserves prefixes);
# keep rule: most tokens, then lowest doc_id — both integers, so the
# argmax is deterministic cross-engine. The augmented corpus's
# drop-last-token mutants guarantee real clusters to adjudicate.
_KEEPBEST_PREFIX = 8

_KEEPBEST_ORACLE = f"""
WITH corpus AS ({{aug}}),
scored AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         md5(array_to_string(
           list_slice(string_split(text, ' '), 1,
                      least(len(string_split(text, ' ')), {_KEEPBEST_PREFIX})),
           ' ')) AS cluster_key
  FROM corpus
), ranked AS (
  SELECT cluster_key, doc_id, n_tokens,
         row_number() OVER (PARTITION BY cluster_key
                            ORDER BY n_tokens DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_key) AS n_members,
         SUM(n_tokens) OVER (PARTITION BY cluster_key) AS cluster_tokens
  FROM scored
)
SELECT cluster_key, doc_id AS keep_id,
       CAST(n_tokens AS BIGINT) AS keep_tokens,
       n_members,
       CAST(cluster_tokens - n_tokens AS BIGINT) AS dropped_tokens
FROM ranked
WHERE rn = 1 AND n_members > 1
""".format(aug=_AUG_ORACLE)


@register("q_dedup_keepbest", oracle=_KEEPBEST_ORACLE, tags=("llm", "dedup"))
def q_dedup_keepbest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-priority dedup: cluster by first-8-token prefix
    fingerprint (truncation dups share prefixes), keep the member with
    the most tokens (tie: lowest doc_id), report kept id + dropped
    token volume per real cluster.

    Scale notes: only (md5-of-prefix, doc_id, n_tokens) shuffles — the
    text never leaves the scan stage; one exchange on the 16-byte
    cluster key serves the rank, membership count, and token-sum
    windows (same partitioning, zero extra shuffles). The keep rule is
    a policy slot: swap n_tokens for any precomputed quality score
    (q_text_quality) without changing the plan shape.

    Known false-positive mode (ADVICE r7): prefix-only admission
    over-merges genuinely distinct documents that share a boilerplate
    opening (license headers, templated intros — common in crawled
    corpora); all but the longest are reported dropped. On such a
    corpus, tighten admission with a containment or length-ratio guard
    (q_dedup_containment implements the Broder containment test) in
    the same policy slot — the cluster key stays the blocking key, the
    guard only prunes members. The hot-prefix skew bound is tested at
    tests/test_adversarial.py (10^4 docs sharing one prefix: a single
    window partition, which WindowGroupLimit caps map-side).
    """
    corpus = augmented_corpus(spark, sf_dir)
    toks = F.split("text", " ")
    scored = corpus.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.md5(
            F.array_join(
                F.slice(
                    toks, 1, F.least(F.size(toks), F.lit(_KEEPBEST_PREFIX))
                ),
                " ",
            )
        ).alias("cluster_key"),
    )
    w = Window.partitionBy("cluster_key")
    ranked = scored.select(
        "cluster_key",
        "doc_id",
        "n_tokens",
        F.row_number()
        .over(w.orderBy(F.desc("n_tokens"), F.asc("doc_id")))
        .alias("rn"),
        F.count("*").over(w).alias("n_members"),
        F.sum("n_tokens").over(w).alias("cluster_tokens"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("n_members") > 1)).select(
        "cluster_key",
        F.col("doc_id").alias("keep_id"),
        F.col("n_tokens").cast("long").alias("keep_tokens"),
        "n_members",
        (F.col("cluster_tokens") - F.col("n_tokens"))
        .cast("long")
        .alias("dropped_tokens"),
    )
