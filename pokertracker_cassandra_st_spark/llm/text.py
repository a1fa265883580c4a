"""Text-analysis operators: stats, TF-IDF, language-ID heuristic,
quality scoring, token counting, fingerprinting.

All pure Catalyst expressions (regex, HOFs, windows) — no Python in the
hot path, every one oracle-checked.

Scale notes: each query is scan -> narrow transforms -> one bounded
shuffle (groupBy/window on doc or term keys). TF-IDF's term join
shuffles (term, doc, tf) triples, never document text; at 100 TB the
document-frequency side is tiny relative to the corpus and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.exprs import davg, md5_16bit, o_davg, o_md5_16bit
from pokertracker_cassandra_st_spark.registry import register

STOPWORDS = ("the", "a", "of", "and", "to", "in")
_SW_SQL = "['" + "','".join(STOPWORDS) + "']"


@register(
    "q_text_stats",
    oracle=f"""
SELECT lang, source,
       count(*) AS n_docs,
       {o_davg('n_chars')} AS avg_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       {o_davg("len(string_split(text, ' '))")} AS avg_tokens
FROM documents
GROUP BY lang, source
""",
    tags=("llm", "text"),
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per (lang, source)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        davg("n_chars").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        davg(F.size(F.split("text", " "))).alias("avg_tokens"),
    )


@register(
    "q_text_tfidf",
    oracle="""
WITH tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY doc_id, tok
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
  FROM scored
)
SELECT doc_id, term, tfidf, rk FROM ranked WHERE rk <= 3
""",
    tags=("llm", "text", "bench"),
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: tokenize -> tf -> document
    frequency as a count over a term-partitioned window -> top-k.

    The window form computes df WITHOUT a second aggregation branch, so
    the corpus is tokenized exactly once (the join form re-executes the
    tokenize+tf lineage for its df side unless tf is materialized —
    measured 1.03s vs 0.75s at sf0.1). Tradeoff at 100 TB: stopword
    terms make hot window partitions; there, materialize tf once
    (cache/checkpoint) and shuffle-JOIN a separately aggregated df on
    term so AQE's skew handling applies — same output, documented here
    because the right physical shape flips with corpus size."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # corpus size enters the plan as a broadcast 1-row aggregate frame —
    # no driver-side d.count() roundtrip / extra scan-job (the same lazy
    # literal-frame pattern as operators/replay.py's as-of snapshot)
    n1 = d.agg(F.count("*").alias("n_docs"))
    w_df = Window.partitionBy("term")
    tfidf = F.round(
        F.col("tf")
        * F.log((F.col("n_docs") + 1.0) / (F.count("*").over(w_df) + 1.0)),
        6,
    ).alias("tfidf")
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        tf.crossJoin(F.broadcast(n1))
        .select("doc_id", "term", tfidf)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )


@register(
    "q_text_langid",
    oracle=f"""
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN len(list_filter(string_split(text, ' '),
                                 t -> list_contains({_SW_SQL}, t))) >= 3 THEN 'en-like'
            WHEN length(text) > 300 THEN 'long-unk'
            ELSE 'unk' END AS guessed_lang,
       len(list_filter(string_split(text, ' '),
                       t -> list_contains({_SW_SQL}, t))) AS n_stopwords
FROM documents
""",
    tags=("llm", "text"),
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit count as the n-gram-profile
    stand-in (the corpus is synthetic; the operator shape — token
    profile -> argmax class — is what scales)."""
    d = table(spark, sf_dir, "documents")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_sw = F.size(F.filter(F.split("text", " "), lambda t: F.array_contains(sw, t)))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(n_sw >= 3, "en-like")
        .when(F.length("text") > 300, "long-unk")
        .otherwise("unk")
        .alias("guessed_lang"),
        n_sw.cast("long").alias("n_stopwords"),
    )


@register(
    "q_text_quality",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
           / length(text) AS space_ratio,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> list_contains({_SW_SQL}, t))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stopword_ratio,
         CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
           / length(text) AS nonalpha_ratio
  FROM documents
)
SELECT doc_id, lang, n_tokens,
       round(space_ratio, 6) AS space_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(nonalpha_ratio, 6) AS nonalpha_ratio,
       (n_tokens >= 20 AND nonalpha_ratio < 0.1 AND stopword_ratio >= 0.01)
         AS keep
FROM feats
""",
    tags=("llm", "text"),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword-ratio features
    and a keep/drop gate — the standard pre-training filter shape."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    space_ratio = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    ).cast("double") / F.length("text")
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
        / n_tokens
    )
    nonalpha_ratio = (
        F.length(F.regexp_replace("text", "[a-z ]", "")).cast("double")
        / F.length("text")
    )
    keep = (n_tokens >= 20) & (nonalpha_ratio < 0.1) & (stop_ratio >= 0.01)
    return d.select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(space_ratio, 6).alias("space_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(nonalpha_ratio, 6).alias("nonalpha_ratio"),
        keep.alias("keep"),
    )


@register(
    "q_text_tokens",
    oracle=r"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_ish_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_len_est
FROM documents
""",
    tags=("llm", "text"),
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, a BPE-ish regex tokenizer
    count, and the chars/4 heuristic estimate."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        ).cast("long").alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).alias("byte_len_est"),
    )


@register(
    "q_text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS norm_fp,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         AS bag_fp
FROM documents
""",
    tags=("llm", "text"),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized text
    (near-exact dedup key) and of the sorted distinct-word bag
    (order-insensitive dedup key)."""
    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    bag = F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_fp"),
        F.md5(bag).alias("bag_fp"),
    )


# ---------------------------------------------------------------- #
# boilerplate removal (frequency-threshold segment filter)          #
# ---------------------------------------------------------------- #

_BSEG = 10  # tokens per non-overlapping segment (mirrors dedup.py._SEG)
_BOILER_MIN_DOCS = 3  # a segment in >= this many distinct docs is boilerplate

_BOILER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), seg AS (
  SELECT doc_id, seg_idx,
         array_to_string(list_slice(toks, seg_idx * {_BSEG} + 1,
                                    seg_idx * {_BSEG} + {_BSEG}), ' ')
           AS seg_text
  FROM (SELECT doc_id, toks,
               unnest(generate_series(0, (len(toks) + {_BSEG - 1}) // {_BSEG} - 1))
                 AS seg_idx
        FROM t WHERE len(toks) > 0)
), freq AS (
  SELECT md5(seg_text) AS seg_hash, count(DISTINCT doc_id) AS nd
  FROM seg GROUP BY md5(seg_text)
), marked AS (
  SELECT s.doc_id, s.seg_idx, s.seg_text,
         f.nd >= {_BOILER_MIN_DOCS} AS boiler
  FROM seg s JOIN freq f ON md5(s.seg_text) = f.seg_hash
)
SELECT doc_id,
       count(*) AS n_segments,
       CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       md5(coalesce(string_agg(CASE WHEN NOT boiler THEN seg_text END, ' '
                               ORDER BY seg_idx), '')) AS clean_hash
FROM marked
GROUP BY doc_id
"""


@register("q_text_boilerplate", oracle=_BOILER_ORACLE, tags=("llm", "text"))
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal (the C4 policy-line /
    repeated-header filter): a token segment occurring in >=
    ``_BOILER_MIN_DOCS`` DISTINCT documents is boilerplate and is
    dropped from EVERY document (unlike q_dedup_lines, which keeps the
    first occurrence). Emits per document the segment counts and the
    md5 of the reconstructed (cleaned, order-preserving) text, so the
    output identity of the rewritten corpus is oracle-checked without
    shipping the text back.

    Scale notes: the frequency pass shuffles (md5, doc_id) pairs only —
    16-byte keys, map-side distinct-partials, never text. The rebuild
    pass must move surviving segment text once, on doc_id — the
    unavoidable cost of EMITTING a rewritten corpus (any engine pays
    it); segments are grouped back with an in-group sort on seg_idx,
    not a global sort. The boilerplate hash set is tiny (frequency
    threshold keeps only cross-doc repeats) so at 100 TB the
    mark-join broadcasts.
    """
    t = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") > 0)
    )
    n_segs = ((F.size("toks") + _BSEG - 1) / _BSEG).cast("long")
    seg = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx"),
        F.col("toks"),
    ).select(
        "doc_id",
        "seg_idx",
        F.array_join(
            F.slice(F.col("toks"), F.col("seg_idx") * _BSEG + 1, F.lit(_BSEG)),
            " ",
        ).alias("seg_text"),
    )
    freq = (
        seg.select(F.md5("seg_text").alias("seg_hash"), "doc_id")
        .distinct()
        .groupBy("seg_hash")
        .agg(F.count("*").alias("nd"))
    )
    marked = seg.join(
        freq, F.md5(seg["seg_text"]) == freq["seg_hash"]
    ).select(
        "doc_id",
        "seg_idx",
        "seg_text",
        (F.col("nd") >= _BOILER_MIN_DOCS).alias("boiler"),
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(~F.col("boiler"), F.struct("seg_idx", "seg_text"))
        )
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("boiler"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.md5(
            F.array_join(F.transform(kept, lambda s: s["seg_text"]), " ")
        ).alias("clean_hash"),
    )


@register(
    "q_text_bigrams",
    oracle="""
WITH bg AS (
  SELECT unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS bigram
  FROM (SELECT string_split(text, ' ') AS tk FROM documents)
)
SELECT bigram, count(*) AS n
FROM bg
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""",
    tags=("llm", "text"),
)
def q_text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams with counts (tie-broken by bigram text).

    Spark builds each document's bigram list in ONE pass with
    ``zip_with`` over two array slices — no positional self-join, no
    UDF — then explodes and counts; the oracle builds the same pairs
    via an index-range list comprehension so the engines arrive at the
    same multiset independently. The n-gram LM / repetition-analysis
    primitive over a corpus.

    Scale notes: bigram construction is embarrassingly parallel
    (per-document, inside codegen); the only shuffle carries (bigram,
    partial count) pairs after map-side combine, and the top-20 is a
    TakeOrderedAndProject — no global sort materialization.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


# Char-bigram LM: log-probs are scaled to exact longs (ln agrees between
# engines to ~1 ulp; rounding at 1e-6 makes the per-doc SUM exact and
# order independent, same doctrine as exprs.slong).
_CHARLM_SCALE = 1_000_000


@register(
    "q_text_charlm",
    oracle=f"""
WITH bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text)),
                               i -> substr(text, CAST(i AS INTEGER), 2))) AS bg
  FROM documents
), counts AS (
  SELECT bg, count(*) AS cnt FROM bigrams GROUP BY bg
), ctx AS (
  SELECT substr(bg, 1, 1) AS c1, SUM(cnt) AS tot FROM counts GROUP BY c1
), model AS (
  SELECT bg,
         CAST(round(ln(CAST(cnt AS DOUBLE) / tot) * {_CHARLM_SCALE}) AS BIGINT)
           AS logp_s
  FROM counts JOIN ctx ON substr(bg, 1, 1) = c1
)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       round(CAST(SUM(m.logp_s) AS DOUBLE) / {_CHARLM_SCALE} / count(*), 4)
         AS avg_logp
FROM bigrams b JOIN model m ON b.bg = m.bg
WHERE b.doc_id < 50
GROUP BY b.doc_id
ORDER BY b.doc_id
""",
    tags=("llm", "text"),
)
def q_text_charlm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language-model scoring (perplexity proxy): fit
    unsmoothed bigram probabilities P(c₂|c₁) on the whole corpus, then
    score each of the first 50 documents by its average log-probability
    — the classic cheap quality/outlier signal a curation pipeline runs
    before anything neural (wikipedia-LM perplexity filters in public
    corpus pipelines use exactly this shape).

    The model is two aggregations over exploded bigrams; scoring is a
    broadcast join of the tiny model (bounded by charset², not data)
    against per-doc bigrams. Log-probs travel as scaled longs so the
    per-doc reduction is exact-integer — order independent under any
    partitioning. No UDFs anywhere.
    """
    docs = table(spark, sf_dir, "documents")
    # GUARD: Spark's sequence(a, b) runs DESCENDING when b < a, so a
    # doc with length < 2 would fabricate bigrams from indices [1,0,-1]
    # (DuckDB's range() is ascending-only and yields empty) — caught by
    # the adversarial empty/single-char fixtures.
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN length(text) >= 2 THEN "
                "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2)) "
                "ELSE array() END"
            )
        ).alias("bg"),
    )
    counts = bigrams.groupBy("bg").agg(F.count("*").alias("cnt"))
    ctx = counts.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("cnt").alias("tot")
    )
    model = counts.join(
        ctx, F.substring("bg", 1, 1) == F.col("c1")
    ).select(
        "bg",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("tot")) * _CHARLM_SCALE
        )
        .cast("long")
        .alias("logp_s"),
    )
    return (
        bigrams.filter(F.col("doc_id") < 50)
        .join(F.broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum("logp_s").cast("double") / _CHARLM_SCALE / F.count("*"), 4
            ).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_text_readability",
    oracle="""
WITH f AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_words,
         len(regexp_extract_all(text, '[aeiou]+')) AS n_syll
  FROM documents
  WHERE length(text) > 0
)
SELECT doc_id, lang, n_words, n_syll,
       CAST(floor(CAST(206835 * n_words - 1015 * n_words * n_words
                       - 84600 * n_syll AS DOUBLE)
                  / (n_words * 10) + 0.5) AS DOUBLE) / 100 AS flesch_like
FROM f
""",
    tags=("llm", "text"),
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability score per document, with vowel-group
    runs as the syllable proxy (the standard cheap approximation) and
    each document scored as one sentence — a quality-gate feature the
    curation stack uses alongside stopword/repetition ratios.

    Both engines count the same integer features (token count, vowel
    groups) and evaluate the identical linear form; the rounding is
    display-only. Pure narrow scan — no shuffle at all.
    """
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_words = F.size(F.split("text", " "))
    n_syll = F.size(F.expr("regexp_extract_all(text, '[aeiou]+', 0)"))
    # exact-integer numerator (score × 1000·n_words), ONE final double
    # divide — the float result is bit-identical across engines, so the
    # 2-decimal rounding can't straddle an ulp boundary (the multi-term
    # float form differed in the last ulp at exactly .xx5 values)
    nw = n_words.cast("long")
    ns = n_syll.cast("long")
    # floor(x·100 + 0.5)/100 instead of round(): Spark's round goes
    # through BigDecimal.valueOf (decimal-string), DuckDB rounds the
    # binary double — exact .xx5 quotients flip between them; floor of
    # the identical double is engine-independent (exprs.slong doctrine)
    num = F.lit(206835) * nw - F.lit(1015) * nw * nw - F.lit(84600) * ns
    x100 = num.cast("double") / (nw * 10)
    return d.select(
        "doc_id",
        "lang",
        nw.alias("n_words"),
        ns.alias("n_syll"),
        (F.floor(x100 + F.lit(0.5)).cast("double") / 100).alias("flesch_like"),
    )


@register(
    "q_text_bpe_step",
    oracle="""
WITH chars AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text)),
                               i -> substr(text, CAST(i AS INTEGER), 2))) AS bg
  FROM documents WHERE length(text) >= 2
), top1 AS (
  SELECT bg AS pair FROM chars GROUP BY bg
  ORDER BY count(*) DESC, bg LIMIT 1
), merged AS (
  SELECT d.doc_id, replace(d.text, t.pair, '#') AS mtext, t.pair
  FROM documents d CROSS JOIN top1 t
  WHERE length(d.text) >= 2
), post AS (
  SELECT pair,
         unnest(list_transform(range(1, length(mtext)),
                               i -> substr(mtext, CAST(i AS INTEGER), 2))) AS bg
  FROM merged
)
SELECT pair AS merged_pair, bg AS next_pair, count(*) AS n,
       CAST(row_number() OVER (ORDER BY count(*) DESC, bg) AS BIGINT)
         AS merge_rank
FROM post
GROUP BY pair, bg
ORDER BY n DESC, bg
LIMIT 10
""",
    tags=("llm", "text"),
)
def q_text_bpe_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding merge iteration — the tokenizer-training
    inner loop as a distributed query: count all character pairs,
    pick the most frequent (tie-broken lexicographically), rewrite the
    corpus replacing that pair with a fresh symbol ('#', leftmost
    non-overlapping — identical replace semantics in the JVM and
    DuckDB), and emit the next iteration's top-10 candidate pairs.
    Real BPE runs this loop vocab-size times with the same dataflow.

    The chosen pair flows through the plan as a broadcast scalar
    (no .collect() — the iteration is expressible as one DAG), and
    the post-merge counts see '#' as a single new alphabet symbol,
    exactly how the next merge round would.

    Scale notes: two bigram-count passes + one broadcast of a 1-row
    relation; counts combine map-side. Production BPE over 100 TB
    batches the loop (N merges per corpus pass, greedy re-scoring
    within a batch) — the per-iteration plan is this one.
    """
    docs = table(spark, sf_dir, "documents").filter(F.length("text") >= 2)

    def bigrams(col):
        return F.explode(
            F.expr(
                f"transform(sequence(1, length({col}) - 1),"
                f" i -> substring({col}, i, 2))"
            )
        )

    chars = docs.select(bigrams("text").alias("bg"))
    top1 = (
        chars.groupBy("bg")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "bg")
        .limit(1)
        .select(F.col("bg").alias("pair"))
    )
    merged = docs.crossJoin(F.broadcast(top1)).select(
        "pair", F.replace(F.col("text"), F.col("pair"), F.lit("#")).alias("mtext")
    )
    post = merged.select("pair", bigrams("mtext").alias("bg"))
    # top-10 FIRST via orderBy+limit (TakeOrdered: per-partition heaps,
    # no single-partition shuffle), THEN rank — the partition-less
    # window runs on a <= 10-row frame, bounded by construction
    w = Window.orderBy(F.desc("n"), "next_pair")
    return (
        post.groupBy("pair", "bg")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("pair").alias("merged_pair"),
            F.col("bg").alias("next_pair"),
            "n",
        )
        .orderBy(F.desc("n"), "next_pair")
        .limit(10)
        .withColumn("merge_rank", F.row_number().over(w).cast("long"))
    )


# ---- hashed linear quality classifier ------------------------------ #
# fastText-style inference shape: token -> hash bucket -> weight; the
# "model" here is a closed-form integer weight per bucket (Knuth
# multiplicative mix) so the oracle reproduces it exactly — a trained
# model swaps in a broadcast weight array, same plan.
_HC_BUCKETS = 256
_HC_MIX = 2654435761  # Knuth's 2^32 / phi multiplier


@register(
    "q_text_hash_classifier",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
), feats AS (
  SELECT doc_id,
         (({o_md5_16bit('tok')} % {_HC_BUCKETS}) * {_HC_MIX}) % 1001 - 500
           AS w
  FROM toks
)
SELECT doc_id,
       count(*) AS n_toks,
       CAST(sum(w) AS BIGINT) AS weight_sum,
       sum(w) > 0 AS label
FROM feats
GROUP BY doc_id
""",
    tags=("llm", "text"),
)
def q_text_hash_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear text-classifier INFERENCE over hashed token features —
    the fastText / hash-kernel shape every corpus quality filter
    (pretraining "educational value", toxicity, domain routers) runs
    at scale: token -> 16-bit md5 hash -> one of 256 buckets -> integer
    weight; document score = Σ weights, label = score > 0. Weights
    here are a deterministic function of the bucket (Knuth
    multiplicative mix into [-500, 500]) so the DuckDB oracle rebuilds
    the identical model; a real trained model is a 256-entry broadcast
    array lookup in the same plan. Scores stay exact integers — no
    float summation order, no sigmoid needed for the decision
    boundary (monotone), so the label set is bit-deterministic.

    Scale notes: tokenize + hash + weight is one narrow scan-parallel
    pass (all Catalyst expressions, no UDF); the only shuffle carries
    (doc_id, partial integer sum) via map-side combine. Model size is
    O(buckets), broadcast — inference cost is independent of model
    quality tier, which is why hashed linear models (not LLM judges)
    gate the first 100 TB -> 10 TB cut of every pretraining pipeline.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    bucket = F.pmod(md5_16bit(F.col("tok")), F.lit(_HC_BUCKETS))
    weight = F.pmod(bucket * F.lit(_HC_MIX), F.lit(1001)) - 500
    return (
        toks.select("doc_id", weight.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("w").cast("long").alias("weight_sum"),
            (F.sum("w") > 0).alias("label"),
        )
    )


# winnowing (MOSS) parameters: k-token grams, window of w consecutive
# gram hashes; every window contributes its minimum hash. Guarantee:
# any shared run of >= k + w - 1 tokens between two documents yields at
# least one shared fingerprint — the document-level robustness that a
# single rolling hash (q_text_fingerprint) doesn't give.
_WIN_K = 3
_WIN_W = 4

_WINNOW_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= {_WIN_K}
              THEN list_transform(range(1, len(tk) - {_WIN_K - 1} + 1),
                   i -> substr(md5(array_to_string(
                            list_slice(tk, i, i + {_WIN_K - 1}), ' ')), 1, 12))
              ELSE [] END AS kg
  FROM t
), w AS (
  SELECT doc_id,
         CASE WHEN len(kg) >= {_WIN_W}
              THEN list_sort(list_distinct(list_transform(
                       range(1, len(kg) - {_WIN_W - 1} + 1),
                       j -> list_min(list_slice(kg, j, j + {_WIN_W - 1})))))
              ELSE [] END AS fps
  FROM g
)
SELECT doc_id,
       len(fps) AS n_fps,
       fps[1] AS first_fp,
       fps[len(fps)] AS last_fp
FROM w
WHERE len(fps) > 0
"""


@register("q_text_winnow", oracle=_WINNOW_ORACLE, tags=("llm", "text"))
def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    {k}-token gram, slide a {w}-wide window over the gram hashes, keep
    each window's minimum — the selected-fingerprint set that
    guarantees detection of any shared token run of length >= k+w-1
    while storing ~2/(w+1) of the hashes.

    Entirely narrow higher-order functions (sequence/transform/slice/
    array_min on the token array) — ZERO shuffles: fingerprinting is a
    map over the corpus, which is exactly why it scales to 100 TB as an
    ingest-time step. Output is the per-doc fingerprint-set summary
    (count, lexicographic first/last of the sorted distinct set); the
    full set feeds an exact-dedup bucket join downstream (same shape as
    q_dedup_lines). Hashes are md5 hex prefixes — identical strings in
    both engines; docs too short to fill one window emit nothing, the
    contract stated by the WHERE in both plans.
    """
    d = table(spark, sf_dir, "documents")
    tk = F.filter(F.split("text", " "), lambda x: x != "")
    # Filter EARLY on the cheap equivalent predicate (optimization r13,
    # guide §1.2/§7.2): the original ``where(size(fps) > 0)`` is pushed
    # by Catalyst below the projections with the ENTIRE fps expression
    # inlined into the Filter condition — and inside the per-window
    # lambda the full kg array (one md5 per gram) sits as a
    # sub-expression re-evaluated PER WINDOW, turning the filter into
    # O(tokens²) md5 calls per document (measured 169 s at sf0.1 vs
    # ~1 s per projection stage). ``size(fps) > 0`` holds iff
    # size(kg) >= w iff size(tk) >= k + w - 1, so filtering on the
    # token count is value-identical and costs one extra tokenize.
    t = d.select("doc_id", tk.alias("tk")).where(
        F.size(tk) >= _WIN_K + _WIN_W - 1
    )
    kg = F.when(
        F.size("tk") >= _WIN_K,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - (_WIN_K - 1)),
            lambda i: F.substring(
                F.md5(F.array_join(F.slice("tk", i, _WIN_K), " ")), 1, 12
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = t.select("doc_id", kg.alias("kg"))
    fps = F.when(
        F.size("kg") >= _WIN_W,
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("kg") - (_WIN_W - 1)),
                    lambda j: F.array_min(F.slice("kg", j, _WIN_W)),
                )
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # rows reaching here satisfy size(tk) >= k+w-1, so fps is never
    # empty — the WHERE moved above as the equivalent token-count gate
    w = g.select("doc_id", fps.alias("fps"))
    return w.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fps"),
        F.element_at("fps", 1).alias("first_fp"),
        F.element_at("fps", F.size("fps")).alias("last_fp"),
    )


_PMI_VOCAB = 30

_PMI_ORACLE = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, u.tok
  FROM documents, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
       AS u(tok)
), vocab AS (
  SELECT tok, count(*) AS df
  FROM dt GROUP BY tok
  ORDER BY df DESC, tok
  LIMIT {_PMI_VOCAB}
), nd AS (
  SELECT count(*) AS n_docs FROM documents
), pairs AS (
  SELECT a.tok AS t1, b.tok AS t2, count(*) AS n_pair
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
  JOIN vocab v1 ON a.tok = v1.tok
  JOIN vocab v2 ON b.tok = v2.tok
  GROUP BY 1, 2
)
SELECT p.t1, p.t2, p.n_pair, v1.df AS df1, v2.df AS df2,
       CAST(CAST(p.n_pair AS HUGEINT) * nd.n_docs * 1000000
            // (CAST(v1.df AS HUGEINT) * v2.df) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN vocab v1 ON p.t1 = v1.tok
JOIN vocab v2 ON p.t2 = v2.tok
CROSS JOIN nd
ORDER BY lift_ppm DESC, p.t1, p.t2
LIMIT 20
"""


@register("q_text_cooccurrence", oracle=_PMI_ORACLE, tags=("llm", "text"))
def q_text_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence lift (the integer core of PMI) over the
    top-{vocab} vocabulary: for token pairs sharing a document,
    lift = P(t1,t2) / (P(t1)·P(t2)) = n_pair·n_docs / (df1·df2),
    reported as exact parts-per-million (PMI itself is just log(lift);
    the log is monotone, so ranking by integer lift IS ranking by PMI
    with no float in sight).

    Scale shape: the vocabulary (top-30 by document frequency,
    deterministic tie-break) broadcasts; pair generation self-joins the
    distinct (doc, vocab-token) incidence ON THE DOCUMENT KEY, so
    per-doc fan-out is bounded by vocab² (constant), total pairs O(n).
    The lift arithmetic runs in DECIMAL(38)/HUGEINT so n_pair·n_docs·1e6
    stays exact far past int64 (good to ~1e13 docs); n_docs arrives via
    a broadcast 1-row aggregate — no driver-side count.
    """
    d = table(spark, sf_dir, "documents")
    dt = (
        d.select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias(
                "tok"
            ),
        )
        .distinct()
    )
    vocab = (
        dt.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(_PMI_VOCAB)
    )
    nd = d.agg(F.count("*").alias("n_docs"))
    a = dt.join(F.broadcast(vocab.select("tok")), "tok").select(
        "doc_id", F.col("tok").alias("t1")
    )
    b = dt.join(F.broadcast(vocab.select("tok")), "tok").select(
        "doc_id", F.col("tok").alias("t2")
    )
    pairs = (
        a.join(b, ["doc_id"])
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("n_pair"))
    )
    v1 = vocab.select(F.col("tok").alias("t1"), F.col("df").alias("df1"))
    v2 = vocab.select(F.col("tok").alias("t2"), F.col("df").alias("df2"))
    return (
        pairs.join(F.broadcast(v1), "t1")
        .join(F.broadcast(v2), "t2")
        .crossJoin(F.broadcast(nd))
        .select(
            "t1",
            "t2",
            "n_pair",
            "df1",
            "df2",
            F.expr(
                "CAST((CAST(n_pair AS DECIMAL(38,0)) * n_docs * 1000000)"
                " DIV (CAST(df1 AS DECIMAL(38,0)) * df2) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "t1", "t2")
        .limit(20)
    )


# ---- q_text_kl_divergence -------------------------------------------- #
# Domain-shift detection for mixture planning: per-source unigram
# distribution vs the whole-corpus distribution, KL(P_src || Q_corpus)
# with Laplace smoothing over the corpus vocabulary (absent terms get
# the +1 floor, so every term of the full vocab contributes and P sums
# to 1). Each p*ln(p/q) term is quantized to a 1e-12 scaled long before
# summation — exact, order-independent, the q_dq_drift_psi doctrine —
# because a raw double SUM over a large vocab is not associative.
_KL_Q = 12


@register(
    "q_text_kl_divergence",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
), toks2 AS (
  SELECT source, term FROM toks WHERE term <> ''
), vocab AS (
  SELECT term, count(*) AS cnt_c FROM toks2 GROUP BY term
), totals AS (
  SELECT count(*) AS n_c, (SELECT count(*) FROM vocab) AS v FROM toks2
), per_src AS (
  SELECT source, count(*) AS n_s FROM toks2 GROUP BY source
), cnt_st AS (
  SELECT source, term, count(*) AS cnt_s FROM toks2 GROUP BY source, term
), dense AS (
  SELECT s.source, s.n_s, vb.term, vb.cnt_c,
         coalesce(c.cnt_s, 0) AS cnt_s
  FROM per_src s CROSS JOIN vocab vb
  LEFT JOIN cnt_st c ON c.source = s.source AND c.term = vb.term
), terms AS (
  SELECT source, n_s,
         CAST(round(
           (CAST(cnt_s + 1 AS DOUBLE) / (n_s + v))
           * ln((CAST(cnt_s + 1 AS DOUBLE) / (n_s + v))
                / (CAST(cnt_c + 1 AS DOUBLE) / (n_c + v)))
           * 1e{_KL_Q} ) AS BIGINT) AS term_q,
         v
  FROM dense CROSS JOIN totals
)
SELECT source, max(n_s) AS n_tokens, max(v) AS vocab_size,
       round(CAST(sum(term_q) AS DOUBLE) / 1e{_KL_Q}, 6) AS kl
FROM terms
GROUP BY source
""",
    tags=("llm", "text"),
)
def q_text_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence from the corpus distribution —
    the domain-shift score mixture planning (q_pipeline_mixture /
    q_pipeline_epoch_plan) consumes to decide which sources need
    re-weighting.

    One tokenize pass feeds all four count frames; the dense
    (source x vocab) frame is the only fan-out and is bounded by
    |vocab| * |sources|, NOT by corpus rows — the corpus-sized frames
    never join each other. At 100 TB restrict vocab to the top-K terms
    by corpus count first (one extra WindowGroupLimit pass) — the
    smoothed tail contributes O(1/(n+V)) per term and the production
    cut documents itself in the report's vocab_size column. The
    per-source shuffle key is (source, term); term skew (stopwords)
    stays inside the count aggregates, which partial-aggregate
    map-side.
    """
    from pokertracker_cassandra_st_spark.exprs import slong

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    # every downstream frame derives from the ONE (source, term) count
    # aggregation, so its exchange subtree is shared verbatim and the
    # executed plan collapses the corpus tokenize to a single scan via
    # ReusedExchange — five independent frames would re-tokenize five
    # times (plan-locked in tests/test_plans.py)
    cnt_st = toks.groupBy("source", "term").agg(F.count("*").alias("cnt_s"))
    vocab = cnt_st.groupBy("term").agg(F.sum("cnt_s").alias("cnt_c"))
    per_src = cnt_st.groupBy("source").agg(F.sum("cnt_s").alias("n_s"))
    # corpus totals as a 1-row broadcast frame (no driver-side counts);
    # vocab size rides the same frame via a count over vocab
    totals = per_src.agg(F.sum("n_s").alias("n_c")).crossJoin(
        F.broadcast(vocab.agg(F.count("*").alias("v")))
    )
    dense = (
        # SHUFFLE_HASH: cnt_st is corpus-vocab-sized — at 100 TB it
        # cannot broadcast; both sides shuffle once on (source, term)
        per_src.crossJoin(vocab)
        .join(cnt_st.hint("shuffle_hash"), ["source", "term"], "left")
        .select(
            "source",
            "n_s",
            "cnt_c",
            F.coalesce("cnt_s", F.lit(0)).alias("cnt_s"),
        )
        .crossJoin(F.broadcast(totals))
    )
    p = (F.col("cnt_s") + 1).cast("double") / (F.col("n_s") + F.col("v"))
    q = (F.col("cnt_c") + 1).cast("double") / (F.col("n_c") + F.col("v"))
    term_q = slong(p * F.log(p / q), _KL_Q)
    return (
        dense.select("source", "n_s", "v", term_q.alias("term_q"))
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.max("v").alias("vocab_size"),
            F.round(
                F.sum("term_q").cast("double") / F.lit(float(10**_KL_Q)), 6
            ).alias("kl"),
        )
    )


# ---- q_text_perplexity ----------------------------------------------- #
# Per-document bigram-LM negative log likelihood / perplexity under the
# corpus's own add-1-smoothed bigram model — the classic fluency /
# quality signal (docs the corpus model finds surprising are prime
# filter candidates). p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V); each
# ln(p) is quantized to a scaled long before the per-doc sum (order
# independence, as above).


@register(
    "q_text_perplexity",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), uni AS (
  SELECT unnest(tk) AS w FROM toks
), uni2 AS (SELECT w, count(*) AS cu FROM uni WHERE w <> '' GROUP BY w),
v AS (SELECT count(*) AS v FROM uni2),
big AS (
  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
  FROM toks, LATERAL unnest(range(1, len(tk))) AS r(i)
  WHERE tk[i] <> '' AND tk[i + 1] <> ''
), bcnt AS (
  SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2
), scored AS (
  SELECT b.doc_id,
         CAST(round(
           ln(CAST(bc.cb + 1 AS DOUBLE) / (u.cu + v.v)) * 1e{_KL_Q}
         ) AS BIGINT) AS nll_q
  FROM big b
  JOIN bcnt bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
  JOIN uni2 u ON b.w1 = u.w
  CROSS JOIN v
)
SELECT doc_id, count(*) AS n_bigrams,
       round(-(CAST(sum(nll_q) AS DOUBLE) / 1e{_KL_Q}) / count(*), 6)
         AS avg_nll,
       round(exp(-(CAST(sum(nll_q) AS DOUBLE) / 1e{_KL_Q}) / count(*)), 6)
         AS ppl
FROM scored
GROUP BY doc_id
""",
    tags=("llm", "text"),
)
def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under the corpus's add-1-smoothed bigram
    LM (self-scored, the in-corpus fluency signal): docs whose own
    corpus finds them surprising — boilerplate soup, token noise, wrong
    language — rank high and feed the quality-filter tier next to
    q_text_quality's shallow heuristics.

    Bigram and unigram counts are partial-aggregated shuffles over the
    tokenize pass (the count-build and probe subtrees differ by the
    partial aggregate, so the plan re-tokenizes rather than
    materializing — at cluster scale, localCheckpoint the bigram frame
    to trade one narrow scan for storage, the dedup.py precedent);
    scoring joins each doc bigram to its count on the (w1, w2) key and
    to the unigram count on w1 —
    stopword-headed bigrams skew those keys, and both joins carry only
    (doc_id, count) payloads so AQE skew splitting applies cleanly.
    ln() terms are scaled-long quantized before the per-doc sum (the
    module doctrine), so the NLL is exact cross-engine; exp() then maps
    identical doubles to identical doubles.
    """
    from pokertracker_cassandra_st_spark.exprs import slong

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tk"))
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    v = uni.agg(F.count("*").alias("v"))
    big = (
        # the >= 2 guard must precede the sequence: sequence(1, 0) is a
        # DESCENDING [1, 0] in Spark (the q_ts_holtwinters lesson)
        toks.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(transform(sequence(1, size(tk) - 1), "
                    "i -> struct(tk[i - 1] AS w1, tk[i] AS w2)), "
                    "s -> s.w1 <> '' AND s.w2 <> '')"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    bcnt = big.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    nll_q = slong(
        F.log((F.col("cb") + 1).cast("double") / (F.col("cu") + F.col("v"))),
        _KL_Q,
    )
    nll_sum = F.sum("nll_q").cast("double") / F.lit(float(10**_KL_Q))
    return (
        # SHUFFLE_HASH on both count joins: bigram and unigram count
        # frames are corpus-vocab-sized at 100 TB — never broadcastable;
        # the probe side shuffles on the same keys its counts aggregated
        # on, so the bcnt join's exchange subtree is shared (ReusedExchange)
        big.join(bcnt.hint("shuffle_hash"), ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1").hint("shuffle_hash"), ["w1"])
        .crossJoin(F.broadcast(v))
        .select("doc_id", nll_q.alias("nll_q"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-nll_sum / F.count("*"), 6).alias("avg_nll"),
            F.round(F.exp(-nll_sum / F.count("*")), 6).alias("ppl"),
        )
    )


# ---- q_text_bpe_train / q_text_bpe_apply ----------------------------- #
# Byte-pair-encoding merge iterations — q_text_bpe_step exhibits ONE
# turn of the tokenizer-training loop; q_text_bpe_train runs the loop
# for k merges and emits the learned merge table (the actual artifact
# BPE training produces); q_text_bpe_apply replays that table over the
# corpus (tokenizer deployment). Fresh symbols are control chars
# \x01 \x02 ... (skipping \t \n \r, which legitimately occur in text) —
# absent from sane corpora, and even if present the rewrite is the same
# deterministic string op in both engines. Ties break lexically.
_BPE_K = 3  # the registered queries' merge count; scale harness runs k=10
_BPE_SYM_POOL = [chr(c) for c in range(1, 32) if c not in (9, 10, 13)]


def _bpe_syms(k: int) -> list[str]:
    if k > len(_BPE_SYM_POOL):
        raise ValueError(f"at most {len(_BPE_SYM_POOL)} merges supported")
    return _BPE_SYM_POOL[:k]


def _bpe_train_ctes(k: int) -> list[str]:
    # AS MATERIALIZED on every chain level: each p{i} is consumed
    # twice (the merge-table row AND the next rewrite) and each c{i}
    # feeds a whole sub-chain — without it DuckDB re-inlines the
    # rewrite lineage per consumer and the oracle goes quadratic in
    # merge count (the q_graph_bfs / q_graph_kcore lesson).
    # length(text) >= 2 is re-applied at EVERY level, not just c0: a
    # merge can collapse an exact-pair doc to one char, and the Spark
    # side must drop it before the next bigram pass (see
    # q_text_bpe_train) — here the filter is a no-op for counts
    # (range(1, 1) is empty) but keeps the two engines' corpus states
    # token-identical.
    ctes = [
        "c0 AS MATERIALIZED (SELECT text FROM documents WHERE length(text) >= 2)"
    ]
    for i, sym in enumerate(_bpe_syms(k)):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT bg AS pair, count(*) AS cnt FROM (
    SELECT unnest(list_transform(range(1, length(text)),
                  i -> substr(text, CAST(i AS INTEGER), 2))) AS bg
    FROM c{i} WHERE length(text) >= 2
  ) GROUP BY bg ORDER BY cnt DESC, pair LIMIT 1
)"""
        )
        ctes.append(
            f"c{i + 1} AS MATERIALIZED "
            f"(SELECT replace(c.text, p.pair, chr({ord(sym)})) AS text "
            f"FROM c{i} c CROSS JOIN p{i} p WHERE length(c.text) >= 2)"
        )
    return ctes


def _bpe_train_oracle(k: int) -> str:
    selects = [
        f"SELECT {i + 1} AS merge_no, pair, cnt FROM p{i}" for i in range(k)
    ]
    return (
        "WITH " + ",\n".join(_bpe_train_ctes(k)) + "\n"
        + "\nUNION ALL ".join(selects)
    )


def _bpe_merge_tables(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    merge_walls: list[float] | None = None,
) -> list[DataFrame]:
    """The k-merge BPE training loop; returns one 1-row (pair, cnt)
    DataFrame per merge, each computed on the corpus state its merge
    saw. Every iteration is the same dataflow: a partial-aggregated
    bigram count, a 1-row top-1 broadcast, a codegen string rewrite —
    no driver-side collect between rounds. Each rewritten corpus is
    localCheckpointed (the q_dedup_components fixed-point precedent):
    without it the level-i plan re-derives every earlier rewrite and
    total work goes quadratic in merge count; with it each merge costs
    exactly one corpus pass — the property that lets production BPE
    run hundreds of merges (k=10 linearity measured in SCALE.md r9).
    The corpus is repartitioned to the executor parallelism first: a
    merge chain inherits the FILE layout's partition count otherwise,
    and a few large text files would serialize the whole explode
    (measured 80 s -> 8 s at the 10x sweep's 2-file corpus).
    """
    corpus = (
        table(spark, sf_dir, "documents")
        .select("text")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def bigrams(col: str):
        return F.explode(
            F.expr(
                f"transform(sequence(1, length({col}) - 1),"
                f" i -> substring({col}, i, 2))"
            )
        )

    import time as _time

    tops: list[DataFrame] = []
    cur = corpus
    for sym in _bpe_syms(k):
        _t0 = _time.monotonic()
        # re-filter EVERY round, not just on entry: a merge collapses an
        # exact-pair doc to one char, where Spark's sequence(1, 0)
        # yields the DESCENDING [1, 0] (never empty) and would fabricate
        # two spurious 'bigram' rows the oracle's range(1, 1) = [] never
        # sees — and a \x01-prefixed key wins any count tie lexically,
        # silently flipping the learned merge table (ADVICE r8)
        cur = cur.filter(F.length("text") >= 2)
        top1 = (
            cur.select(bigrams("text").alias("bg"))
            .groupBy("bg")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), "bg")
            .limit(1)
            .select(F.col("bg").alias("pair"), "cnt")
        )
        tops.append(top1)
        cur = (
            cur.crossJoin(F.broadcast(top1))
            .select(
                F.replace(F.col("text"), F.col("pair"), F.lit(sym)).alias("text")
            )
            .localCheckpoint()
        )
        if merge_walls is not None:
            # localCheckpoint is eager, so the rewrite (and the top-1
            # count feeding it) has fully executed here — the per-merge
            # wall the SCALE.md k-linearity row records
            merge_walls.append(_time.monotonic() - _t0)
    return tops


@register(
    "q_text_bpe_train", oracle=_bpe_train_oracle(_BPE_K), tags=("llm", "text")
)
def q_text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, k merge iterations: each round counts
    all adjacent character pairs over the current corpus, adopts the
    most frequent as a new vocabulary symbol (tie: lexical), rewrites
    the corpus, and repeats — output is the learned merge table
    (merge_no, pair, count), the artifact a tokenizer trainer ships.
    The loop body and its scale doctrine live in _bpe_merge_tables.
    """
    tops = _bpe_merge_tables(spark, sf_dir, _BPE_K)
    merges = [
        t.select(F.lit(i + 1).cast("int").alias("merge_no"), "pair", "cnt")
        for i, t in enumerate(tops)
    ]
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _bpe_apply_oracle(k: int) -> str:
    # the apply chain a{i} threads doc_id and keeps EVERY doc (the
    # tokenizer encodes the whole corpus, including docs too short to
    # have contributed training bigrams); replace() on a doc shorter
    # than the pair is a no-op in both engines
    ctes = _bpe_train_ctes(k)
    ctes.append("a0 AS (SELECT doc_id, text, length(text) AS n0 FROM documents)")
    for i, sym in enumerate(_bpe_syms(k)):
        ctes.append(
            f"a{i + 1} AS MATERIALIZED "
            f"(SELECT a.doc_id, replace(a.text, p.pair, chr({ord(sym)})) AS text,"
            f" a.n0 FROM a{i} a CROSS JOIN p{i} p)"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_tokens,"
        f" CAST(n0 - length(text) AS BIGINT) AS n_merged FROM a{k}"
    )


@register(
    "q_text_bpe_apply", oracle=_bpe_apply_oracle(_BPE_K), tags=("llm", "text")
)
def q_text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer deployment — the other half of q_text_bpe_train: apply
    the learned merge table to the full corpus in merge order and emit
    per-document token counts (doc_id, n_tokens, n_merged). n_tokens is
    the character-level token count after all merges; n_merged is how
    many merge applications the doc absorbed (original length minus
    encoded length).

    Each merge is a broadcast of the 1-row merge entry + a codegen
    string rewrite over the corpus — a narrow map, no shuffle; at
    100 TB this is exactly how a trained tokenizer's merge table rides
    along: k broadcast-joins replayed over every shard, cost linear in
    k corpus passes (shared training prefix via the same
    localCheckpoint chain as the trainer). All docs are encoded,
    including the short ones training filtered out — replace() on a
    doc shorter than its pair is a no-op.
    """
    tops = _bpe_merge_tables(spark, sf_dir, _BPE_K)
    enc = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text", F.length("text").alias("n0"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    for sym, top1 in zip(_bpe_syms(_BPE_K), tops):
        enc = enc.crossJoin(F.broadcast(top1)).select(
            "doc_id",
            F.replace(F.col("text"), F.col("pair"), F.lit(sym)).alias("text"),
            "n0",
        )
    return enc.select(
        "doc_id",
        F.length("text").cast("long").alias("n_tokens"),
        (F.col("n0") - F.length("text")).cast("long").alias("n_merged"),
    )


# ---- q_text_vocab_build ----------------------------------------------- #
# Vocabulary construction — the embedding-table / tokenizer-vocab
# precursor: count whitespace tokens over the corpus, drop the
# long tail below a min-count cutoff, and assign DENSE frequency-
# ordered ids (id 0 = most frequent; ties break lexically).
_VOCAB_MIN_COUNT = 3
_VOCAB_OUT_IDS = 2000  # bound the emitted head; the id assignment is total

_VOCAB_ORACLE = f"""
WITH t AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), c AS (
  SELECT tok, count(*) AS cnt FROM t WHERE tok <> ''
  GROUP BY tok HAVING count(*) >= {_VOCAB_MIN_COUNT}
), r AS (
  SELECT tok, cnt,
         row_number() OVER (ORDER BY cnt DESC, tok) - 1 AS vocab_id
  FROM c
)
SELECT tok, cnt, vocab_id FROM r WHERE vocab_id < {_VOCAB_OUT_IDS}
"""


@register("q_text_vocab_build", oracle=_VOCAB_ORACLE, tags=("llm", "text"))
def q_text_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ordered vocabulary with a min-count cutoff: token
    counts over the corpus, cnt >= {min_count} survivors, dense ids by
    (cnt DESC, tok ASC), head of the table emitted.

    Scale notes: the id assignment is the q_pipeline_shuffle two-phase
    distributed rank — NO global window. Tokens count via one
    (tok)-keyed shuffle with map-side partials; the rank then
    partitions the VOCAB frame by (cnt, first-char-of-token) buckets,
    ranks within buckets (parallel windows ordered by tok), and adds
    bucket offsets from a distinct-bucket-sized aggregate cumsum
    (ordered cnt DESC, prefix ASC — exactly the global (cnt DESC, tok)
    order since buckets partition its equivalence prefix). Equal-count
    tail buckets (the min-count mass, most of any Zipf vocabulary)
    spread across 36+ prefix buckets instead of serializing into one
    reducer. The offsets frame is O(distinct counts x prefixes) — tiny
    at any corpus size; cnt is long-exact so ordering never ties
    ambiguously across engines.
    """
    d = table(spark, sf_dir, "documents").select("text")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    c = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= _VOCAB_MIN_COUNT)
        .withColumn("pfx", F.substring("tok", 1, 1))
    )
    local_rn = F.row_number().over(
        Window.partitionBy("cnt", "pfx").orderBy("tok")
    )
    ranked = c.withColumn("local_rn", local_rn)
    counts = c.groupBy("cnt", "pfx").agg(F.count("*").alias("nb"))
    off = counts.select(
        "cnt",
        "pfx",
        F.coalesce(
            F.sum("nb").over(
                Window.orderBy(F.col("cnt").desc(), F.col("pfx").asc())
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    return (
        ranked.join(F.broadcast(off), ["cnt", "pfx"])
        .select(
            "tok",
            "cnt",
            (F.col("off") + F.col("local_rn") - 1).alias("vocab_id"),
        )
        .filter(F.col("vocab_id") < _VOCAB_OUT_IDS)
    )


# ---- q_text_kneser_ney ------------------------------------------------ #
# Per-document NLL under an interpolated Kneser-Ney bigram LM — the
# smoothing the CCNet-style quality pipeline actually trains its
# filter LM with (add-1 over-penalizes frequent contexts; KN backs off
# to CONTINUATION counts: how many distinct contexts a word follows,
# not how often it occurs). D = 0.75, the standard discount; every
# bigram scored is in-corpus (cb >= 1), so cb - D > 0 and the
# max(., 0) clamp is vacuous by construction.
_KN_D = "0.75"


@register(
    "q_text_kneser_ney",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), big AS (
  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
  FROM toks, LATERAL unnest(range(1, len(tk))) AS r(i)
  WHERE tk[i] <> '' AND tk[i + 1] <> ''
), bcnt AS (
  SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2
), ctx AS (
  SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1, count(*) AS n_after
  FROM bcnt GROUP BY w1
), cont AS (
  SELECT w2, count(*) AS n_before FROM bcnt GROUP BY w2
), nb AS (SELECT count(*) AS nbt FROM bcnt),
scored AS (
  SELECT b.doc_id,
         CAST(round(
           ln((bc.cb - {_KN_D}) / x.c1
              + ({_KN_D} * x.n_after / x.c1) * (co.n_before / nb.nbt))
           * 1e{_KL_Q}
         ) AS BIGINT) AS nll_q
  FROM big b
  JOIN bcnt bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
  JOIN ctx x ON b.w1 = x.w1
  JOIN cont co ON b.w2 = co.w2
  CROSS JOIN nb
)
SELECT doc_id, count(*) AS n_bigrams,
       round(-(CAST(sum(nll_q) AS DOUBLE) / 1e{_KL_Q}) / count(*), 6)
         AS avg_nll,
       round(exp(-(CAST(sum(nll_q) AS DOUBLE) / 1e{_KL_Q}) / count(*)), 6)
         AS ppl
FROM scored
GROUP BY doc_id
""",
    tags=("llm", "text"),
)
def q_text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under an interpolated KNESER-NEY bigram
    LM (D = 0.75): p(w2|w1) = (c(w1 w2) - D)/c(w1) + lambda(w1) *
    P_cont(w2), lambda(w1) = D * N1+(w1 .)/c(w1), P_cont(w2) =
    N1+(. w2)/|bigram types|. q_text_perplexity is the add-1 sibling;
    KN is what a CCNet-style filter LM uses, and its continuation
    counts are what keep "Francisco" (frequent but one-context) from
    outranking genuinely productive words in the backoff mass.

    Every model frame derives from ONE bigram-count aggregate: c(w1)
    and N1+(w1 .) are a groupBy(w1) over bcnt (sum + row count),
    N1+(. w2) a groupBy(w2), |types| a 1-row count — so the model
    build adds two vocab-sized shuffles to the perplexity plan, never
    a second corpus pass. Scoring joins carry (doc_id, counts) only;
    vocab-sized frames take the SHUFFLE_HASH doctrine, the 1-row type
    count broadcasts. ln() terms quantize to scaled longs (module
    doctrine) so per-doc sums are order-independent cross-engine; the
    probability expression is token-identical in both engines (same
    IEEE ops, same order), and cb >= 1 keeps cb - D positive without
    a clamp.
    """
    from pokertracker_cassandra_st_spark.exprs import slong

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tk"))
    big = (
        toks.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(transform(sequence(1, size(tk) - 1), "
                    "i -> struct(tk[i - 1] AS w1, tk[i] AS w2)), "
                    "s -> s.w1 <> '' AND s.w2 <> '')"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    bcnt = big.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    ctx = bcnt.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("c1"), F.count("*").alias("n_after")
    )
    cont = bcnt.groupBy("w2").agg(F.count("*").alias("n_before"))
    nb = bcnt.agg(F.count("*").alias("nbt"))
    kn_d = F.lit(float(_KN_D))
    p = (F.col("cb") - kn_d) / F.col("c1") + (
        kn_d * F.col("n_after") / F.col("c1")
    ) * (F.col("n_before") / F.col("nbt"))
    nll_q = slong(F.log(p), _KL_Q)
    nll_sum = F.sum("nll_q").cast("double") / F.lit(float(10**_KL_Q))
    return (
        big.join(bcnt.hint("shuffle_hash"), ["w1", "w2"])
        .join(ctx.hint("shuffle_hash"), ["w1"])
        .join(cont.hint("shuffle_hash"), ["w2"])
        .crossJoin(F.broadcast(nb))
        .select("doc_id", nll_q.alias("nll_q"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-nll_sum / F.count("*"), 6).alias("avg_nll"),
            F.round(F.exp(-nll_sum / F.count("*")), 6).alias("ppl"),
        )
    )


# ---- q_text_zipf -------------------------------------------------------- #
# Zipf's-law fit: in natural corpora term frequency ~ C / rank^s with
# s near 1; the fitted slope of ln(freq) on ln(rank) is a one-number
# corpus-health signal (synthetic/templated text and boilerplate-heavy
# crawls bend far from -1). Fit over the top-K terms by OLS in EXACT
# scaled-integer arithmetic: ln values quantize to 1e-6 longs (the
# charlm doctrine), all OLS moment sums are pure int64 (bounds below),
# and the slope/intercept are single divisions of identical exact
# numerators — bit-deterministic across engines.
_ZIPF_TOP = 100
_ZIPF_Q = 1_000_000  # x<=ln(100)*1e6~4.6e6, y<=ln(corpus)*1e6;
#                      S_xy <= K*x*y ~ 5e15, K*S_xy ~ 5e17 < int64


@register(
    "q_text_zipf",
    oracle=f"""
WITH t AS (
  SELECT tok, count(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY tok
), ranked AS (
  SELECT row_number() OVER (ORDER BY cnt DESC, tok) AS rnk, cnt
  FROM t
  ORDER BY cnt DESC, tok LIMIT {_ZIPF_TOP}
), q AS (
  SELECT CAST(round(ln(rnk) * {_ZIPF_Q}) AS BIGINT) AS xq,
         CAST(round(ln(cnt) * {_ZIPF_Q}) AS BIGINT) AS yq
  FROM ranked
), m AS (
  SELECT count(*) AS k,
         CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
         CAST(SUM(xq * yq) AS BIGINT) AS sxy,
         CAST(SUM(xq * xq) AS BIGINT) AS sxx
  FROM q
)
SELECT k AS n_terms,
       CAST(k * sxy - sx * sy AS DOUBLE)
         / CAST(k * sxx - sx * sx AS DOUBLE) AS zipf_slope,
       (CAST(sy AS DOUBLE) / {_ZIPF_Q} / k)
         - (CAST(k * sxy - sx * sy AS DOUBLE)
            / CAST(k * sxx - sx * sx AS DOUBLE))
           * (CAST(sx AS DOUBLE) / {_ZIPF_Q} / k) AS intercept_ln
FROM m
""",
    tags=("llm", "text", "stats"),
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope of the corpus: OLS fit of ln(term frequency) against
    ln(rank) over the top-100 terms (rank ties broken by token text).
    Healthy natural text sits near -1; the slope plus ln-intercept is
    the dataset-card stat (templated corpora flatten, boilerplate
    steepens).

    Scale notes: the heavy stage is the corpus term count — one
    explode + map-side-combined groupBy (shuffle carries (token,
    partial count), never text); the top-K is a TakeOrdered, and the
    OLS runs over K=100 rows on exact scaled longs (one final 1-row
    aggregate). At 100 TB the token count is the same single shuffle
    q_text_tfidf already pays; everything after is constant-size.
    """
    from pokertracker_cassandra_st_spark.exprs import slong

    docs = table(spark, sf_dir, "documents")
    t = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(_ZIPF_TOP)
    )
    ranked = t.select(
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), "tok"))
        .alias("rnk"),
        "cnt",
    )
    q = ranked.select(
        slong(F.log(F.col("rnk").cast("double")), 6).alias("xq"),
        slong(F.log(F.col("cnt").cast("double")), 6).alias("yq"),
    )
    m = q.agg(
        F.count("*").alias("k"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return m.select(
        F.col("k").alias("n_terms"),
        slope.alias("zipf_slope"),
        (
            (F.col("sy").cast("double") / _ZIPF_Q / F.col("k"))
            - slope * (F.col("sx").cast("double") / _ZIPF_Q / F.col("k"))
        ).alias("intercept_ln"),
    )


# ---- q_text_keywords ------------------------------------------------------ #
# Per-document keyword extraction — the salted-down TF-IDF consumer:
# each doc's top-3 terms by tf-idf become its tags/index keys. Scoring
# is exact end-to-end: tf and df are integers, idf quantizes to 1e-6
# scaled longs (ln doctrine), and the per-doc score tf * idf_q stays a
# pure int64 (tf <= doc length ~1e3, idf_q <= ln(N)*1e6 ~ 2e7 ->
# <= 2e10/term) — ranking never touches a float.
_KW_K = 3


@register(
    "q_text_keywords",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
), tok2 AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY term
), nd AS (SELECT count(DISTINCT doc_id) AS n FROM tok2),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * CAST(round(ln(CAST(nd.n AS DOUBLE) / df.df) * 1000000)
                      AS BIGINT) AS score_q6
  FROM tf JOIN df USING (term) CROSS JOIN nd
), ranked AS (
  SELECT doc_id, term, score_q6,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_q6 DESC, term) AS rk
  FROM scored
)
SELECT doc_id, term, score_q6, rk
FROM ranked WHERE rk <= {_KW_K}
""",
    tags=("llm", "text"),
)
def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document by exact integer tf-idf (idf as a
    1e-6-quantized ln, score = tf * idf_q — int64 throughout, rank
    ties broken by term text). The per-doc tagging/indexing pass a
    search or curation pipeline materializes from the same frames
    q_text_tfidf builds.

    Scale notes: tf is one (doc, term)-keyed map-side-combined count;
    df one term-keyed count; the scoring join is SHUFFLE_HASH on term
    (vocab-sized frames never broadcast — the kneser_ney doctrine);
    the corpus doc count is a 1-row broadcast. The per-doc top-3 is a
    window over the (doc, term) frame — per-partition heaps of 3 via
    rank-limit pushdown, never a global sort.
    """
    from pokertracker_cassandra_st_spark.exprs import slong

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    nd = tok.agg(F.countDistinct("doc_id").alias("n"))
    idf_q = slong(F.log(F.col("n").cast("double") / F.col("df")), 6)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_q6"), "term")
    return (
        tf.join(df.hint("shuffle_hash"), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * idf_q).alias("score_q6"),
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _KW_K)
        .select("doc_id", "term", "score_q6", "rk")
    )


# ---- q_text_code_detect ------------------------------------------------------ #
# Code-vs-prose heuristic over a MIXED corpus (documents.text = prose,
# events.props = JSON "code-like" rows): character-class ratios in
# exact integer parts-per-million. The structural-text rows trip the
# symbol threshold; natural prose doesn't. This is the cheap lexical
# gate an LLM curation pipeline runs before expensive quality models.


@register(
    "q_text_code_detect",
    oracle="""
WITH corpus AS (
  SELECT 'doc' AS src, doc_id AS rid, text AS t FROM documents
  UNION ALL
  SELECT 'evt' AS src, event_id AS rid, props AS t FROM events
), feat AS (
  SELECT src, rid,
         length(t) AS n,
         length(t) - length(regexp_replace(t, '[^a-zA-Z0-9 \t\n]', '', 'g'))
           AS sym,
         length(t) - length(regexp_replace(t, '[ \t\n]', '', 'g')) AS ws,
         length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) AS dig
  FROM corpus WHERE length(t) >= 1
)
SELECT src, rid, n,
       (1000000 * sym) // n AS sym_ppm,
       (1000000 * ws) // n AS ws_ppm,
       (1000000 * dig) // n AS dig_ppm,
       ((1000000 * sym) // n >= 100000) AS is_code
FROM feat ORDER BY src, rid
""",
    tags=("text", "llm"),
)
def q_text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical code-likeness gate: symbol / whitespace / digit density
    in exact integer ppm over documents.text UNION events.props; rows
    whose symbol density reaches 10% classify as code-like (the JSON
    payloads do, prose doesn't). Ratios are integer divisions of exact
    character counts — no float anywhere, so the engines agree by
    construction.

    Scale notes: embarrassingly parallel row-local regexp counts in
    whole-stage codegen (three regexp_replace + lengths per row, no
    shuffle at all before the display sort); the union is two scans,
    each pruned to one string column. At 100 TB this runs at scan
    speed — it's the first gate in the curation funnel, so it must.
    """
    docs = table(spark, sf_dir, "documents").select(
        F.lit("doc").alias("src"),
        F.col("doc_id").alias("rid"),
        F.col("text").alias("t"),
    )
    evs = table(spark, sf_dir, "events").select(
        F.lit("evt").alias("src"),
        F.col("event_id").alias("rid"),
        F.col("props").alias("t"),
    )
    corpus = docs.unionByName(evs).filter(F.length("t") >= 1)
    n = F.length("t")
    sym = n - F.length(F.regexp_replace("t", r"[^a-zA-Z0-9 \t\n]", ""))
    ws = n - F.length(F.regexp_replace("t", r"[ \t\n]", ""))
    dig = n - F.length(F.regexp_replace("t", r"[0-9]", ""))
    feat = corpus.select(
        "src",
        "rid",
        n.cast("long").alias("n"),
        sym.cast("long").alias("sym"),
        ws.cast("long").alias("ws"),
        dig.cast("long").alias("dig"),
    )
    sym_ppm = F.expr("(1000000 * sym) div n")
    return feat.select(
        "src",
        "rid",
        "n",
        sym_ppm.alias("sym_ppm"),
        F.expr("(1000000 * ws) div n").alias("ws_ppm"),
        F.expr("(1000000 * dig) div n").alias("dig_ppm"),
        (sym_ppm >= 100000).alias("is_code"),
    ).orderBy("src", "rid")


# ---- q_text_oov_rate --------------------------------------------------------- #
# Tokenizer-coverage audit: out-of-vocabulary rate per source against
# the corpus top-100 vocabulary — the number a team checks BEFORE
# shipping a fixed vocab (q_text_vocab_build's acceptance metric).
# Vocabulary selection is a deterministic global top-k
# (count DESC, term ASC), which Spark executes as
# TakeOrderedAndProject — per-task k-heaps, never a global sort.

_OOV_K = 100


@register(
    "q_text_oov_rate",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
), toks2 AS (
  SELECT source, term FROM toks WHERE term <> ''
), vocab AS (
  SELECT term FROM (
    SELECT term, count(*) AS cnt,
           row_number() OVER (ORDER BY count(*) DESC, term) AS rk
    FROM toks2 GROUP BY term
  ) WHERE rk <= {_OOV_K}
)
SELECT t.source,
       count(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS oov_tokens,
       (1000000 * CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)) // count(*) AS oov_ppm
FROM toks2 t LEFT JOIN vocab v ON t.term = v.term
GROUP BY t.source ORDER BY t.source
""",
    tags=("text", "llm"),
)
def q_text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source OOV rate vs the deterministic corpus top-100 vocab
    (frequency DESC, term ASC tiebreak): tokens explode once, the
    vocabulary is a global top-k over term counts, and each source's
    integer-ppm OOV share comes from one broadcast left join.

    Scale notes: the token frame shuffles once for term counts
    (map-side combined); vocab selection is top-k (per-task heaps +
    driver merge of k rows, not a global sort); the membership probe
    broadcasts the 100-term vocab. The per-source rollup reuses the
    exploded frame — no second tokenize pass.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(_OOV_K)
        .select("term", F.lit(1).alias("in_v"))
    )
    probed = toks.join(F.broadcast(vocab), "term", "left")
    oov = F.col("in_v").isNull().cast("long")
    return (
        probed.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(oov).alias("oov_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            "oov_tokens",
            F.expr("(1000000 * oov_tokens) div n_tokens").alias("oov_ppm"),
        )
        .orderBy("source")
    )


@register(
    "q_text_lexical_diversity",
    oracle="""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks
  FROM documents
), d AS (
  SELECT doc_id, source,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_types,
         CASE WHEN len(toks) >= 2 THEN
           len(list_distinct(
             [array_to_string(list_slice(toks, i, i + 1), ' ')
              for i in generate_series(1, len(toks) - 1)]))
         ELSE 0 END AS n_bigram_types
  FROM t WHERE len(toks) >= 1
)
SELECT doc_id, source, n_tokens, n_types,
       (1000000 * n_types) // n_tokens AS ttr_ppm,
       CASE WHEN n_tokens >= 2
            THEN (1000000 * n_bigram_types) // (n_tokens - 1)
            ELSE 0 END AS bigram_ttr_ppm
FROM d ORDER BY doc_id
""",
    tags=("llm", "text"),
)
def q_text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: type-token ratio and bigram
    type-token ratio in exact integer ppm — the repetitiveness signal
    quality filters threshold on (a low TTR marks template spam /
    keyword stuffing; q_text_repetition's top-phrase share is the
    targeted variant, this is the corpus-wide scalar).

    Scale notes: ZERO exchanges — tokenization, distinct-type counting
    (array_distinct), and bigram construction (transform over a
    per-row index sequence) are all row-local array expressions inside
    codegen; no explode, no shuffle, output is docs-sized. The ratios
    are integral ppm, no floats anywhere.
    """
    toks = F.split("text", " ")
    # optimization r13 (the q_text_winnow lesson, guide §1.2): tokenize
    # ONCE into a named column — the inline form re-evaluated
    # split(text) for every reference AND inside the bigram transform's
    # per-element lambda (higher-order lambdas evaluate their whole
    # body per element, outside codegen subexpression elimination) —
    # O(tokens²) splits per doc. Value-identical, 5.0 s -> 1.2 s.
    t0 = (
        table(spark, sf_dir, "documents")
        .filter(F.size(toks) >= 1)
        .select("doc_id", "source", toks.alias("tk"))
    )
    d = t0.select(
        "doc_id",
        "source",
        F.size("tk").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tk")).cast("long").alias("n_types"),
        F.when(
            F.size("tk") >= 2,
            F.size(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("tk") - 1),
                        lambda i: F.array_join(F.slice("tk", i, 2), " "),
                    )
                )
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("n_bigram_types"),
    )
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        "n_types",
        F.expr("(1000000 * n_types) div n_tokens").alias("ttr_ppm"),
        F.when(
            F.col("n_tokens") >= 2,
            F.expr("(1000000 * n_bigram_types) div (n_tokens - 1)"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("bigram_ttr_ppm"),
    ).orderBy("doc_id")


# ---- q_text_ngram_novelty ---------------------------------------------------- #
# Memorization / novelty audit: what fraction of each document's
# trigrams appears for the FIRST time in the corpus at that document
# (by doc_id order)? Low novelty late in the corpus marks recycled /
# templated content the dedup tier's whole-doc fingerprints miss.


@register(
    "q_text_ngram_novelty",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT doc_id, substr(md5(gram), 1, 16) AS d
  FROM (
    SELECT doc_id,
           unnest(list_distinct(
             [array_to_string(list_slice(toks, i, i + 2), ' ')
              for i in generate_series(1, len(toks) - 2)])) AS gram
    FROM t WHERE len(toks) >= 3
  )
), f AS (
  SELECT doc_id, d,
         min(doc_id) OVER (PARTITION BY d) AS first_doc
  FROM g
)
SELECT doc_id, count(*) AS n_grams,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       (1000000 * CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                       AS BIGINT)) // count(*) AS novelty_ppm
FROM f GROUP BY doc_id ORDER BY doc_id
""",
    tags=("llm", "text"),
)
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty: the exact ppm of each document's
    distinct trigrams whose corpus-wide FIRST occurrence (minimum
    doc_id) is this document. The sequence-level complement of
    q_text_contamination (which checks against an external benchmark)
    and q_dedup_ngram_jaccard (which scores pairs): novelty is a
    per-document scalar against the whole corpus, no pair enumeration.

    Scale notes: trigrams build row-locally (transform over an index
    sequence, array_distinct) and explode to 16-hex-char md5 DIGESTS —
    the shuffle never carries text (the dedup-tier doctrine). The
    first-occurrence is min(doc_id) OVER the digest partition — ONE
    digest exchange, no groupBy+join back (which would re-reference
    and rescan the corpus); the per-doc rollup is a second, smaller
    exchange on doc_id. Digest collisions (64-bit) are negligible and
    engine-symmetric either way.
    """
    toks = F.split("text", " ")
    # tokenize ONCE into a named column (optimization r13 — the
    # q_text_winnow/lexical_diversity lesson): the inline form
    # re-evaluated split(text) inside the trigram lambda per element
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - 2),
            lambda i: F.array_join(F.slice("tk", i, 3), " "),
        )
    )
    g = (
        table(spark, sf_dir, "documents")
        .filter(F.size(toks) >= 3)
        .select("doc_id", toks.alias("tk"))
        .select("doc_id", F.explode(grams).alias("gram"))
        .select(
            "doc_id", F.substring(F.md5("gram"), 1, 16).alias("d")
        )
    )
    f = g.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("d")).alias("first_doc"),
    )
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        f.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            novel.alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("(1000000 * n_novel) div n_grams").alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


# ---- q_text_hapax ----------------------------------------------------------- #


@register(
    "q_text_hapax",
    oracle="""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok
  FROM documents
), t AS (SELECT source, tok FROM toks WHERE tok <> ''),
v AS (
  SELECT source, tok, count(*) AS cnt FROM t GROUP BY source, tok
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       (1000000 * CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT))
         // count(*) AS hapax_vocab_ppm,
       (1000000 * CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT))
         // CAST(SUM(cnt) AS BIGINT) AS hapax_token_ppm
FROM v GROUP BY source ORDER BY source
""",
    tags=("llm", "text"),
)
def q_text_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena profile per source: how much of each slice's
    vocabulary (and token mass) occurs exactly once.  A high hapax
    share marks OCR noise, codified ids, or genuinely diverse prose —
    the quick vocabulary-health read before committing a source to a
    training mixture (Zipf's tail, one number per source;
    q_text_zipf fits the head).

    Determinism: whitespace tokenization with empties dropped (the
    module convention), pure integer counting, integral ppm divides.

    Scale notes: ONE (source, token) exchange with map-side partial
    counts — the same shuffle budget as q_text_vocab_build; the hapax
    rollup collapses to a sources-sized frame in the same pass.
    Token strings cross the wire once; documents never do.
    """
    t = (
        table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    v = t.groupBy("source", "tok").agg(F.count("*").alias("cnt"))
    hap = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
    return (
        v.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count("*").alias("vocab_size"),
            hap.alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab_size",
            "n_hapax",
            F.expr("(1000000 * n_hapax) div vocab_size").alias(
                "hapax_vocab_ppm"
            ),
            F.expr("(1000000 * n_hapax) div n_tokens").alias(
                "hapax_token_ppm"
            ),
        )
        .orderBy("source")
    )


# ---- q_text_dup_ngram_coverage ---------------------------------------------- #


@register(
    "q_text_dup_ngram_coverage",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i, i + 4), ' ') AS sh
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
        FROM toks WHERE len(t) >= 5)
), c AS (
  SELECT doc_id, sh,
         count(*) OVER (PARTITION BY sh) AS n_docs
  FROM sh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(*) FILTER (n_docs >= 2) AS BIGINT) AS n_shared,
       (1000000 * CAST(count(*) FILTER (n_docs >= 2) AS BIGINT))
         // count(*) AS coverage_ppm
FROM c GROUP BY doc_id ORDER BY doc_id
""",
    tags=("llm", "text"),
)
def q_text_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-5-gram coverage: the share (ppm) of a
    doc's DISTINCT word-5-grams that also occur in at least one other
    document — the memorization-risk audit run before training (a doc
    whose shingles are mostly corpus-shared is boilerplate/template
    mass even when no single pair crosses a dedup threshold; SemDeDup-
    adjacent diagnostics rank docs by exactly this kind of redundancy).

    Cross-engine determinism: counts and the ppm integer division are
    exact; the shingle builder is the dedup family's (distinct 5-gram
    sets, docs shorter than one shingle drop out).

    Scale notes: ONE corpus scan; shingle cross-doc frequency comes
    from a count window PARTITIONED BY shingle on the exploded narrow
    (sh, doc_id) frame — a groupBy-then-join-back would re-execute the
    explode subtree per branch (the re-reference-rescan trap), here
    everything rides one shingle-keyed exchange followed by the
    doc-keyed rollup. Shuffled bytes are (sh, doc_id) pairs — text
    never moves. A degenerate mega-shingle (template spam) skews one
    window partition; the fix at that scale is the simhash family's
    anchor-cap ladder, not a different plan shape.
    """
    toks = F.split("text", " ")
    sh = (
        table(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1), F.greatest(F.size("t") - 4, F.lit(1))
                        ),
                        lambda i: F.array_join(F.slice("t", i, 5), " "),
                    )
                )
            ).alias("sh"),
        )
    )
    c = sh.withColumn("n_docs", F.count("*").over(Window.partitionBy("sh")))
    return (
        c.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count(F.when(F.col("n_docs") >= 2, F.lit(1))).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            F.expr("(1000000 * n_shared) div n_shingles").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("doc_id")
    )
