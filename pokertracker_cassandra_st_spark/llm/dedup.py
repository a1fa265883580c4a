"""Deduplication operators for training-data pipelines.

Four tiers, cheapest-first — the order a 100 TB pipeline applies them:
  1. exact (content hash) — one shuffle on a 32-byte key;
  2. fingerprint/near-exact — normalization + hash (see llm/text.py);
  3. MinHash + LSH — candidate pairs via banded signature buckets,
     O(n · bands) instead of O(n²);
  4. n-gram Jaccard verification — exact overlap on candidates only.

The near-dup queries run over an AUGMENTED corpus (each document
unioned with a copy missing its last token, id+1_000_000) so the
operators demonstrably find pairs on the driver's all-distinct corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register

AUG_OFFSET = 1_000_000

# ---- augmented corpus (engine + oracle must agree exactly) ----------

_AUG_ORACLE = f"""
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + {AUG_OFFSET} AS doc_id,
       array_to_string(list_slice(string_split(text, ' '), 1,
                                  len(string_split(text, ' ')) - 1), ' ') AS text
FROM documents
WHERE len(string_split(text, ' ')) >= 2
"""


def augmented_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    # only docs with >= 2 tokens get a drop-last-token mutation — the
    # degenerate slice of a 1-token doc diverges between engines
    # (DuckDB list_slice(l, 1, 0) -> NULL, Spark slice -> [])
    mutated = (
        d.filter(F.size(toks) >= 2)
        .select(
            (F.col("doc_id") + AUG_OFFSET).alias("doc_id"),
            F.array_join(F.slice(toks, 1, F.size(toks) - 1), " ").alias("text"),
        )
    )
    return d.unionByName(mutated)


@register(
    "q_dedup_exact",
    oracle=f"""
WITH corpus AS ({_AUG_ORACLE})
SELECT sha256(text) AS text_hash,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM corpus
GROUP BY sha256(text)
HAVING count(*) > 1
""",
    tags=("llm", "dedup"),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: groups of byte-identical documents,
    keeping the lowest doc_id.

    Scale notes: the shuffle key is the 32-byte sha2, not the document
    — at 100 TB the text never moves, only (hash, id) pairs; partial
    aggregation collapses local duplicates map-side.
    """
    corpus = augmented_corpus(spark, sf_dir)
    return (
        corpus.select(F.sha2("text", 256).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


_SHINGLE_ORACLE = f"""
WITH corpus AS ({_AUG_ORACLE}),
toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM corpus
),
shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i.i, i.i + 4), ' ') AS sh
  FROM toks CROSS JOIN range(1, 2001) AS i(i)
  WHERE i.i + 4 <= len(t)
),
counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.id_a, c.id_b,
       round(CAST(c.n_common AS DOUBLE) / (ca.n + cb.n - c.n_common), 6) AS jaccard
FROM common c
JOIN counts ca ON ca.doc_id = c.id_a
JOIN counts cb ON cb.doc_id = c.id_b
WHERE CAST(c.n_common AS DOUBLE) / (ca.n + cb.n - c.n_common) >= 0.5
"""


@register("q_dedup_ngram_jaccard", oracle=_SHINGLE_ORACLE, tags=("llm", "dedup"))
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection by exact word-5-gram Jaccard similarity.

    Candidate generation is the shingle equi-join (pairs sharing at
    least one 5-gram) — with 5-token shingles the join is sparse, so
    the pair set stays near-linear; Jaccard >= 0.5 verified exactly.

    Scale notes: this is the verification stage of a dedup pipeline;
    at 100 TB it runs only on LSH candidates (q_dedup_near_minhash),
    never all-pairs. The shingle join shuffles (shingle, doc_id) pairs
    only — not document text.
    """
    corpus = augmented_corpus(spark, sf_dir)
    toks = F.split("text", " ")
    sh = (
        corpus.select("doc_id", toks.alias("t"))
        # docs shorter than one shingle produce none (also guards
        # Spark's sequence(1, n-4) flipping DESCENDING when n < 5)
        .filter(F.size("t") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 4),
                    lambda i: F.array_join(F.slice("t", i, 5), " "),
                )
            ).alias("sh"),
        )
        .distinct()
    )
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    jac = F.col("n_common").cast("double") / (
        F.col("ca.n") + F.col("cb.n") - F.col("n_common")
    )
    return (
        common.join(ca, F.col("id_a") == F.col("ca.doc_id"))
        .join(cb, F.col("id_b") == F.col("cb.doc_id"))
        .filter(jac >= 0.5)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


@register("q_dedup_near_minhash", oracle=None, tags=("llm", "dedup"))
def q_dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates (spark.ml MinHashLSH, seeded).

    shingle -> HashingTF sparse vector -> minhash signature -> banded
    bucket join (approxSimilarityJoin). Rows-only: signature hashes are
    engine-specific; exactness is delegated to q_dedup_ngram_jaccard.

    Scale notes: this is THE scalable near-dup path — cost is
    O(n · hashes) plus a bucket-join whose fan-out is controlled by the
    band width; no quadratic pair enumeration.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    corpus = augmented_corpus(spark, sf_dir)
    toks = F.split("text", " ")
    sh = corpus.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - 4, F.lit(1))),
                lambda i: F.array_join(F.slice(toks, i, 5), " "),
            )
        ).alias("shingles"),
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    vecs = tf.transform(sh).filter(F.expr("size(shingles) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="sig", numHashTables=8, seed=42)
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 6).alias("jaccard_est"),
        )
    )


@register("q_dedup_simhash", oracle=None, tags=("llm", "dedup"))
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures + banded candidate pairs.

    Per-token xxhash64 -> per-bit ±1 votes -> sign -> signature; docs
    sharing any of four 16-bit bands are near-dup candidates. Rows-only
    (xxhash64 is Spark-specific).

    Scale notes: signature computation is one pass + one groupBy; the
    band join is 4 equi-joins on 16-bit keys — the standard trick to
    avoid pairwise Hamming comparisons at corpus scale.
    """
    corpus = augmented_corpus(spark, sf_dir)
    tok = corpus.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    ).filter(F.col("w") != "")
    hashed = tok.select("doc_id", F.xxhash64("w").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sigbits = hashed.groupBy("doc_id").agg(*votes)
    sig_expr = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sig_expr = term if sig_expr is None else sig_expr.bitwiseXOR(term)
    sig = sigbits.select("doc_id", sig_expr.alias("simhash"))
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
