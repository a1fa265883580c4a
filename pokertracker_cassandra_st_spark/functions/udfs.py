"""UDF / UDAF / UDTF surface (SURVEY.md §2 M7).

The reference's only "custom logic" is Java-side event folding; here
the UDF tier exists to prove the extension points, with oracles where
the logic is SQL-expressible.

Scale notes: the Python-UDF tier is the engine's slow path by design —
row-at-a-time pickling for q_udf_python (kept as the counter-example),
Arrow-vectorized batches for the pandas variants (~10-100x faster).
Anything hot must first try built-ins (functions/scalar.py); these
exist for semantics Spark can't express natively.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register


@register(
    "q_udf_python",
    oracle="""
SELECT event_id, value,
       CASE WHEN value IS NULL THEN NULL
            WHEN value < 10 THEN 'micro'
            WHEN value < 100 THEN 'small'
            WHEN value < 300 THEN 'mid'
            ELSE 'large' END AS bucket
FROM events
""",
    tags=("udf",),
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the deliberately-slow tier)."""

    @F.udf(returnType=T.StringType())
    def bucket(v: float | None) -> str | None:
        if v is None:  # UDFs see raw NULLs — always guard
            return None
        if v < 10:
            return "micro"
        if v < 100:
            return "small"
        if v < 300:
            return "mid"
        return "large"

    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", "value", bucket("value").alias("bucket"))


@register(
    "q_udf_pandas",
    oracle="""
SELECT event_id, value,
       round(ln(1 + value) * 2.5, 6) AS scaled_log
FROM events
""",
    tags=("udf",),
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (the fast Python tier).

    numpy log1p and DuckDB ln agree to well under 1e-6 — rounded on
    both sides.
    """

    @F.pandas_udf(T.DoubleType())
    def scaled_log(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.round(np.log1p(v) * 2.5, 6))

    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", "value", scaled_log("value").alias("scaled_log"))


@register(
    "q_udaf_pandas",
    oracle="""
SELECT event_type,
       round(exp(avg(ln(value))), 4) AS geo_mean,
       count(*) AS n
FROM events
WHERE value > 0
GROUP BY event_type
""",
    tags=("udf",),
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate via applyInPandas: geometric mean per group —
    a UDAF Spark has no built-in for.

    Each group's rows arrive as one pandas DataFrame (shuffle on the
    group key); output is one row per group. Float-order sensitivity
    handled by rounding to 4 decimals.
    """
    import numpy as np

    def geo(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "geo_mean": [round(float(np.exp(np.mean(np.log(v)))), 4)],
                "n": [len(v)],
            }
        )

    ev = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").applyInPandas(
        geo, schema="event_type string, geo_mean double, n long"
    )


@register(
    "q_udtf_python",
    oracle="""
SELECT doc_id, tok AS word, length(tok) AS word_len
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      WHERE doc_id < 50)
WHERE tok <> ''
""",
    tags=("udf",),
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python UDTF (Spark 4 @udtf): one input row -> many output
    rows from arbitrary Python, registered and invoked through SQL with
    a LATERAL join. The built-in explode (q_udtf_explode) is the fast
    path; this is the extension point for logic SQL can't express
    (custom tokenizers, parsers, format shredders).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, word_len: int")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for w in text.split(" "):
                if w:
                    yield (w, len(w))

    spark.udtf.register("tokenize_py", Tokenize)
    table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.word, CAST(t.word_len AS BIGINT) AS word_len
        FROM docs_udtf d, LATERAL tokenize_py(d.text) t
        WHERE d.doc_id < 50
        """
    )


@register(
    "q_udtf_explode",
    oracle="""
SELECT tok AS word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
WHERE tok <> ''
GROUP BY tok
""",
    tags=("udf",),
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating function: one row per token (explode), then a
    word count — the native analog of a UDTF."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_udf_arrow",
    oracle="""
SELECT event_id,
       CASE WHEN value IS NULL THEN NULL
            ELSE round(sqrt(value) + CAST(len(event_type) AS DOUBLE), 6) END AS score
FROM events
""",
    tags=("udf",),
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 3.5+/4 ``useArrow=True``): the
    middle tier — row-function ergonomics, Arrow batch transfer instead
    of per-row pickling (~2-5x over the pickled tier; pandas UDFs remain
    the fastest Python tier because they also vectorize the compute).
    """

    @F.udf(returnType=T.DoubleType(), useArrow=True)
    def score(v: float | None, t: str) -> float | None:
        if v is None:
            return None
        import math

        return round(math.sqrt(v) + float(len(t)), 6)

    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", score("value", "event_type").alias("score"))


@register(
    "q_udf_grouped_map",
    oracle="""
SELECT event_id, user_id,
       round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) AS z
FROM events
WINDOW w AS (PARTITION BY user_id)
""",
    tags=("udf",),
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user z-score normalization, each
    group handed to Python as ONE pandas frame (the API for per-entity
    model scoring / featurization where the whole group is needed at
    once). Oracle is the windowed SQL formulation — the two must agree.

    Scale notes: one shuffle on the grouping key; each group must fit
    in one executor's memory (the API's documented contract) — for
    unbounded groups use the windowed SQL form instead, which streams.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        m = pdf["value"].mean()
        s = pdf["value"].std()  # ddof=1, matches stddev_samp
        out = pdf[["event_id", "user_id"]].copy()
        z = (pdf["value"] - m) / s
        # round half-away-from-zero: pandas .round is IEEE half-even,
        # but DuckDB round() (the oracle) is half-away — a z exactly on
        # a 4th-decimal .5 boundary would otherwise flip between engines
        out["z"] = np.sign(z) * np.floor(np.abs(z) * 1e4 + 0.5) / 1e4
        return out

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").applyInPandas(
        zscore, schema="event_id long, user_id long, z double"
    )


@register(
    "q_udtf_table_arg",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       -- floor(x*100 + 0.5)/100, not round(): DuckDB rounds half away
       -- from zero while Python's round() is banker's — the explicit
       -- floor form (max-min is >= 0) is engine-neutral by construction
       -- (same doctrine as q_text_readability)
       floor((max(value) - min(value)) * 100 + 0.5) / 100 AS value_range,
       max(event_id) AS last_event_id
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
""",
    tags=("udf",),
)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 TABLE-argument UDTF: the UDTF consumes a whole
    partitioned relation (``TABLE(...) PARTITION BY user_id ORDER BY
    event_id``) instead of scalar columns — one eval() call per row,
    terminate() emits the per-partition summary. This is the API tier
    between a grouped-map pandas UDF and a custom aggregate: arbitrary
    Python over an ordered key partition, declared IN SQL.

    The Python computes streaming-style min/max/count (exact arithmetic
    on 2-decimal inputs), so the result matches the plain SQL aggregate
    oracle — proving the mechanism, not replacing the fast path.

    Scale notes: PARTITION BY shuffles once on user_id, partitions
    stream through each UDTF instance row-by-row (constant state per
    key here). The built-in aggregate stays the hot path; the UDTF
    tier exists for per-key logic SQL can't state (sequence parsers,
    sessionized scoring with custom carry).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "user_id bigint, n_events bigint, value_range double, last_event_id bigint"
    ))
    class PerUserSummary:
        def __init__(self):
            self.uid = None
            self.n = 0
            self.vmin = None
            self.vmax = None
            self.last_id = None

        def eval(self, row):
            self.uid = row["user_id"]
            self.n += 1
            v = row["value"]
            self.vmin = v if self.vmin is None else min(self.vmin, v)
            self.vmax = v if self.vmax is None else max(self.vmax, v)
            self.last_id = row["event_id"]

        def terminate(self):
            if self.uid is not None:
                import math

                # engine-neutral half-up (diff >= 0): Python round() is
                # banker's, DuckDB's is half-away — only matched before
                # because fixture deltas were 2-decimal exact
                diff = self.vmax - self.vmin
                yield (
                    self.uid,
                    self.n,
                    math.floor(diff * 100 + 0.5) / 100,
                    self.last_id,
                )

    spark.udtf.register("per_user_summary", PerUserSummary)
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ev.createOrReplaceTempView("events_ta_udtf")
    return spark.sql(
        """
        SELECT user_id, n_events, value_range, last_event_id
        FROM per_user_summary(
          TABLE(SELECT user_id, event_id, value FROM events_ta_udtf)
          PARTITION BY user_id ORDER BY event_id
        )
        """
    )
