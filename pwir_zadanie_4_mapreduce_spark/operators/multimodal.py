"""Multimodal column plumbing (SURVEY.md §2.2 / driver brief).

Media are opaque `binary` columns + typed metadata structs. The
container has no native image/audio codecs, so most *decode* steps
are a deterministic fake behind ``mapInPandas`` — but everything
Spark-side is real and tested: schema, Arrow batch shape,
partition-preserving iterator contract, and the metadata extraction a
real decoder slots into. One decode IS real:
``multimodal_png_decode_stats`` runs a pure-stdlib PNG decode
(functions/png.py — zlib inflate + spec unfiltering) over genuine PNG
payloads, oracle-checked against the pixel-formula arithmetic.

At 100 TB: binary payloads dominate I/O, so the rule is (1) never
shuffle the payload — extract features first, project the binary away
before any wide transform; (2) mapInPandas with modest
``maxRecordsPerBatch`` so Arrow batches of large blobs fit executor
memory; (3) store payloads in their own parquet column chunk so
metadata-only queries never read them (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
from pwir_zadanie_4_mapreduce_spark.operators.registry import register

DECODE_SCHEMA = (
    "doc_id bigint, byte_len int, fake_width int, fake_height int, n_frames int, checksum bigint"
)


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB for a real image decode (no codec libs in this container).

    Deterministic fake: derives (width, height, frames) from payload
    length. A real implementation would call PIL/libvips here and keep
    the exact same signature and return contract.
    """
    byte_len = len(payload)
    return 64 + byte_len % 640, 64 + (byte_len * 7) % 480, 1 + byte_len % 16


PNG_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, px_sum bigint, min_px int, max_px int"
)


def make_png_payload_batches():
    """mapInPandas worker 1: synthesize a REAL grayscale PNG per doc.

    Dimensions and pixels are a deterministic formula of doc_id
    (w = 4 + id%13, h = 4 + id%11, p(x,y) = (id*31 + 7x + 13y) % 256)
    so the downstream decode is independently checkable: the DuckDB
    oracle recomputes the same pixel grid arithmetically and any codec
    bug breaks the value hash. Encoding cycles all five PNG row
    filters (see functions/png.py), so the decoder's unfilter paths
    all run. Closure-only references (repo worker-pickling rule)."""
    from pwir_zadanie_4_mapreduce_spark.functions.png import make_png_codec

    encode_png, _ = make_png_codec()

    def payload_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 13, 4 + d % 11
                grid = (d * 31 + 7 * np.arange(w)[None, :] + 13 * np.arange(h)[:, None]) % 256
                payloads.append(encode_png(w, h, grid.astype(np.uint8).tobytes()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return payload_batches


def make_png_stats_batches():
    """mapInPandas worker 2: REAL PNG decode (signature, chunk+CRC
    walk, zlib inflate, per-row unfilter) → pixel stats. The stats
    come only from decoded bytes; parity with the formula-based oracle
    is what proves the decode correct."""
    from pwir_zadanie_4_mapreduce_spark.functions.png import make_png_codec

    _, decode_png = make_png_codec()

    def stats_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "px_sum", "min_px", "max_px")}
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_png(bytes(payload))
                out["doc_id"].append(int(d))
                out["width"].append(w)
                out["height"].append(h)
                out["px_sum"].append(sum(px))
                out["min_px"].append(min(px))
                out["max_px"].append(max(px))
            yield pd.DataFrame(out)

    return stats_batches


@register(
    "multimodal_png_decode_stats",
    oracle="""
    WITH dim AS (
        SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h
        FROM documents),
    px AS (
        SELECT doc_id, w, h, (doc_id * 31 + x.x * 7 + y.y * 13) % 256 AS p
        FROM dim,
             LATERAL (SELECT unnest(range(0, w)) AS x) x,
             LATERAL (SELECT unnest(range(0, h)) AS y) y)
    SELECT doc_id,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(SUM(p) AS BIGINT) AS px_sum,
           CAST(MIN(p) AS INTEGER) AS min_px,
           CAST(MAX(p) AS INTEGER) AS max_px,
           ROUND(CAST(SUM(p) AS DOUBLE) / (w * h), 4) AS mean_px
    FROM px GROUP BY doc_id, w, h
    """,
)
def multimodal_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode behind the multimodal seam: per document a
    genuine grayscale PNG is synthesized (deterministic pixels,
    all five PNG row filters cycled), shipped through Arrow as a
    binary column, then DECODED — stdlib zlib inflate + spec unfilter
    (functions/png.py), no deterministic fake — and reduced to pixel
    stats. The oracle never sees PNG bytes: it recomputes the pixel
    grid from the doc_id formula, so a wrong CRC walk, inflate, or
    Paeth branch breaks the hash.

    At 100 TB this is the canonical media-feature topology: two
    chained narrow Arrow stages (synthesize→decode here; read→decode
    in production), payload projected away at the stats reduction,
    nothing wide ever touches the binary. decode_image_stub remains
    only as the documented stand-in for codecs (JPEG/video) that a
    container without native libs genuinely cannot run."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = with_binary_payload_png(docs)
    feats = media.mapInPandas(make_png_stats_batches(), schema=PNG_STATS_SCHEMA)
    return feats.select(
        "doc_id",
        "width",
        "height",
        "px_sum",
        "min_px",
        "max_px",
        dround(
            F.col("px_sum").cast("double") / (F.col("width") * F.col("height")), 4
        ).alias("mean_px"),
    )


def with_binary_payload_png(docs: DataFrame) -> DataFrame:
    """Opaque binary column holding REAL PNG bytes (see
    make_png_payload_batches). Same repartition rationale as
    with_binary_payload: per-row codec work must not run on one
    scan split."""
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
    return docs.mapInPandas(make_png_payload_batches(), schema="doc_id bigint, payload binary")


def make_decode_batches():
    """Build the mapInPandas worker for the fake decode.

    Returned as a CLOSURE (not a module-level function, and with no
    references to module globals) so cloudpickle serializes it BY
    VALUE: the driver's SparkSession may have been created from any
    cwd, in which case Python workers cannot import this package and
    by-reference pickling would fail with ModuleNotFoundError.
    """

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            # vectorized form of decode_image_stub over the whole
            # Arrow batch — the stub's features are pure functions of
            # length, so the only per-element Python is the 64-byte
            # checksum prefix. A real decoder would replace this block
            # with a batched codec call (same output columns).
            lens = payloads.map(len).astype("int64")
            checksums = pd.Series(
                [sum(bytes(p)[:64]) for p in payloads], index=pdf.index, dtype="int64"
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": lens.astype("int32"),
                    "fake_width": (64 + lens % 640).astype("int32"),
                    "fake_height": (64 + (lens * 7) % 480).astype("int32"),
                    "n_frames": (1 + lens % 16).astype("int32"),
                    "checksum": checksums,
                }
            )

    return decode_batches


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary column (documents.text encoded) —
    the stand-in for real image/audio bytes, plus typed metadata.

    Repartitions first: the fixture parquet is a single row group (one
    scan split regardless of maxPartitionBytes), and every downstream
    consumer is a per-row Arrow/pandas decode stage — exactly the work
    that must not run on one core. At 100 TB media shards arrive in
    thousands of files and this collapses to a cheap rebalance."""
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length("text").alias("declared_len"),
        ).alias("media_meta"),
    )


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INTEGER)                  AS byte_len,
           CAST(64 + length(text) % 640 AS INTEGER)       AS fake_width,
           CAST(64 + (length(text) * 7) % 480 AS INTEGER) AS fake_height,
           CAST(1 + length(text) % 16 AS INTEGER)         AS n_frames
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode via mapInPandas (Arrow-batched).

    The fake decode is arithmetic on payload length, so the oracle can
    mirror it (text is ASCII ⇒ byte length == char length); the value
    under test is the real plumbing: binary encode → Arrow transfer →
    per-batch pandas iterator → typed feature columns.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = with_binary_payload(docs)
    feats = media.mapInPandas(make_decode_batches(), schema=DECODE_SCHEMA)
    return feats.select("doc_id", "byte_len", "fake_width", "fake_height", "n_frames")


@register(
    "multimodal_resize_meta",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             64 + length(text) % 640       AS w,
             64 + (length(text) * 7) % 480 AS h
      FROM documents)
    SELECT doc_id,
           CAST(w AS INTEGER) AS src_w, CAST(h AS INTEGER) AS src_h,
           CAST(CASE WHEN w >= h THEN 256 ELSE (256 * w) // h END AS INTEGER) AS dst_w,
           CAST(CASE WHEN w >= h THEN (256 * h) // w ELSE 256 END AS INTEGER) AS dst_h
    FROM f
    """,
)
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning: aspect-preserving fit into 256×256 computed
    from decoded dimensions — pure metadata arithmetic, so the actual
    pixel resample (codec work) is the only stubbed step. At 100 TB
    the planner runs on metadata columns without touching payloads
    (column pruning keeps the binary out of the scan)."""
    feats = multimodal_decode_features(spark, sf_dir)
    w, h = F.col("fake_width").cast("long"), F.col("fake_height").cast("long")
    landscape = w >= h
    return feats.select(
        "doc_id",
        F.col("fake_width").alias("src_w"),
        F.col("fake_height").alias("src_h"),
        F.when(landscape, F.lit(256)).otherwise((256 * w / h).cast("int")).cast("int").alias("dst_w"),
        F.when(landscape, (256 * h / w).cast("int")).otherwise(F.lit(256)).cast("int").alias("dst_h"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id, CAST(1 + length(text) % 16 AS INTEGER) AS n_frames
      FROM documents),
    e AS (
      SELECT doc_id, n_frames, UNNEST(range(0, n_frames)) AS frame_idx
      FROM f)
    SELECT doc_id, n_frames, CAST(frame_idx AS INTEGER) AS frame_idx
    FROM e WHERE frame_idx % 4 = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: one row per sampled 'frame' (video-style
    fan-out). posexplode over the decoded frame count — the payload is
    projected away BEFORE the explode so the fan-out never duplicates
    megabyte blobs (the #1 multimodal-pipeline scale mistake).

    The deterministic decode stub (n_frames = 1 + len % 16) makes the
    whole fan-out SQL-mirrorable, so this carries a full value-hash
    oracle despite the decode running through the real mapInPandas
    plumbing."""
    feats = multimodal_decode_features(spark, sf_dir)
    return (
        feats.select(
            "doc_id",
            "n_frames",
            F.posexplode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias(
                "frame_idx", "frame_offset"
            ),
        )
        .filter(F.col("frame_idx") % 4 == 0)  # sample every 4th frame
        .select("doc_id", "n_frames", "frame_idx")
    )


AUDIO_CHUNK_MS = 5000
AUDIO_STRIDE_MS = 4000  # 1 s overlap between consecutive chunks


@register(
    "multimodal_audio_chunks",
    oracle=f"""
    WITH a AS (
        SELECT doc_id,
               CAST(1000 + (length(text) * 13) % 60000 AS BIGINT) AS duration_ms
        FROM documents),
    c AS (
        SELECT doc_id, duration_ms,
               UNNEST(range(0, duration_ms, {AUDIO_STRIDE_MS})) AS start_ms
        FROM a)
    SELECT doc_id, duration_ms,
           CAST(start_ms // {AUDIO_STRIDE_MS} AS INTEGER) AS chunk_idx,
           CAST(start_ms AS BIGINT) AS start_ms,
           CAST(LEAST(start_ms + {AUDIO_CHUNK_MS}, duration_ms) AS BIGINT) AS end_ms,
           (start_ms + {AUDIO_STRIDE_MS} >= duration_ms) AS is_last
    FROM c ORDER BY doc_id, chunk_idx
    """,
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunking plumbing — the ASR/feature-extraction front end:
    each clip is cut into overlapping fixed-duration windows (5 s
    chunks, 4 s stride). Durations are derived deterministically from
    payload length (the decode step is the stub, per the container's
    no-codec constraint); the chunk *planning* — sequence generation,
    fan-out, boundary clamping — is the real Spark surface under test.

    The payload is projected away BEFORE the explode (same rule as
    frame sampling: never duplicate blobs through a fan-out); at
    100 TB the chunk plan is pure metadata and the per-chunk decode
    joins back to byte ranges only inside the Arrow batch."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(
        "doc_id",
        (1000 + (F.length("text") * 13) % 60000).cast("bigint").alias("duration_ms"),
    )
    c = a.select(
        "doc_id",
        "duration_ms",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(AUDIO_STRIDE_MS))
        ).alias("start_ms"),
    )
    return c.select(
        "doc_id",
        "duration_ms",
        (F.col("start_ms") / AUDIO_STRIDE_MS).cast("int").alias("chunk_idx"),
        F.col("start_ms").cast("bigint"),
        F.least(
            F.col("start_ms") + AUDIO_CHUNK_MS, F.col("duration_ms")
        ).cast("bigint").alias("end_ms"),
        (F.col("start_ms") + AUDIO_STRIDE_MS >= F.col("duration_ms")).alias("is_last"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "multimodal_pair_align",
    oracle="""
    WITH d AS (SELECT doc_id, source FROM documents),
         e AS (SELECT vec_id, label FROM embeddings)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(e.vec_id) AS BIGINT) AS n_paired,
           CAST(COUNT(*) - COUNT(e.vec_id) AS BIGINT) AS n_unpaired
    FROM d LEFT JOIN e ON d.doc_id = e.vec_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def multimodal_pair_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality-alignment audit: join the text corpus to the embedding
    store on the shared id and report per-source pairing coverage —
    the dataset-assembly pre-flight for any multimodal training run
    (every caption needs its vector; silently dropped pairs skew the
    mix). The left join keeps unpaired documents countable instead of
    discarding them.

    100 TB note: id-to-id equi join — bucket both stores on the id at
    write time and the audit is exchange-free (tests/test_bucketing.py
    proves the plan); the per-source rollup shuffles one row per
    (task, source)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    return (
        d.join(e, d["doc_id"] == e["vec_id"], "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("vec_id").alias("n_paired"),
            (F.count("*") - F.count("vec_id")).alias("n_unpaired"),
        )
        .orderBy("source")
    )


@register(
    "multimodal_dataset_manifest",
    oracle="""
    WITH splits AS (
      SELECT doc_id, source, lang, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'valid'
                  ELSE 'train' END AS split
      FROM documents
    ),
    paired AS (
      SELECT s.*, CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END AS has_vec
      FROM splits s LEFT JOIN embeddings e ON s.doc_id = e.vec_id
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(has_vec) AS BIGINT) AS n_with_embedding
    FROM paired
    GROUP BY source, split
    ORDER BY source, split
    """,
)
def multimodal_dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card manifest: per (source, split) — docs, bytes,
    language spread, and embedding coverage — composing the hash-split
    assignment (sample_split_documents), the modality pairing
    (multimodal_pair_align) and size accounting into the single table
    a training run's datasheet starts from.

    One left join + one aggregation; every input is a pure projection.
    100 TB note: this is the artifact worth MATERIALIZING per corpus
    snapshot — every mix decision (pipeline_training_mix rates, split
    budgets) reads the manifest, not the corpus."""
    from pwir_zadanie_4_mapreduce_spark.operators.sampling import (
        TEST_UPPER,
        VALID_UPPER,
        hash_bucket,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    b = hash_bucket("doc_id")
    split = (
        F.when(b < TEST_UPPER, "test").when(b < VALID_UPPER, "valid").otherwise("train")
    )
    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    return (
        docs.withColumn("split", split)
        .join(e, docs["doc_id"] == e["vec_id"], "left")
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.count("vec_id").alias("n_with_embedding"),
        )
        .orderBy("source", "split")
    )
