"""Multimodal columns: opaque binary payloads + typed metadata (OP-52;
SURVEY.md §2.11, BASELINE.json:6; the reference's EMBEDDING value type at
feature_registry.py:42 is the only media-adjacent type it has).

Design: media is a row of ``(media_id, kind, content: binary, meta: struct)``.
The engine treats ``content`` as opaque bytes — Spark shuffles/stores it
without interpretation — while ``meta`` carries the typed, queryable facts
(dimensions, sample rate, duration, frame count).  Everything metadata-driven
(frame sampling, chunking, filtering, stats) is pure JVM column expressions;
only payload *decoding* needs Python, and runs as Arrow-batched
``mapInPandas`` so bytes cross the JVM→Python boundary once per batch, not
per row.

The container has no image/audio codecs, so the decode kernels are STUBBED:
``use_fake_decoder=True`` (default) computes deterministic byte-level
features (real plumbing, fake pixels); ``use_fake_decoder=False`` raises
``NotImplementedError`` unless Pillow is importable.  The Spark-side shape —
schema, batch iteration, partitioning — is the production path either way.

Scale notes: media payloads dominate row size, so operators that don't need
``content`` must prune it (metadata queries never touch the binary column —
columnar parquet makes that free).  Decode fan-out is CPU-bound per row →
``repartition`` before ``mapInPandas`` spreads codec work; Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds peak Python memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_TYPE, True),
    ]
)


def synthesize_media_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake media corpus from the documents table: the text
    bytes stand in for an encoded payload; metadata derives arithmetically
    from ``n_chars`` so every engine (incl. a SQL oracle) can reproduce it.

    kind cycles image→audio→video by id; image dims / audio sample-rate /
    video frame count are simple functions of payload length.
    """
    n = F.length(F.col(text_col))
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col(id_col) % 3 + 1).cast("int")
    )
    meta = F.struct(
        F.when(kind == "image", F.lit("png"))
        .when(kind == "audio", F.lit("wav"))
        .otherwise(F.lit("mp4"))
        .alias("format"),
        F.when(kind == "image", (n % 512 + 64).cast("int")).alias("width"),
        F.when(kind == "image", (n % 256 + 64).cast("int")).alias("height"),
        F.when(kind == "image", F.lit(3)).alias("channels"),
        F.when(kind == "audio", F.lit(16_000)).alias("sample_rate"),
        F.when(kind == "audio", (n.cast("double") / F.lit(100.0))).alias("duration_s"),
        F.when(kind == "video", (n % 240 + 24).cast("int")).alias("n_frames"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        meta.alias("meta"),
    )


# ---------------------------------------------------------------------------
# Metadata-only operators — pure JVM, never touch the binary column
# ---------------------------------------------------------------------------


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind corpus stats.  ``octet_length(content)`` comes from parquet
    column stats-friendly binary length; nothing decodes."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.octet_length("content")).alias("total_bytes"),
        # decimal-accumulated float sum → result independent of partition /
        # accumulation order (bit-identical across engines)
        F.sum(
            F.coalesce(F.col("meta.duration_s"), F.lit(0.0)).cast("decimal(25,6)")
        )
        .cast("double")
        .alias("total_duration_s"),
        F.sum(F.coalesce(F.col("meta.n_frames"), F.lit(0))).alias("total_frames"),
    )


def sample_frames(media: DataFrame, every: int = 10) -> DataFrame:
    """Frame sampling as a metadata explode (video rows only): one output
    row per kept frame index — pure ``sequence``+``explode``, no decoding.
    The downstream frame *decoder* joins this plan back to ``content``."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )


def audio_chunks(media: DataFrame, chunk_s: float = 30.0) -> DataFrame:
    """Chunk audio by duration metadata: (media_id, chunk_idx, start_s,
    end_s) rows — the shape a transcription pipeline fans out over."""
    aud = media.where(F.col("kind") == "audio")
    n_chunks = F.ceil(F.col("meta.duration_s") / F.lit(chunk_s)).cast("int")
    chunks = aud.select(
        "media_id",
        F.col("meta.duration_s").alias("duration_s"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx").cast("double") * F.lit(chunk_s)
    return chunks.select(
        "media_id",
        "chunk_idx",
        start.alias("start_s"),
        F.least(start + F.lit(chunk_s), F.col("duration_s")).alias("end_s"),
    )


# ---------------------------------------------------------------------------
# Decode kernels — Arrow-batched mapInPandas; payload codec STUBBED
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _require_real_decoder() -> None:
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no Pillow
        raise NotImplementedError(
            "real image decoding requires Pillow, which is not installed in "
            "this container; pass use_fake_decoder=True for the deterministic "
            "byte-level stub"
        ) from exc


def decode_image_features(
    media: DataFrame, use_fake_decoder: bool = True
) -> DataFrame:
    """Decode → feature-extract for image rows.

    Fake path (default): deterministic byte statistics (length, mean, an
    entropy-ish score) computed with numpy over the raw payload — exercises
    the exact production plumbing (binary column through Arrow into pandas,
    batched, schema'd) without a codec.  Real path: NotImplementedError
    until Pillow exists; the kernel body is where ``PIL.Image.open`` goes.
    """
    if not use_fake_decoder:
        _require_real_decoder()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                payload = bytes(content) if content is not None else b""
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size:
                    counts = np.bincount(arr, minlength=256)
                    p = counts[counts > 0] / arr.size
                    # entropy: round to 6 decimals — canonical across engines
                    # (transcendental terms can't land on a .5 tie, so the
                    # rounding-mode difference between Python/numpy
                    # [half-even] and SQL engines [half-away] never fires)
                    entropy = round(float(-(p * np.log2(p)).sum()), 6)
                    # mean: byte sums are exact integers, and an integer
                    # mean CAN tie at 6 decimals (e.g. 95.4140625), where
                    # half-even vs half-away rounding diverges — so floor in
                    # exact integer micro-units instead of rounding
                    mean = (
                        int(arr.sum(dtype=np.int64)) * 1_000_000 // arr.size
                    ) / 1e6
                else:
                    entropy, mean = 0.0, 0.0
                meta = meta if isinstance(meta, dict) else {}
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": arr.size,
                        "mean_byte": mean,
                        "byte_entropy": entropy,
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    images = media.where(F.col("kind") == "image")
    return images.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, use_fake_decoder: bool = True
) -> DataFrame:
    """Resize: payload transform is the stub (fake path passes bytes through
    and rewrites metadata — the shape of the real op); metadata update is
    real and JVM-side."""
    if not use_fake_decoder:
        _require_real_decoder()
    new_meta = F.struct(
        F.col("meta.format").alias("format"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.col("meta.channels").alias("channels"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_s").alias("duration_s"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    return media.withColumn(
        "meta", F.when(F.col("kind") == "image", new_meta).otherwise(F.col("meta"))
    )


def frame_signatures(
    media: DataFrame, every: int = 10, window: int = 64
) -> DataFrame:
    """Per-sampled-frame content signature (the perceptual-hash analog on
    the stubbed codec): each kept frame hashes a ``window``-byte slice of
    the payload at its frame offset.  With a real codec the md5-of-slice
    becomes pHash-of-decoded-frame; the plan shape — metadata explode,
    payload sliced JVM-side, NO Python in the loop — is the production
    one either way.

    Output: (media_id, frame_idx, sig).  Entirely codegen (explode +
    substr + md5); payload bytes never leave the JVM.
    """
    vids = media.where(F.col("kind") == "video")
    payload = F.decode(F.col("content"), "UTF-8")
    frames = vids.select(
        "media_id",
        payload.alias("__payload"),
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )
    sig = F.md5(
        F.col("__payload").substr(F.col("frame_idx") + 1, F.lit(window))
    )
    return frames.select("media_id", "frame_idx", sig.alias("sig"))


def frame_dedup_groups(frames: DataFrame) -> DataFrame:
    """Cross-video duplicate-frame groups: frames sharing a signature,
    with a deterministic keeper (lexicographically smallest
    (media_id, frame_idx)).  One partial-aggregatable groupBy on the
    hash-uniform signature — the same no-skew shuffle shape as exact doc
    dedup (OP-48), applied at frame granularity."""
    keeper = F.min(F.struct("media_id", "frame_idx")).alias("__k")
    out = frames.groupBy("sig").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("media_id").alias("n_media"),
        keeper,
    )
    return out.where(F.col("n_frames") > 1).select(
        "sig",
        "n_frames",
        "n_media",
        F.col("__k.media_id").alias("keeper_media_id"),
        F.col("__k.frame_idx").alias("keeper_frame_idx"),
    )
