"""Multimodal column tests (OP-52): media table synthesis, metadata-only
plans, frame/chunk fan-out, and the Arrow-batched mapInPandas decode stub.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from feature_store_healthcare_spark.operators import multimodal
from feature_store_healthcare_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.synthesize_media_table(docs)


def test_media_schema_and_kinds(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "content", "meta"]
    assert media.schema["content"].dataType.simpleString() == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_content_is_opaque_bytes_roundtrip(media, spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    joined = media.join(docs, media.media_id == docs.doc_id).select(
        "media_id", "content", "text"
    )
    for r in joined.limit(10).collect():
        assert bytes(r.content).decode("utf-8") == r.text


def test_media_stats_prunes_payload(media):
    stats = multimodal.media_stats(media)
    rows = {r.kind: r for r in stats.collect()}
    assert set(rows) == {"image", "audio", "video"}
    assert all(r.n_media > 0 for r in rows.values())
    assert rows["audio"].total_duration_s > 0
    assert rows["video"].total_frames > 0
    # images/videos carry no duration; audio carries no frames
    assert rows["image"].total_duration_s == 0.0
    assert rows["audio"].total_frames == 0


def test_sample_frames_counts(media):
    frames = multimodal.sample_frames(media, every=10)
    per = frames.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("max_idx")
    )
    meta = media.where(F.col("kind") == "video").select(
        "media_id", F.col("meta.n_frames").alias("n_frames")
    )
    for r in per.join(meta, "media_id").collect():
        assert r.n == math.floor((r.n_frames - 1) / 10) + 1
        assert r.max_idx < r.n_frames


def test_audio_chunks_cover_duration(media):
    chunks = multimodal.audio_chunks(media, chunk_s=30.0)
    agg = chunks.groupBy("media_id").agg(
        F.count("*").alias("n"),
        F.max("end_s").alias("max_end"),
        F.min("start_s").alias("min_start"),
    )
    meta = media.where(F.col("kind") == "audio").select(
        "media_id", F.col("meta.duration_s").alias("dur")
    )
    for r in agg.join(meta, "media_id").collect():
        assert r.min_start == 0.0
        assert abs(r.max_end - r.dur) < 1e-9
        assert r.n == math.ceil(r.dur / 30.0)


def test_decode_image_features_fake_kernel(media):
    feats = multimodal.decode_image_features(media, use_fake_decoder=True)
    n_images = media.where(F.col("kind") == "image").count()
    rows = feats.collect()
    assert len(rows) == n_images
    for r in rows[:20]:
        assert r.n_bytes > 0
        assert 0.0 <= r.mean_byte <= 255.0
        assert 0.0 <= r.byte_entropy <= 8.0
        assert r.width is not None and r.height is not None


def test_decode_image_features_deterministic(media):
    a = {r.media_id: (r.mean_byte, r.byte_entropy) for r in
         multimodal.decode_image_features(media).collect()}
    b = {r.media_id: (r.mean_byte, r.byte_entropy) for r in
         multimodal.decode_image_features(media).collect()}
    assert a == b


def test_real_decoder_gates_unknown_formats_only(media):
    """Round-12: the real path no longer blanket-raises — built-in PNG/BMP
    codecs decode without Pillow; only out-of-profile payloads still gate.
    `synthesize_media_table` payloads are raw text bytes (neither magic),
    so the real path on THEM must fail at execution with the explicit
    capability error."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow unexpectedly present; unknown formats would decode")
    except ImportError:
        pass
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    out = multimodal.decode_image_features(media, use_fake_decoder=False)
    with pytest.raises((PythonException, Py4JJavaError), match="neither PNG nor BMP"):
        out.collect()


def test_resize_rewrites_image_meta_only(media):
    out = multimodal.resize_images(media, 32, 48)
    img = out.where(F.col("kind") == "image").select("meta.width", "meta.height").distinct().collect()
    assert [(r.width, r.height) for r in img] == [(32, 48)]
    aud = out.where(F.col("kind") == "audio").select("meta.sample_rate").distinct().collect()
    assert [r.sample_rate for r in aud] == [16_000]


class TestFrameDedup:
    def test_identical_payloads_collide(self, spark):
        from pyspark.sql import Row

        docs = spark.createDataFrame(
            [
                Row(doc_id=2, text="the same video payload " * 20),
                Row(doc_id=5, text="the same video payload " * 20),
                Row(doc_id=8, text="a completely different clip " * 20),
            ]
        )
        media = multimodal.synthesize_media_table(docs)
        frames = multimodal.frame_signatures(media, every=10, window=64)
        groups = multimodal.frame_dedup_groups(frames).collect()
        # docs 2 and 5 are identical payloads -> every sampled frame pair
        # collides across the two videos; keeper is the smaller media_id
        cross = [g for g in groups if g["n_media"] == 2]
        assert cross and all(g["keeper_media_id"] == 2 for g in cross)

    def test_signatures_are_deterministic_and_jvm_side(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
        media = multimodal.synthesize_media_table(docs)
        a = multimodal.frame_signatures(media).collect()
        b = multimodal.frame_signatures(media.repartition(5)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # no Python evaluation in the plan
        from feature_store_healthcare_spark import plans

        plan = plans.physical_plan(multimodal.frame_signatures(media))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
