"""Multimodal column plumbing tests: binary payloads + metadata structs
through mapInPandas with an injected deterministic decoder (the real
codec is stubbed in this environment — the Spark-side schema,
batching, and partitioning are what's under test)."""

from __future__ import annotations

import pytest

from direct_kafka_stream_spark.functions import multimodal as mm
from direct_kafka_stream_spark.io import load_table

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    return mm.attach_binary_column(docs)


def test_binary_column_schema(media):
    schema = dict((f.name, f.dataType.simpleString()) for f in media.schema.fields)
    assert schema["media"] == "binary"
    assert schema["media_meta"].startswith("struct<mime:string")


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x00\x01")


def test_image_features_pipeline(spark, media):
    feats = mm.image_features(media, decoder=mm.fake_decoder)
    pdf = feats.toPandas()
    assert list(pdf.columns) == ["doc_id", "width", "height", "n_bytes", "mean_lum", "phash"]
    assert len(pdf) == 50
    assert (pdf["width"].between(8, 16)).all()
    assert (pdf["n_bytes"] > 0).all()
    # determinism: same input → same fingerprint
    pdf2 = mm.image_features(media, decoder=mm.fake_decoder).toPandas()
    assert pdf.sort_values("doc_id")["phash"].tolist() == pdf2.sort_values("doc_id")["phash"].tolist()


def test_frame_sample(spark, media):
    frames = mm.frame_sample(media, every_nth=3).toPandas()
    assert (frames["frame_idx"] % 3 == 0).all()
    assert (frames["byte_end"] - frames["byte_start"] == 16).all()
    one = frames[frames["doc_id"] == frames["doc_id"].iloc[0]]
    assert one["frame_idx"].is_monotonic_increasing


def test_binaryfile_source_feeds_feature_extraction(spark, tmp_path):
    """The corpus-ingestion path for raw media: files on disk read via
    the binaryFile source (path/length/content schema), filtered by
    glob, recursed into nested dirs, doc ids derived from filenames —
    then straight into the mapInPandas feature extractor. At 100 TB
    this is the landing read that precedes the parquet rewrite; the
    source parallelizes per file with zero shuffle."""
    from pyspark.sql import functions as F

    media_root = tmp_path / "landing"
    for sub, ids in [("batch=0", (0, 1, 2)), ("batch=1/deep", (3, 4))]:
        d = media_root / sub
        d.mkdir(parents=True)
        for i in ids:
            (d / f"img_{i}.bin").write_bytes(bytes([i + 1] * (32 + i)))
        (d / "ignore.txt").write_text("not media")

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .option("recursiveFileLookup", "true")
        .load(str(media_root))
    )
    schema = {f.name: f.dataType.simpleString() for f in raw.schema.fields}
    assert schema["content"] == "binary" and schema["length"] == "bigint"
    assert raw.count() == 5  # .txt files excluded by the glob

    docs = raw.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("media"),
    )
    feats = {
        r.doc_id: r for r in mm.image_features(docs, decoder=mm.fake_decoder).collect()
    }
    assert set(feats) == {0, 1, 2, 3, 4}
    assert all(feats[i].n_bytes == 32 + i for i in feats)
    assert all(feats[i].width >= 8 and feats[i].height >= 8 for i in feats)


def test_resize_images_fixed_grid(spark, media):
    """resize_images pools any decoded shape onto the fixed target grid
    and preserves the global mean (area-average over the full image)."""
    from direct_kafka_stream_spark.functions.multimodal import (
        fake_decoder,
        resize_images,
    )

    out = resize_images(media, out_h=4, out_w=4, decoder=fake_decoder)
    rows = out.collect()
    assert len(rows) == media.count()
    assert all((r.out_h, r.out_w) == (4, 4) for r in rows)
    assert all(0.0 <= r.mean_lum <= 255.0 for r in rows)
    # the pooled buckets tile the image exactly and the pooled mean is
    # pixel-count weighted, so mean_lum == the image's global mean
    payloads = {r.doc_id: bytes(r.media) for r in media.collect()}
    for r in rows:
        img = fake_decoder(payloads[r.doc_id]).astype(float)
        assert r.mean_lum == pytest.approx(float(img.mean()), rel=1e-12)


def test_resize_without_decoder_is_explicit_stub(spark, media):
    from direct_kafka_stream_spark.functions.multimodal import resize_images

    with pytest.raises(Exception) as ei:
        resize_images(media).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_audio_windows_bounds_and_rms(spark, media):
    """audio_windows emits overlapping byte windows with JVM-computed
    bounds and a per-window RMS equal to a numpy recomputation."""
    import numpy as np

    from direct_kafka_stream_spark.functions.multimodal import audio_windows

    out = audio_windows(media, win_bytes=32, hop_bytes=16).collect()
    assert out, "fixture payloads are longer than one window"
    payloads = {r.doc_id: bytes(r.media) for r in media.collect()}
    for r in out:
        assert r.byte_end - r.byte_start == 32
        assert r.byte_start == r.win_idx * 16
        arr = np.frombuffer(
            payloads[r.doc_id][r.byte_start:r.byte_end], dtype=np.uint8
        ).astype(np.float64)
        assert abs(r.rms - float(np.sqrt((arr * arr).mean()))) < 1e-9
