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
