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
