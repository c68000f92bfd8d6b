"""Pure-numpy raster codecs + the real-bytes multimodal path.

Round-8 upgrade: the multimodal pipeline previously ran only on an
injected fake decoder (no image library ships here); numpy does ship,
so netpbm/BMP now decode for real. These tests pin (1) exact codec
roundtrips under hypothesis, (2) the exact-tile pooling's
mean-preservation claim over arbitrary (h, w, grid), and (3) the full
binaryFile → mapInPandas decode → features/resize path on real encoded
bytes with ZERO injected fakes.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from direct_kafka_stream_spark.functions import multimodal as mm
from direct_kafka_stream_spark.functions import raster


def _rng_img(seed: int, h: int, w: int, ch: int | None = None) -> np.ndarray:
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# codec roundtrips
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    rgb=st.booleans(),
)
def test_ppm_roundtrip_exact(seed, h, w, rgb):
    img = _rng_img(seed, h, w, 3 if rgb else None)
    back = raster.decode_ppm(raster.encode_ppm(img))
    assert back.dtype == np.uint8 and back.shape == img.shape
    assert np.array_equal(back, img)


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 40),
    w=st.integers(1, 40),  # covers all 4 stride-padding residues
)
def test_bmp_roundtrip_exact(seed, h, w):
    img = _rng_img(seed, h, w, 3)
    back = raster.decode_bmp(raster.encode_bmp(img))
    assert np.array_equal(back, img)


def test_ppm_header_comments_and_whitespace():
    img = _rng_img(7, 3, 5)
    body = raster.encode_ppm(img).split(b"\n", 1)[1].split(b"\n", 2)[2]
    wrapped = b"P5\n# a comment\n 5  # trailing\n 3\n255\n" + body
    # decoder must skip comments/extra whitespace like real netpbm
    assert np.array_equal(raster.decode_ppm(wrapped), img)


def test_bmp_topdown_rows_decode():
    """Negative biHeight = top-down row order (a real-world BMP
    variant the encoder never emits): decoded pixels must match the
    bottom-up encoding of the same image."""
    import struct

    img = _rng_img(23, 5, 3, 3)
    payload = bytearray(raster.encode_bmp(img))
    h = img.shape[0]
    struct.pack_into("<i", payload, 22, -h)  # biHeight := -h
    off = struct.unpack_from("<I", payload, 10)[0]
    stride = (img.shape[1] * 3 + 3) & ~3
    rows = np.frombuffer(bytes(payload[off:]), dtype=np.uint8).reshape(h, stride)
    flipped = payload[:off] + rows[::-1].tobytes()  # re-order rows top-down
    assert np.array_equal(raster.decode_bmp(bytes(flipped)), img)


def test_decoders_reject_foreign_payloads():
    with pytest.raises(ValueError):
        raster.decode_ppm(b"BM\x00\x00")
    with pytest.raises(ValueError):
        raster.decode_bmp(b"P6 1 1 255 \x00\x00\x00")
    with pytest.raises(ValueError):
        raster.decode_raster(b"\x89PNG unsupported")


def test_sniff_rejects_lookalike_text():
    """Two-byte magic collisions must NOT route into the codecs: text
    starting with 'BM'/'P5'/'P6' stays on the explicit-stub path
    (previously decode_bmp could raise struct.error on 'BMW ...')."""
    for payload in (b"BM", b"BMW is a carmaker", b"P6x no separator",
                    b"P5", b"BM" + b"\x00" * 60):
        assert raster.sniff(payload) is None, payload
        with pytest.raises(NotImplementedError):
            mm.decode_image(payload)
    # real encodings still sniff
    assert raster.sniff(raster.encode_ppm(_rng_img(1, 2, 2))) == "ppm"
    assert raster.sniff(raster.encode_bmp(_rng_img(1, 2, 2, 3))) == "bmp"


def test_decode_image_sniffs_rasters_and_stubs_the_rest():
    img = _rng_img(11, 6, 4, 3)
    lum = img.astype(np.float64).mean(axis=2)
    assert np.array_equal(mm.decode_image(raster.encode_ppm(img)), lum)
    assert np.array_equal(mm.decode_image(raster.encode_bmp(img)), lum)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff jpeg-ish")


# ---------------------------------------------------------------------------
# exact-tile pooling: mean preservation over arbitrary (h, w, grid)
# ---------------------------------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 50),
    w=st.integers(1, 50),
    out_h=st.integers(1, 12),
    out_w=st.integers(1, 12),
)
def test_pool_mean_preserves_global_mean_exactly(seed, h, w, out_h, out_w):
    """The tiles partition the image and the pooled mean is
    pixel-count weighted, so pooled == global mean EXACTLY (uint8 sums
    are exact integers in float64) — including grids coarser AND finer
    than the image (empty tiles when out_h > h)."""
    img = _rng_img(seed, h, w).astype(np.float64)
    assert mm.pool_mean(img, out_h, out_w) == img.mean()


# ---------------------------------------------------------------------------
# end-to-end on real bytes: binaryFile → decode → features/resize
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def raster_landing(spark, tmp_path_factory):
    """A landing dir of REAL encoded images (mixed PPM/BMP, varied
    shapes) read back through the binaryFile source."""
    root = tmp_path_factory.mktemp("raster_landing")
    truth = {}
    for i in range(12):
        img = _rng_img(100 + i, 5 + i, 9 + (i * 3) % 7, 3)
        payload = raster.encode_ppm(img) if i % 2 else raster.encode_bmp(img)
        ext = "ppm" if i % 2 else "bmp"
        (root / f"img_{i}.{ext}").write_bytes(payload)
        truth[i] = (img, len(payload))
    from pyspark.sql import functions as F

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "img_*")
        .load(str(root))
        .select(
            F.regexp_extract("path", r"img_(\d+)\.", 1).cast("long").alias("doc_id"),
            F.col("content").alias("media"),
        )
    )
    return raw, truth


def test_image_features_on_real_bytes(spark, raster_landing):
    """No injected decoder anywhere: the sniffer decodes the real PPM
    and BMP payloads, and every emitted feature matches a direct numpy
    recomputation from the source image."""
    raw, truth = raster_landing
    feats = {r.doc_id: r for r in mm.image_features(raw).collect()}
    assert set(feats) == set(truth)
    for i, (img, n_bytes) in truth.items():
        lum = img.astype(np.float64).mean(axis=2)
        r = feats[i]
        assert (r.height, r.width) == lum.shape
        assert r.n_bytes == n_bytes
        assert r.mean_lum == pytest.approx(float(lum.mean()), rel=1e-12)
        flat = np.resize(lum, (8, 8))
        bits = (flat > flat.mean()).flatten()
        phash = int(sum(int(b) << k for k, b in enumerate(bits)))
        if phash >= 1 << 63:
            phash -= 1 << 64
        assert r.phash == phash


def test_resize_images_on_real_bytes(spark, raster_landing):
    raw, truth = raster_landing
    rows = mm.resize_images(raw, out_h=3, out_w=5).collect()
    assert len(rows) == len(truth)
    for r in rows:
        img, _ = truth[r.doc_id]
        assert (r.out_h, r.out_w) == (3, 5)
        # exact-tile pooling preserves the global luminance mean (to
        # summation-order rounding: RGB luminance is a channel MEAN, so
        # the plane is non-integer — bit-exactness holds only for
        # integer planes, pinned by the hypothesis property above)
        assert r.mean_lum == pytest.approx(
            img.astype(np.float64).mean(axis=2).mean(), rel=1e-12
        )


def test_frame_sample_on_real_bytes(spark, raster_landing):
    raw, truth = raster_landing
    frames = mm.frame_sample(raw, every_nth=2).toPandas()
    assert set(frames["doc_id"]) == set(truth)
    per_doc = frames.groupby("doc_id")["frame_idx"].max()
    for i, (_, n_bytes) in truth.items():
        assert per_doc[i] == ((n_bytes // 16 - 1) // 2) * 2
