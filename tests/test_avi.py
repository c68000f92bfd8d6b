"""Pure-numpy AVI codec + the real-bytes VIDEO multimodal path.

Round-9 completion of the real-bytes multimodal story (image:
raster.py round-8, audio: wav.py round-9): the video pipeline
previously ran only on the notional byte-slice shape; uncompressed
24-bit DIB AVI is trivial enough to en/decode with struct +
np.frombuffer (each frame chunk IS a BMP pixel array), so frame
sampling now runs end-to-end on real encoded video. These tests pin
(1) exact codec roundtrips under hypothesis (raw DIB is lossless),
(2) the recursive RIFF LIST walk's structure checks and loud
rejections (compressed streams, irregular layouts, truncation), and
(3) the full binaryFile → header-parse → JVM-side frame slice →
decode/fingerprint path on real encoded bytes with ZERO injected
fakes.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from direct_kafka_stream_spark.functions import avi
from direct_kafka_stream_spark.functions import multimodal as mm


def _rng_frames(seed: int, n: int, h: int, w: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)


# ---------------------------------------------------------------------------
# codec roundtrips
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 8),
    h=st.integers(1, 16),
    w=st.integers(1, 16),  # covers every row-padding residue w*3 % 4
    fps=st.sampled_from([1, 10, 24, 30, 60]),
)
def test_avi_roundtrip_exact(seed, n, h, w, fps):
    frames = _rng_frames(seed, n, h, w)
    fps2, back = avi.decode_avi(avi.encode_avi(frames, fps))
    assert fps2 == fps
    assert back.dtype == np.uint8 and back.shape == frames.shape
    assert np.array_equal(back, frames)


def test_avi_header_fields():
    frames = _rng_frames(3, 4, 6, 5)  # w=5 → stride 16 (padded from 15)
    h = avi.parse_header(avi.encode_avi(frames, 24))
    assert (h["width"], h["height"], h["n_frames"]) == (5, 6, 4)
    assert h["fps"] == 24.0
    assert h["frame_size"] == 16 * 6
    # regular layout: consecutive 00db chunks, 8-byte headers between
    assert h["stride_bytes"] == h["frame_size"] + 8


def test_avi_decoder_rejects_compressed_and_wrong_depth_loudly():
    blob = avi.encode_avi(_rng_frames(1, 2, 4, 4), 10)
    strf_off = blob.find(b"strf") + 8  # BITMAPINFOHEADER start
    for field_off, val, msg in (
        (16, 0x47504A4D, "biCompression=MJPG"),  # compression fourcc
        (14, 32, "32-bit"),  # biBitCount
    ):
        bad = bytearray(blob)
        struct.pack_into(
            "<H" if field_off == 14 else "<I", bad, strf_off + field_off, val
        )
        with pytest.raises(ValueError):
            avi.decode_avi(bytes(bad)), msg


def test_avi_decoder_rejects_structural_damage_loudly():
    frames = _rng_frames(2, 3, 4, 4)
    blob = avi.encode_avi(frames, 10)
    with pytest.raises(ValueError):
        avi.decode_avi(blob[: len(blob) // 2])  # truncated chunk
    with pytest.raises(ValueError):
        avi.decode_avi(b"RIFF\x08\x00\x00\x00WAVEdata")  # RIFF, not AVI
    # frame-count mismatch between avih and movi must not pass silently
    bad = bytearray(blob)
    avih_off = blob.find(b"avih") + 8
    struct.pack_into("<I", bad, avih_off + 16, 99)  # dwTotalFrames
    with pytest.raises(ValueError):
        avi.decode_avi(bytes(bad))


def test_avi_fps_is_exact_or_loud():
    """A fractional float fps must be rejected (the integer dwRate
    field would silently truncate it); rational rates round-trip
    exactly through an integer (rate, scale) pair."""
    frames = _rng_frames(6, 2, 3, 3)
    with pytest.raises(ValueError, match="non-integral"):
        avi.encode_avi(frames, 29.97)
    fps, back = avi.decode_avi(avi.encode_avi(frames, (30000, 1001)))
    assert fps == 30000 / 1001 and np.array_equal(back, frames)
    # derived u32 header fields must overflow LOUDLY (ValueError per
    # the codec contract, not struct.error): dwMicroSecPerFrame for a
    # huge scale, dwMaxBytesPerSec for huge frames at high rate
    with pytest.raises(ValueError, match="32-bit"):
        avi.encode_avi(frames, (1, 4295))
    with pytest.raises(ValueError, match="32-bit"):
        avi.encode_avi(np.zeros((1, 1200, 1200, 3), dtype=np.uint8), 1000)


def test_avi_dimension_overflow_is_loud():
    """rcFrame in strh is four SIGNED 16-bit fields: any dimension past
    32767 must raise the promised ValueError, not escape as
    struct.error from the '4h' pack (ADVICE round 9)."""
    with pytest.raises(ValueError, match="rcFrame"):
        avi.encode_avi(np.zeros((1, 1, 32768, 3), dtype=np.uint8), 10)
    with pytest.raises(ValueError, match="rcFrame"):
        avi.encode_avi(np.zeros((1, 32768, 1, 3), dtype=np.uint8), 10)
    # 32767-wide is representable and round-trips
    fps, back = avi.decode_avi(
        avi.encode_avi(np.zeros((1, 1, 32767, 3), dtype=np.uint8), 10)
    )
    assert back.shape == (1, 1, 32767, 3)


def test_sniff_avi_requires_avi_form_type():
    assert avi.sniff_avi(avi.encode_avi(_rng_frames(4, 1, 2, 2), 1))
    assert not avi.sniff_avi(b"RIFF\x10\x00\x00\x00WAVE")  # RIFF but not AVI
    assert not avi.sniff_avi(b"RIFF")  # too short
    assert not avi.sniff_avi(b"\x00\x00\x00\x18ftypmp42")  # mp4-ish


def test_decode_video_sniffs_avi_and_stubs_the_rest():
    frames = _rng_frames(11, 3, 5, 7)
    fps, back = mm.decode_video(avi.encode_avi(frames, 30))
    assert fps == 30.0 and np.array_equal(back, frames)
    with pytest.raises(NotImplementedError):
        mm.decode_video(b"\x00\x00\x00\x18ftypisom mp4-ish")
    # injection point still wins over the sniffer
    fps, back = mm.decode_video(b"anything", decoder=lambda p: (1.0, len(p)))
    assert (fps, back) == (1.0, 8)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), w=st.integers(1, 12), h=st.integers(1, 12))
def test_decode_frame_matches_full_decode(seed, w, h):
    """Slicing one frame's chunk out of the container and decoding it
    standalone (the JVM-substring path) must equal the full decode —
    the property frame_sample_avi's correctness rests on."""
    frames = _rng_frames(seed, 3, h, w)
    blob = avi.encode_avi(frames, 10)
    hdr = avi.parse_header(blob)
    for i in range(3):
        start = hdr["data_off"] + i * hdr["stride_bytes"]
        chunk = blob[start : start + hdr["frame_size"]]
        assert np.array_equal(
            avi.decode_frame(chunk, hdr["width"], hdr["height"]), frames[i]
        )


# ---------------------------------------------------------------------------
# end-to-end on real bytes: binaryFile → header parse → frame slice → features
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def avi_landing(spark, tmp_path_factory):
    """A landing dir of REAL encoded AVIs (varied frame counts, dims
    including padded-row widths, rates) read through binaryFile."""
    root = tmp_path_factory.mktemp("avi_landing")
    truth = {}
    for i in range(8):
        n = 2 + i
        h, w = 4 + i % 3, 3 + i % 5  # w ∈ {3..7} covers stride padding
        fps = (10, 24, 30)[i % 3]
        frames = _rng_frames(900 + i, n, h, w)
        (root / f"clip_{i}.avi").write_bytes(avi.encode_avi(frames, fps))
        truth[i] = (frames, fps)
    from pyspark.sql import functions as F

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "clip_*")
        .load(str(root))
        .select(
            F.regexp_extract("path", r"clip_(\d+)\.", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("content").alias("media"),
        )
    )
    return raw, truth


def test_frame_sample_avi_on_real_bytes(spark, avi_landing):
    """No injected decoder anywhere: header parse walks the real movi
    chunk directory, the JVM slices each sampled frame's exact byte
    range, and every emitted luminance/fingerprint matches a direct
    numpy recomputation from the source frames."""
    raw, truth = avi_landing
    every = 2
    got = mm.frame_sample_avi(raw, every_nth=every).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(truth)
    for i, (frames, fps) in truth.items():
        n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        rows = sorted(by_doc[i], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(range(0, n, every))
        for r in rows:
            assert (r.width, r.height, r.fps) == (w, h, float(fps))
            img = frames[r.frame_idx].astype(np.float64)
            assert r.mean_lum == pytest.approx(float(img.mean()), rel=1e-12)
            flat = np.resize(img, (8, 8))
            bits = (flat > flat.mean()).flatten()
            phash = int(sum(int(b) << k for k, b in enumerate(bits)))
            if phash >= 1 << 63:
                phash -= 1 << 64
            assert r.phash == phash


def test_frame_sample_avi_every_nth_one_is_dense(spark, avi_landing):
    raw, truth = avi_landing
    got = mm.frame_sample_avi(raw, every_nth=1).collect()
    assert len(got) == sum(f.shape[0] for f, _ in truth.values())
