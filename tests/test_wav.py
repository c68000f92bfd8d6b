"""Pure-numpy WAV codec + the real-bytes AUDIO multimodal path.

Round-9 upgrade (mirror of round-8's raster.py image half): the audio
pipeline previously ran only on byte-window fakes; PCM-16 RIFF/WAVE is
trivial enough to en/decode with struct + np.frombuffer, so the path
now runs end-to-end on real encoded audio. These tests pin (1) exact
codec roundtrips under hypothesis (16-bit PCM is lossless), (2) the
RIFF chunk walk's pad-byte and foreign-chunk tolerance, and (3) the
full binaryFile → header-parse → JVM-side window/slice → int16 RMS
path on real encoded bytes with ZERO injected fakes.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from direct_kafka_stream_spark.functions import multimodal as mm
from direct_kafka_stream_spark.functions import wav


def _rng_pcm(seed: int, n: int, ch: int | None = None) -> np.ndarray:
    rng = np.random.RandomState(seed)
    shape = (n,) if ch is None else (n, ch)
    return rng.randint(-32768, 32768, size=shape).astype(np.int16)


# ---------------------------------------------------------------------------
# codec roundtrips
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 400),
    ch=st.one_of(st.none(), st.integers(1, 4)),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
)
def test_wav_roundtrip_exact(seed, n, ch, rate):
    pcm = _rng_pcm(seed, n, ch)
    rate2, back = wav.decode_wav(wav.encode_wav(pcm, rate))
    assert rate2 == rate
    want = pcm if pcm.ndim == 2 else pcm[:, None]  # mono decodes as (n, 1)
    assert back.dtype == np.int16 and back.shape == want.shape
    assert np.array_equal(back, want)


def test_wav_header_fields():
    pcm = _rng_pcm(3, 100, 2)
    h = wav.parse_header(wav.encode_wav(pcm, 22050))
    assert (h["rate"], h["channels"], h["bits"]) == (22050, 2, 16)
    assert h["n_frames"] == 100 and h["data_size"] == 400
    assert h["data_off"] == 44  # canonical layout


def _with_extra_chunk(payload: bytes, cid: bytes, body: bytes) -> bytes:
    """Splice a foreign chunk between fmt and data, fixing the RIFF
    size — odd-sized bodies get the pad byte the spec requires."""
    chunk = cid + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    out = payload[:36] + chunk + payload[36:]
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


def test_wav_chunk_walk_skips_foreign_and_odd_chunks():
    """A LIST chunk with an ODD size must be stepped over including
    its pad byte — off-by-one here shears every later chunk id."""
    pcm = _rng_pcm(9, 37, 1)
    for body in (b"INFOxyz", b"INFOxy"):  # odd (7) and even (6)
        payload = _with_extra_chunk(wav.encode_wav(pcm, 8000), b"LIST", body)
        rate, back = wav.decode_wav(payload)
        assert rate == 8000 and np.array_equal(back, pcm)


def test_wav_extensible_format_tag_decodes():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping 16-bit PCM decodes;
    the tag lives at fmt offset 0."""
    payload = bytearray(wav.encode_wav(_rng_pcm(5, 20, 1), 16000))
    struct.pack_into("<H", payload, 20, 0xFFFE)
    rate, back = wav.decode_wav(bytes(payload))
    assert rate == 16000 and back.shape == (20, 1)


def test_wav_decoder_rejects_non_pcm16_loudly():
    pcm = _rng_pcm(1, 10, 1)
    for off, val in ((20, 3), (34, 32)):  # float tag; 32-bit
        payload = bytearray(wav.encode_wav(pcm, 16000))
        struct.pack_into("<H", payload, off, val)
        with pytest.raises(ValueError):
            wav.decode_wav(bytes(payload))
    with pytest.raises(ValueError):
        wav.decode_wav(b"RIFF\x00\x00\x00\x00AVI LIST")  # RIFF, not WAVE
    truncated = wav.encode_wav(pcm, 16000)[:30]
    with pytest.raises(ValueError):
        wav.decode_wav(truncated)


def test_wav_rejects_partial_trailing_frame_loudly():
    """A data chunk that is not a whole number of frames is corruption;
    silently dropping the tail would violate the loud-decoder contract."""
    payload = bytearray(wav.encode_wav(_rng_pcm(7, 25, 2), 16000))
    # shrink the data chunk's declared size by one byte (data size field
    # sits at offset 40 in the canonical 44-byte layout)
    struct.pack_into("<I", payload, 40, 25 * 4 - 1)
    with pytest.raises(ValueError, match="not a multiple"):
        wav.parse_header(bytes(payload))


def test_sniff_wav_requires_wave_form_type():
    assert wav.sniff_wav(wav.encode_wav(_rng_pcm(2, 4), 8000))
    assert not wav.sniff_wav(b"RIFF\x10\x00\x00\x00AVI ")  # RIFF but not WAVE
    assert not wav.sniff_wav(b"RIFF")  # too short
    assert not wav.sniff_wav(b"\xff\xd8\xff jpeg-ish")


def test_decode_audio_sniffs_wav_and_stubs_the_rest():
    pcm = _rng_pcm(11, 50, 2)
    rate, back = mm.decode_audio(wav.encode_wav(pcm, 44100))
    assert rate == 44100 and np.array_equal(back, pcm)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"OggS vorbis-ish")
    # injection point still wins over the sniffer
    rate, back = mm.decode_audio(b"anything", decoder=lambda p: (1, len(p)))
    assert (rate, back) == (1, 8)


# ---------------------------------------------------------------------------
# end-to-end on real bytes: binaryFile → header parse → windows → RMS
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wav_landing(spark, tmp_path_factory):
    """A landing dir of REAL encoded WAVs (mono + stereo, varied
    lengths/rates) read back through the binaryFile source."""
    root = tmp_path_factory.mktemp("wav_landing")
    truth = {}
    for i in range(10):
        ch = 1 + i % 2
        n = 200 + 37 * i
        rate = (8000, 16000, 44100)[i % 3]
        pcm = _rng_pcm(500 + i, n, ch)
        (root / f"clip_{i}.wav").write_bytes(wav.encode_wav(pcm, rate))
        truth[i] = (pcm, rate)
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


def test_audio_windows_wav_on_real_bytes(spark, wav_landing):
    """No injected decoder anywhere: header parse finds the real data
    chunk, the JVM slices each (win, hop) frame window's exact byte
    range, and every emitted RMS matches a direct numpy recomputation
    from the source samples."""
    raw, truth = wav_landing
    win, hop = 64, 32
    got = mm.audio_windows_wav(raw, win_frames=win, hop_frames=hop).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(truth)
    for i, (pcm, rate) in truth.items():
        n = pcm.shape[0]
        expect_wins = (n - win) // hop + 1
        rows = sorted(by_doc[i], key=lambda r: r.win_idx)
        assert len(rows) == expect_wins
        for r in rows:
            assert (r.rate, r.channels) == (rate, pcm.shape[1])
            assert (r.start_frame, r.end_frame) == (
                r.win_idx * hop, r.win_idx * hop + win,
            )
            sl = pcm[r.win_idx * hop : r.win_idx * hop + win].astype(np.float64)
            assert r.rms == pytest.approx(
                float(np.sqrt((sl * sl).mean())), rel=1e-12
            )


def test_audio_windows_wav_short_clip_emits_nothing(spark, wav_landing):
    """A clip shorter than one window contributes zero rows (the
    byte-window form's contract, kept)."""
    raw, _ = wav_landing
    rows = mm.audio_windows_wav(raw, win_frames=10**6, hop_frames=1).collect()
    assert rows == []
