"""Pure-numpy RIFF/WAVE PCM-16 codec — the audio half of the
real-bytes multimodal story (mirror of ``raster.py``'s round-8 image
half).

This container ships no audio library, but canonical WAV is trivial
enough to en/decode with ``struct`` + ``np.frombuffer`` alone: a RIFF
container holding a ``fmt `` chunk (PCM format tag, channel count,
sample rate, 16 bits per sample) and a ``data`` chunk of interleaved
little-endian int16 frames. 16-bit PCM is LOSSLESS, so roundtrip
equality is a hard property (tests/test_wav.py hypothesis suites).

Decoder scope (loud, never silent): format tag must be 1 (PCM) or
0xFFFE (extensible wrapping PCM), bits must be 16; the chunk walk
honors the RIFF pad byte (chunks with ODD declared size are followed
by one alignment byte not counted in the size — the classic trap) and
tolerates any chunks before/after ``data`` (LIST/INFO/fact/cue...).
Compressed or float WAVs raise ``ValueError``; real deployments swap
a full codec in through the same ``decode_audio(payload, decoder=...)``
injection point in ``multimodal.py``.

Reference anchor: EXT multimodal surface per SURVEY.md §2.D (the
reference's processing hook is KafkaDirectStream.scala:43-51; it has
no media path — this is mandated extension surface).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 PCM as canonical WAV: ``(n,)`` → mono, ``(n, ch)``
    → interleaved multichannel. 44-byte header (RIFF + fmt + data),
    the layout every reader accepts."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"unsupported sample shape for WAV: {samples.shape}")
    n_frames, ch = arr.shape
    if ch < 1:
        raise ValueError("WAV needs at least one channel")
    if not 1 <= int(rate) <= 0xFFFFFFFF:
        raise ValueError(f"unrepresentable sample rate: {rate}")
    data = arr.tobytes()  # C-order == interleaved frames
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, int(rate), int(rate) * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    # 16-bit PCM data is always even-sized, but keep the encoder
    # RIFF-correct for any body: a trailing odd chunk gets its pad byte.
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(payload: bytes):
    """Yield ``(chunk_id, data_offset, data_size)`` for every chunk in
    the RIFF body via the shared walker (``riff.walk_chunks`` — pad
    byte after odd-sized chunks, loud truncation). WAV treats LIST
    chunks (INFO metadata etc.) as opaque skippable blocks, so the
    walker's list_type is dropped here."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    from direct_kafka_stream_spark.functions import riff

    for cid, _ltype, off, size in riff.walk_chunks(
        payload, 12, riff.body_end(payload)
    ):
        yield cid, off, size


def parse_header(payload: bytes) -> dict:
    """Header-only parse: locate the ``fmt `` and ``data`` chunks and
    return ``{"rate", "channels", "bits", "data_off", "data_size",
    "n_frames"}`` without touching the sample bytes — the cheap
    metadata step a Spark pipeline runs before JVM-side window/slice
    planning. Loud on anything that is not integer PCM-16."""
    fmt = None
    data = None
    for cid, off, size in _walk_chunks(payload):
        if cid == b"fmt " and fmt is None:
            if size < 16:
                raise ValueError(f"fmt chunk too small: {size}")
            fmt = struct.unpack_from("<HHIIHH", payload, off)
        elif cid == b"data" and data is None:
            data = (off, size)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, ch, rate, _byte_rate, _block_align, bits = fmt
    # 0xFFFE = WAVE_FORMAT_EXTENSIBLE; the wrapped subformat is PCM in
    # every 16-bit capture pipeline — anything else fails at bits != 16
    if tag not in (1, 0xFFFE):
        raise ValueError(f"only PCM WAV supported (format tag {tag})")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported (got {bits}-bit)")
    if ch < 1:
        raise ValueError("WAV declares zero channels")
    off, size = data
    if size % (2 * ch):
        # a data chunk that is not a whole number of frames is
        # truncation/corruption — dropping the tail silently would
        # violate the loud-decoder contract
        raise ValueError(
            f"data chunk size {size} is not a multiple of the "
            f"{2 * ch}-byte frame size"
        )
    n_frames = size // (2 * ch)
    return {
        "rate": rate,
        "channels": ch,
        "bits": bits,
        "data_off": off,
        "data_size": size,
        "n_frames": n_frames,
    }


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode PCM-16 WAV to ``(rate, samples)`` with samples shaped
    ``(n_frames, channels)`` int16 — exact for every encoder output
    (and any other integer PCM-16 WAV regardless of chunk order)."""
    h = parse_header(payload)
    ch = h["channels"]
    n = h["n_frames"] * ch
    flat = np.frombuffer(payload, dtype="<i2", count=n, offset=h["data_off"])
    return h["rate"], flat.reshape((h["n_frames"], ch))


def sniff_wav(payload: bytes) -> bool:
    """Container detection from the first 12 bytes: RIFF magic + WAVE
    form type. (Four CONSTRAINED bytes at offset 8 — 'RIFF' alone
    would false-positive on AVI/WebP, which are also RIFF.)"""
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
