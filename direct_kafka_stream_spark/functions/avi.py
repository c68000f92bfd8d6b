"""Pure-numpy RIFF/AVI codec for UNCOMPRESSED 24-bit DIB video — the
video third of the real-bytes multimodal story (image: ``raster.py``
round-8, audio: ``wav.py`` round-9).

This container ships no video library, but uncompressed AVI is the
WAV of video: a RIFF container with a ``hdrl`` LIST (``avih`` main
header + one ``strl`` stream LIST holding ``strh``/``strf``), a
``movi`` LIST of ``00db`` frame chunks, and an ``idx1`` index. Each
frame's pixel data is exactly a BMP pixel array (bottom-up rows, BGR
byte order, rows padded to 4 bytes), so the frame decode shares its
row logic with ``raster.decode_bmp``. Raw DIB frames are LOSSLESS, so
roundtrip equality is a hard property (tests/test_avi.py hypothesis
suites).

Decoder scope (loud, never silent): stream handler must be raw DIB
(``strf`` declares ``biCompression == 0`` and 24 bpp); every movi
frame chunk must carry the same declared size at a regular byte
stride — true of every raw-DIB writer, and the property that lets
``frame_sample_avi`` compute each sampled frame's byte range
JVM-side with pure arithmetic (no per-frame Python offset table).
Compressed AVIs (MJPG/Xvid/...) raise ``ValueError``; real
deployments swap ffmpeg in through the same
``decode_video(payload, decoder=...)`` injection point in
``multimodal.py``.

Reference anchor: EXT multimodal surface per SURVEY.md §2.D (the
reference's processing hook is KafkaDirectStream.scala:43-51; it has
no media path — this is mandated extension surface).
"""

from __future__ import annotations

import struct

import numpy as np

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _stride(w: int) -> int:
    return (w * 3 + 3) & ~3


def encode_avi(
    frames: np.ndarray, fps: int | tuple[int, int] = 10
) -> bytes:
    """Encode ``(n, h, w, 3)`` RGB uint8 frames as an uncompressed
    24-bit DIB AVI (one ``vids``/``DIB `` stream, ``00db`` frame
    chunks, ``idx1`` keyframe index — the layout every reader
    accepts). ``fps`` is an integer rate or an exact ``(rate, scale)``
    integer pair for rational rates (NTSC 29.97 = ``(30000, 1001)``);
    fractional floats are rejected, not truncated."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"AVI encoder needs (n, h, w, 3), got {arr.shape}")
    n, h, w = arr.shape[0], arr.shape[1], arr.shape[2]
    if n < 1 or h < 1 or w < 1:
        raise ValueError(f"AVI needs at least one non-empty frame, got {arr.shape}")
    # loud, never struct.error: rcFrame in strh is four SIGNED 16-bit
    # fields, so any dimension past 32767 is unrepresentable; likewise
    # the per-chunk size and dwSuggestedBufferSize are u32, so a frame
    # larger than 4 GiB - 1 cannot be written
    if w > 0x7FFF or h > 0x7FFF:
        raise ValueError(
            f"frame dimensions {w}x{h} overflow the AVI header's signed "
            "16-bit rcFrame fields (max 32767)"
        )
    # with w,h <= 32767 one frame always fits in u32, but the movi LIST
    # and RIFF size fields cover ALL frames — bound the total up front
    # (4 bytes 'movi' fourcc + 8-byte chunk header per frame)
    if 4 + n * (8 + _stride(w) * h) > 0xFFFFFFFF:
        raise ValueError(
            f"{n} frames of {w}x{h} exceed the RIFF container's "
            "32-bit size fields (4 GiB)"
        )
    # loud, never silent: a fractional fps would be truncated by the
    # integer dwRate field and round-trip as a different rate (the
    # decoder deliberately returns rate/scale as a float) — reject it;
    # rational rates encode exactly as an integer (rate, scale) pair
    rate, scale = fps if isinstance(fps, tuple) else (fps, 1)
    if rate != int(rate) or scale != int(scale):
        raise ValueError(
            f"non-integral frame rate {fps!r}; pass an int fps or an "
            "exact (rate, scale) integer pair"
        )
    rate, scale = int(rate), int(scale)
    if not (1 <= rate <= 0xFFFFFFFF and 1 <= scale <= 0xFFFFFFFF):
        raise ValueError(f"unrepresentable frame rate: {fps!r}")
    stride = _stride(w)
    frame_size = stride * h
    # the derived u32 header fields must also fit — raise the promised
    # ValueError, not struct.error (e.g. scale=4295 overflows
    # dwMicroSecPerFrame; 1200x1200 at fps=1000 overflows
    # dwMaxBytesPerSec)
    usec_per_frame = 1_000_000 * scale // rate
    bytes_per_sec = frame_size * rate // scale
    if usec_per_frame > 0xFFFFFFFF or bytes_per_sec > 0xFFFFFFFF:
        raise ValueError(
            f"frame rate {fps!r} with {w}x{h} frames overflows the AVI "
            "header's 32-bit timing fields"
        )
    # frame pixel array == BMP pixel array: bottom-up rows, BGR, padded
    padded = np.zeros((n, h, stride), dtype=np.uint8)
    padded[:, :, : w * 3] = arr[:, ::-1, :, ::-1].reshape(n, h, w * 3)

    avih = b"avih" + struct.pack(
        "<I14I",
        56,
        usec_per_frame,  # dwMicroSecPerFrame
        bytes_per_sec,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_size,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = b"strh" + struct.pack(
        "<I4s4sIHHIIIIIIII4h",
        56,
        b"vids",
        b"DIB ",
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        scale,  # dwScale
        rate,  # dwRate (fps = rate/scale)
        0,  # dwStart
        n,  # dwLength (frames)
        frame_size,  # dwSuggestedBufferSize
        0,  # dwQuality
        0,  # dwSampleSize (0 = one sample per chunk)
        0, 0, w, h,  # rcFrame
    )
    strf = b"strf" + struct.pack(
        "<IIiiHHIIiiII",
        40,
        40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0,
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl

    movi_body = bytearray(b"movi")
    idx1_body = bytearray()
    for i in range(n):
        # idx1 offsets are relative to the 'movi' fourcc (first chunk=4)
        idx1_body += struct.pack(
            "<4sIII", b"00db", _AVIIF_KEYFRAME, len(movi_body), frame_size
        )
        movi_body += b"00db" + struct.pack("<I", frame_size) + padded[i].tobytes()
        if frame_size % 2:  # stride is 4-aligned so never odd, but stay RIFF-correct
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + bytes(movi_body)
    idx1 = b"idx1" + struct.pack("<I", len(idx1_body)) + bytes(idx1_body)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, pos: int, end: int):
    """Shared RIFF walker (``riff.walk_chunks``): ``(chunk_id,
    list_type, data_off, data_size)`` per chunk, LIST form types
    surfaced, pad byte honored, loud on truncation."""
    from direct_kafka_stream_spark.functions import riff

    return riff.walk_chunks(payload, pos, end)


def parse_header(payload: bytes) -> dict:
    """Structure-only parse: locate ``avih``/``strh``/``strf`` and walk
    the ``movi`` frame chunks WITHOUT touching pixel bytes, returning
    ``{"width", "height", "n_frames", "fps", "frame_size", "data_off",
    "stride_bytes"}`` where frame *i*'s pixel data lives at
    ``data_off + i * stride_bytes`` — the regular layout every raw-DIB
    writer produces, verified chunk by chunk (loud on compressed
    streams, non-24-bit frames, or irregular movi layouts)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    from direct_kafka_stream_spark.functions import riff

    end = riff.body_end(payload)
    avih = strh = strf = None
    movi = None
    for cid, ltype, off, size in _walk(payload, 12, end):
        if cid == b"LIST" and ltype == b"hdrl":
            for cid2, ltype2, off2, size2 in _walk(payload, off, off + size):
                if cid2 == b"avih" and avih is None:
                    if size2 < 56:
                        raise ValueError(f"avih chunk too small: {size2}")
                    avih = struct.unpack_from("<14I", payload, off2)
                elif cid2 == b"LIST" and ltype2 == b"strl" and strh is None:
                    for cid3, _lt3, off3, size3 in _walk(payload, off2, off2 + size2):
                        if cid3 == b"strh" and size3 >= 56:
                            strh = struct.unpack_from("<4s4sIHHIIIIIIII", payload, off3)
                        elif cid3 == b"strf" and size3 >= 40:
                            strf = struct.unpack_from("<IiiHHI", payload, off3)
        elif cid == b"LIST" and ltype == b"movi" and movi is None:
            movi = (off, size)
    if avih is None or strh is None or strf is None or movi is None:
        raise ValueError("AVI missing avih, strh, strf, or movi")
    if strh[0] != b"vids":
        raise ValueError(f"first AVI stream is not video (fccType {strh[0]!r})")
    w, h, _planes, bits, compression = strf[1:6]
    if compression != 0:
        raise ValueError(
            f"only uncompressed DIB AVI supported (biCompression {compression})"
        )
    if bits != 24:
        raise ValueError(f"only 24-bit DIB AVI supported (got {bits}-bit)")
    if h < 0:
        raise ValueError("top-down DIB AVI not supported")
    if w < 1 or h < 1:
        raise ValueError(f"AVI declares empty frame dims {w}x{h}")
    scale, rate = strh[6], strh[7]
    if scale < 1 or rate < 1:
        raise ValueError(f"AVI declares non-positive rate/scale {rate}/{scale}")
    frame_size = _stride(w) * h
    offs = []
    for cid, _ltype, off, size in _walk(payload, movi[0], movi[0] + movi[1]):
        if cid[2:4] in (b"db", b"dc"):
            if size != frame_size:
                raise ValueError(
                    f"frame chunk {cid!r} size {size} != {frame_size} for {w}x{h}x24"
                )
            offs.append(off)
        elif cid == b"LIST":
            raise ValueError("rec-grouped movi lists not supported")
    if not offs:
        raise ValueError("AVI movi list holds no frame chunks")
    strides = {b - a for a, b in zip(offs, offs[1:])}
    if len(strides) > 1:
        raise ValueError(f"irregular movi frame stride: {sorted(strides)}")
    if avih[4] != len(offs):
        raise ValueError(
            f"avih declares {avih[4]} frames but movi holds {len(offs)}"
        )
    return {
        "width": w,
        "height": h,
        "n_frames": len(offs),
        "fps": rate / scale,
        "frame_size": frame_size,
        "data_off": offs[0],
        "stride_bytes": strides.pop() if strides else frame_size + 8,
    }


def decode_frame(chunk: bytes, w: int, h: int) -> np.ndarray:
    """Decode one raw-DIB frame's pixel bytes (bottom-up, BGR, 4-byte
    padded rows — shared layout with ``raster.decode_bmp``) to an
    ``(h, w, 3)`` RGB uint8 array."""
    stride = _stride(w)
    rows = np.frombuffer(chunk, dtype=np.uint8, count=h * stride)
    rows = rows.reshape((h, stride))[:, : w * 3].reshape((h, w, 3))
    return rows[::-1, :, ::-1]  # bottom-up → top-down, BGR → RGB


def decode_avi(payload: bytes) -> tuple[float, np.ndarray]:
    """Decode an uncompressed 24-bit DIB AVI to ``(fps, frames)`` with
    frames shaped ``(n, h, w, 3)`` RGB uint8 — exact for every encoder
    output (and any other regular raw-DIB AVI)."""
    h = parse_header(payload)
    frames = np.stack(
        [
            decode_frame(
                payload[
                    h["data_off"]
                    + i * h["stride_bytes"] : h["data_off"]
                    + i * h["stride_bytes"]
                    + h["frame_size"]
                ],
                h["width"],
                h["height"],
            )
            for i in range(h["n_frames"])
        ]
    )
    return h["fps"], frames


def sniff_avi(payload: bytes) -> bool:
    """Container detection from the first 12 bytes: RIFF magic + 'AVI '
    form type (the constrained form fourcc keeps WAV/WebP — also RIFF —
    from false-positiving)."""
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
