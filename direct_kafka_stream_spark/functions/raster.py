"""Pure-numpy raster codecs (PPM P5/P6 and uncompressed 24-bit BMP).

This container ships no image library (no Pillow/libvips), but these
two containers are trivial enough to en/decode with numpy alone — so
the multimodal pipeline (binaryFile → mapInPandas decode → features →
resize) can run END-TO-END on real encoded bytes instead of an
injected fake. Real deployments swap in a full codec through the same
``decode_image(payload, decoder=...)`` injection point; formats these
sniffers don't recognize still raise the explicit stub error.

Both formats are exact (lossless, 8-bit), so roundtrip equality is a
hard property (tests/test_multimodal.py hypothesis suites).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM / PGM (netpbm binary): P5 = grayscale, P6 = RGB
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode a uint8 array as binary netpbm: (h, w) → P5, (h, w, 3) → P6."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        magic = b"P5"
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported shape for netpbm: {img.shape}")
    h, w = img.shape[0], img.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary netpbm (P5/P6, maxval ≤ 255) to a uint8 array,
    honoring '#' comments and arbitrary whitespace in the header."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster data
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    data = np.frombuffer(payload, dtype=np.uint8, count=h * w * ch, offset=pos)
    return data.reshape((h, w, 3)) if ch == 3 else data.reshape((h, w))


# ---------------------------------------------------------------------------
# BMP: uncompressed (BI_RGB) 24-bit, BITMAPINFOHEADER, bottom-up rows
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as an uncompressed 24-bit BMP
    (rows bottom-up, BGR byte order, 4-byte padded — the classic v3
    layout every reader accepts)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"BMP encoder needs (h, w, 3), got {img.shape}")
    h, w = img.shape[0], img.shape[1]
    row = w * 3
    pad = (-row) % 4
    bgr = img[::-1, :, ::-1]  # bottom-up, RGB→BGR
    body = bytearray()
    padding = b"\x00" * pad
    for r in range(h):
        body += bgr[r].tobytes() + padding
    data_size = len(body)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to an (h, w, 3) RGB uint8
    array. Handles bottom-up and top-down (negative height) rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs not supported")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    topdown = h_raw < 0
    h = -h_raw if topdown else h_raw
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off)
    rows = rows.reshape((h, stride))[:, : w * 3].reshape((h, w, 3))
    rgb = rows[:, :, ::-1]  # BGR→RGB
    return rgb if topdown else rgb[::-1]


# ---------------------------------------------------------------------------
# Sniffing dispatch + luminance plane
# ---------------------------------------------------------------------------


def luminance(img: np.ndarray) -> np.ndarray:
    """Channel-mean luminance plane as float64 ((h, w) passes through).
    uint8 sums stay exact integers in float64, so downstream pooled
    means are exact."""
    img = np.asarray(img, dtype=np.float64)
    return img.mean(axis=2) if img.ndim == 3 else img


def sniff(payload: bytes) -> str | None:
    """Container detection; None = not a known raster.

    Two-byte magics alone false-positive on arbitrary text ("P6 ...",
    "BMW ...") — so require the structural byte that must follow: a
    whitespace separator after the netpbm magic, and a plausible DIB
    header size + BI_RGB 24 bpp at the fixed BMP offsets. Needs the
    first ~34 bytes of the payload."""
    if payload[:2] in (b"P5", b"P6") and payload[2:3].isspace():
        return "ppm"
    if payload[:2] == b"BM" and len(payload) >= 34:
        hdr = struct.unpack_from("<I", payload, 14)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if hdr in (40, 52, 56, 108, 124) and bpp == 24 and comp == 0:
            return "bmp"
    return None


def decode_raster(payload: bytes) -> np.ndarray:
    """Decode any supported raster container to a 2-D float64 luminance
    plane (the shape image_features/resize_images consume)."""
    kind = sniff(payload)
    if kind == "ppm":
        return luminance(decode_ppm(payload))
    if kind == "bmp":
        return luminance(decode_bmp(payload))
    raise ValueError("unknown raster container")
