"""Shared RIFF chunk walker for the pure-numpy media codecs.

WAV (``wav.py``) and AVI (``avi.py``) are both RIFF containers; the
chunk walk — 8-byte (fourcc, size) headers, the pad byte after
odd-sized chunks (the classic off-by-one), loud truncation checks,
LIST form-type introspection — is identical, so it lives once here.
"""

from __future__ import annotations

import struct


def walk_chunks(payload: bytes, pos: int, end: int):
    """Yield ``(chunk_id, list_type, data_off, data_size)`` for each
    chunk in ``payload[pos:end]``; ``list_type`` is the inner fourcc
    for LIST chunks (with data_off/size covering the LIST BODY past
    it), else None. Honors the RIFF pad byte after odd-sized chunks;
    raises on a declared size past the payload end."""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            raise ValueError(f"truncated chunk {cid!r}: size {size} past payload end")
        if cid == b"LIST" and size >= 4:
            yield cid, payload[pos + 8 : pos + 12], pos + 12, size - 4
        else:
            yield cid, None, pos + 8, size
        pos += 8 + size + (size % 2)  # RIFF pad byte on odd sizes


def body_end(payload: bytes) -> int:
    """The end offset of the RIFF body: the declared RIFF size clamped
    to the actual payload length (tolerates a conservative declared
    size; chunk-level truncation still raises in walk_chunks)."""
    return min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
