"""Pure-Python MJPEG/AVI video container (SURVEY §2.12 multimodal — r10).

Video from the two codecs this repo already ships: AVI is a RIFF
container (the same chunk grammar ops/wav.py walks) and Motion-JPEG
frames are plain baseline JPEGs (ops/jpeg.py) — so frame extraction
and decode need ZERO new primitives. This converts the last multimodal
kind ("video") from stub to a real, tested path for one mainstream
layout: :func:`avi_mjpeg_decode` walks ``LIST movi`` collecting
``##dc``/``##db`` frame chunks, and :func:`avi_mjpeg_encode` plants
spec-shaped files (avih + strl/strh/strf headers, frame chunks, idx1)
for tests.

Honest errors (:class:`AviFormatError`) for non-AVI RIFF, truncated
chunks, and non-MJPEG video streams — the same refuse-don't-garble
contract as the PNG/JPEG/WAV codecs. Frame decode is per-frame
baseline JPEG (Python-speed; the mapInPandas stage in ops/mm.py keeps
it executor-side and Arrow-batched, and frame SAMPLING happens before
decode so a 1-fps sample of a 30-fps stream decodes 1/30th of the
frames).
"""

from __future__ import annotations

import struct


class AviFormatError(ValueError):
    """Malformed or unsupported-variant AVI payload."""


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def avi_mjpeg_encode(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Assemble already-encoded JPEG frame payloads into a minimal but
    spec-shaped MJPEG AVI (avih + one 'vids'/'MJPG' stream with
    BITMAPINFOHEADER, movi frame chunks, idx1 index)."""
    if not frames:
        raise AviFormatError("no frames")
    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        us_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))
        for off, f in zip(offsets, frames)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_end = pos + 8 + clen
        if body_end > end:
            raise AviFormatError(f"truncated {cid!r} chunk")
        yield cid, pos + 8, body_end
        pos = body_end + (clen & 1)


def avi_mjpeg_decode(payload: bytes):
    """Parse an MJPEG AVI → ``(frames, width, height, fps)`` where
    ``frames`` is the list of raw JPEG byte payloads in stream order
    (decode each with :func:`ops.jpeg.jpeg_decode` — kept separate so a
    frame SAMPLER can skip decode work entirely for unsampled frames).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise AviFormatError("not an AVI: bad RIFF/AVI header")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(len(payload), 8 + riff_size)

    width = height = None
    fps = None
    handler_ok = False
    frames: list[bytes] = []

    def walk_list(pos: int, stop: int) -> None:
        nonlocal width, height, fps, handler_ok
        for cid, b0, b1 in _walk(payload, pos, stop):
            if cid == b"LIST":
                walk_list(b0 + 4, b1)
            elif cid == b"avih":
                us, = struct.unpack("<I", payload[b0 : b0 + 4])
                fps = round(1_000_000 / us) if us else None
                width, height = struct.unpack("<II", payload[b0 + 32 : b0 + 40])
            elif cid == b"strh":
                if payload[b0 : b0 + 4] == b"vids":
                    if payload[b0 + 4 : b0 + 8] not in (b"MJPG", b"mjpg"):
                        raise AviFormatError(
                            f"unsupported video codec {payload[b0 + 4:b0 + 8]!r} (MJPG only)"
                        )
                    handler_ok = True
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(payload[b0:b1])

    walk_list(12, end)
    if not handler_ok:
        raise AviFormatError("no MJPG video stream header")
    if not frames:
        raise AviFormatError("no frame chunks in movi")
    return frames, width, height, fps
