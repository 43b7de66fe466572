"""Pure-Python GIF codec (SURVEY §2.12 multimodal — r10).

GIF is LZW over palette indices in a block container — all
implementable with the stdlib (GIF's LZW variant with variable code
widths and LSB-first bit packing is ~60 lines each way), so web-scrape
GIFs join PNG/JPEG/WAV/AVI as REAL decode paths. Decoder composes
animated frames onto the logical canvas (interlacing, local color
tables, GCE transparency, all four disposal methods including
restore-previous); encoder plants
GIF89a files (≤256 distinct colors per frame — true-color sources
must quantize first, and the encoder refuses rather than dither
silently). Honest :class:`GifFormatError` elsewhere.

Scale note: Python-speed per payload inside mapInPandas Arrow batches,
same contract as ops/png.py — a correct fallback, not a throughput
claim.
"""

from __future__ import annotations

import struct


class GifFormatError(ValueError):
    """Malformed or unsupported-variant GIF payload."""


# --------------------------------------------------------------- LZW (GIF)

def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    # LSB-first bit reader over the concatenated sub-block data
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    dict_: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    prev: list[int] | None = None
    out: list[int] = []
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # tolerate missing EOI (common in the wild)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_ = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(dict_):
                raise GifFormatError("LZW: first code not a literal")
            entry = dict_[code]
        elif code < len(dict_):
            entry = dict_[code]
            dict_.append(prev + [entry[0]])
        elif code == len(dict_):
            entry = prev + [prev[0]]
            dict_.append(entry)
        else:
            raise GifFormatError("LZW: code out of range")
        out.extend(entry)
        prev = entry
        if len(dict_) == (1 << width) and width < 12:
            width += 1


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear, width)
    cur: tuple[int, ...] = ()
    for idx in indices:
        cand = cur + (idx,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        if nxt > (1 << width) and width < 12:
            width += 1
        cur = (idx,)
        if nxt == 4096:  # table full → reset (keeps the decoder in sync)
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code_size + 1
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


# ----------------------------------------------------------------- decode

def gif_decode(payload: bytes):
    """Decode a GIF → ``(frames, width, height)`` where ``frames`` is a
    list of (h, w, 3) uint8 arrays, each the COMPOSED logical canvas
    after that frame (disposal 0/1 leave-in-place, 2 restore-background,
    3 restore-previous; GCE transparent pixels keep the underlying
    canvas). Frames whose rect exceeds the logical screen raise
    :class:`GifFormatError` rather than a bare numpy broadcast error."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF: bad signature")
    if len(payload) < 14:
        raise GifFormatError("truncated header")
    w, h = struct.unpack("<HH", payload[6:10])
    packed, bg, _ = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise GifFormatError("truncated global color table")
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames = []
    transparent = None
    disposal = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(payload):
                raise GifFormatError("truncated sub-blocks")
            ln = payload[p]
            p += 1
            if ln == 0:
                return b"".join(chunks), p
            chunks.append(payload[p : p + ln])
            p += ln

    while True:
        if pos >= len(payload):
            raise GifFormatError("no trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags = body[0]
                disposal = (flags >> 2) & 0x7
                transparent = body[3] if flags & 1 else None
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown block 0x{block:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", payload[pos : pos + 8])
        fpacked = payload[pos + 8]
        pos += 9
        if left + fw > w or top + fh > h:
            # malformed rect past the logical screen: without this check
            # the canvas slice is smaller than the frame and the masked
            # assignment below raises a bare numpy broadcast ValueError,
            # breaking the typed-error contract the decode stages rely on
            raise GifFormatError(
                f"frame rect {fw}x{fh}@({left},{top}) exceeds logical screen {w}x{h}"
            )
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            if pos + 3 * n > len(payload):
                raise GifFormatError("truncated local color table")
            table = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise GifFormatError("no color table for frame")
        mcs = payload[pos]
        pos += 1
        data, pos = read_subblocks(pos)
        idx = _lzw_decode(mcs, data)
        if len(idx) < fw * fh:
            raise GifFormatError(f"LZW yielded {len(idx)} of {fw * fh} pixels")
        grid = np.asarray(idx[: fw * fh], dtype=np.int32).reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: rows arrive in pass order
            ordered = np.empty_like(grid)
            ordered[_deinterlace_rows(fh)] = grid
            grid = ordered
        if grid.max() >= len(table):
            raise GifFormatError("palette index out of range")
        # disposal 3 (restore-previous) needs the pre-draw canvas back
        # after this frame is emitted — snapshot the rect before drawing
        saved = canvas[top : top + fh, left : left + fw].copy() if disposal == 3 else None
        rect = canvas[top : top + fh, left : left + fw]
        px = table[grid]
        if transparent is not None:
            mask = grid != transparent
            rect[mask] = px[mask]
        else:
            rect[:, :] = px
        frames.append(canvas.copy())
        if disposal == 2:  # restore background
            canvas[top : top + fh, left : left + fw] = (
                gct[bg] if gct is not None and bg < len(gct) else 0
            )
        elif disposal == 3:  # restore previous: undo this frame's draw
            canvas[top : top + fh, left : left + fw] = saved
        transparent = None
        disposal = 0
    if not frames:
        raise GifFormatError("no image blocks")
    return frames, w, h


# ----------------------------------------------------------------- encode

def gif_encode(frames, interlace: bool = False) -> bytes:
    """Encode one or more (h, w, 3) uint8 frames → GIF89a with a global
    palette built from the frames' distinct colors (must be ≤ 256 —
    refuses otherwise: quantization is the caller's modeling decision,
    not something to do silently)."""
    import numpy as np

    arrs = [np.asarray(f, dtype=np.uint8) for f in (frames if isinstance(frames, list) else [frames])]
    h, w = arrs[0].shape[:2]
    if any(a.shape != (h, w, 3) for a in arrs):
        raise GifFormatError("all frames must be (h, w, 3) with equal dims")
    colors = np.unique(np.concatenate([a.reshape(-1, 3) for a in arrs], axis=0), axis=0)
    if len(colors) > 256:
        raise GifFormatError(f"{len(colors)} distinct colors > 256 — quantize first")
    # palette sized to a power of two ≥ 2
    bits = max(1, int(len(colors) - 1).bit_length())
    n = 1 << bits
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors.tolist())}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg=0
    out += pal.tobytes()
    for a in arrs:
        idx = [lut[tuple(px)] for px in a.reshape(-1, 3).tolist()]
        if interlace:
            grid = np.asarray(idx, dtype=np.int32).reshape(h, w)
            idx = grid[_deinterlace_rows(h)].ravel().tolist()
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00])
        mcs = max(2, bits)
        out += bytes([mcs])
        data = _lzw_encode(mcs, idx)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
