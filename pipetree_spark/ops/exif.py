"""EXIF (APP1/TIFF) metadata build + parse — pure ``struct``, no codec.

Crawl pipelines extract image metadata (camera make, orientation,
timestamps) long before they decode pixels: orientation drives rotation
normalization, timestamps drive freshness filters, and make/model
strings drive provenance audits. EXIF is a TIFF container embedded in a
JPEG APP1 segment, so the parser here is a real byte-level TIFF IFD
walk (both byte orders, inline AND offset-stored values, one sub-IFD
level for the Exif pointer) — the same class of pure-Python decoding as
ops/png.py and ops/wav.py, verifiable end-to-end because the builder
below writes the exact same structures.

Reference note: /root/reference is empty (SURVEY §0); the reference is
an ML-pipeline orchestrator with no EXIF surface — this is extension
surface for the multimodal ingest family (SURVEY §2.12).

Structures (public spec knowledge — EXIF 2.x / TIFF 6.0):

- APP1 marker ``FF E1 <len:u16> 'Exif\\0\\0'`` followed by a TIFF file:
  ``II``/``MM`` byte-order mark, magic 42, u32 offset of IFD0.
- An IFD is ``count:u16`` then ``count`` 12-byte entries
  ``(tag:u16, type:u16, n:u32, value_or_offset:u32)`` and a u32 next-IFD
  offset. Values ≤ 4 bytes store inline (left-justified); longer values
  (ASCII strings, RATIONALs) store at an offset from the TIFF origin.
"""

from __future__ import annotations

import struct

#: TIFF tags used by the builder/parser pair.
TAG_MAKE = 0x010F
TAG_ORIENTATION = 0x0112
TAG_XRESOLUTION = 0x011A
TAG_EXIF_IFD = 0x8769
TAG_DATETIME_ORIGINAL = 0x9003

TYPE_ASCII = 2
TYPE_SHORT = 3
TYPE_LONG = 4
TYPE_RATIONAL = 5


class ExifFormatError(ValueError):
    """Raised on malformed APP1/TIFF structures (loud-fail contract,
    same as WavFormatError / JpegFormatError)."""


def exif_app1(
    make: str,
    orientation: int,
    xres: tuple[int, int],
    dt_original: str,
    big_endian: bool = False,
) -> bytes:
    """Build a spec-conformant APP1 segment: IFD0 with Make (offset
    ASCII), Orientation (inline SHORT), XResolution (offset RATIONAL),
    and an Exif sub-IFD holding DateTimeOriginal (offset ASCII)."""
    e = ">" if big_endian else "<"
    try:
        make_b = make.encode("ascii") + b"\x00"
        dt_b = dt_original.encode("ascii") + b"\x00"
    except UnicodeEncodeError as exc:
        raise ExifFormatError(f"EXIF ASCII fields must be ASCII: {exc}") from None
    if len(dt_b) != 20:
        raise ExifFormatError(f"DateTimeOriginal must be 19 chars, got {dt_original!r}")
    # Range checks so struct.pack can't leak a bare struct.error for
    # ANY field: APP1 length is a u16, Orientation a SHORT, the
    # RATIONAL components u32s
    if len(make_b) > 65000:
        raise ExifFormatError(f"Make too long for an APP1 segment ({len(make_b)} B)")
    if not 0 <= orientation <= 0xFFFF:
        raise ExifFormatError(f"Orientation out of SHORT range: {orientation}")
    if not all(0 <= v <= 0xFFFFFFFF for v in xres):
        raise ExifFormatError(f"XResolution out of u32 range: {xres}")

    # Layout (offsets from TIFF origin):
    #   8:          IFD0 (2 + 4*12 + 4 bytes)
    #   ifd0_end:   Exif sub-IFD (2 + 1*12 + 4)
    #   data area:  make string, xres rational, datetime string
    ifd0_off = 8
    ifd0_len = 2 + 4 * 12 + 4
    sub_off = ifd0_off + ifd0_len
    sub_len = 2 + 1 * 12 + 4
    data_off = sub_off + sub_len
    make_off = data_off
    xres_off = make_off + len(make_b)
    dt_off = xres_off + 8

    def entry(tag: int, typ: int, n: int, val: bytes) -> bytes:
        return struct.pack(f"{e}HHI", tag, typ, n) + val.ljust(4, b"\x00")

    # TIFF 6.0: values of ≤ 4 bytes store INLINE in the entry's value
    # field (left-justified); only longer values store at an offset
    make_val = make_b if len(make_b) <= 4 else struct.pack(f"{e}I", make_off)

    ifd0 = struct.pack(f"{e}H", 4)
    ifd0 += entry(TAG_MAKE, TYPE_ASCII, len(make_b), make_val)
    ifd0 += entry(TAG_ORIENTATION, TYPE_SHORT, 1, struct.pack(f"{e}H", orientation))
    ifd0 += entry(TAG_XRESOLUTION, TYPE_RATIONAL, 1, struct.pack(f"{e}I", xres_off))
    ifd0 += entry(TAG_EXIF_IFD, TYPE_LONG, 1, struct.pack(f"{e}I", sub_off))
    ifd0 += struct.pack(f"{e}I", 0)

    sub = struct.pack(f"{e}H", 1)
    sub += entry(TAG_DATETIME_ORIGINAL, TYPE_ASCII, len(dt_b), struct.pack(f"{e}I", dt_off))
    sub += struct.pack(f"{e}I", 0)

    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(f"{e}H", 42)
        + struct.pack(f"{e}I", ifd0_off)
        + ifd0
        + sub
        + make_b
        + struct.pack(f"{e}II", *xres)
        + dt_b
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (the spec position)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ExifFormatError("not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def _ifd_entries(tiff: bytes, off: int, e: str) -> dict[int, tuple[int, int, int]]:
    """{tag: (type, count, entry_value_field_offset)} for one IFD."""
    if off + 2 > len(tiff):
        raise ExifFormatError("IFD offset past end")
    (n,) = struct.unpack_from(f"{e}H", tiff, off)
    out: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            raise ExifFormatError("IFD entry past end")
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", tiff, base)
        out[tag] = (typ, cnt, base + 8)
    return out


def _ascii_at(tiff: bytes, typ: int, cnt: int, voff: int, e: str) -> str:
    if typ != TYPE_ASCII:
        raise ExifFormatError(f"expected ASCII, got type {typ}")
    if cnt <= 4:
        raw = tiff[voff : voff + cnt]
    else:
        (off,) = struct.unpack_from(f"{e}I", tiff, voff)
        raw = tiff[off : off + cnt]
    return raw.rstrip(b"\x00").decode("ascii")


def exif_parse(jpeg: bytes) -> dict[str, object] | None:
    """Extract (endian, make, orientation, xres_num, xres_den,
    dt_original) from a JPEG's APP1 EXIF segment; None when the image
    carries no EXIF. Malformed EXIF raises (loud-fail)."""
    # walk JPEG segments from SOI to SOS
    if jpeg[:2] != b"\xff\xd8":
        raise ExifFormatError("not a JPEG (no SOI)")
    pos = 2
    tiff: bytes | None = None
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ExifFormatError(f"bad marker alignment at {pos}")
        marker = jpeg[pos + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: image data begins
            break
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        body = jpeg[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        pos += 2 + seglen
    if tiff is None:
        return None

    bom = tiff[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ExifFormatError(f"bad TIFF byte order {bom!r}")
    (magic,) = struct.unpack_from(f"{e}H", tiff, 2)
    if magic != 42:
        raise ExifFormatError(f"bad TIFF magic {magic}")
    (ifd0_off,) = struct.unpack_from(f"{e}I", tiff, 4)
    ifd0 = _ifd_entries(tiff, ifd0_off, e)

    # every tag below is OPTIONAL per TIFF/EXIF — a real camera JPEG
    # may carry any subset, so absent tags yield None fields rather
    # than a KeyError escaping the documented loud-fail contract
    # (ExifFormatError stays reserved for STRUCTURALLY broken data)
    out: dict[str, object] = {
        "endian": bom.decode("ascii"),
        "make": None,
        "orientation": None,
        "xres_num": None,
        "xres_den": None,
        "dt_original": None,
    }
    if TAG_MAKE in ifd0:
        typ, cnt, voff = ifd0[TAG_MAKE]
        out["make"] = _ascii_at(tiff, typ, cnt, voff, e)
    if TAG_ORIENTATION in ifd0:
        typ, cnt, voff = ifd0[TAG_ORIENTATION]
        if typ != TYPE_SHORT:
            raise ExifFormatError("Orientation must be SHORT")
        (out["orientation"],) = struct.unpack_from(f"{e}H", tiff, voff)
    if TAG_XRESOLUTION in ifd0:
        typ, cnt, voff = ifd0[TAG_XRESOLUTION]
        if typ != TYPE_RATIONAL:
            raise ExifFormatError("XResolution must be RATIONAL")
        (roff,) = struct.unpack_from(f"{e}I", tiff, voff)
        num, den = struct.unpack_from(f"{e}II", tiff, roff)
        out["xres_num"], out["xres_den"] = num, den
    if TAG_EXIF_IFD in ifd0:
        typ, cnt, voff = ifd0[TAG_EXIF_IFD]
        (sub_off,) = struct.unpack_from(f"{e}I", tiff, voff)
        sub = _ifd_entries(tiff, sub_off, e)
        if TAG_DATETIME_ORIGINAL in sub:
            typ, cnt, voff = sub[TAG_DATETIME_ORIGINAL]
            out["dt_original"] = _ascii_at(tiff, typ, cnt, voff, e)
    return out
