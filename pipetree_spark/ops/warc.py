"""WARC (Web ARChive, ISO 28500) build + parse — pure text/struct.

WARC is THE crawl interchange format (CommonCrawl ships it), so a
training-data pipeline's first stage is a WARC record walk: split
records on the Content-Length framing, read the WARC named fields,
and for ``response`` records parse the embedded HTTP message down to
the body that feeds HTML extraction (ops/text.py html_extract_stage).
This module is the byte-level half of that stage — a real parser with
a builder twin so planted archives certify it end-to-end, the same
pattern as ops/exif.py and the media codecs.

Production note: CommonCrawl WARCs are per-record gzip members;
``ops.mm.decompress_stage`` (gzip) composes in front of this parser
for that layout. Parsing here is strict framing (Content-Length +
CRLF CRLF record separators) with loud failure — a truncated record
raises, it does not silently yield garbage.

Reference note: /root/reference is empty (SURVEY §0); the reference is
an ML-pipeline orchestrator with no WARC surface — extension surface
for the ingest family (SURVEY §2.1/§2.12).
"""

from __future__ import annotations

CRLF = "\r\n"


class WarcFormatError(ValueError):
    """Raised on malformed WARC framing (loud-fail contract)."""


def warc_record(warc_type: str, headers: dict[str, str], payload: bytes) -> bytes:
    """One spec-conformant WARC/1.0 record: version line, named
    fields, Content-Length, blank line, payload, double CRLF."""
    head = f"WARC/1.0{CRLF}WARC-Type: {warc_type}{CRLF}"
    for k, v in headers.items():
        head += f"{k}: {v}{CRLF}"
    head += f"Content-Length: {len(payload)}{CRLF}{CRLF}"
    return head.encode("ascii") + payload + (CRLF + CRLF).encode("ascii")


def http_response(status: int, reason: str, body: bytes, content_type: str = "text/html") -> bytes:
    """A minimal HTTP/1.1 response message for a WARC response record."""
    head = (
        f"HTTP/1.1 {status} {reason}{CRLF}"
        f"Content-Type: {content_type}{CRLF}"
        f"Content-Length: {len(body)}{CRLF}{CRLF}"
    )
    return head.encode("ascii") + body


def warc_build(records: list[tuple[str, dict[str, str], bytes]]) -> bytes:
    """Concatenate records into one WARC file."""
    return b"".join(warc_record(t, h, p) for (t, h, p) in records)


# Fields (lowercased — header names are case-insensitive, RFC 9110 /
# ISO 28500) where a repeat with a DIFFERENT value makes the record
# ambiguous to frame or classify — loud-fail, never guess.
_SINGLETON_FIELDS = frozenset({"content-length", "warc-type"})


def _get_ci(fields: dict[str, str], name: str, default: str | None = None) -> str | None:
    """Case-insensitive header lookup (first match in insertion order)
    — `content-length:` frames a record just as well as
    `Content-Length:` and real crawls use every casing."""
    lname = name.lower()
    return next((v for k, v in fields.items() if k.lower() == lname), default)


def _parse_headers(block: str) -> tuple[dict[str, str], dict[str, list[str]]]:
    """Parse a CRLF header block. Returns (scalar, multi): ``scalar``
    is the convenient last-wins dict most consumers key into;
    ``multi`` preserves EVERY value of legally repeatable fields
    (WARC-Concurrent-To, Set-Cookie, ...) in order, which a last-wins
    dict silently collapses (r12 ADVICE). Framing-critical fields
    (Content-Length, WARC-Type) repeated with conflicting values raise
    — CASE-INSENSITIVELY, so `Content-Length: 2` + `content-length: 9`
    is caught too — framing must never be a coin flip on dict
    insertion order or header casing."""
    scalar: dict[str, str] = {}
    multi: dict[str, list[str]] = {}
    singleton_seen: dict[str, str] = {}
    for line in block.split(CRLF):
        if not line:
            continue
        if ":" not in line:
            raise WarcFormatError(f"bad header line {line!r}")
        k, v = line.split(":", 1)
        k, v = k.strip(), v.strip()
        lk = k.lower()
        if lk in _SINGLETON_FIELDS:
            if lk in singleton_seen and singleton_seen[lk] != v:
                raise WarcFormatError(
                    f"conflicting repeated header {k}: {singleton_seen[lk]!r} vs {v!r}"
                )
            singleton_seen[lk] = v
        scalar[k] = v
        multi.setdefault(k, []).append(v)
    return scalar, multi


def warc_parse(data: bytes) -> list[dict[str, object]]:
    """Walk a WARC file record-by-record. Returns one dict per record:
    warc_type, the WARC named fields, payload (bytes) — and for
    ``response`` records the parsed HTTP status plus body bytes."""
    out: list[dict[str, object]] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == CRLF.encode():
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find((CRLF + CRLF).encode(), pos)
        if hdr_end < 0:
            raise WarcFormatError("unterminated record header")
        # latin-1 is TOTAL (every byte maps to one char, length
        # preserved — framing offsets can't shift) so a stray
        # non-ASCII header byte — routine in real crawls — can never
        # raise an untyped UnicodeDecodeError; non-ASCII field VALUES
        # mojibake reversibly instead of killing the ingest (r13
        # review). Structural failures below stay typed WarcFormatError.
        head = data[pos:hdr_end].decode("latin-1")
        lines = head.split(CRLF)
        if not lines[0].startswith("WARC/"):
            raise WarcFormatError(f"bad version line {lines[0]!r}")
        fields, fields_all = _parse_headers(CRLF.join(lines[1:]))
        clen_s = _get_ci(fields, "Content-Length")
        if clen_s is None:
            raise WarcFormatError("record missing Content-Length")
        # digits-only: int() alone accepts '-33' (which would walk the
        # parse position BACKWARDS into an infinite loop), '+1' and
        # '1_0' (silent mis-framing)
        if not clen_s.isdigit():
            raise WarcFormatError(f"bad Content-Length {clen_s!r}")
        clen = int(clen_s)
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise WarcFormatError("truncated record payload")
        payload = data[body_start : body_start + clen]
        rec: dict[str, object] = {
            "warc_type": _get_ci(fields, "WARC-Type", ""),
            "fields": fields,
            "fields_all": fields_all,  # every value of repeated fields, in order
            "payload": payload,
        }
        if rec["warc_type"] == "response":
            rec.update(_parse_http(payload))
        out.append(rec)
        pos = body_start + clen
    return out


def _parse_http(payload: bytes) -> dict[str, object]:
    sep = payload.find((CRLF + CRLF).encode())
    if sep < 0:
        raise WarcFormatError("response payload is not an HTTP message")
    head = payload[:sep].decode("latin-1")  # total — see warc_parse
    lines = head.split(CRLF)
    parts = lines[0].split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise WarcFormatError(f"bad HTTP status line {lines[0]!r}")
    if not parts[1].isdigit():  # rejects '-200', '+200', '2_0', '2OO'
        raise WarcFormatError(f"bad HTTP status {parts[1]!r}")
    headers, headers_all = _parse_headers(CRLF.join(lines[1:]))
    return {
        "http_status": int(parts[1]),
        "http_headers": headers,
        "http_headers_all": headers_all,  # Set-Cookie et al. keep every value
        "http_body": payload[sep + 4 :],
    }
