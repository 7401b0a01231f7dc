"""WARC (Web ARChive, ISO 28500 / WARC/1.0) crawl-container ingest.

CommonCrawl-class corpora ship as ``.warc.gz`` files: a concatenation
of PER-RECORD gzip members, each member one WARC/1.0 record —
``WARC/1.0\\r\\n`` version line, ``Name: value\\r\\n`` headers, blank
line, exactly ``Content-Length`` payload bytes, then a ``\\r\\n\\r\\n``
record trailer. Per-member compression is what makes the format usable
at crawl scale: a reader can start at any member boundary without
decompressing the prefix, and offset indexes (CDX) address members
directly.

This module is the byte-exact structural walk in the repo's codec
style (PNG chunk-walk precedent, ``operators/multimodal.py``): stdlib
``zlib`` only, malformed structure raises ``ValueError`` — a silent
partial walk would drop crawl records without a trace.

Scale shape (100 TB): WARC members are not splittable without a CDX
index, so parallelism is per FILE — the standard CommonCrawl layout is
~1 GB files in the thousands, which saturates any executor fleet. The
Spark reader below uses ``binaryFile`` + ``mapInPandas`` (one Arrow
batch per file, records exploded executor-side); never collect payload
bytes to the driver.
"""

from __future__ import annotations

import zlib

_CRLF = b"\r\n"
_VERSION = b"WARC/1.0"
# Mandatory per ISO 28500 §5: every record carries these four.
_MANDATORY = ("WARC-Type", "WARC-Record-ID", "WARC-Date", "Content-Length")


def encode_warc(records: list, gzip_members: bool = True) -> bytes:
    """WARC/1.0 writer. Each record is a dict with ``rec_type``,
    ``record_id``, ``date``, ``payload`` (bytes) and optional
    ``uri`` / ``headers`` (extra header map). ``gzip_members`` emits
    the standard ``.warc.gz`` layout (one gzip member per record);
    ``False`` emits the uncompressed concatenation."""
    out = bytearray()
    for rec in records:
        payload = rec["payload"]
        if not isinstance(payload, (bytes, bytearray)):
            raise ValueError("WARC payload must be bytes")
        hdrs = [
            ("WARC-Type", rec["rec_type"]),
            ("WARC-Record-ID", rec["record_id"]),
            ("WARC-Date", rec["date"]),
        ]
        if rec.get("uri") is not None:
            hdrs.append(("WARC-Target-URI", rec["uri"]))
        for k, v in (rec.get("headers") or {}).items():
            hdrs.append((k, v))
        hdrs.append(("Content-Length", str(len(payload))))
        for k, v in hdrs:
            # names AND values: a CR/LF in either would smuggle a forged
            # header line into the record (header-injection guard)
            if "\r" in str(k) or "\n" in str(k) or "\r" in str(v) or "\n" in str(v):
                raise ValueError(f"WARC header {k!r} contains CR/LF")
        block = (
            _VERSION + _CRLF
            + b"".join(f"{k}: {v}".encode("utf-8") + _CRLF for k, v in hdrs)
            + _CRLF + bytes(payload) + _CRLF + _CRLF
        )
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += co.compress(block) + co.flush()
        else:
            out += block
    return bytes(out)


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress a concatenation of gzip members (stdlib ``gzip``
    stops at the first member's logical end in some modes; this walks
    every member explicitly and fails loud on truncation)."""
    raw = bytearray()
    rest = payload
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise ValueError("garbage between gzip members in .warc.gz")
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        raw += d.decompress(rest)
        raw += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in .warc.gz")
        rest = d.unused_data
    return bytes(raw)


def _parse_warc_headers(payload: bytes, pos: int) -> tuple:
    """Walk one WARC header block starting at ``pos`` (just past the
    version line). Returns ``(headers, pos_after_blank_line)``.
    Duplicate names: a repeated MANDATORY header (or Target-URI) is a
    structural conflict — two Content-Length lines cannot both frame
    the record — and raises ``ValueError``; other repeats (the spec
    legitimately allows e.g. multiple ``WARC-Concurrent-To``) are
    preserved by comma-joining values, never silently dropped."""
    unique = set(_MANDATORY) | {"WARC-Target-URI"}
    headers: dict = {}
    while True:
        eol = payload.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("unterminated WARC header block")
        line = payload[pos:eol]
        pos = eol + 2
        if not line:
            break
        k, sep, v = line.partition(b":")
        if not sep:
            raise ValueError(f"bad WARC header line {line!r}")
        key = k.decode("utf-8").strip(" \t")
        val = v.decode("utf-8").strip(" \t")
        if key in headers:
            if key in unique:
                raise ValueError(f"duplicate WARC header {key}")
            headers[key] = headers[key] + ", " + val
        else:
            headers[key] = val
    for k in _MANDATORY:
        if k not in headers:
            raise ValueError(f"WARC record missing mandatory header {k}")
    return headers, pos


def decode_warc(payload: bytes) -> list:
    """Byte-exact WARC/1.0 record walk. Accepts both ``.warc.gz``
    (per-member gzip, detected by magic) and uncompressed ``.warc``.
    Returns one dict per record: ``rec_type``, ``record_id``, ``date``,
    ``uri`` (None when absent), ``headers`` (the full header map),
    ``payload`` (bytes). Malformed structure — bad version line,
    missing mandatory header, duplicated mandatory header, short
    content block, missing trailer — raises ``ValueError``."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    records: list = []
    pos = 0
    n = len(payload)
    while pos < n:
        eol = payload.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("WARC record without version line")
        version = payload[pos:eol]
        if version != _VERSION:
            raise ValueError(f"unsupported WARC version line {version!r}")
        headers, pos = _parse_warc_headers(payload, eol + 2)
        try:
            clen = int(headers["Content-Length"])
        except ValueError:
            raise ValueError(
                f"bad Content-Length {headers['Content-Length']!r}"
            ) from None
        if clen < 0 or pos + clen + 4 > n:
            raise ValueError("WARC content block runs past end of stream")
        body = payload[pos : pos + clen]
        pos += clen
        if payload[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("missing WARC record trailer (CRLFCRLF)")
        pos += 4
        records.append(
            {
                "rec_type": headers["WARC-Type"],
                "record_id": headers["WARC-Record-ID"],
                "date": headers["WARC-Date"],
                "uri": headers.get("WARC-Target-URI"),
                "headers": headers,
                "payload": body,
            }
        )
    return records


# Spark-side reader --------------------------------------------------------

WARC_RECORD_SCHEMA = (
    "path string, rec_idx int, rec_type string, record_id string,"
    " warc_date string, uri string, content_length long, payload binary"
)


def read_warc(spark, path):
    """Distributed WARC ingest: ``binaryFile`` scan (one row per
    ``.warc``/``.warc.gz`` file) exploded to one row per record via
    ``mapInPandas`` — records never transit the driver, and each file
    decodes on whichever executor holds it (the per-file parallelism
    that matches the format's member-boundary split model). ``path``
    is a directory/glob string or an explicit list of file paths (a
    manifest read: only the named files are scanned, so a shared
    fixture dir with extra members cannot leak rows in). Columns:
    ``path, rec_idx, rec_type, record_id, warc_date, uri,
    content_length, payload``."""
    from collections.abc import Iterator

    import pandas as pd

    def explode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(decode_warc(bytes(content))):
                    rows.append(
                        (
                            p, i, rec["rec_type"], rec["record_id"],
                            rec["date"], rec["uri"],
                            len(rec["payload"]), rec["payload"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "rec_idx", "rec_type", "record_id",
                    "warc_date", "uri", "content_length", "payload",
                ],
            )

    paths = path if isinstance(path, (list, tuple)) else [path]
    files = (
        spark.read.format("binaryFile").load(list(paths))
        .select("path", "content")
    )
    return files.mapInPandas(explode, WARC_RECORD_SCHEMA)


def cdx_records(payload: bytes) -> list:
    """CDX-style offset index over a WARC stream: one dict per record
    with ``rec_idx``, ``rec_type``, ``uri``, ``offset``, ``length`` —
    the byte addressing that makes WARC splittable at scale (a reader
    seeks straight to a member instead of scanning the prefix).

    For ``.warc.gz`` the offsets/lengths address the COMPRESSED gzip
    members (the CommonCrawl CDX semantic); for uncompressed ``.warc``
    they address the record byte spans directly. Offsets come from the
    same fail-loud structural walk as :func:`decode_warc`."""
    out: list = []
    if payload[:2] == b"\x1f\x8b":
        pos = 0
        rest = payload
        while rest:
            if rest[:2] != b"\x1f\x8b":
                raise ValueError("garbage between gzip members in .warc.gz")
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            raw = d.decompress(rest) + d.flush()
            if not d.eof:
                raise ValueError("truncated gzip member in .warc.gz")
            member_len = len(rest) - len(d.unused_data)
            recs = decode_warc(raw)
            if len(recs) != 1:
                raise ValueError("gzip member must hold exactly one record")
            out.append(
                {
                    "rec_idx": len(out), "rec_type": recs[0]["rec_type"],
                    "uri": recs[0]["uri"], "offset": pos,
                    "length": member_len,
                }
            )
            pos += member_len
            rest = d.unused_data
        return out
    pos = 0
    n = len(payload)
    while pos < n:
        recs_before = pos
        # reuse the strict single-record walk by slicing forward: parse
        # headers to find Content-Length, then bound the record span
        eol = payload.find(_CRLF, pos)
        if eol < 0 or payload[pos:eol] != _VERSION:
            raise ValueError("bad WARC version line at offset %d" % pos)
        headers, hpos = _parse_warc_headers(payload, eol + 2)
        clen = int(headers["Content-Length"])
        end = hpos + clen + 4
        if clen < 0 or end > n or payload[end - 4 : end] != _CRLF + _CRLF:
            raise ValueError("WARC content block/trailer out of bounds")
        out.append(
            {
                "rec_idx": len(out), "rec_type": headers["WARC-Type"],
                "uri": headers.get("WARC-Target-URI"),
                "offset": recs_before, "length": end - recs_before,
            }
        )
        pos = end
    return out


def _parse_http_headers(lines: list) -> dict:
    """Header lines -> map, names case-normalized to lowercase.
    Repeated names are comma-joined (RFC 7230 §3.2.2 list semantics) —
    never silently dropped. Obs-fold continuation lines (RFC 7230
    §3.2.4, a line starting with SP/HTAB) are unfolded per the RFC's
    prescribed recovery: "replace each received obs-fold with one or
    more SP octets" — the value continues the PREVIOUS field, joined
    by a single SP. A fold before any field is unattributable and
    raises ValueError."""
    headers: dict = {}
    last_key: str = ""
    for line in lines:
        if line[:1] in (b" ", b"\t"):
            if not last_key:
                raise ValueError(
                    "HTTP obs-fold continuation before any header field"
                )
            cont = line.decode("latin-1").strip(" \t")
            headers[last_key] = headers[last_key] + " " + cont
            continue
        k, hsep, v = line.partition(b":")
        if not hsep:
            raise ValueError(f"bad HTTP header line {line!r}")
        key = k.decode("latin-1").strip(" \t").lower()
        val = v.decode("latin-1").strip(" \t")
        headers[key] = headers[key] + ", " + val if key in headers else val
        last_key = key
    return headers


def _dechunk(body: bytes) -> bytes:
    """Reassemble a ``Transfer-Encoding: chunked`` body (RFC 7230
    §4.1): hex chunk-size lines (chunk extensions after ``;`` ignored),
    exactly that many data bytes + CRLF per chunk, a ``0`` chunk, then
    optional trailer fields up to a final blank line. Truncated or
    mis-framed chunking raises ``ValueError`` — the framing bytes
    embedded in crawl text would poison every downstream text op."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("chunked body without chunk-size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip(b" \t")
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(f"bad chunk size {size_tok!r}") from None
        pos = eol + 2
        if size == 0:
            break
        if pos + size + 2 > len(body):
            raise ValueError("chunk data runs past end of body")
        out += body[pos : pos + size]
        if body[pos + size : pos + size + 2] != _CRLF:
            raise ValueError("chunk data not CRLF-terminated")
        pos = pos + size + 2
    # trailer section: zero or more header lines, then a blank line
    # (the blank line is optional at end-of-payload in practice)
    while pos < len(body):
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("unterminated chunked trailer section")
        if eol == pos:  # blank line: end of trailers
            pos += 2
            break
        pos = eol + 2
    if pos != len(body):
        raise ValueError("bytes after chunked body terminator")
    return bytes(out)


def _decode_content(body: bytes, encoding: str) -> bytes:
    """Apply ``Content-Encoding`` (RFC 7231 §3.1.2.2): gzip/x-gzip and
    deflate via stdlib zlib (deflate accepts both the zlib-wrapped form
    the RFC specifies and the raw-deflate form real servers emit),
    identity as a no-op. Anything else (br, zstd, compress, stacked
    codings) gates loudly — a compressed body reaching the text
    operators would be silent garbage."""
    codings = [c.strip() for c in encoding.lower().split(",") if c.strip()]
    codings = [c for c in codings if c != "identity"]
    if not codings:
        return body
    if len(codings) > 1:
        raise NotImplementedError(
            f"stacked Content-Encoding not supported: {encoding!r}"
        )
    coding = codings[0]
    if coding in ("gzip", "x-gzip"):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = d.decompress(body) + d.flush()
        if not d.eof:
            raise ValueError("truncated gzip body")
        return out
    if coding == "deflate":
        try:
            d = zlib.decompressobj()
            out = d.decompress(body) + d.flush()
        except zlib.error:
            d = zlib.decompressobj(-zlib.MAX_WBITS)
            out = d.decompress(body) + d.flush()
        if not d.eof:
            raise ValueError("truncated deflate body")
        return out
    raise NotImplementedError(f"Content-Encoding {coding!r} not supported")


def parse_http_response(payload: bytes) -> dict:
    """Parse the HTTP/1.1 response message a real WARC ``response``
    record carries as its payload: status line, header map (lowercased
    names, repeats comma-joined), body with REAL crawl framing —
    ``Transfer-Encoding: chunked`` bodies are reassembled (chunk-size
    lines, extensions, trailers) and ``Content-Encoding: gzip/deflate``
    bodies decompressed, so ``body`` is always the usable content
    bytes. When chunked, ``Content-Length`` is ignored per RFC 7230
    §3.3.3 (Transfer-Encoding takes precedence); otherwise a present
    ``Content-Length`` must match the raw body length exactly — a
    silent mismatch would mean truncated crawl content. Obs-fold
    header continuations unfold to a single SP (RFC 7230 §3.2.4
    recovery). Unsupported codings (br/zstd, stacked, non-chunked TE)
    gate loudly. Malformed structure raises
    ``ValueError``. Returns ``version, status, reason, headers, body,
    chunked, content_encoding``."""
    head, sep, body = payload.partition(_CRLF + _CRLF)
    if not sep:
        raise ValueError("HTTP response without header terminator")
    lines = head.split(_CRLF)
    status = lines[0].split(b" ", 2)
    if len(status) < 2 or not status[0].startswith(b"HTTP/"):
        raise ValueError(f"bad HTTP status line {lines[0]!r}")
    try:
        code = int(status[1])
    except ValueError:
        raise ValueError(f"bad HTTP status code {status[1]!r}") from None
    headers = _parse_http_headers(lines[1:])
    te = headers.get("transfer-encoding", "").strip().lower()
    chunked = False
    if te:
        if te != "chunked":
            raise NotImplementedError(
                f"Transfer-Encoding {te!r} not supported (only chunked)"
            )
        chunked = True
        body = _dechunk(body)
    elif "content-length" in headers:
        try:
            clen = int(headers["content-length"])
        except ValueError:
            raise ValueError("bad Content-Length") from None
        if clen != len(body):
            raise ValueError(
                f"Content-Length {clen} != body length {len(body)}"
            )
    encoding = headers.get("content-encoding")
    if encoding is not None:
        body = _decode_content(body, encoding)
    return {
        "version": status[0].decode("latin-1"),
        "status": code,
        "reason": status[2].decode("latin-1") if len(status) > 2 else "",
        "headers": headers,
        "body": body,
        "chunked": chunked,
        "content_encoding": encoding,
    }


def parse_http_request(payload: bytes) -> dict:
    """Parse the HTTP/1.1 request message a WARC ``request`` record
    carries: request line (method, target, version), header map (same
    rules as :func:`parse_http_response`), body (chunked/encoded
    request bodies share the response framing path). Malformed
    structure raises ``ValueError``."""
    head, sep, body = payload.partition(_CRLF + _CRLF)
    if not sep:
        raise ValueError("HTTP request without header terminator")
    lines = head.split(_CRLF)
    reqline = lines[0].split(b" ")
    if len(reqline) != 3 or not reqline[2].startswith(b"HTTP/"):
        raise ValueError(f"bad HTTP request line {lines[0]!r}")
    headers = _parse_http_headers(lines[1:])
    te = headers.get("transfer-encoding", "").strip().lower()
    if te:
        if te != "chunked":
            raise NotImplementedError(
                f"Transfer-Encoding {te!r} not supported (only chunked)"
            )
        body = _dechunk(body)
    elif "content-length" in headers:
        clen = int(headers["content-length"])
        if clen != len(body):
            raise ValueError(
                f"Content-Length {clen} != body length {len(body)}"
            )
    encoding = headers.get("content-encoding")
    if encoding is not None:
        body = _decode_content(body, encoding)
    return {
        "method": reqline[0].decode("latin-1"),
        "target": reqline[1].decode("latin-1"),
        "version": reqline[2].decode("latin-1"),
        "headers": headers,
        "body": body,
    }


def parse_warc_fields(payload: bytes) -> list:
    """Parse an ``application/warc-fields`` payload (ISO 28500 §6 —
    the format ``warcinfo`` and ``metadata`` records carry): UTF-8
    ``Name: value`` lines with RFC-style continuation folding (a line
    starting with SP/HTAB extends the previous value, joined by one
    space). Returns ordered (name, value) pairs — repeats are REAL in
    warc-fields (e.g. multiple ``outlink`` lines) so nothing is
    deduplicated. Fail-loud contract: a non-UTF-8 payload, a line
    without a colon, or a continuation before any field raises
    ``ValueError``."""
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(f"warc-fields payload is not UTF-8: {exc}") from exc
    fields: list = []
    for raw in text.split("\r\n"):
        if raw == "":
            continue
        if "\n" in raw:
            # a bare LF means the payload is LF-delimited (or mixes
            # line endings) — without this gate it would silently
            # parse as ONE field with embedded newlines in the value
            raise ValueError(
                "warc-fields lines must be CRLF-delimited; bare LF in"
                f" {raw!r}"
            )
        if raw[0] in (" ", "\t"):
            if not fields:
                raise ValueError(
                    "warc-fields continuation before any field"
                )
            name, val = fields[-1]
            fields[-1] = (name, val + " " + raw.strip(" \t"))
            continue
        k, sep, v = raw.partition(":")
        if not sep:
            raise ValueError(f"bad warc-fields line {raw!r}")
        fields.append((k.strip(" \t"), v.strip(" \t")))
    if not fields:
        raise ValueError("empty warc-fields payload")
    return fields
