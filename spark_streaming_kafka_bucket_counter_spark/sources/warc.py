"""WARC (ISO 28500) reader/writer — the container format crawl corpora
actually arrive in (Common Crawl ships ~100 TB-scale .warc.gz dumps).

Pure Python over stdlib gzip/zlib, same rationale as the other
dependency-free codecs: the Spark-side plumbing (binaryFile source,
Arrow batches, per-record tolerance) is the real deliverable and is
fully testable without a crawl library.

Layout implemented (the subset every WARC consumer relies on):

- record = ``WARC/1.0`` version line, CRLF header block
  (``WARC-Type``, ``WARC-Record-ID``, ``WARC-Target-URI``,
  ``Content-Length`` in BYTES), blank line, a block of exactly
  Content-Length bytes, then CRLF CRLF.
- response records carry an HTTP/1.1 response inside the block: status
  line + headers, blank line, body. ``Transfer-Encoding: chunked``
  bodies are de-chunked (round 7 — real crawls store the wire bytes,
  so chunk framing is common and a reader that returns the framing as
  text silently corrupts the corpus).
- request records carry the HTTP/1.1 request (method + target
  surfaced); metadata/warcinfo records carry ``application/
  warc-fields`` text; revisit records carry ``WARC-Refers-To`` +
  ``WARC-Profile`` (the dedup breadcrumb crawls write instead of
  refetching identical payloads); resource/conversion records carry
  their block verbatim. Round 7: all of these parse into uniform rows
  instead of type-and-URI-only stubs — real Common Crawl segments
  interleave them with responses.
- Common-Crawl-style ``.warc.gz``: every record is its OWN gzip member
  and members are concatenated — which is exactly what makes the format
  splittable at member boundaries (a reader can seek to any gzip magic
  and resynchronize). :func:`parse_warc` handles both plain and
  member-gzip input.

Parsing is per-record tolerant (crawl reality: truncated/garbled
records are normal) — malformed records are skipped and COUNTED, never
raised, unlike the object-container ingest which fails loudly on its
own files.
"""

from __future__ import annotations

import gzip
import io
import zlib

from ..functions.charset import charset_from_content_type, detect_and_decode

CRLF = b"\r\n"


def _warc_record(
    wtype: str, record_id: str, target_uri: str | None, block: bytes,
    content_type: str, date: str, extra: list[bytes] | None = None,
) -> bytes:
    hdr = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: " + wtype.encode() + CRLF
        + b"WARC-Record-ID: <" + record_id.encode() + b">" + CRLF
        + b"WARC-Date: " + date.encode() + CRLF
    )
    if target_uri is not None:
        hdr += b"WARC-Target-URI: " + target_uri.encode() + CRLF
    for line in extra or ():
        hdr += line + CRLF
    hdr += (
        b"Content-Type: " + content_type.encode() + CRLF
        + b"Content-Length: " + str(len(block)).encode() + CRLF
        + CRLF
    )
    return hdr + block + CRLF + CRLF


def _chunk_body(body: bytes, chunk_size: int = 13) -> bytes:
    """HTTP/1.1 chunked transfer framing: hex size line + chunk per
    piece, zero-size terminator."""
    out = bytearray()
    for i in range(0, len(body), chunk_size):
        piece = body[i : i + chunk_size]
        out += f"{len(piece):x}".encode() + CRLF + piece + CRLF
    out += b"0" + CRLF + CRLF
    return bytes(out)


def build_warc_response(
    record_id: str, target_uri: str, body: bytes,
    date: str = "2026-01-01T00:00:00Z", chunked: bool = False,
    content_type: str = "text/plain; charset=utf-8",
) -> bytes:
    """One conformant WARC/1.0 response record (uncompressed).
    ``chunked=True`` stores the HTTP body in chunked transfer framing —
    the wire shape crawls capture verbatim. ``content_type`` carries
    the charset declaration (or lack of one) the reader must honor."""
    if chunked:
        payload = _chunk_body(body)
        http = (
            b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: " + content_type.encode() + CRLF
            + b"Transfer-Encoding: chunked" + CRLF
            + CRLF
            + payload
        )
    else:
        http = (
            b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: " + content_type.encode() + CRLF
            + b"Content-Length: " + str(len(body)).encode() + CRLF
            + CRLF
            + body
        )
    return _warc_record(
        "response", record_id, target_uri, http,
        "application/http;msgtype=response", date,
    )


def build_warc_request(
    record_id: str, target_uri: str, method: str = "GET",
    date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    """One WARC/1.0 request record (the fetch that produced a response)."""
    http = (
        method.encode() + b" " + target_uri.encode() + b" HTTP/1.1" + CRLF
        + b"Host: corpus.invalid" + CRLF
        + b"User-Agent: ssbc-crawler/1.0" + CRLF
        + CRLF
    )
    return _warc_record(
        "request", record_id, target_uri, http,
        "application/http;msgtype=request", date,
    )


def build_warc_metadata(
    record_id: str, target_uri: str, fields: dict[str, str],
    date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    """One WARC/1.0 metadata record (``application/warc-fields`` block —
    fetch duration, hop path, detected charset, ... in real crawls)."""
    block = b"".join(
        k.encode() + b": " + v.encode() + CRLF for k, v in fields.items()
    )
    return _warc_record(
        "metadata", record_id, target_uri, block,
        "application/warc-fields", date,
    )


def build_warc_revisit(
    record_id: str, target_uri: str, refers_to: str,
    date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    """One WARC/1.0 revisit record — what a crawler writes instead of a
    duplicate payload when a refetch hashed identical (URL-level dedup
    at crawl time). Carries the response headers only."""
    http = (
        b"HTTP/1.1 304 Not Modified" + CRLF
        + b"Content-Type: text/plain; charset=utf-8" + CRLF
        + CRLF
    )
    return _warc_record(
        "revisit", record_id, target_uri, http,
        "application/http;msgtype=response", date,
        extra=[
            b"WARC-Refers-To: <" + refers_to.encode() + b">",
            b"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
            b"identical-payload-digest",
        ],
    )


def encode_warc(records: list[bytes], member_gzip: bool = True) -> bytes:
    """Concatenate records into a WARC file; ``member_gzip`` compresses
    each record as its own gzip member (the Common Crawl layout, and
    the reason .warc.gz is splittable: any gzip magic is a resync
    point). ``mtime=0`` keeps output deterministic."""
    if not member_gzip:
        return b"".join(records)
    out = bytearray()
    for rec in records:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        out += buf.getvalue()
    return bytes(out)


def _gunzip_members(data: bytes) -> list[bytes]:
    """Split concatenated gzip members into their decompressed payloads."""
    members = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        members.append(d.decompress(data[pos:]))
        tail = d.unused_data
        pos = len(data) - len(tail)
        if not members[-1] and not d.eof:
            break  # truncated final member
    return members


def _dechunk(data: bytes) -> bytes | None:
    """Decode an HTTP/1.1 chunked transfer body, ``None`` on bad
    framing (fail closed — framing returned as text would silently
    corrupt the corpus)."""
    out = bytearray()
    pos = 0
    while True:
        eol = data.find(CRLF, pos)
        if eol < 0:
            return None
        size_tok = data[pos:eol].split(b";", 1)[0].strip()  # drop extensions
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers (if any) are ignored
        chunk = data[pos : pos + size]
        if len(chunk) < size:
            return None
        out += chunk
        pos += size
        if data[pos : pos + 2] != CRLF:
            return None
        pos += 2


def parse_warc(data: bytes) -> tuple[list[dict], int]:
    """WARC bytes (plain or member-gzip) -> ``(records, n_malformed)``.

    Every record yields a UNIFORM dict: ``type``, ``record_id``,
    ``target_uri``, plus type-specific fields left ``None`` where not
    applicable — ``status``/``body`` for response records (chunked
    transfer bodies de-chunked), ``method`` for request records,
    ``refers_to``/``status`` for revisit records, and the raw
    warc-fields/block text as ``body`` for metadata / warcinfo /
    resource / conversion records. Bodies decode UTF-8 with
    replacement (crawl text is dirty by nature). Content-Length is in
    BYTES and is trusted over delimiters, per spec. Malformed records
    are skipped and counted."""
    if data[:2] == b"\x1f\x8b":
        try:
            chunks = _gunzip_members(data)
        except zlib.error:
            return [], 1
    else:
        chunks = [data]
    records: list[dict] = []
    bad = 0
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            # skip inter-record padding
            while chunk[pos : pos + 2] == CRLF:
                pos += 2
            if pos >= len(chunk):
                break
            if not chunk[pos:].startswith(b"WARC/"):
                bad += 1
                break  # cannot resynchronize inside a plain stream
            hdr_end = chunk.find(CRLF + CRLF, pos)
            if hdr_end < 0:
                bad += 1
                break
            headers: dict[str, str] = {}
            lines = chunk[pos:hdr_end].split(CRLF)
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                if _:
                    headers[k.strip().lower().decode("ascii", "replace")] = (
                        v.strip().decode("utf-8", "replace")
                    )
            try:
                clen = int(headers["content-length"])
            except (KeyError, ValueError):
                bad += 1
                break
            block = chunk[hdr_end + 4 : hdr_end + 4 + clen]
            pos = hdr_end + 4 + clen
            if len(block) < clen:
                bad += 1
                break
            rec = {
                "type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", "").strip("<>"),
                "target_uri": headers.get("warc-target-uri", ""),
                "status": None,
                "body": None,
                "method": None,
                "refers_to": None,
                "charset": None,
            }
            wtype = rec["type"]
            if wtype in ("response", "revisit") and block[:5] == b"HTTP/":
                http_end = block.find(CRLF + CRLF)
                if http_end < 0:
                    bad += 1
                    continue
                head = block[:http_end]
                status_line = head[: (head + CRLF).find(CRLF)]
                parts = status_line.split(None, 2)
                try:
                    rec["status"] = int(parts[1])
                except (IndexError, ValueError):
                    bad += 1
                    continue
                if wtype == "revisit":
                    # no payload by definition; surface the dedup pointer
                    rec["refers_to"] = headers.get(
                        "warc-refers-to", ""
                    ).strip("<>") or None
                else:
                    body = block[http_end + 4 :]
                    hl = {}
                    for line in head.split(CRLF)[1:]:
                        k, sep, v = line.partition(b":")
                        if sep:
                            hl[k.strip().lower()] = v.strip().lower()
                    if b"chunked" in hl.get(b"transfer-encoding", b""):
                        body = _dechunk(body)
                        if body is None:
                            bad += 1
                            continue
                    # charset ladder: BOM > declared (when it strictly
                    # decodes) > strict UTF-8 > cp1252 — crawl text is
                    # ~5-10% legacy encodings; hard-coded UTF-8 would
                    # silently mojibake every such document
                    declared = charset_from_content_type(
                        hl.get(b"content-type", b"").decode("ascii", "replace")
                    )
                    rec["body"], rec["charset"] = detect_and_decode(
                        body, declared
                    )
            elif wtype == "request" and block.find(b" HTTP/") > 0:
                req_line = block[: (block + CRLF).find(CRLF)]
                parts = req_line.split(None, 2)
                if parts:
                    rec["method"] = parts[0].decode("ascii", "replace")
            elif wtype in ("metadata", "warcinfo", "resource", "conversion"):
                # warc-fields / payload block verbatim
                rec["body"] = block.decode("utf-8", "replace")
            records.append(rec)
    return records, bad


def read_member_range(path: str, start: int, end: int) -> tuple[list[bytes], int]:
    """The splittable-read primitive: decompress every gzip member whose
    FIRST byte lies in ``[start, end)`` of a member-gzip WARC file,
    returning ``(records, n_malformed)``.

    A task that does not start at 0 RESYNCHRONIZES: scan forward for a
    gzip magic (``1f 8b 08``) whose decompression cleanly yields a
    ``WARC/`` prefix — magic bytes occur by chance inside compressed
    streams, so a candidate is only accepted when it actually inflates
    to a record (the same trick production WARC readers use; false
    candidates cost one failed inflate and are skipped). Each member is
    then decoded independently; the member straddling ``end`` belongs to
    the task that OWNS its first byte, so every record is read exactly
    once across a partition of ``[0, filesize)``."""
    out: list[bytes] = []
    bad = 0
    with open(path, "rb") as fh:
        data = fh.read()  # per-task byte range + tail; files are bounded
    n = len(data)
    pos = start
    if pos > 0:  # resync to the first true member at/after pos
        while True:
            hit = data.find(b"\x1f\x8b\x08", pos)
            if hit < 0 or hit >= end:
                return out, bad
            d = zlib.decompressobj(wbits=31)
            try:
                payload = b""
                feed = hit
                while len(payload) < 5 and not d.eof and feed < n:
                    payload += d.decompress(data[feed : feed + 4096])
                    feed += 4096
                if payload[:5] == b"WARC/":
                    pos = hit
                    break
            except zlib.error:
                pass
            pos = hit + 1
    while pos < min(end, n):
        d = zlib.decompressobj(wbits=31)
        try:
            payload = d.decompress(data[pos:])
        except zlib.error:
            bad += 1
            break
        if not d.eof:
            bad += 1  # truncated trailing member
            break
        out.append(payload)
        pos = n - len(d.unused_data)
    return out, bad
