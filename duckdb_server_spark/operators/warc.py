"""WARC (Web ARChive, ISO 28500) record parsing — the scraped-web
ingestion format: Common-Crawl-style corpora ship as WARC/WET files
whose records are individually gzip-member-compressed (the X147 chain,
operators/gzipio.py). This module parses the record layer on top:

* the version line (``WARC/1.0`` or ``WARC/1.1``) + named header
  fields terminated by an empty line (CRLF conventions), the
  Content-Length-delimited body, and the CRLF CRLF record separator;
* HTTP response payload extraction for ``response`` records (status
  line + header block + body — what a text pipeline actually wants);
* a deterministic record writer for fixtures.

Everything fails closed: a bad version line, a missing Content-Length,
a truncated body, or a malformed separator raises with a WARC-prefixed
message — corrupt crawl data must surface, not flow downstream as
garbage text.

Reference scope: the reference moves blobs opaquely (main.go:199);
this is beyond-reference capability for the training-data pipeline.
Scale shape: a linear record walk per payload inside mapInPandas —
embarrassingly parallel, payloads never cross the driver.
"""

from __future__ import annotations

_CRLF = b"\r\n"


def parse_warc_records(payload: bytes) -> list[dict]:
    """Walk every WARC record in an (already-decompressed) payload.
    Returns [{version, headers (dict, original-case keys preserved,
    lookups case-insensitive via the lowered copy), warc_type,
    target_uri, content_length, body}]."""
    out, pos = [], 0
    n = len(payload)
    while pos < n:
        # skip inter-record blank lines (writers vary between 0 and 2)
        while payload[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = payload.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("WARC: unterminated version line")
        version = payload[pos:eol].decode("ascii", "strict")
        if not version.startswith("WARC/"):
            raise ValueError(f"WARC: bad version line {version[:20]!r}")
        if version not in ("WARC/1.0", "WARC/1.1"):
            raise ValueError(f"WARC: unsupported version {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = payload.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("WARC: unterminated header block")
            line = payload[pos:eol]
            pos = eol + 2
            if not line:
                break  # empty line ends the header block
            if line[:1] in (b" ", b"\t"):  # obs-fold continuation
                if not headers:
                    raise ValueError("WARC: continuation before any field")
                headers[last] += " " + line.strip().decode("utf-8")
                continue
            ci = line.find(b":")
            if ci <= 0:
                raise ValueError(f"WARC: malformed field {line[:30]!r}")
            last = line[:ci].decode("ascii").strip()
            headers[last] = line[ci + 1 :].strip().decode("utf-8")
        lowered = {k.lower(): v for k, v in headers.items()}
        if "content-length" not in lowered:
            raise ValueError("WARC: record without Content-Length")
        clen = int(lowered["content-length"])
        if pos + clen > n:
            raise ValueError("WARC: truncated record body")
        body = payload[pos : pos + clen]
        pos += clen
        # the spec's record separator: exactly two CRLFs
        if payload[pos : pos + 4] != _CRLF * 2:
            if pos != n:  # last record may end the payload
                raise ValueError("WARC: missing record separator")
        else:
            pos += 4
        out.append(
            {
                "version": version,
                "headers": headers,
                "warc_type": lowered.get("warc-type", ""),
                "target_uri": lowered.get("warc-target-uri"),
                "content_length": clen,
                "body": body,
            }
        )
    if not out:
        raise ValueError("WARC: no records")
    return out


def extract_http_response(body: bytes) -> dict:
    """An HTTP/1.x response inside a WARC ``response`` record →
    {status, headers, body}. Chunked transfer encoding fails closed
    (crawlers store the decoded payload; chunked bodies here mean the
    writer misbehaved)."""
    sep = body.find(_CRLF * 2)
    if sep < 0:
        raise ValueError("WARC/HTTP: no header/body separator")
    head_lines = body[:sep].split(_CRLF)
    status_line = head_lines[0].decode("ascii", "strict")
    parts = status_line.split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"WARC/HTTP: bad status line {status_line[:30]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        ci = line.find(b":")
        if ci <= 0:
            raise ValueError("WARC/HTTP: malformed header line")
        headers[line[:ci].decode("ascii").strip().lower()] = (
            line[ci + 1 :].strip().decode("utf-8", "strict")
        )
    if headers.get("transfer-encoding", "").lower() == "chunked":
        raise ValueError("WARC/HTTP: chunked bodies are not stored form")
    return {"status": status, "headers": headers, "body": body[sep + 4 :]}


def write_warc_record(
    warc_type: str,
    body: bytes,
    target_uri: str | None = None,
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    date: str = "2024-01-01T00:00:00Z",
    extra: dict[str, str] | None = None,
) -> bytes:
    """One deterministic WARC/1.0 record (fixed date/id for byte-stable
    fixtures)."""
    fields = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", record_id),
        ("WARC-Date", date),
    ]
    if target_uri is not None:
        fields.append(("WARC-Target-URI", target_uri))
    for k, v in (extra or {}).items():
        fields.append((k, v))
    fields.append(("Content-Length", str(len(body))))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in fields
    )
    return head + _CRLF + body + _CRLF * 2


def write_http_response(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    """A stored-form HTTP/1.1 response block (what crawl writers put in
    a ``response`` record's body)."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "Status"
    )
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n".encode()
        + _CRLF
        + body
    )
