"""Round-10 compressed/web-archive corpus containers: WARC record
framing + HTTP extraction (operators/warc.py) and bzip2/xz multistream
walks with magic dispatch (operators/multistream.py). Every malformed
shape fails closed — corrupt crawl data must surface, never flow on as
garbage text."""

from __future__ import annotations

import pytest

from duckdb_server_spark.operators.multistream import (
    read_bz2_streams,
    read_multistream,
    read_xz_streams,
    write_bz2_streams,
    write_xz_streams,
)
from duckdb_server_spark.operators.warc import (
    extract_http_response,
    parse_warc_records,
    write_http_response,
    write_warc_record,
)

# --- WARC ---------------------------------------------------------------------


def test_warc_two_record_roundtrip():
    blob = write_warc_record("warcinfo", b"software: x\r\n") + \
        write_warc_record(
            "response",
            write_http_response(b"hello body", status=200),
            target_uri="https://a.test/1",
        )
    recs = parse_warc_records(blob)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["target_uri"] == "https://a.test/1"
    http = extract_http_response(recs[1]["body"])
    assert http["status"] == 200
    assert http["body"] == b"hello body"
    assert http["headers"]["content-type"] == "text/html"


def test_warc_binary_body_and_crlf_in_payload():
    body = bytes(range(256)) + b"\r\n\r\nWARC/1.0\r\n"  # adversarial bytes
    blob = write_warc_record("resource", body)
    recs = parse_warc_records(blob)
    assert recs[0]["body"] == body  # Content-Length wins over content


def test_warc_header_continuation_folds():
    blob = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"X-Long: first\r\n second\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    )
    recs = parse_warc_records(blob)
    assert recs[0]["headers"]["X-Long"] == "first second"


@pytest.mark.parametrize(
    "blob, msg",
    [
        (b"WARX/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n", "bad version"),
        (b"WARC/0.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n", "unsupported"),
        (b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n", "Content-Length"),
        (b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort", "truncated"),
        (b"WARC/1.0\r\nnocolon\r\n", "malformed field"),
    ],
)
def test_warc_malformed_fails_closed(blob, msg):
    with pytest.raises(ValueError, match=msg):
        parse_warc_records(blob)


def test_warc_missing_separator_fails_closed():
    good = write_warc_record("metadata", b"xy")
    # drop the record separator, then append a second record
    broken = good[:-4] + write_warc_record("metadata", b"z")
    with pytest.raises(ValueError, match="separator"):
        parse_warc_records(broken)


def test_http_chunked_fails_closed():
    body = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nx")
    with pytest.raises(ValueError, match="chunked"):
        extract_http_response(body)


def test_http_bad_status_line_fails_closed():
    with pytest.raises(ValueError, match="status line"):
        extract_http_response(b"NOTHTTP\r\n\r\n")


# --- bzip2 / xz multistream ------------------------------------------------------


def test_bz2_multistream_roundtrip():
    blob = write_bz2_streams([b"alpha ", b"beta"])
    streams = read_bz2_streams(blob)
    assert streams == [b"alpha ", b"beta"]


def test_xz_multistream_roundtrip_with_padding():
    blob = write_xz_streams([b"one", b"two"], pad=True)
    assert read_xz_streams(blob) == [b"one", b"two"]
    blob2 = write_xz_streams([b"one", b"two"], pad=False)
    assert read_xz_streams(blob2) == [b"one", b"two"]


def test_multistream_dispatch_by_magic():
    from duckdb_server_spark.operators.gzipio import write_member

    gz = write_member(b"g1") + write_member(b"g2")
    bz = write_bz2_streams([b"b1"])
    xz = write_xz_streams([b"x1", b"x2"])
    assert read_multistream(gz) == {
        "codec": "gzip", "n_streams": 2, "data": b"g1g2"}
    assert read_multistream(bz) == {
        "codec": "bzip2", "n_streams": 1, "data": b"b1"}
    assert read_multistream(xz) == {
        "codec": "xz", "n_streams": 2, "data": b"x1x2"}


def test_bz2_bad_magic_fails_closed():
    with pytest.raises(ValueError, match="magic"):
        read_bz2_streams(b"BZx9junk")


def test_bz2_corrupt_stream_fails_closed():
    blob = bytearray(write_bz2_streams([b"payload payload payload"]))
    blob[15] ^= 0xFF
    with pytest.raises(ValueError, match="bzip2"):
        read_bz2_streams(bytes(blob))


def test_bz2_truncated_fails_closed():
    blob = write_bz2_streams([b"payload payload payload"])
    with pytest.raises(ValueError, match="truncated|corrupt"):
        read_bz2_streams(blob[: len(blob) - 6])


def test_xz_bad_padding_fails_closed():
    blob = write_xz_streams([b"a"]) + b"\x00\x00" + write_xz_streams([b"b"])
    with pytest.raises(ValueError, match="padding"):
        read_xz_streams(blob)


def test_xz_corrupt_stream_fails_closed():
    blob = bytearray(write_xz_streams([b"payload payload payload"]))
    blob[20] ^= 0xFF
    with pytest.raises(ValueError, match="xz"):
        read_xz_streams(bytes(blob))


def test_multistream_unknown_magic_fails_closed():
    with pytest.raises(ValueError, match="unknown"):
        read_multistream(b"PK\x03\x04whatever")


def test_stdlib_interop_both_directions():
    import bz2 as _bz2
    import lzma as _lzma

    # stdlib-written single streams read back
    assert read_bz2_streams(_bz2.compress(b"interop")) == [b"interop"]
    assert read_xz_streams(_lzma.compress(b"interop")) == [b"interop"]
    # engine-written streams read by stdlib
    assert _bz2.decompress(write_bz2_streams([b"a", b"b"])) == b"ab"
    assert _lzma.decompress(write_xz_streams([b"a"])) == b"a"
