"""HTML text extraction (operators/htmltext.py): round-trip exactness
on adversarial text, the subset rules one by one, and fail-closed
character references."""

from __future__ import annotations

import re

import pytest

from duckdb_server_spark.operators.htmltext import (
    escape_text,
    extract_text,
    wrap_page,
)


def test_template_roundtrip_exact_on_adversarial_text():
    text = "Ben & Jerry <3 a+b>c  spaced\n\nlines & &amp; literal"
    out = extract_text(wrap_page("Doc 7", text))
    want = (
        "Doc 7 Home | About Doc 7 "
        + re.sub(r"\s+", " ", text)
        + " © 2024 — Example …"
    )
    assert out == want


def test_script_and_style_contents_removed():
    html = (
        "<p>keep</p><script>var a = '<p>gone</p>';</script>"
        "<style>p { content: 'gone'; }</style><p>also</p>"
    )
    assert extract_text(html) == "keep also"


def test_comments_removed_across_lines():
    assert extract_text("a<!-- x\n<p>y</p>\n -->b") == "a b"


def test_numeric_refs_decimal_and_hex():
    assert extract_text("&#65;&#x42;&#x2014;") == "AB—"


def test_amp_decoded_last_one_level():
    # '&amp;lt;' is the ESCAPED text '&lt;' — must not become '<'
    assert extract_text("&amp;lt;") == "&lt;"


def test_invalid_numeric_ref_fails_closed():
    with pytest.raises(ValueError, match="character reference"):
        extract_text("&#xD800;")
    with pytest.raises(ValueError, match="character reference"):
        extract_text("&#0;")


def test_escape_is_exact_inverse_through_template():
    for text in ("", "&", "<<>>", "&amp;&lt;", "tab\there", "ü—…"):
        out = extract_text(wrap_page("T", text))
        inner = re.sub(r"\s+", " ", text).strip()
        assert (f" {inner} " in f" {out} ") or inner == ""


def test_tags_become_spaces_not_glue():
    assert extract_text("<p>one</p><p>two</p>") == "one two"
