"""HTML → text extraction — the first transform every scraped-web
pipeline applies: drop non-content blocks (script/style/comments),
strip tags, decode character references, normalize whitespace. This is
the regex-subset extractor (documented below), not a full HTML5 tree
parser — malformed-nesting recovery and CSS-visibility rules are out
of scope; the subset is exactly what WET-style text extraction does.

Subset rules (deterministic, order matters):
1. ``<!-- ... -->`` comments removed (non-greedy, across lines);
2. ``<script>``/``<style>`` elements removed WITH their contents
   (case-insensitive; a ``</script>`` inside a quoted JS string will
   end the block — the known regex-subset limit, documented);
3. every remaining tag ``<...>`` becomes a single space (block/inline
   distinction is not text-destroying under rule 5);
4. character references decoded: the HTML named core (amp, lt, gt,
   quot, apos, nbsp, copy, mdash, hellip) plus ALL numeric forms
   (``&#NNN;`` and ``&#xHH;``); ``&amp;`` is decoded LAST so escaped
   entity text survives exactly one level, matching the escape side;
5. whitespace runs collapse to one space, ends trimmed.

A paired ``escape_text`` writes the inverse (&/</> escaping), so
template → extract round-trips are byte-exact on arbitrary text — the
property b80's oracle replays.

Reference scope: the reference is SQL passthrough (main.go:229) with
no HTML functions; beyond-reference capability. Scale shape: per-
payload regex kernel inside mapInPandas — embarrassingly parallel.
"""

from __future__ import annotations

import re

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_SCRIPT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_NUM_REF_RE = re.compile(r"&#(x[0-9A-Fa-f]+|\d+);")

_NAMED = {
    "lt": "<", "gt": ">", "quot": '"', "apos": "'", "nbsp": " ",
    "copy": "©", "mdash": "—", "hellip": "…",
}


def _decode_refs(s: str) -> str:
    def num(m: re.Match) -> str:
        body = m.group(1)
        code = int(body[1:], 16) if body[0] in "xX" else int(body)
        if not (0 < code <= 0x10FFFF) or 0xD800 <= code <= 0xDFFF:
            raise ValueError(f"html: invalid character reference {code}")
        return chr(code)

    s = _NUM_REF_RE.sub(num, s)
    for name, ch in _NAMED.items():
        s = s.replace(f"&{name};", ch)
    return s.replace("&amp;", "&")  # LAST: one level of unescaping


def extract_text(html: str) -> str:
    """Visible text of an HTML document under the module's subset
    rules; whitespace-normalized."""
    s = _COMMENT_RE.sub(" ", html)
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _decode_refs(s)
    return _WS_RE.sub(" ", s).strip()


def escape_text(text: str) -> str:
    """The inverse write side: escape &, <, > so arbitrary text embeds
    into element content and extract_text recovers it exactly (modulo
    the whitespace normalization both sides share)."""
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def wrap_page(title: str, body_text: str) -> str:
    """A deterministic page template with the boilerplate every crawler
    meets: nav links, an inline script whose STRING contains markup, a
    style block, a comment hiding markup, entity-bearing footer."""
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{escape_text(title)}</title>"
        "<style>p { color: #333; }</style></head>\n"
        '<body><nav><a href="/">Home</a> | <a href="/about">About</a>'
        "</nav>\n"
        '<script type="text/javascript">var hidden = "<p>not text</p>";'
        "</script>\n"
        f"<h1>{escape_text(title)}</h1>\n"
        f"<p>{escape_text(body_text)}</p>\n"
        "<!-- hidden <p>comment markup</p> -->\n"
        "<footer>&copy; 2024 &#8212; Example &#x2026;</footer>"
        "</body></html>"
    )
