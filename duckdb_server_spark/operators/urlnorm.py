"""URL canonicalization — the crawl-dedup front end: the same page
arrives under scheme/host case variants, default ports, tracking
parameters, fragments, and query-order permutations; canonicalizing
BEFORE dedup is what makes URL-keyed dedup meaningful at corpus scale.

Built ENTIRELY from JVM expression primitives (regexp_extract /
regexp_replace / lower / split / filter / array_sort / array_join /
concat) — no Python UDF: the whole transform stays inside whole-stage
codegen on the scan side, so canonicalizing 100 TB of URLs costs a
scan, not an Arrow hop.

Rules (the conservative, loss-free subset every crawler agrees on):
* scheme and host lowercase;
* default port stripped (``:80`` for http, ``:443`` for https);
  non-default ports KEPT;
* fragment dropped;
* ``utm_*`` tracking parameters removed; surviving query parameters
  sorted bytewise; an emptied query drops its ``?``;
* an empty path becomes ``/``.

Reference scope: the reference executes whatever SQL arrives
(main.go:229) with no URL functions of its own; this is
beyond-reference capability for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://.*$"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*).*$"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)(\?[^#]*)?(#.*)?$"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL as a pure
    expression column (see module rules)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    path = F.regexp_extract(url, _REST_RE, 1)
    query = F.regexp_extract(url, _REST_RE, 2)  # includes the '?'

    host = (
        F.when(
            (scheme == "http") & hostport.rlike(":80$"),
            F.regexp_replace(hostport, ":80$", ""),
        )
        .when(
            (scheme == "https") & hostport.rlike(":443$"),
            F.regexp_replace(hostport, ":443$", ""),
        )
        .otherwise(hostport)
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)

    params = F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    query_part = F.when(sorted_q == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_q)
    )
    return F.concat(scheme, F.lit("://"), host, path, query_part)
