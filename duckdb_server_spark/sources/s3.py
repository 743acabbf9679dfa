"""S3-protocol object store support — the httpfs/S3-secret path (S8).

The reference's k8s deployment INSTALLs httpfs and wires a
``CREATE SECRET (TYPE s3, KEY_ID …, SECRET …, ENDPOINT …)`` so queries
can ``read_parquet('s3://bucket/key')`` (k8s/main.yaml:110-125). The
Spark-native production path is hadoop-s3a conf (``configure_s3`` /
``_apply_secret`` already set ``fs.s3a.*`` on the live session, and on a
real cluster the executors then scan object storage directly and in
parallel). This container ships no hadoop-aws jars, so this module
implements the protocol itself against the PUBLIC AWS SigV4 spec
(https://docs.aws.amazon.com/IAM/latest/UserGuide/create-signed-request.html):

- :class:`S3Client` — GetObject / ListObjectsV2 over plain urllib with
  REAL AWS Signature Version 4 request signing;
- :class:`MiniS3Server` — a hermetic stdlib HTTP object store that
  serves a local directory as one bucket and VERIFIES each request's
  SigV4 signature server-side (canonical-request reconstruction, HMAC
  chain, constant-time compare) — so the client's signing is proven
  correct, not just present;
- :func:`resolve_s3_paths` — the engine hook: ``s3://`` URIs in
  ``read_parquet``/bare-path SQL spool through the client into a local
  cache keyed by (endpoint, path, ETag), then the ordinary
  ``spark.read`` scan takes over. Spooling is the single-node stand-in;
  the 100 TB path is the s3a conf above, where no spool exists.

Scope: GET/HEAD + list-type=2 listing, path-style URLs, anonymous mode
when no secret is configured. Multipart upload, versioning, and the
rest of the S3 surface are out of scope — serving here is read-only.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import os
import threading
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


# ---------------------------------------------------------------------------
# SigV4 primitives (shared by signer and verifier)
# ---------------------------------------------------------------------------


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def _signing_key(secret: str, datestamp: str, region: str, service: str) -> bytes:
    k = _hmac(("AWS4" + secret).encode("utf-8"), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def _canonical_query(query: str) -> str:
    pairs = urllib.parse.parse_qsl(query, keep_blank_values=True)
    return "&".join(
        f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(v, safe='-_.~')}"
        for k, v in sorted(pairs)
    )


def _signature(
    secret: str,
    method: str,
    path: str,
    query: str,
    headers: dict[str, str],
    signed_headers: list[str],
    payload_hash: str,
    amz_date: str,
    scope: tuple[str, str, str],  # (datestamp, region, service)
) -> str:
    canonical_headers = "".join(
        f"{h}:{' '.join(headers[h].split())}\n" for h in signed_headers
    )
    canonical_request = "\n".join(
        (
            method,
            urllib.parse.quote(path, safe="/-_.~"),
            _canonical_query(query),
            canonical_headers,
            ";".join(signed_headers),
            payload_hash,
        )
    )
    datestamp, region, service = scope
    credential_scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        (
            "AWS4-HMAC-SHA256",
            amz_date,
            credential_scope,
            hashlib.sha256(canonical_request.encode("utf-8")).hexdigest(),
        )
    )
    key = _signing_key(secret, datestamp, region, service)
    return hmac.new(key, string_to_sign.encode("utf-8"), hashlib.sha256).hexdigest()


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class S3Client:
    """Minimal path-style S3 client with SigV4 signing (GET-only)."""

    def __init__(
        self,
        endpoint: str,
        access_key: str | None = None,
        secret_key: str | None = None,
        region: str = "us-east-1",
        use_ssl: bool = False,
    ) -> None:
        endpoint = endpoint.replace("http://", "").replace("https://", "")
        self.endpoint = endpoint
        self.base = f"{'https' if use_ssl else 'http'}://{endpoint}"
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region

    def _request(self, path: str, query: str = "") -> tuple[bytes, dict]:
        url = self.base + urllib.parse.quote(path, safe="/-_.~")
        if query:
            url += "?" + query
        headers = {"host": self.endpoint}
        if self.access_key and self.secret_key:
            now = datetime.datetime.now(datetime.timezone.utc)
            amz_date = now.strftime("%Y%m%dT%H%M%SZ")
            datestamp = now.strftime("%Y%m%d")
            headers["x-amz-date"] = amz_date
            headers["x-amz-content-sha256"] = _EMPTY_SHA256
            signed = sorted(headers)
            sig = _signature(
                self.secret_key,
                "GET",
                path,
                query,
                headers,
                signed,
                _EMPTY_SHA256,
                amz_date,
                (datestamp, self.region, "s3"),
            )
            credential = f"{self.access_key}/{datestamp}/{self.region}/s3/aws4_request"
            headers["Authorization"] = (
                f"AWS4-HMAC-SHA256 Credential={credential}, "
                f"SignedHeaders={';'.join(signed)}, Signature={sig}"
            )
        req = urllib.request.Request(url, headers=headers, method="GET")
        with urllib.request.urlopen(req) as resp:  # noqa: S310 - config-chosen endpoint
            return resp.read(), dict(resp.headers)

    def get_object(self, bucket: str, key: str) -> tuple[bytes, str]:
        """Returns (bytes, etag)."""
        body, headers = self._request(f"/{bucket}/{key}")
        return body, headers.get("ETag", "").strip('"')

    def list_objects(self, bucket: str, prefix: str = "") -> list[dict]:
        """ListObjectsV2 → [{'key':…, 'size':…, 'etag':…}]."""
        import xml.etree.ElementTree as ET

        query = "list-type=2"
        if prefix:
            query += "&prefix=" + urllib.parse.quote(prefix, safe="-_.~/")
        body, _ = self._request(f"/{bucket}", query)
        root = ET.fromstring(body)
        ns = ""
        if root.tag.startswith("{"):
            ns = root.tag[: root.tag.index("}") + 1]
        out = []
        for c in root.findall(f"{ns}Contents"):
            out.append(
                {
                    "key": c.findtext(f"{ns}Key"),
                    "size": int(c.findtext(f"{ns}Size") or 0),
                    "etag": (c.findtext(f"{ns}ETag") or "").strip('"'),
                }
            )
        return out


# ---------------------------------------------------------------------------
# hermetic server
# ---------------------------------------------------------------------------


class MiniS3Server:
    """Serve ``root_dir`` as bucket ``bucket`` on 127.0.0.1, verifying
    SigV4 on every request when credentials are configured."""

    def __init__(
        self,
        root_dir: str,
        bucket: str = "warehouse",
        access_key: str | None = None,
        secret_key: str | None = None,
        region: str = "us-east-1",
    ) -> None:
        self.root_dir = os.path.abspath(root_dir)
        self.bucket = bucket
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _deny(self, code: int, msg: str) -> None:
                body = (
                    f"<?xml version='1.0'?><Error><Code>{msg}</Code></Error>"
                ).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/xml")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _verify(self) -> bool:
                if not outer.access_key:
                    return True  # anonymous store
                auth = self.headers.get("Authorization", "")
                if not auth.startswith("AWS4-HMAC-SHA256 "):
                    self._deny(403, "AccessDenied")
                    return False
                fields = dict(
                    kv.strip().split("=", 1)
                    for kv in auth[len("AWS4-HMAC-SHA256 ") :].split(",")
                )
                credential = fields.get("Credential", "")
                ak, datestamp, region, service, _term = (
                    credential.split("/") + [""] * 5
                )[:5]
                if ak != outer.access_key:
                    self._deny(403, "InvalidAccessKeyId")
                    return False
                signed = fields.get("SignedHeaders", "").split(";")
                parsed = urllib.parse.urlsplit(self.path)
                headers = {
                    h: self.headers.get(h, "") for h in signed
                }
                expect = _signature(
                    outer.secret_key or "",
                    self.command,
                    urllib.parse.unquote(parsed.path),
                    parsed.query,
                    headers,
                    signed,
                    self.headers.get("x-amz-content-sha256", _EMPTY_SHA256),
                    self.headers.get("x-amz-date", ""),
                    (datestamp, region, service),
                )
                if not hmac.compare_digest(expect, fields.get("Signature", "")):
                    self._deny(403, "SignatureDoesNotMatch")
                    return False
                return True

            def _object_path(self, key: str) -> str | None:
                full = os.path.abspath(os.path.join(outer.root_dir, key))
                if not full.startswith(outer.root_dir + os.sep):
                    return None  # traversal
                return full if os.path.isfile(full) else None

            def do_GET(self):
                if not self._verify():
                    return
                parsed = urllib.parse.urlsplit(self.path)
                parts = urllib.parse.unquote(parsed.path).lstrip("/").split("/", 1)
                if parts[0] != outer.bucket:
                    self._deny(404, "NoSuchBucket")
                    return
                if len(parts) == 1 or not parts[1]:
                    self._list(parsed.query)
                    return
                full = self._object_path(parts[1])
                if full is None:
                    self._deny(404, "NoSuchKey")
                    return
                with open(full, "rb") as fh:
                    data = fh.read()
                etag = hashlib.md5(data).hexdigest()
                rng = self.headers.get("Range")
                status = 200
                if rng and rng.startswith("bytes="):
                    lo_s, _, hi_s = rng[6:].partition("-")
                    lo = int(lo_s) if lo_s else 0
                    hi = int(hi_s) if hi_s else len(data) - 1
                    data = data[lo : hi + 1]
                    status = 206
                self.send_response(status)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(data)))
                self.send_header("ETag", f'"{etag}"')
                self.end_headers()
                self.wfile.write(data)

            def _list(self, query: str) -> None:
                q = dict(urllib.parse.parse_qsl(query))
                prefix = q.get("prefix", "")
                entries = []
                for base, _dirs, files in os.walk(outer.root_dir):
                    for f in files:
                        full = os.path.join(base, f)
                        key = os.path.relpath(full, outer.root_dir).replace(
                            os.sep, "/"
                        )
                        if key.startswith(prefix):
                            with open(full, "rb") as fh:
                                etag = hashlib.md5(fh.read()).hexdigest()
                            entries.append((key, os.path.getsize(full), etag))
                entries.sort()
                contents = "".join(
                    f"<Contents><Key>{k}</Key><Size>{sz}</Size>"
                    f"<ETag>&quot;{etag}&quot;</ETag></Contents>"
                    for k, sz, etag in entries
                )
                body = (
                    "<?xml version='1.0' encoding='UTF-8'?>"
                    "<ListBucketResult xmlns='http://s3.amazonaws.com/doc/2006-03-01/'>"
                    f"<Name>{outer.bucket}</Name><Prefix>{prefix}</Prefix>"
                    f"<KeyCount>{len(entries)}</KeyCount><IsTruncated>false"
                    f"</IsTruncated>{contents}</ListBucketResult>"
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/xml")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_HEAD(self):
                if not self._verify():
                    return
                parsed = urllib.parse.urlsplit(self.path)
                parts = urllib.parse.unquote(parsed.path).lstrip("/").split("/", 1)
                full = (
                    self._object_path(parts[1])
                    if len(parts) == 2 and parts[0] == outer.bucket
                    else None
                )
                if full is None:
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(os.path.getsize(full)))
                self.end_headers()

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def endpoint(self) -> str:
        return f"127.0.0.1:{self.port}"

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()


# ---------------------------------------------------------------------------
# engine hook: s3:// path resolution
# ---------------------------------------------------------------------------


def client_from_secrets(
    secrets: dict[str, dict[str, str]], path: str | None = None
) -> S3Client | None:
    """Build a client from the engine's CREATE SECRET store (dialect
    state), DuckDB key spellings and DuckDB resolution: the secret with
    the longest matching SCOPE prefix wins; among equal matches the most
    recently created one does (insertion order)."""
    best = None
    best_rank = (-1, -1)
    for idx, kv in enumerate(secrets.values()):
        if kv.get("type", "").lower() != "s3":
            continue
        if not kv.get("endpoint"):
            continue
        scope = kv.get("scope", "")
        if scope and path is not None and not path.startswith(scope):
            continue
        rank = (len(scope), idx)
        if rank > best_rank:
            best, best_rank = kv, rank
    if best is None:
        return None
    return S3Client(
        best["endpoint"],
        access_key=best.get("key_id"),
        secret_key=best.get("secret"),
        region=best.get("region", "us-east-1"),
        use_ssl=best.get("use_ssl", "").lower() not in ("false", "0"),
    )


def resolve_s3_paths(
    paths: tuple[str, ...], secrets: dict[str, dict[str, str]]
) -> tuple[str, ...]:
    """Spool every ``s3://bucket/key`` URI (globs via ListObjectsV2) to a
    local cache and return the local paths; non-s3 paths pass through.
    Cache key = (endpoint, uri, etag), so re-reads of unchanged objects
    cost one signed GET per process lifetime and zero bytes."""
    import re
    import tempfile

    def glob_re(pat: str) -> "re.Pattern[str]":
        # DuckDB glob semantics: '*' stays within a path segment,
        # '**' crosses segments, '?' is one non-separator char
        out, i = [], 0
        while i < len(pat):
            c = pat[i]
            if c == "*":
                if pat[i : i + 2] == "**":
                    out.append(".*")
                    i += 2
                    continue
                out.append("[^/]*")
            elif c == "?":
                out.append("[^/]")
            elif c == "[":
                j = pat.find("]", i + 1)
                if j == -1:
                    out.append(re.escape(c))
                else:
                    out.append(pat[i : j + 1])
                    i = j + 1
                    continue
            else:
                out.append(re.escape(c))
            i += 1
        return re.compile("".join(out) + r"\Z")

    if not any(p.startswith("s3://") for p in paths):
        return paths
    first_s3 = next(p for p in paths if p.startswith("s3://"))
    client = client_from_secrets(secrets, first_s3)
    if client is None:
        raise ValueError(
            "s3:// path but no s3 secret configured — "
            "CREATE SECRET (TYPE s3, ENDPOINT …, KEY_ID …, SECRET …) first"
        )
    spool = os.path.join(tempfile.gettempdir(), "dss_s3_spool")
    os.makedirs(spool, exist_ok=True)
    out: list[str] = []
    for p in paths:
        if not p.startswith("s3://"):
            out.append(p)
            continue
        bucket, _, key = p[5:].partition("/")
        # one listing resolves both globs and cache keys: the returned
        # ETags let unchanged objects hit the spool without a GET
        prefix = key.split("*")[0].split("?")[0].split("[")[0]
        listed = {o["key"]: o["etag"] for o in client.list_objects(bucket, prefix)}
        if any(ch in key for ch in "*?["):
            pat = glob_re(key)
            keys = [k for k in listed if pat.match(k)]
        else:
            keys = [key] if key in listed else []
        if not keys:
            raise FileNotFoundError(f"no objects match {p}")
        for k in sorted(keys):
            digest = hashlib.md5(
                f"{client.endpoint}/{bucket}/{k}/{listed[k]}".encode()
            ).hexdigest()[:16]
            local = os.path.join(spool, digest + "_" + os.path.basename(k))
            if not os.path.exists(local):
                body, _etag = client.get_object(bucket, k)
                tmp = local + f".tmp{os.getpid()}"
                with open(tmp, "wb") as fh:
                    fh.write(body)
                os.replace(tmp, local)
            out.append(local)
    return tuple(out)
