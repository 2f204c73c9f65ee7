"""S3 conditional-write protocol over real HTTP — server + client.

The commit path documents a 3-call S3 mapping (commitstore.py module
docstring, mirroring the reference's opendal S3 accessors,
src/moonlink/src/storage/filesystem/s3/ and accessor_config.rs):

- ``put_if_absent`` → PutObject + ``If-None-Match: *`` (412 if the key
  exists — S3 conditional writes, public API since 2024);
- pointer CAS      → PutObject + ``If-Match: <etag>`` retry loop that
  keeps the max version;
- reads            → GetObject / HeadObject / ListObjectsV2.

This module makes that contract EXECUTABLE without boto or network:

- :class:`S3HttpServer` — a minimal in-process S3-flavored object
  server (stdlib ``http.server``, in-memory bucket, one lock) that
  implements exactly the semantics above: conditional PUT (If-None-
  Match / If-Match on quoted-md5 ETags), GET/HEAD/DELETE, and
  paginated ListObjectsV2 XML.
- :class:`S3HttpCommitStore` — the full commit-store API
  (put_if_absent / put / pointers / read / exists / list / delete)
  spoken over those HTTP calls with urllib. Registered under the
  ``s3test://host:port/prefix`` scheme (commitstore.store_for), with a
  matching GetObject fetcher for the worker file cache — so the whole
  write plane (create → bulk load → MERGE → maintenance → expire →
  scan/lookup) runs against a real HTTP object store in tests. A real
  S3 deployment swaps the transport for SigV4-signed requests; every
  call shape and status-code contract is the one tested here.

The server is test infrastructure; the client is the deployable
protocol implementation.
"""

from __future__ import annotations

import hashlib
import http.server
import posixpath
import threading
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

# ------------------------------------------------------------- server


class _Bucket:
    def __init__(self):
        self.lock = threading.Lock()
        self.objects: dict[str, bytes] = {}

    @staticmethod
    def etag(data: bytes) -> str:
        return f'"{hashlib.md5(data).hexdigest()}"'


class _Handler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "moonray-s3http/1"

    def log_message(self, *a):  # quiet
        pass

    @property
    def bucket(self) -> _Bucket:
        return self.server.bucket  # type: ignore[attr-defined]

    def _key(self) -> str:
        return urllib.parse.unquote(
            urllib.parse.urlsplit(self.path).path).lstrip("/")

    def _respond(self, code: int, body: bytes = b"",
                 etag: str | None = None,
                 ctype: str = "application/octet-stream") -> None:
        self.send_response(code)
        if etag:
            self.send_header("ETag", etag)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body and self.command != "HEAD":
            self.wfile.write(body)

    # -- PutObject: blind / If-None-Match:* create / If-Match CAS -----
    def do_PUT(self):
        key = self._key()
        length = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(length)
        if_none = self.headers.get("If-None-Match")
        if_match = self.headers.get("If-Match")
        b = self.bucket
        with b.lock:  # conditional check + write is one atomic step
            cur = b.objects.get(key)
            if if_none == "*" and cur is not None:
                return self._respond(412)
            if if_match is not None and (
                    cur is None or _Bucket.etag(cur) != if_match):
                return self._respond(412)
            b.objects[key] = data
            return self._respond(200, etag=_Bucket.etag(data))

    def do_GET(self):
        split = urllib.parse.urlsplit(self.path)
        q = urllib.parse.parse_qs(split.query)
        if "list-type" in q:
            return self._list(q)
        key = self._key()
        with self.bucket.lock:
            data = self.bucket.objects.get(key)
        if data is None:
            return self._respond(404)
        self._respond(200, data, etag=_Bucket.etag(data))

    def do_HEAD(self):
        key = self._key()
        with self.bucket.lock:
            data = self.bucket.objects.get(key)
        if data is None:
            return self._respond(404)
        self._respond(200, data, etag=_Bucket.etag(data))

    def do_DELETE(self):
        key = self._key()
        with self.bucket.lock:
            self.bucket.objects.pop(key, None)
        self._respond(204)

    # -- ListObjectsV2 (sorted keys, continuation-token pagination) ---
    def _list(self, q):
        prefix = q.get("prefix", [""])[0]
        token = q.get("continuation-token", [""])[0]
        max_keys = int(q.get("max-keys", ["1000"])[0])
        with self.bucket.lock:
            keys = sorted(k for k in self.bucket.objects
                          if k.startswith(prefix) and k > token)
        page, rest = keys[:max_keys], keys[max_keys:]
        parts = ["<?xml version='1.0'?><ListBucketResult>"]
        parts.append(f"<IsTruncated>{'true' if rest else 'false'}"
                     "</IsTruncated>")
        if rest:
            parts.append(f"<NextContinuationToken>{escape(page[-1])}"
                         "</NextContinuationToken>")
        for k in page:
            parts.append(f"<Contents><Key>{escape(k)}</Key></Contents>")
        parts.append("</ListBucketResult>")
        self._respond(200, "".join(parts).encode(), ctype="application/xml")


class S3HttpServer:
    """In-process S3-protocol object server bound to 127.0.0.1:0."""

    def __init__(self):
        self.bucket = _Bucket()
        self._httpd = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), _Handler)
        self._httpd.bucket = self.bucket  # type: ignore[attr-defined]
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def root(self, prefix: str = "") -> str:
        """A table root served by this server:
        ``s3test://127.0.0.1:<port>/<prefix>``."""
        return f"s3test://127.0.0.1:{self.port}/{prefix}".rstrip("/")

    def shutdown(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)


# ------------------------------------------------------------- client


class S3HttpCommitStore:
    """The commit-store API over the S3 conditional-write HTTP calls.
    Stateless and picklable — Ray workers construct one per publish."""

    SCHEME = "s3test://"

    def __init__(self, root: str):
        assert root.startswith(self.SCHEME), root
        rest = root[len(self.SCHEME):]
        host, _, prefix = rest.partition("/")
        self.base = f"http://{host}"
        self.prefix = prefix.strip("/")
        self.root = root

    # -- transport ----------------------------------------------------
    def _url(self, key: str) -> str:
        return f"{self.base}/{urllib.parse.quote(key, safe='/')}"

    def _full(self, rel: str) -> str:
        return posixpath.join(self.prefix, rel) if self.prefix else rel

    def _req(self, method: str, url: str, data: bytes | None = None,
             headers: dict | None = None):
        """→ (status, body, etag); HTTP errors become statuses."""
        req = urllib.request.Request(url, data=data, method=method,
                                     headers=headers or {})
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                return resp.status, resp.read(), resp.headers.get("ETag")
        except urllib.error.HTTPError as e:
            body = e.read()
            e.close()
            return e.code, body, e.headers.get("ETag")

    # -- write plane --------------------------------------------------
    def put_if_absent(self, rel: str, data: bytes) -> None:
        """PutObject + ``If-None-Match: *`` — the concurrent-writer
        guard: 412 means another committer created this version."""
        from moonray import chaos
        from moonray.commitstore import CommitConflict

        if chaos.config_for(self.root):
            # pre-effect only: a post-PUT retry would see its own
            # object and mis-report CommitConflict (same contract as
            # LocalCommitStore.put_if_absent)
            chaos.with_io_retries(
                lambda: chaos.maybe_fault(self.root, rel, "commit"))
        status, _, _ = self._req("PUT", self._url(self._full(rel)),
                                 data=data,
                                 headers={"If-None-Match": "*"})
        if status == 412:
            raise CommitConflict(
                f"{rel} already committed — concurrent writer detected.")
        if status != 200:
            raise OSError(f"PUT {rel} failed with HTTP {status}")

    def put(self, rel: str, local_path: str) -> None:
        """Blind PutObject of a complete immutable object (content/
        job-named: concurrent writers carry identical bytes)."""
        from moonray import chaos

        with open(local_path, "rb") as f:
            data = f.read()

        def _once():
            chaos.maybe_fault(self.root, rel, "commit")
            status, _, _ = self._req("PUT", self._url(self._full(rel)),
                                     data=data)
            if status != 200:
                raise OSError(f"PUT {rel} failed with HTTP {status}")

        chaos.with_io_retries(_once)

    def set_pointer(self, name: str, value: str) -> None:
        status, _, _ = self._req("PUT", self._url(self._full(name)),
                                 data=value.encode())
        if status != 200:
            raise OSError(f"PUT pointer {name} failed with HTTP {status}")

    def advance_pointer(self, name: str, value: int) -> None:
        """Monotonic pointer swap as an ``If-Match`` CAS retry loop
        keeping the max value — the documented S3 mapping for
        concurrent committers (no flock on an object store)."""
        url = self._url(self._full(name))
        while True:
            status, body, etag = self._req("GET", url)
            if status == 404:
                s, _, _ = self._req("PUT", url, data=str(value).encode(),
                                    headers={"If-None-Match": "*"})
                if s == 412:
                    continue  # racer created it; re-read and CAS
                if s != 200:
                    raise OSError(f"pointer create HTTP {s}")
                return
            if status != 200:
                raise OSError(f"pointer read HTTP {status}")
            try:
                cur = int(body.decode().strip())
            except ValueError:
                cur = -1
            if value <= cur:
                return
            s, _, _ = self._req("PUT", url, data=str(value).encode(),
                                headers={"If-Match": etag})
            if s == 200:
                return
            if s != 412:
                raise OSError(f"pointer CAS HTTP {s}")
            # 412: somebody advanced it meanwhile — re-read, keep max

    # -- read plane ---------------------------------------------------
    def read(self, rel: str) -> bytes:
        status, body, _ = self._req("GET", self._url(self._full(rel)))
        if status == 404:
            raise FileNotFoundError(rel)
        if status != 200:
            raise OSError(f"GET {rel} failed with HTTP {status}")
        return body

    def read_pointer(self, name: str) -> str:
        return self.read(name).decode().strip()

    def exists(self, rel: str) -> bool:
        status, _, _ = self._req("HEAD", self._url(self._full(rel)))
        return status == 200

    def list(self, prefix: str) -> list[str]:
        """ListObjectsV2 with continuation-token pagination → sorted
        root-relative paths."""
        full = self._full(prefix)
        strip = f"{self.prefix}/" if self.prefix else ""
        # match the local store's directory semantics: list("a") must
        # not return "abc" — constrain to the prefix as a path segment
        want = full.rstrip("/") + "/" if full else ""
        out, token = [], ""
        while True:
            q = {"list-type": "2", "prefix": want, "max-keys": "500"}
            if token:
                q["continuation-token"] = token
            status, body, _ = self._req(
                "GET", f"{self.base}/?{urllib.parse.urlencode(q)}")
            if status != 200:
                raise OSError(f"LIST {prefix} failed with HTTP {status}")
            doc = ET.fromstring(body.decode())
            for c in doc.iter("Key"):
                out.append(c.text[len(strip):])
            if doc.findtext("IsTruncated") != "true":
                break
            token = doc.findtext("NextContinuationToken") or ""
            if not token:
                break
        return sorted(out)

    def delete(self, rel: str) -> None:
        status, _, _ = self._req("DELETE", self._url(self._full(rel)))
        if status not in (200, 204, 404):
            raise OSError(f"DELETE {rel} failed with HTTP {status}")


def s3test_fetch(root: str, rel: str, dst: str) -> None:
    """File-cache fetcher (GetObject → local file) for s3test:// roots."""
    data = S3HttpCommitStore(root).read(rel)
    with open(dst, "wb") as f:
        f.write(data)
