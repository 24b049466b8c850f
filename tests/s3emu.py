"""Minimal in-memory S3 REST emulator (stdlib only) for exercising the
REAL pyarrow S3 client end-to-end without network egress.

Implements exactly the surface Arrow's S3FileSystem uses: HEAD bucket /
object, ranged GET, PUT object, DELETE, ListObjectsV2 (XML), and the
multipart-upload trio (initiate / UploadPart / complete) that Arrow's
output streams speak. Auth headers are accepted and ignored (SigV4 is
the client's concern; the test asserts data-plane behavior).

Threaded so concurrent Spark executor reads work. NOT a general S3 —
just enough protocol for the scan/write stack, kept honest by the
round-trip assertions in tests/test_s3_roundtrip.py.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse


class _Store:
    def __init__(self):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.buckets: set[str] = set()
        self.uploads: dict[str, dict[int, bytes]] = {}
        self.lock = threading.Lock()
        self.counter = 0
        self.faults: FaultSchedule | None = None


class FaultSchedule:
    """Deterministic fault injection for retry-path testing
    (verdict r6 #4): the first ``per_key`` attempts of each distinct
    data-plane request — keyed (verb, bucket, key, Range header) so a
    RETRY of the same ranged GET is recognized as such — fail with
    ``mode`` before the request is served normally.

    Modes:
      '503'      → 503 SlowDown XML error (AWS throttle; SDK retryable)
      '500'      → 500 InternalError XML error (SDK retryable)
      'truncate' → 200 with the full Content-Length but only half the
                   body, then connection close (short read → the SDK
                   treats it as a network error and retries)
      'drop'     → TCP shutdown with no response at all

    ``injected`` counts applied faults, so tests can assert the retry
    path actually ran (per_key > 0 and a passing read PROVES at least
    per_key retries happened per touched request)."""

    def __init__(self, mode: str = "503", per_key: int = 2,
                 verbs: tuple[str, ...] = ("GET", "PUT", "POST")):
        assert mode in ("503", "500", "truncate", "drop")
        self.mode = mode
        self.per_key = per_key
        self.verbs = set(verbs)
        self.attempts: dict[tuple, int] = {}
        self.injected = 0
        self.lock = threading.Lock()

    def take(self, verb: str, bucket: str, key: str, rng: str | None) -> bool:
        """True if THIS attempt should fail (and record it)."""
        if verb not in self.verbs or not key:
            return False  # keep bucket-level ops (client init, list) clean
        k = (verb, bucket, key, rng)
        with self.lock:
            n = self.attempts.get(k, 0)
            self.attempts[k] = n + 1
            if n < self.per_key:
                self.injected += 1
                return True
        return False


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    store: _Store  # set by serve()

    def log_message(self, *a):  # quiet
        pass

    def _split(self):
        u = urlparse(self.path)
        parts = unquote(u.path).lstrip("/").split("/", 1)
        bucket = parts[0]
        key = parts[1] if len(parts) > 1 else ""
        return bucket, key, parse_qs(u.query, keep_blank_values=True)

    def _send(self, code: int, body: bytes = b"", headers: dict | None = None):
        self.send_response(code)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _read_body(self) -> bytes:
        if self.headers.get("Transfer-Encoding", "").lower() == "chunked":
            out = []
            while True:
                line = self.rfile.readline().strip()
                # aws-chunked extensions: "SIZE;chunk-signature=..."
                size = int(line.split(b";")[0], 16)
                if size == 0:
                    # trailing headers until blank line
                    while self.rfile.readline().strip():
                        pass
                    break
                out.append(self.rfile.read(size))
                self.rfile.readline()  # CRLF
            return b"".join(out)
        n = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(n) if n else b""
        # SigV4 streaming payloads arrive with Content-Encoding aws-chunked
        if "aws-chunked" in self.headers.get("Content-Encoding", ""):
            out, i = [], 0
            while i < len(raw):
                j = raw.index(b"\r\n", i)
                size = int(raw[i:j].split(b";")[0], 16)
                if size == 0:
                    break
                out.append(raw[j + 2 : j + 2 + size])
                i = j + 2 + size + 2
            return b"".join(out)
        return raw

    def _maybe_fault(self, verb: str, bucket: str, key: str,
                     body_reader=None) -> bool:
        """Apply the store's fault schedule to this request; returns True
        when a fault was injected (response already handled). PUT/POST
        bodies are drained first so the failure happens after upload —
        the harder retry case (client must re-send the payload)."""
        f = self.store.faults
        if f is None:
            return False
        if not f.take(verb, bucket, key, self.headers.get("Range")):
            return False
        if body_reader is not None:
            try:
                body_reader()
            except Exception:
                pass
        if f.mode == "503":
            self.close_connection = True
            self._send(503, b"<Error><Code>SlowDown</Code>"
                            b"<Message>injected</Message></Error>",
                       {"Content-Type": "application/xml"})
        elif f.mode == "500":
            self.close_connection = True
            self._send(500, b"<Error><Code>InternalError</Code>"
                            b"<Message>injected</Message></Error>",
                       {"Content-Type": "application/xml"})
        elif f.mode == "truncate":
            data = self.store.objects.get((bucket, key), b"x" * 64)
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                lo_s, hi_s = rng[6:].split("-", 1)
                lo = int(lo_s) if lo_s else 0
                hi = min(int(hi_s) if hi_s else len(data) - 1, len(data) - 1)
                data = data[lo:hi + 1]
            self.close_connection = True
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data[: max(len(data) // 2, 1)])
            # short body + connection close → client-side short read
        else:  # drop
            self.close_connection = True
            try:
                import socket as _s

                self.connection.shutdown(_s.SHUT_RDWR)
            except Exception:
                pass
        return True

    # ---- verbs -----------------------------------------------------
    def do_HEAD(self):
        bucket, key, _ = self._split()
        st = self.store
        if not key:
            if bucket in st.buckets:
                self._send(200)
            else:
                self._send(404)
            return
        data = st.objects.get((bucket, key))
        if data is None:
            self._send(404)
        else:
            self._send(200, headers={"Content-Length-Hint": str(len(data)),
                                     "ETag": '"emu"',
                                     "Last-Modified": "Thu, 01 Jan 2026 00:00:00 GMT",
                                     "Accept-Ranges": "bytes"})
            # BaseHTTPRequestHandler already wrote Content-Length: 0 via
            # _send; S3 HEAD needs the REAL length — resend properly:

    def do_GET(self):
        bucket, key, q = self._split()
        st = self.store
        if self._maybe_fault("GET", bucket, key):
            return
        if not key:
            # ListObjectsV2
            prefix = q.get("prefix", [""])[0]
            delim = q.get("delimiter", [""])[0]
            keys = sorted(
                k for (b, k) in st.objects if b == bucket and k.startswith(prefix)
            )
            contents, prefixes = [], []
            seen = set()
            for k in keys:
                if delim:
                    rest = k[len(prefix):]
                    if delim in rest:
                        p = prefix + rest.split(delim, 1)[0] + delim
                        if p not in seen:
                            seen.add(p)
                            prefixes.append(p)
                        continue
                contents.append(k)
            body = ["<?xml version='1.0'?><ListBucketResult>",
                    f"<Name>{bucket}</Name><IsTruncated>false</IsTruncated>",
                    f"<KeyCount>{len(contents) + len(prefixes)}</KeyCount>"]
            for k in contents:
                size = len(st.objects[(bucket, k)])
                body.append(
                    f"<Contents><Key>{_xml_escape(k)}</Key><Size>{size}</Size>"
                    "<ETag>\"emu\"</ETag>"
                    "<LastModified>2026-01-01T00:00:00.000Z</LastModified>"
                    "<StorageClass>STANDARD</StorageClass></Contents>"
                )
            for p in prefixes:
                body.append(
                    f"<CommonPrefixes><Prefix>{_xml_escape(p)}</Prefix></CommonPrefixes>"
                )
            body.append("</ListBucketResult>")
            self._send(200, "".join(body).encode(),
                       {"Content-Type": "application/xml"})
            return
        data = st.objects.get((bucket, key))
        if data is None:
            self._send(404, b"<Error><Code>NoSuchKey</Code></Error>")
            return
        rng = self.headers.get("Range")
        if rng and rng.startswith("bytes="):
            lo_s, hi_s = rng[6:].split("-", 1)
            lo = int(lo_s) if lo_s else 0
            hi = int(hi_s) if hi_s else len(data) - 1
            hi = min(hi, len(data) - 1)
            part = data[lo : hi + 1]
            self._send(206, part, {
                "Content-Range": f"bytes {lo}-{hi}/{len(data)}",
                "Accept-Ranges": "bytes",
                "ETag": '"emu"',
                "Last-Modified": "Thu, 01 Jan 2026 00:00:00 GMT",
            })
        else:
            self._send(200, data, {
                "Accept-Ranges": "bytes",
                "ETag": '"emu"',
                "Last-Modified": "Thu, 01 Jan 2026 00:00:00 GMT",
            })

    def do_PUT(self):
        bucket, key, q = self._split()
        st = self.store
        if self._maybe_fault("PUT", bucket, key, body_reader=self._read_body):
            return
        body = self._read_body()
        if not key:
            st.buckets.add(bucket)
            self._send(200)
            return
        if "partNumber" in q and "uploadId" in q:
            uid = q["uploadId"][0]
            with st.lock:
                st.uploads.setdefault(uid, {})[int(q["partNumber"][0])] = body
            self._send(200, headers={"ETag": f'"part-{q["partNumber"][0]}"'})
            return
        st.buckets.add(bucket)
        st.objects[(bucket, key)] = body
        self._send(200, headers={"ETag": '"emu"'})

    def do_POST(self):
        bucket, key, q = self._split()
        st = self.store
        if self._maybe_fault("POST", bucket, key, body_reader=self._read_body):
            return
        body = self._read_body()  # noqa: F841  (CompleteMultipartUpload XML)
        if "uploads" in q:
            with st.lock:
                st.counter += 1
                uid = f"up{st.counter}"
                st.uploads[uid] = {}
            xml = (f"<?xml version='1.0'?><InitiateMultipartUploadResult>"
                   f"<Bucket>{bucket}</Bucket><Key>{_xml_escape(key)}</Key>"
                   f"<UploadId>{uid}</UploadId></InitiateMultipartUploadResult>")
            self._send(200, xml.encode(), {"Content-Type": "application/xml"})
            return
        if "uploadId" in q:
            uid = q["uploadId"][0]
            with st.lock:
                parts = st.uploads.pop(uid, {})
            st.buckets.add(bucket)
            st.objects[(bucket, key)] = b"".join(
                parts[i] for i in sorted(parts)
            )
            xml = (f"<?xml version='1.0'?><CompleteMultipartUploadResult>"
                   f"<Bucket>{bucket}</Bucket><Key>{_xml_escape(key)}</Key>"
                   f"<ETag>\"emu\"</ETag></CompleteMultipartUploadResult>")
            self._send(200, xml.encode(), {"Content-Type": "application/xml"})
            return
        self._send(400)

    def do_DELETE(self):
        bucket, key, q = self._split()
        st = self.store
        if "uploadId" in q:
            st.uploads.pop(q["uploadId"][0], None)
            self._send(204)
            return
        if key:
            st.objects.pop((bucket, key), None)
        else:
            st.buckets.discard(bucket)
        self._send(204)


class _HeadFixedHandler(_Handler):
    """HEAD must carry the object's true Content-Length (Arrow sizes files
    from it); BaseHTTPRequestHandler lets us send headers manually."""

    def do_HEAD(self):  # override with correct Content-Length
        bucket, key, _ = self._split()
        st = self.store
        if not key:
            self._send(200 if bucket in st.buckets else 404)
            return
        data = st.objects.get((bucket, key))
        if data is None:
            self._send(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.send_header("ETag", '"emu"')
        self.send_header("Last-Modified", "Thu, 01 Jan 2026 00:00:00 GMT")
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()
        # no body for HEAD


def serve(port: int = 0):
    """Start the emulator on 127.0.0.1:port (0 = ephemeral). Returns
    (server, actual_port, store); call server.shutdown() to stop."""
    store = _Store()
    handler = type("H", (_HeadFixedHandler,), {"store": store})
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1], store
