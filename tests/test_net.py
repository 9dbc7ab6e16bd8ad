"""HTTP(S) byte source (net.py — the opusfile http.c equivalent,
reference: /root/reference/third_party/opus/opusfile/src/http.c).

Zero-egress environment: every test runs against an in-process
localhost server.  The server implements RFC 7233 single-range
requests with keep-alive, plus switchable misbehaviors (no Range
support, chunked bodies, redirects, lying Content-Range) to exercise
the client's fallback paths.
"""

import http.server
import pathlib
import socket
import ssl
import subprocess
import threading

import numpy as np
import pytest

import libnyquist_tpu as nq
from libnyquist_tpu.net import (
    CHUNK_MIN, NCONNS_MAX, REDIRECT_LIMIT, HTTPSource, NetworkError,
    open_url,
)
from libnyquist_tpu.streaming import seek_reader

REF = pathlib.Path("/root/reference/test_data")
FIX = pathlib.Path(__file__).parent / "fixtures"


class _RangeHandler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):
        pass

    def do_GET(self):
        cfg = self.server.cfg
        self.server.hits += 1
        # redirect chain: /r/<n>/<path> -> /r/<n-1>/<path> -> ... /<path>
        if self.path.startswith("/r/"):
            _, _, n, rest = self.path.split("/", 3)
            n = int(n)
            loc = f"/{rest}" if n <= 1 else f"/r/{n - 1}/{rest}"
            self.send_response(302)
            self.send_header("Location", loc)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if self.path == "/missing":
            self.send_response(404)
            self.send_header("Content-Length", "9")
            self.end_headers()
            self.wfile.write(b"not found")
            return
        if self.path == "/loop":
            self.send_response(302)
            self.send_header("Location", "/loop")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        body = self.server.payload
        rng = self.headers.get("Range")
        if rng and cfg.get("ranges", True):
            spec = rng.split("=", 1)[1].split(",")[0].strip()
            lo_s, hi_s = spec.split("-", 1)
            lo = int(lo_s)
            hi = int(hi_s) if hi_s else len(body) - 1
            hi = min(hi, len(body) - 1)
            if lo >= len(body):
                self.send_response(416)
                self.send_header("Content-Range", f"bytes */{len(body)}")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            part = body[lo : hi + 1]
            self.send_response(206)
            start = lo + cfg.get("range_lie", 0)
            total = cfg.get("total_lie", len(body))
            self.send_header("Content-Range",
                             f"bytes {start}-{hi}/{total}")
            self.send_header("Content-Length", str(len(part)))
            self.end_headers()
            self.wfile.write(part)
            return
        self.send_response(200)
        if cfg.get("chunked"):
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            if cfg.get("chunk_lie"):
                # advertise an absurd chunk then hang up
                self.wfile.write(b"ffffffffff\r\n")
                self.close_connection = True
                return
            for i in range(0, len(body), 9973):
                c = body[i : i + 9973]
                self.wfile.write(b"%x\r\n" % len(c) + c + b"\r\n")
            self.wfile.write(b"0\r\n\r\n")
            return
        self.send_header("Content-Length",
                         str(cfg.get("cl_lie", len(body))))
        self.end_headers()
        self.wfile.write(body)


class _Server(http.server.ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, payload, cfg=None, certfile=None):
        super().__init__(("127.0.0.1", 0), _RangeHandler)
        self.payload = payload
        self.cfg = cfg or {}
        self.hits = 0
        self.conns = 0
        if certfile:
            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(certfile)
            self.socket = ctx.wrap_socket(self.socket, server_side=True)

    def get_request(self):
        req = super().get_request()
        self.conns += 1
        return req

    def handle_error(self, request, client_address):
        pass   # expected: client-aborted TLS handshakes in tests


@pytest.fixture
def serve():
    servers = []

    def start(payload, cfg=None, certfile=None):
        s = _Server(payload, cfg, certfile)
        threading.Thread(target=s.serve_forever, daemon=True).start()
        servers.append(s)
        scheme = "https" if certfile else "http"
        return s, f"{scheme}://127.0.0.1:{s.server_address[1]}"

    yield start
    for s in servers:
        s.shutdown()
        s.server_close()


OPUS = REF / "ad_hoc" / "detodos.opus"
pytestmark = pytest.mark.skipif(not OPUS.exists(),
                                reason="reference corpus absent")


def test_seek_reader_over_http_bit_exact(serve):
    data = OPUS.read_bytes()
    srv, base = serve(data)
    src = HTTPSource(f"{base}/detodos.opus")
    assert src.seekable and src.size == len(data)
    r = seek_reader(src)
    ref = seek_reader(data)
    assert r.pcm_total() == ref.pcm_total()
    mid = r.pcm_total() // 2
    for pos in (0, mid, r.pcm_total() - 4800, 1234):
        r.pcm_seek(pos)
        ref.pcm_seek(pos)
        a = r.read(4800)
        b = ref.read(4800)
        np.testing.assert_array_equal(a, b)
    # network cost stays bounded: bisection + reads, not O(file)
    assert src.requests < 60
    assert src.bytes_fetched < 2 * len(data)
    src.close()


def test_sequential_chunk_escalation(serve):
    data = bytes(range(256)) * 4096          # 1 MiB
    srv, base = serve(data)
    src = HTTPSource(f"{base}/x.bin")
    out = bytearray()
    pos = 0
    while pos < len(data):
        b = src.pread(pos, 65536)
        out += b
        pos += len(b)
    assert bytes(out) == data
    # doubling chunks: far fewer requests than 1MiB/64KiB reads
    assert src.requests <= 8
    src.close()


def test_load_url_matches_local(serve):
    data = OPUS.read_bytes()
    srv, base = serve(data)
    d = nq.load_url(f"{base}/detodos.opus")
    ref = nq.load(data, extension="opus")
    np.testing.assert_array_equal(d.samples, ref.samples)
    assert d.sample_rate == ref.sample_rate


def test_redirect_chain_followed(serve):
    data = OPUS.read_bytes()
    srv, base = serve(data)
    src = HTTPSource(f"{base}/r/3/detodos.opus")
    assert src.redirects == 3
    assert src.size == len(data)
    assert src.pread(0, 4) == data[:4]
    src.close()


def test_redirect_loop_bounded(serve):
    srv, base = serve(b"x")
    with pytest.raises(NetworkError, match="redirect limit"):
        HTTPSource(f"{base}/loop")
    assert srv.hits <= REDIRECT_LIMIT + 2


def test_no_range_server_buffers_whole_body(serve):
    data = OPUS.read_bytes()
    srv, base = serve(data, cfg={"ranges": False})
    src = HTTPSource(f"{base}/detodos.opus")
    assert not src.seekable
    assert src.size == len(data)
    r = seek_reader(src)
    r.pcm_seek(1000)
    ref = seek_reader(data)
    ref.pcm_seek(1000)
    np.testing.assert_array_equal(r.read(480), ref.read(480))
    # exactly one download, no per-read requests
    assert src.requests == 1
    src.close()


def test_chunked_200_body(serve):
    data = OPUS.read_bytes()
    srv, base = serve(data, cfg={"ranges": False, "chunked": True})
    src = HTTPSource(f"{base}/detodos.opus")
    assert src.size == len(data)
    assert src.pread(100, 64) == data[100:164]
    src.close()


def test_lying_content_range_rejected(serve):
    data = b"a" * (CHUNK_MIN * 8)
    srv, base = serve(data, cfg={"range_lie": 7})
    # bootstrap reads from 0 on the opener; a later far seek issues a
    # fresh range request whose (lied) start mismatches
    src = HTTPSource(f"{base}/x.bin")
    with pytest.raises(NetworkError, match="Content-Range start"):
        src.pread(len(data) - 16, 16)
    src.close()


def test_lying_content_length_bounded(serve):
    # a no-Range server advertising a 100 TB body must fail fast, not
    # buffer unbounded (net.py wire-size doctrine: BODY_BYTES_MAX)
    srv, base = serve(b"tiny", cfg={"ranges": False,
                                    "cl_lie": 100 * 2**40})
    with pytest.raises(NetworkError, match="Content-Length"):
        HTTPSource(f"{base}/x.bin")


def test_lying_chunk_size_bounded(serve):
    # chunked body advertising a ~1 TB chunk: rejected before any
    # attempt to buffer it (CHUNK_BYTES_MAX)
    srv, base = serve(b"tiny", cfg={"ranges": False, "chunked": True,
                                    "chunk_lie": True})
    with pytest.raises(NetworkError, match="chunk size"):
        HTTPSource(f"{base}/x.bin")


def test_lying_content_range_total_bounded(serve):
    # Content-Range total beyond the body bound poisons self.size and
    # every later pread window; reject at the bootstrap
    srv, base = serve(b"a" * 4096, cfg={"total_lie": 1 << 62})
    with pytest.raises(NetworkError, match="Content-Range total"):
        HTTPSource(f"{base}/x.bin")


def test_connection_pool_bounded(serve):
    data = OPUS.read_bytes()
    srv, base = serve(data)
    src = HTTPSource(f"{base}/detodos.opus")
    rng = np.random.default_rng(0)
    for off in rng.integers(0, len(data) - 64, 64):
        assert src.pread(int(off), 64) == data[off : off + 64]
    assert len(src._conns) <= NCONNS_MAX
    # keep-alive: far fewer TCP connections than requests
    assert srv.conns <= NCONNS_MAX + 2
    src.close()


@pytest.fixture(scope="module")
def self_signed(tmp_path_factory):
    d = tmp_path_factory.mktemp("tls")
    pem = d / "cert.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout",
         str(pem), "-out", str(pem), "-days", "2", "-nodes", "-subj",
         "/CN=127.0.0.1", "-addext", "subjectAltName=IP:127.0.0.1"],
        check=True, capture_output=True)
    return str(pem)


def test_https_self_signed(serve, self_signed):
    data = OPUS.read_bytes()
    srv, base = serve(data, certfile=self_signed)
    # verify=True must reject the unknown CA ...
    with pytest.raises((NetworkError, ssl.SSLError, OSError)):
        HTTPSource(f"{base}/x.opus")
    # ... and the OP_SSL_SKIP_CERTIFICATE_CHECK analog accepts it
    src = HTTPSource(f"{base}/detodos.opus", verify=False)
    assert src.size == len(data)
    r = open_url(f"{base}/detodos.opus", verify=False)
    ref = seek_reader(data)
    r.pcm_seek(4800)
    ref.pcm_seek(4800)
    np.testing.assert_array_equal(r.read(480), ref.read(480))
    src.close()


def test_scheme_and_error_surface():
    with pytest.raises(nq.NyquistError):
        HTTPSource("ftp://example/x.opus")
    # connection refused surfaces as OSError/NetworkError, not a hang
    free = socket.socket()
    free.bind(("127.0.0.1", 0))
    port = free.getsockname()[1]
    free.close()
    with pytest.raises((NetworkError, OSError)):
        HTTPSource(f"http://127.0.0.1:{port}/x", timeout=2.0)


def test_http_404_surfaces(serve):
    srv, base = serve(b"x")
    with pytest.raises(NetworkError, match="HTTP 404"):
        HTTPSource(f"{base}/missing")
