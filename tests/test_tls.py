"""TLS certificate validation against a loopback self-signed HTTPS
server — the python mirror of the reference's
test/fixtures/self-signed-server.ts + test/test.cert-validation.ts:
default (allow_insecure_certs=False) rejects the self-signed cert
(BROKEN), allow_insecure_certs=True accepts it (OK)."""

import datetime
import ssl
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from linkinator_ray.options import CheckOptions
from linkinator_ray.pipelines.crawl import LinkChecker
from linkinator_ray.stages.fetch import TransportError
from linkinator_ray.stages.http_transport import HttpTransport


def _self_signed_cert(tmp_path):
    """Generate a self-signed localhost certificate (the fixture the
    reference ships as a static PEM; generated here so nothing is
    copied)."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(days=1))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(x509.SubjectAlternativeName(
            [x509.DNSName("localhost"),
             x509.IPAddress(__import__("ipaddress").ip_address("127.0.0.1"))]),
            critical=False)
        .sign(key, hashes.SHA256())
    )
    cert_path = tmp_path / "cert.pem"
    key_path = tmp_path / "key.pem"
    cert_path.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_path.write_bytes(key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption()))
    return str(cert_path), str(key_path)


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def _respond(self, body: bool):
        data = b"<html><body>secure hello</body></html>"
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        if body:
            self.wfile.write(data)

    def do_GET(self):
        self._respond(True)

    def do_HEAD(self):
        self._respond(False)


@pytest.fixture(scope="module")
def tls_server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tls")
    cert, key = _self_signed_cert(tmp)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"https://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_transport_rejects_self_signed(tls_server):
    t = HttpTransport(timeout=5)  # default: verify certs
    with pytest.raises(TransportError):
        t.request(f"{tls_server}/", "GET")
    assert t.calls[-1][2] == 0  # logged as a status-0 transport error


def test_transport_accepts_self_signed_when_insecure(tls_server):
    t = HttpTransport(timeout=5, allow_insecure_certs=True)
    resp = t.request(f"{tls_server}/", "GET")
    assert resp.status == 200


def test_crawl_cert_validation(tls_server):
    """Engine-level parity with test.cert-validation.ts: default →
    BROKEN (status 0), allow_insecure_certs → OK."""
    rejected = LinkChecker(
        CheckOptions(paths=[f"{tls_server}/"], transport="http",
                     timeout=5000),
        use_ray=False).check()
    row = rejected.results.to_pylist()[0]
    assert row["state"] == "BROKEN"
    assert not rejected.passed

    accepted = LinkChecker(
        CheckOptions(paths=[f"{tls_server}/"], transport="http",
                     timeout=5000, allow_insecure_certs=True),
        use_ray=False).check()
    row = accepted.results.to_pylist()[0]
    assert row["state"] == "OK"
    assert accepted.passed
