"""FromURL parity (readability.go:40-71): HTTP fetch + content-type gate,
exercised against a localhost server."""

import http.server
import os
import threading

import pytest

from conftest import TEST_PAGES, fixture_cases

from go_readability_spark.readability import from_url


@pytest.fixture(scope="module")
def httpd():
    fixture = os.path.join(TEST_PAGES, "001", "source.html")
    body = open(fixture, "rb").read() if os.path.exists(fixture) else b"<p>hello world</p>"

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/page.html":
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/data.json":
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b"{}")
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):
            pass

    server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_from_url_extracts(httpd):
    art = from_url(f"{httpd}/page.html", timeout=10)
    if fixture_cases():
        assert art.title == "Get your Frontend JavaScript Code Covered | Code"
    assert art.length > 0


def test_from_url_content_type_gate(httpd):
    with pytest.raises(ValueError, match="not a HTML document"):
        from_url(f"{httpd}/data.json", timeout=10)


def test_from_url_invalid():
    with pytest.raises(ValueError, match="failed to parse URL"):
        from_url("not-a-url")
