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


# ------------------------------------------------ CLI URL source + server mode

def test_cli_parse_url_source(httpd, capsys):
    """main.go:114-135: the CLI accepts a URL as the source argument."""
    import json

    from go_readability_spark.cli import main

    rc = main(["parse", f"{httpd}/page.html", "-m"])
    out = capsys.readouterr().out
    assert rc == 0
    meta = json.loads(out)
    assert set(meta) == {"title", "byline", "excerpt", "image", "favicon"}
    if fixture_cases():
        assert meta["title"] == "Get your Frontend JavaScript Code Covered | Code"


def test_cli_http_server_mode(httpd):
    """main.go:82-112: GET / serves the form; ?url= extracts; metadata and
    text flags switch payload + content type; bad upstream is a 400."""
    import json
    import threading
    from urllib.error import HTTPError
    from urllib.parse import quote
    from urllib.request import urlopen

    from go_readability_spark.cli import make_http_server

    server = make_http_server("127.0.0.1:0")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urlopen(base) as r:
            assert "Get readability content" in r.read().decode()

        page = quote(f"{httpd}/page.html", safe="")
        with urlopen(f"{base}/?url={page}&metadata=true") as r:
            assert r.headers.get("Content-Type") == "application/json"
            meta = json.loads(r.read().decode())
            assert set(meta) == {"title", "byline", "excerpt", "image", "favicon"}

        with urlopen(f"{base}/?url={page}&text=true") as r:
            assert r.headers.get("Content-Type", "").startswith("text/plain")
            assert len(r.read()) > 200

        with urlopen(f"{base}/?url={page}") as r:
            body = r.read().decode()
            assert body.lstrip().startswith("<")

        try:
            urlopen(f"{base}/?url={quote(f'{httpd}/missing.html', safe='')}")
            raise AssertionError("expected HTTP 400")
        except HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_cli_parse_url_check_only(httpd, capsys):
    from go_readability_spark.cli import main

    rc = main(["parse", f"{httpd}/page.html", "-l"])
    out = capsys.readouterr().out.strip()
    assert out in ("true", "false")
    assert rc == (0 if out == "true" else 1)


def test_server_rejects_file_scheme(httpd):
    import threading
    from urllib.error import HTTPError
    from urllib.parse import quote
    from urllib.request import urlopen

    from go_readability_spark.cli import make_http_server

    server = make_http_server("127.0.0.1:0")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        try:
            urlopen(f"http://127.0.0.1:{port}/?url={quote('file:///etc/passwd', safe='')}")
            raise AssertionError("expected HTTP 400 for file:// url")
        except HTTPError as e:
            assert e.code == 400
            assert b"http" in e.read()
    finally:
        server.shutdown()
        server.server_close()


def test_cli_file_source_matches_reference_semantics(tmp_path, capsys):
    """main.go getContent applies the readerable gate, the 5-key indent-4
    metadata, and the http://fakehost.com base to FILE sources too (review
    finding: the file branch skipped the gate and emitted a different
    metadata shape than the URL branch)."""
    import json

    from go_readability_spark.cli import main

    page = tmp_path / "page.html"
    body = (
        "<html><head><title>T</title></head><body><article>"
        + "<p><a href='rel.html'>rel</a> "
        + "Long readable sentence, with commas, and length. " * 40
        + "</p></article></body></html>"
    )
    page.write_text(body)

    rc = main(["parse", str(page), "-m"])
    out = capsys.readouterr().out
    meta = json.loads(out)
    assert rc == 0
    assert sorted(meta) == ["byline", "excerpt", "favicon", "image", "title"]

    rc = main(["parse", str(page)])
    out = capsys.readouterr().out
    assert rc == 0
    assert 'href="http://fakehost.com/rel.html"' in out  # fakehost base

    unreadable = tmp_path / "tiny.html"
    unreadable.write_text("<p>x</p>")
    rc = main(["parse", str(unreadable)])
    err = capsys.readouterr().err
    assert rc == 1 and "not readable" in err
