"""PDF text extraction: writer→parser round-trips (flate + raw streams,
escapes, hex strings, multi-page, multi-line), honest failure modes
(encrypted / non-PDF / unsupported filters), and the Spark read path."""

from __future__ import annotations

import zlib

import pytest

from go_readability_spark.sources.pdf import (
    docs_from_pdf,
    pdf_text,
    write_pdf,
)


@pytest.mark.parametrize("flate", [True, False])
def test_roundtrip_single_page(flate):
    assert pdf_text(write_pdf(["Hello, PDF world."], flate=flate)) == "Hello, PDF world."


def test_roundtrip_multiline_multipage():
    pages = ["line one\nline two\nline three", "second page"]
    assert pdf_text(write_pdf(pages)) == "line one\nline two\nline three\nsecond page"


def test_escapes_and_parens():
    s = r"parens () and \ backslash, tabs"
    assert pdf_text(write_pdf([s])) == s


def test_hex_strings_and_tj_array():
    content = b"BT /F1 12 Tf 72 720 Td [(Kerned) -120 ( pair)] TJ T* <48657821> Tj ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert pdf_text(pdf) == "Kerned pair\nHex!"


def test_octal_and_quote_operator():
    content = b"BT (first) Tj (\\110i) ' ET"  # ' starts a new line, \110 = 'H'
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert pdf_text(pdf) == "first\nHi"


def test_not_a_pdf_and_encrypted_raise():
    with pytest.raises(ValueError):
        pdf_text(b"GIF89a not a pdf")
    enc = write_pdf(["x"]).replace(b"/Root", b"/Encrypt 9 0 R /Root")
    with pytest.raises(ValueError):
        pdf_text(enc)


def test_image_stream_skipped():
    """A DCTDecode (JPEG) stream must be ignored, not parsed as text."""
    img = b"<< /Filter /DCTDecode /Length 4 >>\nstream\nBTET\nendstream\n"
    pdf = write_pdf(["real text"], flate=False)
    pdf = pdf.replace(b"%PDF-1.4\n", b"%PDF-1.4\n9 0 obj\n" + img + b"endobj\n")
    assert pdf_text(pdf) == "real text"


def test_corrupt_flate_stream_skipped():
    pdf = write_pdf(["will be corrupted"])
    # damage the deflate payload: text stream becomes undecodable → skipped
    body = bytearray(pdf)
    i = pdf.index(b"stream\n") + 7
    body[i:i + 8] = b"\x00" * 8
    assert pdf_text(bytes(body)) == ""


def test_spark_read_path(spark, tmp_path):
    (tmp_path / "a.pdf").write_bytes(write_pdf(["alpha doc", "page 2"]))
    (tmp_path / "b.pdf").write_bytes(write_pdf(["beta doc"], flate=False))
    (tmp_path / "c.pdf").write_bytes(b"not a pdf at all")
    rows = {r.path.rsplit("/", 1)[-1]: r
            for r in docs_from_pdf(spark, str(tmp_path)).collect()}
    assert rows["a.pdf"].text == "alpha doc\npage 2" and rows["a.pdf"].error is None
    assert rows["b.pdf"].text == "beta doc"
    assert rows["c.pdf"].text is None and "ValueError" in rows["c.pdf"].error


def test_spark_strict_raises(spark, tmp_path):
    (tmp_path / "c.pdf").write_bytes(b"junk")
    with pytest.raises(Exception):
        docs_from_pdf(spark, str(tmp_path), strict=True).count()


def test_deflate_payload_ending_in_eol_byte_not_eaten():
    """Regression: a compressed stream whose last deflate byte is 0x0A or
    0x0D must round-trip — stripping more than one EOL before `endstream`
    ate payload bytes and silently lost the stream's text (~1 in 128)."""
    found = 0
    for i in range(400):
        text = f"silent loss {i}"
        blob = write_pdf([text])
        # locate the compressed payload and check its tail byte
        start = blob.index(b"stream\n", blob.index(b"/FlateDecode")) + 7
        end = blob.index(b"\nendstream", start)
        if blob[end - 1:end] in (b"\n", b"\r"):
            found += 1
            assert pdf_text(blob) == text, text
    assert found > 0  # the hazard case was actually exercised


def test_backslash_before_non_octal_digit():
    """§7.3.4.2: backslash before a non-escape char is ignored — '\\8'
    means '8', '\\79' is octal \\7 then literal '9'."""
    content = rb"BT (digit \8 and \79 ok) Tj ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert pdf_text(pdf) == "digit 8 and \x079 ok"


def test_pdf_roundtrip_distributed(spark):
    from go_readability_spark.sources import pdf_roundtrip

    df = spark.createDataFrame(
        [(1, "hello (world) \\ yes"), (2, "café — naïve"), (3, ""),
         (4, "x" * 1000), (5, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pdf_roundtrip(df).collect()}
    assert out[1]["text_out"] == "hello (world) \\ yes"
    assert out[2]["text_out"] == "caf  nave"      # non-ASCII stripped
    assert out[3]["text_out"] == ""
    assert out[4]["text_out"] == "x" * 400        # capped at max_chars
    assert out[5]["text_out"] == ""
    assert all(r["n_chars"] == len(r["text_out"]) for r in out.values())
