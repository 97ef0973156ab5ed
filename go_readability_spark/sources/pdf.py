"""Minimal stdlib PDF text extraction — the "PDF/layout parse" leg of the
extraction tier, built like the PNG codec: a real, tested, dependency-free
parser for the common simple case, with honest bounds (no encryption, no
CID/composite fonts, no object streams / cross-reference streams; such
documents yield a per-row error, never a task death).

Covers what a crawl actually needs first: classic PDFs whose page content
streams are plain or FlateDecoded and whose text is shown with the
standard operators —

    BT ... (text) Tj  |  (text) '  |  [(a) -120 (b)] TJ ... ET

String syntax per ISO 32000-1 §7.3.4: literal strings with \\-escapes and
octal codes, hex strings <...>. Line layout: Td/TD/T*/' start new lines;
TJ kerning offsets are ignored (text order preserved).

Spark integration mirrors the WARC source: binaryFile scan → mapInPandas,
one PDF per row, corrupt documents degrade to an error value.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
# one text-showing or line-moving operator at a time, in stream order
_OP_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)\s*(?:Tj|')"   # (string) Tj / (string) '
    rb"|<[0-9A-Fa-f\s]*>\s*(?:Tj|')"      # <hex> Tj
    rb"|\[(?:[^\]]*)\]\s*TJ"               # [(a) -120 (b)] TJ
    rb"|T\*|Td|TD",
    re.DOTALL,
)
_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>", re.DOTALL)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(raw: bytes) -> bytes:
    """PDF literal string body (between parens) → bytes."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1:i + 2]
        if nxt and nxt in b"01234567":  # octal \d{1,3}, OCTAL digits only:
            # \8 / \9 are "backslash before non-escape" (ignored backslash,
            # §7.3.4.2), and \79 is octal \7 followed by literal '9'
            j = i + 1
            while j < min(i + 4, n) and raw[j:j + 1] in b"01234567":
                j += 1
            out.append(int(raw[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
            if nxt == b"\r" and raw[i:i + 1] == b"\n":
                i += 1
        else:
            out += _ESCAPES.get(nxt, nxt)
            i += 2
    return bytes(out)


def _decode_string_token(tok: bytes) -> bytes:
    if tok.startswith(b"("):
        return _decode_literal(tok[1:-1])
    hexbody = re.sub(rb"\s", b"", tok[1:-1])
    if len(hexbody) % 2:
        hexbody += b"0"  # §7.3.4.3: odd final digit implies trailing 0
    return bytes.fromhex(hexbody.decode("ascii"))


def _content_streams(pdf: bytes) -> Iterator[bytes]:
    """Decoded stream payloads that look like page content."""
    if b"/Encrypt" in pdf[:2048] or b"/Encrypt" in pdf[-2048:]:
        raise ValueError("encrypted PDF not supported")
    for m in _STREAM_RE.finditer(pdf):
        params, data = m.group(1), m.group(2)
        # the payload length: /Length when direct (authoritative — deflate
        # payloads may legitimately END in 0x0A/0x0D bytes, so trimming by
        # EOL inspection alone is ambiguous); otherwise strip AT MOST ONE
        # EOL sequence before `endstream` (§7.3.8.1 — rstrip would eat
        # payload bytes and silently lose the stream's text)
        lm = re.search(rb"/Length\s+(\d+)(\s+0\s+R)?", params)
        if lm and not lm.group(2) and int(lm.group(1)) <= len(data):
            data = data[: int(lm.group(1))]
        elif data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith((b"\n", b"\r")):
            data = data[:-1]
        if b"/FlateDecode" in params:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue  # not a decodable stream (e.g. image) — skip
        elif b"/Filter" in params:
            continue  # unsupported filter (DCT, LZW, ...) — not text
        if b"BT" in data:
            yield data


def pdf_text(pdf: bytes) -> str:
    """Extracted text of all pages, reading order of the content streams.
    Raises ValueError on non-PDF/encrypted input (callers map this to a
    per-row error)."""
    if not pdf.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    lines: list[str] = []
    for data in _content_streams(pdf):
        for block in _TEXT_BLOCK_RE.finditer(data):
            cur: list[bytes] = []
            for op in _OP_RE.finditer(block.group(1)):
                tok = op.group(0)
                if tok in (b"T*", b"Td", b"TD") or tok.endswith(b"'"):
                    if cur:
                        lines.append(b"".join(cur).decode("latin-1"))
                        cur = []
                for s in _STR_RE.finditer(tok):
                    cur.append(_decode_string_token(s.group(0)))
            if cur:
                lines.append(b"".join(cur).decode("latin-1"))
    return "\n".join(lines)


def docs_from_pdf(spark, path: str, strict: bool = False) -> DataFrame:
    """Read *.pdf under `path` into (path, text, error) — same
    binaryFile + mapInPandas shape as the WARC source; a malformed or
    unsupported PDF fills `error` instead of killing the task."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf_batch in batches:
            rows = []
            for p, content in zip(pdf_batch["path"], pdf_batch["content"]):
                try:
                    rows.append({"path": p, "text": pdf_text(bytes(content)), "error": None})
                except Exception as exc:
                    if strict:
                        raise
                    rows.append({"path": p, "text": None,
                                 "error": f"{type(exc).__name__}: {exc}"})
            yield pd.DataFrame(rows)

    return files.mapInPandas(parse, schema="path string, text string, error string")


def write_pdf(pages: list[str], flate: bool = True) -> bytes:
    """Build a spec-shaped single-font PDF from page texts — for tests and
    examples (mirrors sources/warc.write_warc). Each input string becomes
    one page; its lines become Td-positioned text lines."""
    def content(text: str) -> bytes:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(text.split("\n")):
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            if i:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + esc.encode("latin-1") + b") Tj")
        ops.append(b"ET")
        return b" ".join(ops)

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    n_pages = len(pages)
    cat = add(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    add(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    font_num = 3 + 2 * n_pages
    for i, text in enumerate(pages):
        page_num = 3 + 2 * i
        add(f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {page_num + 1} 0 R "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>".encode())
        data = content(text)
        if flate:
            data = zlib.compress(data)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            head = f"<< /Length {len(data)} >>".encode()
        add(head + b"\nstream\n" + data + b"\nendstream")
    add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    assert cat == 1

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def pdf_roundtrip(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  max_chars: int = 400) -> DataFrame:
    """Distributed writer→parser round-trip: synthesize a single-page PDF
    per row from the ASCII-printable prefix of `text_col`, then extract it
    back with pdf_text. Output (doc_id, text_out, n_chars) is arithmetic
    on the input text, so a SQL oracle can verify the whole encode → Flate
    → content-stream-parse → decode loop without parsing any PDF itself.

    Scale shape: map-only (mapInPandas, Arrow batches), no shuffle; each
    row's cost is one zlib deflate+inflate of <= max_chars bytes.
    """
    import pandas as pd

    printable = re.compile(r"[^ -~]")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            out = []
            for i, t in zip(b[id_col], b[text_col]):
                s = printable.sub("", t or "")[:max_chars]
                txt = pdf_text(write_pdf([s]))
                out.append({"doc_id": int(i), "text_out": txt,
                            "n_chars": len(txt)})
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(
        gen, schema="doc_id long, text_out string, n_chars int"
    )
