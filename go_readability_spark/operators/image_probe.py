"""Header-only image metadata probing: format + dimensions WITHOUT pixel
decode, from the public container layouts (PNG IHDR, JPEG SOF markers,
GIF logical screen descriptor, BMP BITMAPINFOHEADER, WebP VP8/VP8L/VP8X).

Full pixel decode for JPEG/GIF/WebP needs codec libraries this sandbox
doesn't ship (those paths stay honestly stubbed in multimodal.py) — but
dimensions and format live in plain header fields, so a crawl pipeline
can still compute the size/aspect features and format mix it filters on.
Every parser is bounds-checked; corrupt headers raise ValueError.
"""

from __future__ import annotations

import struct

from .png import PNG_MAGIC

# JPEG start-of-frame markers that carry dimensions (all SOFn except
# DHT/JPG/DAC which reuse nearby codes)
_JPEG_SOF = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)


def _probe_png(data: bytes):
    if len(data) < 24 or data[12:16] != b"IHDR":
        raise ValueError("PNG too short for IHDR")
    w, h = struct.unpack(">II", data[16:24])
    return "png", w, h


def _probe_jpeg(data: bytes):
    pos = 2  # past SOI
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers
            continue
        (seg_len,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if seg_len < 2:
            raise ValueError("JPEG bad segment length")
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                raise ValueError("JPEG SOF truncated")
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            return "jpeg", w, h
        if marker == 0xD9:  # EOI before any SOF
            break
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOF marker")


def _probe_gif(data: bytes):
    if len(data) < 10:
        raise ValueError("GIF too short")
    w, h = struct.unpack("<HH", data[6:10])
    return "gif", w, h


def _probe_bmp(data: bytes):
    if len(data) < 26:
        raise ValueError("BMP too short")
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size >= 40:
        w, h = struct.unpack("<ii", data[18:26])
    else:  # BITMAPCOREHEADER
        w, h = struct.unpack("<HH", data[18:22])
    return "bmp", abs(w), abs(h)  # negative height = top-down rows


def _probe_webp(data: bytes):
    if len(data) < 25 or data[8:12] != b"WEBP":
        raise ValueError("WebP too short")
    fourcc = data[12:16]
    if fourcc == b"VP8X":
        if len(data) < 30:
            raise ValueError("WebP VP8X too short")
        # 24-bit little-endian canvas minus one
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return "webp", w, h
    if fourcc == b"VP8L":
        b = data[21:25]
        if data[20] != 0x2F:
            raise ValueError("WebP VP8L bad signature byte")
        bits = int.from_bytes(b, "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return "webp", w, h
    if fourcc == b"VP8 ":
        # lossy: frame tag then 3-byte start code 9d 01 2a, then dims
        if len(data) < 30:
            raise ValueError("WebP VP8 too short")
        if data[23:26] != b"\x9d\x01\x2a":
            raise ValueError("WebP VP8 bad start code")
        w, h = struct.unpack("<HH", data[26:30])
        return "webp", w & 0x3FFF, h & 0x3FFF
    raise ValueError(f"WebP unknown chunk {fourcc!r}")


def probe_image(data: bytes):
    """-> (format, width, height) from headers only. Raises ValueError
    for unrecognized or corrupt payloads."""
    data = bytes(data or b"")
    if data[:8] == PNG_MAGIC:
        return _probe_png(data)
    if data[:2] == b"\xff\xd8":
        return _probe_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _probe_gif(data)
    if data[:2] == b"BM":
        return _probe_bmp(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return _probe_webp(data)
    raise ValueError("unrecognized image format")


def probe_media_dimensions(media, payload_col: str = "payload",
                           id_col: str = "media_id"):
    """Distributed probe: (id, format, width, height, ok) per row.
    Header parsing only — bytes scanned per row are tiny regardless of
    payload size. Unprobeable rows get ok=false, never task failures."""
    from collections.abc import Iterator

    import pandas as pd

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                payload = pdf[payload_col].iat[i]
                try:
                    fmt, w, h = probe_image(payload)
                    rows.append(
                        {id_col: pdf[id_col].iat[i], "format": fmt,
                         "width": w, "height": h, "ok": True}
                    )
                except Exception:
                    rows.append(
                        {id_col: pdf[id_col].iat[i], "format": None,
                         "width": None, "height": None, "ok": False}
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        probe, schema=f"{id_col} long, format string, width int, height int, ok boolean"
    )
