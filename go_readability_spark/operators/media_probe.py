"""Header-only media metadata probing: format + dimensions WITHOUT pixel
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


# ---------------------------------------------------------------- audio probe

# MPEG-1/2/2.5 Layer III bitrate (kbps) and sample-rate tables — public
# frame-header layout; index 0 and 15 are invalid
_MP3_BITRATE = {
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0),
}
_MP3_SAMPLERATE = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000),
                   25: (11025, 12000, 8000)}


def probe_mp3(data: bytes):
    """-> (sample_rate, bitrate_kbps, channels, est_duration_s) from the
    first MPEG Layer III frame header (ID3v2 tags skipped). Duration is
    the CBR estimate payload/byterate — honest for CBR, approximate for
    VBR. Raises ValueError when no valid frame is found."""
    data = bytes(data or b"")
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # syncsafe 28-bit tag size
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
               ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + size
    end = min(len(data) - 4, pos + 64 * 1024)  # bounded sync search
    while pos <= end:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
            ver_bits = (b1 >> 3) & 0x3
            layer_bits = (b1 >> 1) & 0x3
            if ver_bits != 0x1 and layer_bits == 0x1:  # Layer III only
                version = {0x3: 1, 0x2: 2, 0x0: 25}[ver_bits]
                br_idx = (b2 >> 4) & 0xF
                sr_idx = (b2 >> 2) & 0x3
                if 0 < br_idx < 15 and sr_idx < 3:
                    table = _MP3_BITRATE[(1 if version == 1 else 2, 3)]
                    bitrate = table[br_idx]
                    sample_rate = _MP3_SAMPLERATE[version][sr_idx]
                    channels = 1 if ((b3 >> 6) & 0x3) == 0x3 else 2
                    payload = len(data) - pos
                    duration = payload * 8.0 / (bitrate * 1000.0)
                    return sample_rate, bitrate, channels, duration
        pos += 1
    raise ValueError("no MPEG Layer III frame found")
