"""Header-only image probing (PNG/JPEG/GIF/BMP/WebP) — hand-built
fixtures per the public container layouts."""

import struct

import numpy as np
import pytest

from go_readability_spark.operators.media_probe import probe_image
from go_readability_spark.operators.png import encode_png


def _jpeg(w, h, progressive=False, junk_segments=1):
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9  # APP0
    for _ in range(junk_segments):
        out += b"\xff\xfe" + struct.pack(">H", 6) + b"cmt!"  # COM
    sof = 0xC2 if progressive else 0xC0
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += bytes([0xFF, sof]) + struct.pack(">H", 2 + len(body)) + body
    out += b"\xff\xd9"
    return bytes(out)


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def _bmp(w, h):
    info = struct.pack("<IiiHH", 40, w, -h, 1, 24) + b"\x00" * 20
    return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info


def _webp_vp8x(w, h):
    body = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 4 + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def _webp_vp8l(w, h):
    bits = (w - 1) | ((h - 1) << 14)
    body = b"VP8L" + struct.pack("<I", 5) + b"\x2f" + bits.to_bytes(4, "little")
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def test_probe_all_formats():
    png = encode_png(np.zeros((7, 9), dtype=np.uint8))
    assert probe_image(png) == ("png", 9, 7)
    assert probe_image(_jpeg(640, 480)) == ("jpeg", 640, 480)
    assert probe_image(_jpeg(123, 45, progressive=True, junk_segments=3)) == ("jpeg", 123, 45)
    assert probe_image(_gif(320, 200)) == ("gif", 320, 200)
    assert probe_image(_bmp(800, 600)) == ("bmp", 800, 600)  # top-down abs()
    assert probe_image(_webp_vp8x(1920, 1080)) == ("webp", 1920, 1080)
    assert probe_image(_webp_vp8l(33, 17)) == ("webp", 33, 17)


def test_probe_corrupt_and_unknown():
    with pytest.raises(ValueError):
        probe_image(b"plain text")
    with pytest.raises(ValueError):
        probe_image(b"")
    with pytest.raises(ValueError):
        probe_image(b"\xff\xd8\xff\xfe\x00\x06cmt!\xff\xd9")  # JPEG, no SOF
    with pytest.raises(ValueError):
        probe_image(b"GIF89a\x01")  # truncated
    with pytest.raises(ValueError):
        probe_image(b"RIFF\x00\x00\x00\x00WEBPXXXX" + b"\x00" * 20)


def test_probe_operator(spark):
    from go_readability_spark.operators.media_probe import probe_media_dimensions

    rows = [
        (0, bytearray(_jpeg(10, 20))),
        (1, bytearray(_gif(5, 6))),
        (2, bytearray(b"garbage")),
        (3, bytearray(encode_png(np.zeros((2, 3), dtype=np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in probe_media_dimensions(df).collect()}
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == ("jpeg", 10, 20)
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("gif", 5, 6)
    assert got[2]["ok"] is False and got[2]["format"] is None
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("png", 3, 2)


def _mp3_frame(version=1, bitrate_idx=9, sr_idx=0, mono=False, n_frames=4):
    ver_bits = {1: 0x3, 2: 0x2}[version]
    b1 = 0xE0 | (ver_bits << 3) | (0x1 << 1) | 0x1  # sync+ver+layerIII
    b2 = (bitrate_idx << 4) | (sr_idx << 2)
    b3 = 0xC0 if mono else 0x00
    # frame size for layer III: 144 * bitrate / samplerate (v1)
    from go_readability_spark.operators.media_probe import (
        _MP3_BITRATE, _MP3_SAMPLERATE,
    )
    br = _MP3_BITRATE[(1 if version == 1 else 2, 3)][bitrate_idx] * 1000
    sr = _MP3_SAMPLERATE[version][sr_idx]
    size = (144 if version == 1 else 72) * br // sr
    frame = bytes([0xFF, b1, b2, b3]) + b"\x00" * (size - 4)
    return frame * n_frames


def test_probe_mp3():
    from go_readability_spark.operators.media_probe import probe_mp3

    data = _mp3_frame(bitrate_idx=9, sr_idx=0)  # 128 kbps, 44100 Hz
    sr, br, ch, dur = probe_mp3(data)
    assert (sr, br, ch) == (44100, 128, 2)
    assert abs(dur - len(data) * 8 / 128000) < 1e-9
    # ID3v2 tag skipped
    tag = b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"x" * 10
    sr2, br2, ch2, _ = probe_mp3(tag + _mp3_frame(bitrate_idx=5, sr_idx=1, mono=True))
    assert (sr2, br2, ch2) == (48000, 64, 1)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        probe_mp3(b"not audio at all")
    with _pytest.raises(ValueError):
        probe_mp3(b"")
