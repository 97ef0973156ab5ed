"""Pure-stdlib PNG codec: round-trip every filter type and color layout,
plus the real-decode path through the multimodal operators."""

import numpy as np
import pytest

from go_readability_spark.operators.png import decode_png, encode_png, is_png


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_round_trip_every_filter_and_layout(filter_type, channels):
    rng = np.random.RandomState(filter_type * 10 + channels)
    arr = rng.randint(0, 256, size=(13, 9, channels), dtype=np.uint8)
    data = encode_png(arr, filter_type=filter_type)
    assert is_png(data)
    w, h, px = decode_png(data)
    assert (w, h) == (9, 13)
    assert px.shape == (13, 9, channels)
    assert np.array_equal(px, arr)


def test_grayscale_2d_input():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    w, h, px = decode_png(encode_png(arr))
    assert (w, h) == (8, 8)
    assert np.array_equal(px[:, :, 0], arr)


def test_palette_png_expands_to_rgb():
    """Hand-build a 2x2 palette image (color type 3)."""
    import struct
    import zlib

    from go_readability_spark.operators.png import PNG_MAGIC

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = bytes([0, 0, 1, 0, 2, 0])  # rows: [red, green], [blue, red]
    data = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, px = decode_png(data)
    assert (w, h) == (2, 2)
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]]


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png")
    # 16-bit depth: unsupported, explicit error
    import struct
    import zlib

    from go_readability_spark.operators.png import PNG_MAGIC

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    data = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"\0\0\0")) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(data)


def test_decode_image_real_png_no_fake_flag():
    from go_readability_spark.operators import decode_image

    arr = np.full((5, 7, 3), 42, dtype=np.uint8)
    w, h, px = decode_image(encode_png(arr), fake=False)
    assert (w, h) == (7, 5)
    assert px == arr.tobytes()


def test_media_features_real_png_through_spark(spark):
    """Width/height/pixel-derived features from REAL encoded images via the
    mapInPandas plumbing (the stub seam upgraded to a real operator)."""
    from go_readability_spark.operators.multimodal import extract_media_features

    rows = []
    for i in range(6):
        arr = np.full((4, 4, 3), i * 30 + 5, dtype=np.uint8)
        rows.append((i, "image", bytearray(encode_png(arr)), "image/png", None, None))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, width int, height int"
    )
    feats = {r["media_id"]: r for r in extract_media_features(media, fake=False).collect()}
    assert len(feats) == 6
    for i in range(6):
        expect = round((i * 30 + 5) / 255.0, 5)
        assert all(round(v, 5) == expect for v in feats[i]["feat"]), feats[i]


def test_corrupt_png_does_not_kill_the_task(spark):
    """Truncated/garbled IDAT payloads (a certainty in crawl data) yield
    zero features, never a task failure."""
    import numpy as np

    from go_readability_spark.operators.multimodal import extract_media_features
    from go_readability_spark.operators.png import encode_png

    good = encode_png(np.full((4, 4, 3), 99, dtype=np.uint8))
    corrupt = good[:40] + b"\x00\x00\x00\x00" + good[44:]  # garble IDAT
    truncated = good[: len(good) // 2]
    rows = [
        (1, "image", bytearray(good), "image/png", None, None),
        (2, "image", bytearray(corrupt), "image/png", None, None),
        (3, "image", bytearray(truncated), "image/png", None, None),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, width int, height int"
    )
    out = {r.media_id: r for r in extract_media_features(media, fake=False).collect()}
    assert len(out) == 3
    assert out[1].frames == 1 and any(v > 0 for v in out[1].feat)
    assert out[2].frames == 0 or out[2].frames == 1  # decodes or degrades, never dies
    assert out[3].frames == 0 and all(v == 0 for v in out[3].feat)


def test_decompression_bomb_rejected():
    """A tiny IDAT claiming enormous dimensions must be rejected BEFORE
    inflating (zlib fed a max_length), not OOM the executor."""
    import struct
    import zlib

    import pytest

    from go_readability_spark.operators.png import PNG_MAGIC, decode_png

    def chunk(ctype, body):
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(
            ">I", zlib.crc32(ctype + body)
        )

    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 6, 0, 0, 0)
    idat = zlib.compress(b"\x00" * 1024)
    bomb = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="too large"):
        decode_png(bomb)


def test_oversized_idat_rejected():
    """An IDAT that inflates past the declared dimensions is an error."""
    import struct
    import zlib

    import pytest

    from go_readability_spark.operators.png import PNG_MAGIC, decode_png

    def chunk(ctype, body):
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(
            ">I", zlib.crc32(ctype + body)
        )

    # claims 2x2 grayscale (expected 2*(2+1)=6 bytes) but inflates to 600
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" * 600)
    png = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="inflates past|size"):
        decode_png(png)
