"""Baseline JPEG codec (operators/jpeg.py): round-trip exactness bounds
across subsampling modes, restart intervals, partial MCUs; honest-stub
contract for non-baseline processes; integration with the multimodal
decode layer."""

import numpy as np
import pytest

from go_readability_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 5 + 30) % 256, (xx * 7 + 60) % 256, ((yy + xx) * 3 + 90) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_is_jpeg():
    assert is_jpeg(b"\xff\xd8\xff\xe0rest")
    assert not is_jpeg(b"\x89PNG")
    assert not is_jpeg(b"")


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("ri", [0, 2])
def test_rgb_round_trip(sub, ri):
    """Every subsampling mode and restart interval round-trips within a
    lossy-codec error bound (tight at q90 on a smooth gradient)."""
    rgb = _smooth_rgb(37, 29)  # partial MCUs in both axes for 420
    enc = encode_jpeg(rgb, quality=90, subsample=sub, restart_interval=ri)
    w, h, px = decode_jpeg(enc)
    assert (w, h) == (29, 37)
    assert px.shape == (37, 29, 3)
    err = np.abs(px.astype(float) - rgb.astype(float)).mean()
    assert err < (2.0 if sub == "444" else 4.0), (sub, ri, err)


def test_gray_round_trip_high_quality():
    rng = np.random.RandomState(7)
    g = np.clip(rng.randn(24, 17) * 30 + 128, 0, 255).astype(np.uint8)
    enc = encode_jpeg(g, quality=95)
    w, h, px = decode_jpeg(enc)
    assert (w, h, px.shape) == (17, 24, (24, 17, 1))
    assert np.abs(px[:, :, 0].astype(float) - g.astype(float)).mean() < 3.0


def test_restart_interval_changes_stream_not_pixels():
    rgb = _smooth_rgb(16, 16)
    a = encode_jpeg(rgb, quality=90, restart_interval=0)
    b = encode_jpeg(rgb, quality=90, restart_interval=1)
    assert a != b and b"\xff\xd0" in b  # RST0 present
    _, _, pa = decode_jpeg(a)
    _, _, pb = decode_jpeg(b)
    assert np.array_equal(pa, pb)  # resync must not alter decoded pixels


def test_quality_monotone_size():
    rgb = _smooth_rgb(32, 32)
    sizes = [len(encode_jpeg(rgb, quality=q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_single_pixel_and_tiny():
    for h, w in ((1, 1), (3, 5), (8, 8), (9, 9)):
        g = ((np.arange(h * w).reshape(h, w) * 7) % 256).astype(np.uint8)
        enc = encode_jpeg(g, quality=95)
        ww, hh, px = decode_jpeg(enc)
        assert (ww, hh) == (w, h)
        assert px.shape == (h, w, 1)


def test_lossless_sof_raises_not_implemented():
    """Honest-stub contract: processes beyond baseline+progressive
    (e.g. SOF3 lossless) must refuse loudly, not decode garbage."""
    enc = bytearray(encode_jpeg(_smooth_rgb(8, 8)))
    idx = bytes(enc).find(b"\xff\xc0")
    assert idx > 0
    enc[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(enc))


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_progressive_decode_equals_baseline(sub):
    """Progressive (SOF2) and baseline encodes quantize identically, so
    their decodes must be pixel-EQUAL — the entropy layer (spectral
    selection, successive approximation, DC/AC refinement, EOB runs) is
    lossless.  Partial MCUs in both axes."""
    from go_readability_spark.operators.jpeg import encode_jpeg_progressive

    rgb = _smooth_rgb(37, 29)
    base = encode_jpeg(rgb, quality=88, subsample=sub)
    prog = encode_jpeg_progressive(rgb, quality=88, subsample=sub)
    assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
    assert prog.count(b"\xff\xda") > 3  # a real multi-scan script
    wb, hb, pb = decode_jpeg(base)
    wp, hp, pp = decode_jpeg(prog)
    assert (wb, hb) == (wp, hp) == (29, 37)
    assert np.array_equal(pb, pp)


def test_progressive_decode_gray_and_noise():
    """Grayscale progressive + dense random coefficients (exercises ZRL
    spans and correction-bit interleaving in the refinement scans)."""
    from go_readability_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(11)
    g = rng.randint(0, 256, size=(25, 18)).astype(np.uint8)
    pb = decode_jpeg(encode_jpeg(g, quality=92))[2]
    pp = decode_jpeg(encode_jpeg_progressive(g, quality=92))[2]
    assert np.array_equal(pb, pp)
    noisy = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    pb = decode_jpeg(encode_jpeg(noisy, quality=35))[2]
    pp = decode_jpeg(encode_jpeg_progressive(noisy, quality=35))[2]
    assert np.array_equal(pb, pp)


def test_progressive_round_trip_error_bound():
    """Progressive decode is a faithful JPEG decode of the original."""
    from go_readability_spark.operators.jpeg import encode_jpeg_progressive

    rgb = _smooth_rgb(24, 31)
    w, h, px = decode_jpeg(encode_jpeg_progressive(rgb, quality=90))
    assert (w, h) == (31, 24)
    assert np.abs(px.astype(float) - rgb.astype(float)).mean() < 2.0


def test_twelve_bit_raises_not_implemented():
    enc = bytearray(encode_jpeg(_smooth_rgb(8, 8)))
    idx = bytes(enc).find(b"\xff\xc0")
    enc[idx + 4] = 12  # precision byte of SOF0
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_jpeg(bytes(enc))


def test_corrupt_raises_value_error():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    enc = encode_jpeg(_smooth_rgb(8, 8))
    with pytest.raises((ValueError, Exception)):
        decode_jpeg(enc[: len(enc) // 2])  # truncated entropy stream


def test_header_probe_agrees_with_decoder():
    """media_probe's dimension sniff and the full decoder must agree on
    our own encoder's output."""
    from go_readability_spark.operators.media_probe import probe_image

    for sub in ("444", "420"):
        enc = encode_jpeg(_smooth_rgb(21, 13), subsample=sub)
        fmt, w, h = probe_image(enc)
        assert (fmt, w, h) == ("jpeg", 13, 21)
        dw, dh, _ = decode_jpeg(enc)
        assert (dw, dh) == (w, h)


def test_decode_image_dispatches_jpeg():
    from go_readability_spark.operators.multimodal import decode_image

    rgb = _smooth_rgb(10, 12)
    enc = encode_jpeg(rgb, quality=92)
    w, h, raw = decode_image(enc, fake=False)
    assert (w, h) == (12, 10)
    assert len(raw) == 10 * 12 * 3


def test_resize_image_preserves_format():
    from go_readability_spark.operators.image_ops import resize_image
    from go_readability_spark.operators.png import encode_png, is_png

    jpg = encode_jpeg(_smooth_rgb(20, 24), quality=92)
    out = resize_image(jpg, 8, 8)
    assert is_jpeg(out)
    w, h, px = decode_jpeg(out)
    assert (w, h, px.shape) == (8, 8, (8, 8, 3))

    png = encode_png(_smooth_rgb(20, 24))
    assert is_png(resize_image(png, 8, 8))


def test_resize_images_spark_handles_jpeg_rows(spark):
    """resize_images over the mixed PNG/JPEG synth corpus: every image
    row resizes ok in its own format; audio/video rows come back
    ok=false untouched."""
    from go_readability_spark.operators.multimodal import (
        resize_images,
        synth_real_media_dataframe,
    )

    media = synth_real_media_dataframe(spark, n=12, seed=42)
    out = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    kinds = {r["media_id"]: (r["kind"], r["mime"]) for r in media.collect()}
    for mid, (kind, mime) in kinds.items():
        if kind == "image":
            assert out[mid]["ok"], (mid, mime)
            assert out[mid]["width"] == 8 and out[mid]["height"] == 8
            head = bytes(out[mid]["payload"])[:8]
            if mime == "image/jpeg":
                assert head[:2] == b"\xff\xd8"
            else:
                assert head == b"\x89PNG\r\n\x1a\n"
        elif kind == "audio":
            assert not out[mid]["ok"]


def test_media_features_real_jpeg_rows(spark):
    """synth_real_media_dataframe now carries JPEG images; the feature
    extractor must take the REAL decode path for them (frames=1 and a
    non-zero feature vector, even with fake=False)."""
    from go_readability_spark.operators.multimodal import (
        extract_media_features,
        synth_real_media_dataframe,
    )

    media = synth_real_media_dataframe(spark, n=24, seed=42)
    jpeg_ids = {
        r["media_id"]
        for r in media.where("mime = 'image/jpeg'").select("media_id").collect()
    }
    assert jpeg_ids, "expected some JPEG rows in the synth corpus"
    feats = {
        r["media_id"]: r
        for r in extract_media_features(media, fake=False).collect()
    }
    for mid in jpeg_ids:
        assert feats[mid]["frames"] == 1
        assert any(abs(v) > 0 for v in feats[mid]["feat"])
