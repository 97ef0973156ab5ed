"""Real audio (RIFF/WAVE PCM) decode, image resize, and motion-PNG
frame-sampling — the multimodal legs beyond plain PNG decode."""

import math
import struct

import numpy as np
import pytest

from go_readability_spark.operators.wav import (
    decode_wav,
    encode_wav,
    is_wav,
    wav_features,
)
from go_readability_spark.operators.png import encode_png
from go_readability_spark.operators.image_ops import (
    count_frames,
    encode_motion_png,
    frame_sample,
    resize_box,
    resize_nearest,
    resize_png,
    split_frames,
)
from go_readability_spark.operators.png import decode_png


# ------------------------------------------------------------------ WAV codec

def _sine(sr=8000, freq=440.0, dur=0.25, amp=0.5):
    t = np.arange(int(sr * dur), dtype=np.float64) / sr
    return (amp * np.sin(2 * math.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip_16bit_mono():
    wave = _sine()
    data = encode_wav(wave, 8000, bits=16)
    assert is_wav(data)
    sr, samples = decode_wav(data)
    assert sr == 8000
    assert samples.shape == (len(wave), 1)
    # 16-bit quantization error bound
    assert np.max(np.abs(samples[:, 0] - wave)) < 1.5 / 32768


def test_wav_roundtrip_8bit_and_32bit():
    wave = _sine(dur=0.05)
    for bits, tol in ((8, 1.5 / 127), (32, 1e-6)):
        sr, samples = decode_wav(encode_wav(wave, 8000, bits=bits))
        assert np.max(np.abs(samples[:, 0] - wave)) < tol, bits


def test_wav_stereo_and_24bit():
    left = _sine(freq=220, dur=0.05)
    right = _sine(freq=330, dur=0.05)
    stereo = np.stack([left, right], axis=1)
    sr, samples = decode_wav(encode_wav(stereo, 44100, bits=16))
    assert sr == 44100 and samples.shape == (len(left), 2)
    assert np.max(np.abs(samples - stereo)) < 1.5 / 32768
    # hand-build a 24-bit file (encoder doesn't emit 24-bit)
    vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)], dtype=np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + \
        b"data" + struct.pack("<I", len(raw)) + raw
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    sr, samples = decode_wav(data)
    expect = vals.astype(np.float64) / (1 << 23)
    assert np.allclose(samples[:, 0], expect, atol=1e-6)


def test_wav_float32_format():
    wave = _sine(dur=0.02)
    pcm = wave.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + \
        b"data" + struct.pack("<I", len(pcm)) + pcm
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    sr, samples = decode_wav(data)
    assert np.allclose(samples[:, 0], wave)


def test_wav_features_scalars():
    # full-scale square wave: rms == peak == 1, zcr = 1/period
    sr = 1000
    wave = np.tile(np.array([1.0] * 10 + [-1.0] * 10, dtype=np.float32), 10)
    f = wav_features(encode_wav(wave, sr, bits=32))
    assert f["sample_rate"] == sr and f["channels"] == 1
    assert f["n_frames"] == 200
    assert abs(f["duration_s"] - 0.2) < 1e-9
    assert abs(f["rms"] - 1.0) < 1e-3 and abs(f["peak"] - 1.0) < 1e-3
    # 20 alternating blocks of 10 -> 19 sign flips in 199 transitions
    assert abs(f["zero_crossing_rate"] - 19 / 199) < 1e-6


def test_wav_hostile_inputs():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    # truncated data chunk
    good = encode_wav(_sine(dur=0.05), 8000)
    with pytest.raises(ValueError):
        decode_wav(good[: len(good) - 7])
    # bomb: header claims huge data via n_frames -> size gate, not OOM
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    huge = 400 * 1024 * 1024
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + \
        b"data" + struct.pack("<I", huge)
    data = b"RIFF" + struct.pack("<I", len(body) + huge) + body
    with pytest.raises(ValueError):  # truncated (no real payload)
        decode_wav(data)


# ------------------------------------------------------------------ resize

def test_resize_nearest_exact_factor():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8)
    assert np.array_equal(up[::2, ::2], arr)  # each source pixel present
    down = resize_nearest(up, 4, 4)
    assert np.array_equal(down, arr)


def test_resize_box_average_is_exact_for_integer_factor():
    arr = np.zeros((4, 4), dtype=np.uint8)
    arr[:2, :2] = 100
    arr[2:, 2:] = 200
    out = resize_box(arr, 2, 2)
    assert out.tolist() == [[100, 0], [0, 200]]
    # 2x2 box means: uniform blocks average exactly
    arr2 = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    big = np.kron(arr2, np.ones((3, 3), dtype=np.uint8))
    assert np.array_equal(resize_box(big, 2, 2), arr2)


def test_resize_box_rgb_and_rounding():
    arr = np.stack([np.full((2, 2), v, dtype=np.uint8) for v in (1, 2, 3)], axis=2)
    out = resize_box(arr, 1, 1)
    assert out.shape == (1, 1, 3)
    assert out[0, 0].tolist() == [1, 2, 3]


def test_resize_png_roundtrip():
    arr = (np.arange(96, dtype=np.uint8) * 2).reshape(8, 4, 3)
    resized = resize_png(encode_png(arr), 2, 4, method="box")
    w, h, px = decode_png(resized)
    assert (w, h) == (2, 4) and px.shape == (4, 2, 3)


# ------------------------------------------------------------ motion-PNG video

def test_motion_png_split_and_count():
    frames = [np.full((3, 3), v, dtype=np.uint8) for v in (10, 20, 30, 40)]
    payload = encode_motion_png(frames)
    parts = split_frames(payload)
    assert len(parts) == 4 and count_frames(payload) == 4
    for part, f in zip(parts, frames):
        _w, _h, px = decode_png(part)
        assert np.array_equal(px[:, :, 0], f)


def test_frame_sample_decodes_only_sampled():
    frames = [np.full((2, 2), v, dtype=np.uint8) for v in range(10)]
    payload = encode_motion_png(frames)
    sampled = frame_sample(payload, every_n=3)
    assert [s[0] for s in sampled] == [0, 3, 6, 9]
    assert all(px[0, 0, 0] == idx for idx, _w, _h, px in sampled)
    capped = frame_sample(payload, every_n=1, max_frames=2)
    assert [s[0] for s in capped] == [0, 1]
    with pytest.raises(ValueError):
        frame_sample(payload, every_n=0)


def test_motion_png_rejects_trailing_garbage():
    payload = encode_motion_png([np.zeros((2, 2), dtype=np.uint8)]) + b"junk"
    with pytest.raises(ValueError):
        split_frames(payload)


# -------------------------------------------------------------- Spark plumbing

def test_media_features_real_wav_and_video(spark):
    from go_readability_spark.operators.multimodal import (
        extract_media_features,
        synth_real_media_dataframe,
    )

    media = synth_real_media_dataframe(spark, n=12, seed=7)
    feats = {r["media_id"]: r for r in extract_media_features(media, fake=True).collect()}
    assert len(feats) == 12
    for i, r in feats.items():
        kind = r["kind"]
        if kind == "audio":
            # real WAV decode: duration 0.25s at 8 kHz -> 2000 frames
            assert r["frames"] == 2000, r
            assert abs(r["feat"][0] - 0.25) < 1e-6  # duration_s
            assert 0.3 < r["feat"][1] < 0.4  # rms of 0.5-amp sine ~ 0.354
        elif kind == "video":
            assert 2 <= r["frames"] <= 6, r  # real frame count
            assert r["feat"][0] > 0  # mean pixel of frame 0
        else:
            assert r["frames"] == 1


def test_resize_images_operator(spark):
    from go_readability_spark.operators.multimodal import resize_images

    rows = []
    for i in range(4):
        arr = np.full((8, 8, 3), 40 * i + 10, dtype=np.uint8)
        rows.append((i, "image", bytearray(encode_png(arr)), "image/png", 8, 8))
    rows.append((99, "image", bytearray(b"not a png"), "image/png", None, None))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, width int, height int"
    )
    out = {r["media_id"]: r for r in resize_images(media, 4, 4, method="box").collect()}
    assert len(out) == 5
    for i in range(4):
        assert out[i]["ok"] and (out[i]["width"], out[i]["height"]) == (4, 4)
        w, h, px = decode_png(bytes(out[i]["payload"]))
        assert (w, h) == (4, 4)
        assert int(px[0, 0, 0]) == 40 * i + 10  # uniform image: exact average
    assert not out[99]["ok"] and bytes(out[99]["payload"]) == b"not a png"


def test_non_wav_audio_raises_without_fake(spark):
    from go_readability_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-ish", fake=False)
    f = decode_audio(b"ID3\x04mp3-ish", fake=True)
    assert f["n_frames"] >= 1  # deterministic stub still works


def test_wav_extensible_subformat():
    """WAVE_FORMAT_EXTENSIBLE: the real tag lives in the SubFormat GUID."""
    wave = _sine(dur=0.02)
    pcm = wave.astype("<f4").tobytes()
    # fmt: extensible(0xFFFE), 1ch, float32 subformat in the GUID
    base = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000 * 4, 4, 32)
    ext = struct.pack("<HHI", 22, 32, 0) + struct.pack("<H", 3) + b"\x00" * 14
    fmt = base + ext
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + \
        b"data" + struct.pack("<I", len(pcm)) + pcm
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    sr, samples = decode_wav(data)
    assert np.allclose(samples[:, 0], wave)


def test_resize_box_mixed_direction():
    """ADVICE r2: 10x2 -> 5x4 (downscale x, upscale y) used to IndexError
    past the integral image. Box-average applies per-axis now."""
    arr = np.arange(20, dtype=np.uint8).reshape(2, 10)
    out = resize_box(arr, 5, 4)  # (h=2,w=10) -> (h=4,w=5)
    assert out.shape == (4, 5)
    # x pairs average, y rows replicate (nearest on the upscaled axis)
    row0 = [(0 + 1 + 1) // 2, (2 + 3 + 1) // 2, 5, 7, 9]
    assert out[0].tolist() == row0
    assert np.array_equal(out[0], out[1]) and np.array_equal(out[2], out[3])
    # other orientation: upscale x, downscale y
    out2 = resize_box(arr.T.copy(), 4, 5)  # (h=10,w=2) -> (h=5,w=4)
    assert out2.shape == (5, 4)
    # rgb + png round-trip through the mixed path
    rgb = np.arange(60, dtype=np.uint8).reshape(2, 10, 3)
    out3 = resize_box(rgb, 5, 4)
    assert out3.shape == (4, 5, 3)
    w, h, px = decode_png(resize_png(encode_png(rgb), 5, 4, method="box"))
    assert (w, h) == (5, 4) and px.shape == (4, 5, 3)
