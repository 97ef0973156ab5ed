"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas.

Decode is REAL for:
  * images — PNG (pure-stdlib codec in .png: zlib + struct; 8-bit
    gray/RGB/RGBA/palette, all five filters) and baseline JFIF JPEG
    (ITU-T.81 codec in .jpeg: Huffman + IDCT, 4:4:4/4:2:2/4:2:0,
    restart markers), plus real resize (nearest / box-average,
    .image_ops);
  * audio — RIFF/WAVE PCM (pure-stdlib codec in .wav: 8/16/24/32-bit
    int + float32, any channel count);
  * video — motion-PNG payloads (N complete PNG streams back to back;
    container framing is ours because this sandbox ships no mp4/codec
    library, but the frame walk parses real PNG chunk structure and the
    frame decode is the real codec — see .image_ops).

Anything else (progressive JPEG, GIF/WebP images, MP3 audio, real
MP4...) needs a codec library this container doesn't ship and stays
STUBBED: decode raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (seeded by the content hash) exercises the real Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — end to
end. Real payloads always take the real path, even under fake=True.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, width int, height int"
)
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha int, feat array<float>, frames int"
)
RESIZE_SCHEMA = (
    "media_id long, payload binary, width int, height int, ok boolean"
)


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload to (width, height, pixels). PNG and
    baseline JFIF JPEG decode for real (pure-stdlib/numpy codecs in
    .png / .jpeg); other formats need an imaging library this container
    doesn't ship, so they stay stubbed behind fake=True."""
    from .jpeg import decode_jpeg, is_jpeg
    from .png import decode_png, is_png

    if is_png(payload or b""):
        w, h, px = decode_png(payload)
        return w, h, px.tobytes()
    if is_jpeg(payload or b""):
        w, h, px = decode_jpeg(payload)
        return w, h, px.tobytes()
    if not fake:
        raise NotImplementedError(
            "only PNG and baseline JPEG decode without an imaging library "
            "(PIL/cv2); run with fake=True for the deterministic stub"
        )
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    return w, ht, h  # 'pixels' stand-in: the digest


def decode_audio(payload: bytes, fake: bool = False) -> dict:
    """Decode an audio payload to its feature dict (see wav.wav_features).
    WAV PCM decodes for real; other formats stay stubbed."""
    from .wav import is_wav, wav_features

    if is_wav(payload or b""):
        return wav_features(payload)
    if not fake:
        raise NotImplementedError(
            "only RIFF/WAVE PCM decodes without an audio library; "
            "run with fake=True for the deterministic stub"
        )
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    n = min(32, max(1, len(payload or b"") // 1024))
    return {
        "sample_rate": 16000,
        "channels": 1,
        "n_frames": n,
        "duration_s": n / 16000.0,
        "rms": h[2] / 255.0,
        "peak": h[3] / 255.0,
        "zero_crossing_rate": h[4] / 255.0,
    }


def _real_image_feat(payload: bytes):
    """(feat8, frames) for a real PNG or baseline JPEG; corrupt payloads
    degrade to zeros."""
    import numpy as np

    from .jpeg import decode_jpeg, is_jpeg
    from .png import decode_png

    try:
        if is_jpeg(payload):
            _w, _h, px = decode_jpeg(payload)
        else:
            _w, _h, px = decode_png(payload)
    except Exception:
        return np.zeros(8, dtype="float32"), 0
    flat = px.reshape(-1)
    feat = np.zeros(8, dtype="float32")
    feat[: min(8, flat.size)] = flat[:8] / 255.0
    return feat, 1


def _real_audio_feat(payload: bytes):
    import numpy as np

    from .wav import wav_features

    try:
        f = wav_features(payload)
    except Exception:
        return np.zeros(8, dtype="float32"), 0
    feat = np.array(
        [
            f["duration_s"],
            f["rms"],
            f["peak"],
            f["zero_crossing_rate"],
            f["sample_rate"] / 48000.0,
            float(f["channels"]),
            min(f["n_frames"], 10**6) / 10**6,
            1.0,
        ],
        dtype="float32",
    )
    return feat, f["n_frames"]


def _real_video_feat(payload: bytes, sample_every: int = 4):
    """Frame-count + mean pixel of the sampled frames of a motion-PNG."""
    import numpy as np

    from .image_ops import frame_sample, split_frames

    try:
        n_frames = len(split_frames(payload))
        sampled = frame_sample(payload, every_n=sample_every, max_frames=8)
    except Exception:
        return np.zeros(8, dtype="float32"), 0
    feat = np.zeros(8, dtype="float32")
    for slot, (_idx, _w, _h, px) in enumerate(sampled[:8]):
        feat[slot] = float(px.mean()) / 255.0
    return feat, n_frames


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Feature-extract every media row: real decode for PNG/WAV/motion-PNG
    payloads, deterministic fake features (real Arrow plumbing) for
    formats this container can't decode. Partition-local; no shuffle."""
    import hashlib

    import numpy as np
    import pandas as pd

    from .jpeg import is_jpeg
    from .png import PNG_MAGIC

    from .wav import is_wav

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                payload = bytes(pdf["payload"].iat[i] or b"")
                kind = pdf["kind"].iat[i]
                digest = hashlib.sha256(payload).digest()
                if kind == "image":
                    if payload[:8] == PNG_MAGIC or is_jpeg(payload):
                        feat, frames = _real_image_feat(payload)
                    elif fake:
                        w, h, px = decode_image(payload, fake=True)
                        feat = (np.frombuffer(px, dtype=np.uint8)[:8] / 255.0).astype(
                            "float32"
                        )
                        frames = 1
                    else:
                        raise NotImplementedError(
                            "non-PNG/JPEG image needs an imaging library; use fake=True"
                        )
                elif kind == "audio":
                    if is_wav(payload):
                        feat, frames = _real_audio_feat(payload)
                    elif fake:
                        f = decode_audio(payload, fake=True)
                        feat = (
                            np.frombuffer(digest[:8], dtype=np.uint8) / 255.0
                        ).astype("float32")
                        frames = f["n_frames"]
                    else:
                        raise NotImplementedError(
                            "non-WAV audio needs an audio library; use fake=True"
                        )
                elif kind == "video":
                    if payload[:8] == PNG_MAGIC:
                        feat, frames = _real_video_feat(payload)
                    elif fake:
                        frames = min(32, max(1, len(payload) // 1024))
                        feat = (
                            np.frombuffer(digest[:8], dtype=np.uint8) / 255.0
                        ).astype("float32")
                    else:
                        raise NotImplementedError(
                            "non-motion-PNG video needs a codec library; use fake=True"
                        )
                else:
                    frames = 0
                    feat = np.zeros(8, dtype="float32")
                rows.append(
                    {
                        "media_id": pdf["media_id"].iat[i],
                        "kind": kind,
                        "n_bytes": len(payload),
                        "sha": digest[0],
                        "feat": feat.tolist(),
                        "frames": frames,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(features, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  method: str = "box") -> DataFrame:
    """Distributed image resize: PNG and baseline-JPEG payloads are
    decoded, resized (real pixel math — box average or nearest), and
    re-encoded in their own format. Corrupt or undecodable payloads
    yield ok=false with the original payload, never a task failure.
    Partition-local; no shuffle; binary in/out so the result can be
    written straight back to a media table."""
    import pandas as pd

    from .image_ops import resize_image

    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize target must be positive")

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                payload = bytes(pdf["payload"].iat[i] or b"")
                try:
                    out = resize_image(payload, out_w, out_h, method=method)
                    rows.append(
                        {
                            "media_id": pdf["media_id"].iat[i],
                            "payload": out,
                            "width": out_w,
                            "height": out_h,
                            "ok": True,
                        }
                    )
                except Exception:
                    rows.append(
                        {
                            "media_id": pdf["media_id"].iat[i],
                            "payload": payload,
                            "width": None,
                            "height": None,
                            "ok": False,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(do_resize, schema=RESIZE_SCHEMA)


def synth_media_dataframe(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table in the MEDIA_SCHEMA shape (payloads
    are hash noise, not decodable — exercises the stub path)."""
    import hashlib

    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 7)
        rows.append(
            {
                "media_id": i,
                "kind": kinds[i % 3],
                "payload": payload,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kinds[i % 3]],
                "width": None,
                "height": None,
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synth_real_media_dataframe(spark, n: int = 24, seed: int = 42) -> DataFrame:
    """Deterministic REAL media table: decodable PNG + JPEG images
    (alternating — JPEGs cycle through 4:4:4/4:2:2/4:2:0 subsampling and
    restart intervals, and the second half of the corpus encodes
    PROGRESSIVE (SOF2) streams so the decoder's spectral-selection /
    successive-approximation paths are exercised), WAV PCM audio, and
    motion-PNG video, synthesized with the repo's own encoders (no
    external fixtures)."""
    import math

    import numpy as np

    from .image_ops import encode_motion_png
    from .jpeg import encode_jpeg, encode_jpeg_progressive
    from .png import encode_png
    from .wav import encode_wav

    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 8 + i % 9, 6 + i % 7
            grad = (
                np.arange(h)[:, None, None] * 17
                + np.arange(w)[None, :, None] * 5
                + np.arange(3)[None, None, :] * 41
                + i
            ) % 256
            if (i // 3) % 2:
                if i >= 12:  # progressive share of the corpus
                    payload = encode_jpeg_progressive(
                        grad.astype(np.uint8),
                        quality=85 + (i % 3) * 5,
                        subsample=("444", "422", "420")[(i // 6) % 3],
                    )
                else:
                    payload = encode_jpeg(
                        grad.astype(np.uint8),
                        quality=85 + (i % 3) * 5,
                        subsample=("444", "422", "420")[(i // 6) % 3],
                        restart_interval=(i // 6) % 3,
                    )
            else:
                payload = encode_png(grad.astype(np.uint8), filter_type=i % 5)
            width, height = w, h
        elif kind == "audio":
            sr = 8000
            t = np.arange(sr // 4, dtype=np.float64) / sr
            freq = 220.0 * (1 + i % 5)
            wave = 0.5 * np.sin(2 * math.pi * freq * t)
            payload = encode_wav(wave.astype(np.float32), sr, bits=16)
            width = height = None
        else:
            frames = [
                ((np.full((6, 6), (i * 13 + f * 29) % 256, dtype=np.uint8)))
                for f in range(2 + i % 5)
            ]
            payload = encode_motion_png(frames)
            width, height = 6, 6
        if kind == "image":
            mime = "image/jpeg" if payload[:2] == b"\xff\xd8" else "image/png"
        else:
            mime = {"audio": "audio/wav", "video": "video/x-motion-png"}[kind]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "mime": mime,
                "width": width,
                "height": height,
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
