"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas.

Image decode is REAL for PNG (pure-stdlib codec in .png — zlib + struct;
8-bit gray/RGB/RGBA/palette, all five filters). Other image formats and
audio/video decode remain STUBBED (this container ships no imaging/audio
library): `decode_image` raises NotImplementedError for them unless
`fake=True`, in which case a deterministic fake decoder (seeded by the
content hash) exercises the real Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, width int, height int"
)
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha int, feat array<float>, frames int"
)


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload to (width, height, pixels). PNG decodes for
    real (stdlib codec); other formats need an imaging library this
    container doesn't ship, so they stay stubbed behind fake=True."""
    from .png import decode_png, is_png

    if is_png(payload or b""):
        w, h, px = decode_png(payload)
        return w, h, px.tobytes()
    if not fake:
        raise NotImplementedError(
            "only PNG decodes without an imaging library (PIL/cv2); "
            "run with fake=True for the deterministic stub"
        )
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    return w, ht, h  # 'pixels' stand-in: the digest


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Feature-extract every media row: deterministic fake features with
    real Arrow plumbing. Partition-local; no shuffle."""
    import hashlib

    import numpy as np
    import pandas as pd

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                payload = pdf["payload"].iat[i] or b""
                kind = pdf["kind"].iat[i]
                digest = hashlib.sha256(payload).digest()
                if kind == "image":
                    try:
                        w, h, px = decode_image(payload, fake=fake)
                        feat = (np.frombuffer(px, dtype=np.uint8)[:8] / 255.0).astype("float32")
                        frames = 1
                    except NotImplementedError:
                        raise  # caller asked for real decode of a stubbed format
                    except Exception:
                        # corrupt/truncated image: a crawl corpus is full of
                        # them — never fail the task for one bad payload
                        feat = np.zeros(8, dtype="float32")
                        frames = 0
                elif kind in ("audio", "video"):
                    # frame-sample stub: 1 frame per 1 KiB, capped
                    frames = min(32, max(1, len(payload) // 1024))
                    feat = (np.frombuffer(digest[:8], dtype=np.uint8) / 255.0).astype("float32")
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


def synth_media_dataframe(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table in the MEDIA_SCHEMA shape."""
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
