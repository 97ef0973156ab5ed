"""Image resize and video frame-sampling over the pure-stdlib PNG codec
(operators/png.py) — the remaining legs of the multimodal surface
(decode / feature-extract / resize / frame-sample).

Resize is real pixel math (nearest-neighbor and box/area average, both
pure numpy). "Video" uses a motion-PNG container: a payload that is N
complete PNG streams back to back. The *container* framing is ours (this
sandbox ships no mp4/codec library — documented honestly here); the
*frame* codec is the real PNG decoder, and the frame-walk parses real
PNG chunk structure (signature → chunks → IEND) rather than searching
for magic bytes, so a PNG embedded inside another frame's payload can't
confuse it.
"""

from __future__ import annotations

import struct

from .png import PNG_MAGIC, decode_png, encode_png, is_png


# ------------------------------------------------------------------ resize

def resize_nearest(pixels, out_w: int, out_h: int):
    """Nearest-neighbor resize of an (h, w[, c]) uint8 array. Index map
    matches the common convention src = floor(dst * src_size / dst_size)."""
    import numpy as np

    arr = np.asarray(pixels)
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize target must be positive")
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :]]


def _box_reduce_axis(arr, out_n: int, axis: int):
    """1-D box-average (out_n < src size) along one axis, same ceil-split
    bucket edges and round-half-up integer rounding as the 2-D path."""
    import numpy as np

    moved = np.moveaxis(arr, axis, 0)
    n = moved.shape[0]
    integ = np.zeros((n + 1,) + moved.shape[1:], dtype=np.int64)
    np.cumsum(moved, axis=0, dtype=np.int64, out=integ[1:])
    edges = (np.arange(out_n + 1) * n + out_n - 1) // out_n
    e0, e1 = edges[:-1], edges[1:]
    sums = integ[e1] - integ[e0]
    lens = (e1 - e0).reshape((-1,) + (1,) * (moved.ndim - 1))
    out = ((sums + lens // 2) // lens).astype(np.uint8)
    return np.moveaxis(out, 0, axis)


def resize_box(pixels, out_w: int, out_h: int):
    """Box-filter (area-average) downscale: each output pixel is the mean
    of its source box. Any upscaled AXIS degrades to nearest independently
    (box smaller than one pixel), so mixed-direction resizes like
    10x2 -> 5x4 are valid. Uses an integral image so cost is O(h*w)
    regardless of box size."""
    import numpy as np

    arr = np.asarray(pixels)
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize target must be positive")
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if out_h >= h and out_w >= w:
        out = resize_nearest(arr, out_w, out_h)
        return out[:, :, 0] if squeeze else out
    if out_h >= h or out_w >= w:
        # mixed direction: box-average the downscaled axis, nearest the other
        if out_h < h:
            out = _box_reduce_axis(arr, out_h, axis=0)
            xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
            out = out[:, xs, :]
        else:
            out = _box_reduce_axis(arr, out_w, axis=1)
            ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
            out = out[ys, :, :]
        return out[:, :, 0] if squeeze else out
    # integral image with a zero row/col prepended: sum of any box in O(1)
    integ = np.zeros((h + 1, w + 1, c), dtype=np.int64)
    np.cumsum(np.cumsum(arr, axis=0, dtype=np.int64), axis=1, out=integ[1:, 1:])
    y_edges = (np.arange(out_h + 1) * h + out_h - 1) // out_h  # ceil split
    x_edges = (np.arange(out_w + 1) * w + out_w - 1) // out_w
    y0, y1 = y_edges[:-1], np.maximum(y_edges[1:], y_edges[:-1] + 1)
    x0, x1 = x_edges[:-1], np.maximum(x_edges[1:], x_edges[:-1] + 1)
    sums = (
        integ[y1[:, None], x1[None, :]]
        - integ[y0[:, None], x1[None, :]]
        - integ[y1[:, None], x0[None, :]]
        + integ[y0[:, None], x0[None, :]]
    )
    areas = ((y1 - y0)[:, None] * (x1 - x0)[None, :])[:, :, None]
    out = ((sums + areas // 2) // areas).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def resize_png(data: bytes, out_w: int, out_h: int, method: str = "box") -> bytes:
    """Decode → resize → re-encode. The Spark-side resize UDF body."""
    _w, _h, px = decode_png(data)
    if method == "nearest":
        resized = resize_nearest(px, out_w, out_h)
    elif method == "box":
        resized = resize_box(px, out_w, out_h)
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return encode_png(resized)


def resize_image(data: bytes, out_w: int, out_h: int, method: str = "box",
                 jpeg_quality: int = 85) -> bytes:
    """Format-preserving resize: PNG in → PNG out, baseline JPEG in →
    baseline JPEG out (4:4:4 re-encode). Raises on anything else — the
    resize_images operator maps that to ok=false per row."""
    from .jpeg import decode_jpeg, encode_jpeg, is_jpeg

    if not is_jpeg(data):
        return resize_png(data, out_w, out_h, method=method)
    _w, _h, px = decode_jpeg(data)
    if px.shape[2] == 1:
        px = px[:, :, 0]
    if method == "nearest":
        resized = resize_nearest(px, out_w, out_h)
    elif method == "box":
        resized = resize_box(px, out_w, out_h)
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return encode_jpeg(resized, quality=jpeg_quality)


# ------------------------------------------------------------ motion-PNG video

def _png_stream_end(data: bytes, start: int) -> int:
    """Offset one past the IEND chunk of the PNG starting at `start`,
    walking real chunk structure."""
    if data[start:start + 8] != PNG_MAGIC:
        raise ValueError("frame does not start with PNG signature")
    pos = start + 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        end = pos + 12 + length
        if end > n:
            raise ValueError("truncated PNG chunk in video frame")
        if ctype == b"IEND":
            return end
        pos = end
    raise ValueError("video frame PNG missing IEND")


def encode_motion_png(frames) -> bytes:
    """Concatenate per-frame PNG encodes into one payload."""
    return b"".join(encode_png(f) for f in frames)


def split_frames(data: bytes):
    """-> list of per-frame PNG byte strings (no decode)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        end = _png_stream_end(data, pos)
        out.append(data[pos:end])
        pos = end
    return out


def count_frames(data: bytes) -> int:
    return len(split_frames(data))


def frame_sample(data: bytes, every_n: int = 1, max_frames: int | None = None):
    """Decode every Nth frame (0, N, 2N, ...) of a motion-PNG payload.
    -> list of (frame_index, width, height, pixels). Frames are *parsed*
    cheaply (chunk walk) and only the sampled ones are decoded, which is
    the property that matters at scale: sampling 1/30 frames must not
    pay 30/30 decodes."""
    if every_n <= 0:
        raise ValueError("every_n must be >= 1")
    out = []
    for i, frame in enumerate(split_frames(data)):
        if i % every_n:
            continue
        w, h, px = decode_png(frame)
        out.append((i, w, h, px))
        if max_frames is not None and len(out) >= max_frames:
            break
    return out


__all__ = [
    "resize_nearest",
    "resize_box",
    "resize_png",
    "encode_motion_png",
    "split_frames",
    "count_frames",
    "frame_sample",
    "is_png",
]
