"""Pure-stdlib PNG codec (zlib + struct + numpy): the real decode path for
the multimodal image operators in a container that ships no imaging
library. Supports the common web subset — 8-bit non-interlaced grayscale,
gray+alpha, RGB, RGBA, and palette images, all five scanline filters
(spec: https://www.w3.org/TR/png-3/, public). The encoder exists so tests
can round-trip every filter type without external fixtures.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def is_png(data: bytes) -> bool:
    return bool(data) and data[:8] == PNG_MAGIC


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int):
    """Reverse the per-scanline filters; returns height x (width*bpp) bytes."""
    import numpy as np

    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"decompressed size {len(raw)} != expected {height * (stride + 1)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: per-channel prefix sum mod 256 (uint8
            # cumsum wraps), replacing the per-byte Python loop — the
            # most common photo filter, O(stride) interpreted iterations
            # per line otherwise
            cur = (
                np.cumsum(
                    line.astype(np.uint8).reshape(-1, bpp), axis=0, dtype=np.uint8
                )
                .reshape(-1)
                .astype(np.int32)
            )
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes):
    """-> (width, height, pixels) with pixels an (h, w, channels) uint8
    numpy array (palette images are expanded to RGB)."""
    import numpy as np

    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    bpp = _CHANNELS[color_type]
    # hostile-input bound (same policy as the HTML depth cap): the exact
    # decompressed size is known BEFORE inflating — cap dimensions and
    # feed zlib a max_length so a decompression bomb (tiny IDAT claiming
    # 60000x60000) can never materialize gigabytes inside an executor
    expected = height * (width * bpp + 1)
    if expected > 256 * 1024 * 1024:
        raise ValueError(
            f"PNG too large: {width}x{height}x{bpp} needs {expected} bytes"
        )
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected)
        extra = (
            dec.decompress(dec.unconsumed_tail, 1) if dec.unconsumed_tail else b""
        )
    except zlib.error as exc:  # corrupt stream -> consistent error type
        raise ValueError(f"corrupt PNG IDAT: {exc}") from exc
    if extra:
        raise ValueError("PNG IDAT inflates past its declared size")
    flat = _unfilter(raw, width, height, bpp)
    px = flat.reshape(height, width, bpp)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        px = palette[px[:, :, 0]]
    return width, height, px


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """Minimal encoder for (h, w) or (h, w, {1,2,3,4}) uint8 arrays; the
    filter_type applies to every scanline (exists so tests can exercise
    each unfilter branch)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            enc = cur.copy()
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                enc[x] = (cur[x] - _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(filter_type)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
