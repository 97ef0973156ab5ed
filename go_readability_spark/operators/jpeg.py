"""JPEG (JFIF) codec — pure stdlib + numpy, no imaging library.

Implements the baseline sequential DCT process of ITU-T Rec. T.81 (the
public JPEG standard): marker parse, Huffman entropy decode (with byte
de-stuffing and RSTn restart markers), dequantize, inverse zigzag, 8x8
IDCT, chroma upsampling for 4:2:0 / 4:2:2 subsampling, YCbCr→RGB — and
(round 5) the progressive DCT process (SOF2): spectral selection,
successive approximation, DC/AC first and refinement scans, EOB runs.
The encoders produce baseline and progressive streams with the standard
Annex K quantization and Huffman tables; both quantize identically, so
the round-trip tests assert baseline and progressive decodes of the
same image are pixel-EQUAL (the entropy layer is lossless).

Scope is the same honesty contract as .png: arithmetic coding, 12-bit
precision, and lossless/hierarchical processes raise
NotImplementedError with a clear message instead of decoding garbage.
A real crawl corpus is dominated by baseline JFIF with a material
progressive share — both now decode for real.

Like the PNG codec, this is the slow-but-correct reference path: the
point is real decoded pixels through the Arrow-batched plumbing
(operators/multimodal.py), not throughput — at scale the decode UDF is
embarrassingly parallel and partition-local either way.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

# zigzag order: index i of the scan -> (row, col) flattened offset
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1 luminance / chrominance quantization tables (quality 50 base)
STD_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
STD_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal DCT-II basis: idct2(B) = C.T @ B @ C, fdct2(b) = C @ b @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == JPEG_MAGIC


class _CorruptJpeg(ValueError):
    pass


# ------------------------------------------------------------------ decoding


def _build_decode_table(bits, huffval):
    """Canonical Huffman → dict (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the de-stuffed entropy stream."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.bitcnt = 0

    def read_bit(self) -> int:
        if self.bitcnt == 0:
            if self.pos >= len(self.data):
                raise _CorruptJpeg("entropy stream truncated")
            self.bitbuf = self.data[self.pos]
            self.pos += 1
            self.bitcnt = 8
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self):
        self.bitcnt = 0


def _decode_huffman(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise _CorruptJpeg("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def decode_jpeg(payload: bytes):
    """-> (width, height, pixels uint8 [h, w, c]) with c = 1 or 3.

    Baseline sequential DCT (SOF0/SOF1) and progressive DCT (SOF2 —
    spectral selection + successive approximation, DC and AC first and
    refinement scans, EOB runs, restart markers) are decoded;
    hierarchical/arithmetic/12-bit processes raise NotImplementedError
    (honest-stub contract)."""
    if not is_jpeg(payload):
        raise _CorruptJpeg("not a JPEG stream (missing SOI)")
    qt = {}
    dc_tables = {}
    ac_tables = {}
    frame = None
    restart_interval = 0
    coeff = None  # progressive: per-component coefficient store
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise _CorruptJpeg(f"expected marker at {i}")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: no payload
            continue
        (seglen,) = struct.unpack(">H", payload[i : i + 2])
        seg = payload[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = [0] + list(seg[p + 1 : p + 17])
                nsym = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + nsym])
                p += 17 + nsym
                table = _build_decode_table(bits, huffval)
                (dc_tables if tc == 0 else ac_tables)[th] = table
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported (8-bit only)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3], seg[7 + c * 3], seg[8 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                frame["mcux"], frame["mcuy"] = mcux, mcuy
                coeff = {
                    c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                                      dtype=np.int32)
                    for c in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEG are "
                f"supported; marker SOF{marker - 0xC0} (lossless/"
                "hierarchical/arithmetic) needs a codec library"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise _CorruptJpeg("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + c * 2], seg[2 + c * 2]
                comp = next(cc for cc in frame["comps"] if cc["id"] == cs)
                scan.append({"comp": comp, "dc": tdta >> 4, "ac": tdta & 0x0F})
            entropy_start = i + seglen
            if not frame.get("progressive"):
                return _decode_scan(
                    payload, entropy_start, frame, scan, qt, dc_tables,
                    ac_tables, restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            segments, end = _destuff(payload, entropy_start)
            _decode_progressive_scan(
                segments, frame, scan, coeff, ss, se, ahal >> 4, ahal & 0x0F,
                restart_interval, dc_tables, ac_tables,
            )
            i = end
            continue
        # APPn/COM/others: skip
        i += seglen
    if frame is not None and frame.get("progressive") and coeff is not None:
        return _planes_to_pixels(frame, _reconstruct_progressive(frame, qt, coeff))
    raise _CorruptJpeg("no SOS marker found")


def _destuff(payload: bytes, start: int):
    """Entropy bytes with 0xFF00 → 0xFF; stops at any non-RST marker.
    RSTn markers are recorded as segment boundaries.  Returns
    (segments, end_index) — end_index is the position of the terminating
    marker's 0xFF (so a progressive decoder can continue the marker
    loop at the next scan header)."""
    out = bytearray()
    segments = []
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker: new segment
                segments.append(bytes(out))
                out = bytearray()
                i += 2
                continue
            break  # real marker (EOI or next scan) ends the stream
        out.append(b)
        i += 1
    segments.append(bytes(out))
    return segments, i


def _decode_scan(payload, start, frame, scan, qt, dc_tables, ac_tables,
                 restart_interval):
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = {}
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)

    segments, _ = _destuff(payload, start)
    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in comps}
    n_mcu = mcux * mcuy

    for mcu in range(n_mcu):
        if restart_interval and mcu > 0 and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise _CorruptJpeg("missing restart segment")
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcux)
        for sc in scan:
            c = sc["comp"]
            dct = dc_tables.get(sc["dc"])
            act = ac_tables.get(sc["ac"])
            if dct is None or act is None:
                raise _CorruptJpeg("scan references undefined Huffman table")
            q = qt.get(c["tq"])
            if q is None:
                raise _CorruptJpeg("scan references undefined quant table")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coeffs = np.zeros(64, dtype=np.int32)
                    t = _decode_huffman(reader, dct)
                    diff = _extend(reader.read_bits(t), t)
                    pred[c["id"]] += diff
                    coeffs[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _decode_huffman(reader, act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise _CorruptJpeg("AC run past block end")
                        coeffs[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = coeffs * q
                    px = _idct2(block.reshape(8, 8)) + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px

    return _planes_to_pixels(frame, planes)


def _planes_to_pixels(frame, planes):
    """Crop each component plane to the sample grid, upsample chroma to
    full resolution, and color-convert — shared by the baseline and
    progressive reconstruction paths."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        p = p[:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])

    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, gray[:, :, None]
    if len(out_planes) != 3:
        raise NotImplementedError(f"{len(out_planes)}-component JPEG (CMYK?) not supported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ----------------------------------------------------- progressive decoding


def _comp_block_dims(frame, c):
    """Non-interleaved block-grid dims (T.81 A.2.2): blocks over the
    component's OWN sample grid, not the MCU-padded one."""
    hmax = max(cc["h"] for cc in frame["comps"])
    vmax = max(cc["v"] for cc in frame["comps"])
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8  # (block rows, block cols)


def _first_ac(reader, zz, ss, se, al, act, eobrun):
    """T.81 G.1.2.2: first AC scan of a band (Ah == 0) for one block;
    returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huffman(reader, act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise _CorruptJpeg("AC run past spectral band")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _refine_ac(reader, zz, ss, se, al, act, eobrun):
    """T.81 G.1.2.3: AC successive-approximation refinement for one
    block (Ah > 0).  History coefficients (already nonzero) receive a
    correction bit whenever the traversal passes them — including inside
    ZRL spans and EOB runs; newly-nonzero coefficients arrive as ±1<<Al.
    Returns the remaining EOB run."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        if reader.read_bit() and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huffman(reader, act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:  # EOB run covers this and the next blocks
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise _CorruptJpeg("AC refinement magnitude must be 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if zz[k]:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k <= se and val:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # finish this block inside the EOB run
            if zz[k]:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(segments, frame, scan, coeff, ss, se, ah, al,
                             restart_interval, dc_tables, ac_tables):
    """Decode one progressive scan into the per-component coefficient
    store.  DC scans (Ss == 0) may be MCU-interleaved; AC scans are
    single-component rasters over the component's own block grid.
    Restart markers reset DC predictors and the EOB run."""
    state = {"seg": 0, "reader": _BitReader(segments[0]),
             "pred": {sc["comp"]["id"]: 0 for sc in scan}, "eobrun": 0}

    def resync():
        state["seg"] += 1
        if state["seg"] >= len(segments):
            raise _CorruptJpeg("missing restart segment")
        state["reader"] = _BitReader(segments[state["seg"]])
        state["pred"] = {sc["comp"]["id"]: 0 for sc in scan}
        state["eobrun"] = 0

    def dc_unit(sc, zz):
        reader = state["reader"]
        if ah == 0:
            t = _decode_huffman(reader, dc_tables.get(sc["dc"]) or {})
            diff = _extend(reader.read_bits(t), t)
            state["pred"][sc["comp"]["id"]] += diff
            zz[0] = state["pred"][sc["comp"]["id"]] << al
        elif reader.read_bit():
            zz[0] |= 1 << al  # two's complement OR refines negatives too

    if ss == 0:
        if se != 0:
            raise _CorruptJpeg("progressive scan mixes DC and AC")
        if len(scan) > 1:  # MCU-interleaved DC scan
            mcux, mcuy = frame["mcux"], frame["mcuy"]
            for mcu in range(mcux * mcuy):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    resync()
                my, mx = divmod(mcu, mcux)
                for sc in scan:
                    c = sc["comp"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_unit(sc, coeff[c["id"]][my * c["v"] + by,
                                                       mx * c["h"] + bx])
        else:  # single-component DC scan: raster over its own grid
            sc = scan[0]
            bh, bw = _comp_block_dims(frame, sc["comp"])
            arr = coeff[sc["comp"]["id"]]
            for u in range(bh * bw):
                if restart_interval and u and u % restart_interval == 0:
                    resync()
                dc_unit(sc, arr[u // bw, u % bw])
        return

    if len(scan) != 1:
        raise _CorruptJpeg("progressive AC scan must be single-component")
    sc = scan[0]
    act = ac_tables.get(sc["ac"])
    if act is None:
        raise _CorruptJpeg("scan references undefined Huffman table")
    bh, bw = _comp_block_dims(frame, sc["comp"])
    arr = coeff[sc["comp"]["id"]]
    step = _refine_ac if ah else _first_ac
    for u in range(bh * bw):
        if restart_interval and u and u % restart_interval == 0:
            resync()
        state["eobrun"] = step(
            state["reader"], arr[u // bw, u % bw], ss, se, al, act,
            state["eobrun"])


def _reconstruct_progressive(frame, qt, coeff):
    """Dequantize + IDCT every accumulated block into component planes
    (same math as the baseline per-block path)."""
    planes = {}
    for c in frame["comps"]:
        q = qt.get(c["tq"])
        if q is None:
            raise _CorruptJpeg("frame references undefined quant table")
        arr = coeff[c["id"]]
        bh, bw = arr.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                block = np.zeros(64, dtype=np.float64)
                block[ZIGZAG] = arr[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct2(block.reshape(8, 8)) + 128.0
                )
        planes[c["id"]] = plane
    return planes


# ------------------------------------------------------------------ encoding


def _build_encode_table(bits, huffval):
    """Canonical Huffman → symbol -> (code, length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    __slots__ = ("out", "bitbuf", "bitcnt")

    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.bitcnt = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.bitbuf = (self.bitbuf << 1) | ((code >> i) & 1)
            self.bitcnt += 1
            if self.bitcnt == 8:
                self.out.append(self.bitbuf)
                if self.bitbuf == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.bitbuf = 0
                self.bitcnt = 0

    def flush(self):
        if self.bitcnt:
            self.bitbuf = (self.bitbuf << (8 - self.bitcnt)) | ((1 << (8 - self.bitcnt)) - 1)
            self.out.append(self.bitbuf)
            if self.bitbuf == 0xFF:
                self.out.append(0x00)
            self.bitbuf = 0
            self.bitcnt = 0


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _magnitude(v: int):
    """(category, code-bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a plane to (ph, pw)."""
    h, w = plane.shape
    out = np.empty((ph, pw), dtype=plane.dtype)
    out[:h, :w] = plane
    if w < pw:
        out[:h, w:] = plane[:, w - 1 : w]
    if h < ph:
        out[h:, :] = out[h - 1 : h, :]
    return out


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Mean-pool by (fy, fx), edge-replicating to a multiple first."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = _pad_to(plane, ph, pw)
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def _encode_block(writer, block, q, dc_tab, ac_tab, pred_dc: int) -> int:
    """FDCT + quantize + Huffman-encode one 8x8 block; returns new DC."""
    coef = _C @ (block - 128.0) @ _C.T
    quant = np.round(coef.reshape(-1) / q).astype(np.int32)
    zz = quant[ZIGZAG]
    diff = int(zz[0]) - pred_dc
    t, bitsv = _magnitude(diff)
    code, length = dc_tab[t]
    writer.write(code, length)
    if t:
        writer.write(bitsv, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        t, bitsv = _magnitude(v)
        code, length = ac_tab[(run << 4) | t]
        writer.write(code, length)
        writer.write(bitsv, t)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsample: str = "444", restart_interval: int = 0) -> bytes:
    """Encode [h, w] grayscale or [h, w, 3] RGB uint8 to baseline JFIF
    (standard Annex K tables, IJG quality scaling).

    subsample: "444" (no chroma subsampling), "422" (2x1), or "420"
    (2x2 — the dominant layout in real crawls); ignored for grayscale.
    restart_interval > 0 writes a DRI segment and RSTn markers every
    that many MCUs (exercises the decoder's restart-resync path)."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError(f"expected 1 or 3 channels, got {nc}")
    px = px.astype(np.float64)
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        comps_px = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        factors = {
            "444": [(1, 1), (1, 1), (1, 1)],
            "422": [(2, 1), (1, 1), (1, 1)],
            "420": [(2, 2), (1, 1), (1, 1)],
        }.get(subsample)
        if factors is None:
            raise ValueError(f"subsample must be 444/422/420, got {subsample!r}")
    else:
        comps_px = [px[..., 0]]
        factors = [(1, 1)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component sampled plane, padded to the MCU grid
    planes = []
    for (fh, fv), plane in zip(factors, comps_px):
        sampled = _box_downsample(plane, vmax // fv, hmax // fh)
        planes.append(_pad_to(sampled, mcuy * 8 * fv, mcux * 8 * fh))

    luma_q = _scale_qt(STD_LUMA_QT, quality)
    chroma_q = _scale_qt(STD_CHROMA_QT, quality)
    qts = [luma_q] + ([chroma_q] if nc == 3 else [])

    dc_enc = [_build_encode_table(*STD_DC_LUMA), _build_encode_table(*STD_DC_CHROMA)]
    ac_enc = [_build_encode_table(*STD_AC_LUMA), _build_encode_table(*STD_AC_CHROMA)]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qts):
        # stored in zigzag order: element i of the segment is q[zigzag[i]]
        zz = q.reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(v) for v in zz)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        fh, fv = factors[c]
        out += bytes([c + 1, (fh << 4) | fv, 0 if c == 0 else 1])
    for tc, tables in ((0, (STD_DC_LUMA, STD_DC_CHROMA)), (1, (STD_AC_LUMA, STD_AC_CHROMA))):
        for th in range(2 if nc == 3 else 1):
            bits, huffval = tables[th]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval))
            out += bytes([(tc << 4) | th]) + bytes(bits[1:17]) + bytes(huffval)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for c in range(nc):
        t = 0 if c == 0 else 1
        out += bytes([c + 1, (t << 4) | t])
    out += bytes([0, 63, 0])

    writer = _BitWriter()
    pred = [0] * nc
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu > 0 and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            writer = _BitWriter()
            pred = [0] * nc
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            fh, fv = factors[ci]
            ti = 0 if ci == 0 else 1
            for by in range(fv):
                for bx in range(fh):
                    y0 = (my * fv + by) * 8
                    x0 = (mx * fh + bx) * 8
                    block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                    pred[ci] = _encode_block(
                        writer, block, qts[ti], dc_enc[ti], ac_enc[ti], pred[ci]
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------- progressive encoding


def _quantize_planes(pixels: np.ndarray, quality: int, subsample: str):
    """Shared encoder front half: color transform, subsample, pad, FDCT,
    quantize.  Returns (h, w, nc, factors, qts natural-order,
    coeffs[comp][by, bx, 64] zigzag int32 over the MCU-padded grid,
    mcux, mcuy)."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError(f"expected 1 or 3 channels, got {nc}")
    px = px.astype(np.float64)
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        comps_px = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        factors = {
            "444": [(1, 1), (1, 1), (1, 1)],
            "422": [(2, 1), (1, 1), (1, 1)],
            "420": [(2, 2), (1, 1), (1, 1)],
        }.get(subsample)
        if factors is None:
            raise ValueError(f"subsample must be 444/422/420, got {subsample!r}")
    else:
        comps_px = [px[..., 0]]
        factors = [(1, 1)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    luma_q = _scale_qt(STD_LUMA_QT, quality)
    chroma_q = _scale_qt(STD_CHROMA_QT, quality)
    qts = [luma_q] + ([chroma_q] if nc == 3 else [])
    coeffs = []
    for ci, ((fh, fv), plane) in enumerate(zip(factors, comps_px)):
        sampled = _box_downsample(plane, vmax // fv, hmax // fh)
        padded = _pad_to(sampled, mcuy * 8 * fv, mcux * 8 * fh)
        q = qts[0 if ci == 0 else 1]
        bh, bw = mcuy * fv, mcux * fh
        arr = np.zeros((bh, bw, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw):
                block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _C @ (block - 128.0) @ _C.T
                arr[by, bx] = np.round(coef.reshape(-1) / q).astype(np.int32)[ZIGZAG]
        coeffs.append(arr)
    return h, w, nc, factors, qts, coeffs, mcux, mcuy


def _first_ac_encode_block(writer, zz, ss, se, al, ac_tab):
    """First AC scan of a band: baseline-style run/size over the
    point-transformed values; per-block EOB0 (no cross-block EOB-run
    batching — decoders must accept both)."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, length = ac_tab[0xF0]
            writer.write(code, length)
            r -= 16
        s, _ = _magnitude(t)
        code, length = ac_tab[(r << 4) | s]
        writer.write(code, length)
        mag = t if v > 0 else -t
        _, bitsv = _magnitude(mag)
        writer.write(bitsv, s)
        r = 0
    if r > 0:
        code, length = ac_tab[0x00]  # EOB (run of one block)
        writer.write(code, length)


def _refine_ac_encode_block(writer, zz, ss, se, al, ac_tab):
    """AC refinement scan (Ah = Al + 1): newly-nonzero coefficients as
    (run, 1) + sign, history coefficients as appended correction bits —
    the bit order _refine_ac consumes."""
    absv = [abs(int(zz[k])) >> al for k in range(se + 1)]
    # eob = last newly-nonzero position; ZRLs are only valid inside it
    eob = ss - 1
    for k in range(ss, se + 1):
        if absv[k] == 1:
            eob = k
    r = 0
    pending = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        # flush ZRLs at EVERY nonzero (incl. history) so the buffered
        # correction bits always lie within the decoder's 16-zero window
        while r > 15 and k <= eob:
            code, length = ac_tab[0xF0]
            writer.write(code, length)
            r -= 16
            for b in pending:
                writer.write(b, 1)
            pending = []
        if t > 1:  # history: correction bit rides behind the next symbol
            pending.append(t & 1)
            continue
        code, length = ac_tab[(r << 4) | 1]
        writer.write(code, length)
        writer.write(1 if int(zz[k]) > 0 else 0, 1)
        for b in pending:
            writer.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        code, length = ac_tab[0x00]  # EOB; correction bits follow
        writer.write(code, length)
        for b in pending:
            writer.write(b, 1)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 85,
                            subsample: str = "444") -> bytes:
    """Encode to progressive JFIF (SOF2) with a scan script that
    exercises the full progressive surface: interleaved DC first scan at
    Al=1, per-component spectral-selection AC first scans (1-5, 6-63) at
    Al=1, a raw-bit DC refinement scan, and per-band AC refinement scans
    down to Al=0.  Quantized coefficients are IDENTICAL to
    :func:`encode_jpeg` at the same quality/subsampling, so baseline and
    progressive decodes of the same image must produce equal pixels (the
    entropy layer is lossless) — the round-trip test asserts exactly
    that."""
    h, w, nc, factors, qts, coeffs, mcux, mcuy = _quantize_planes(
        pixels, quality, subsample)

    dc_enc = [_build_encode_table(*STD_DC_LUMA), _build_encode_table(*STD_DC_CHROMA)]
    ac_enc = [_build_encode_table(*STD_AC_LUMA), _build_encode_table(*STD_AC_CHROMA)]

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qts):
        zz = q.reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(v) for v in zz)
    out += b"\xff\xc2" + struct.pack(">H", 8 + 3 * nc) + bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        fh, fv = factors[c]
        out += bytes([c + 1, (fh << 4) | fv, 0 if c == 0 else 1])
    for tc, tables in ((0, (STD_DC_LUMA, STD_DC_CHROMA)), (1, (STD_AC_LUMA, STD_AC_CHROMA))):
        for th in range(2 if nc == 3 else 1):
            bits, huffval = tables[th]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval))
            out += bytes([(tc << 4) | th]) + bytes(bits[1:17]) + bytes(huffval)

    def sos_header(comp_idx, ss, se, ah, al):
        hdr = bytearray(b"\xff\xda")
        ids = range(nc) if comp_idx is None else [comp_idx]
        hdr += struct.pack(">H", 6 + 2 * len(ids)) + bytes([len(ids)])
        for ci in ids:
            t = 0 if ci == 0 else 1
            hdr += bytes([ci + 1, (t << 4) | t])
        hdr += bytes([ss, se, (ah << 4) | al])
        return bytes(hdr)

    # scan 1: DC first, all components interleaved, Al=1
    out += sos_header(None, 0, 0, 0, 1)
    writer = _BitWriter()
    pred = [0] * nc
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            fh, fv = factors[ci]
            ti = 0 if ci == 0 else 1
            for by in range(fv):
                for bx in range(fh):
                    zz0 = int(coeffs[ci][my * fv + by, mx * fh + bx, 0]) >> 1
                    diff = zz0 - pred[ci]
                    pred[ci] = zz0
                    t, bitsv = _magnitude(diff)
                    code, length = dc_enc[ti][t]
                    writer.write(code, length)
                    if t:
                        writer.write(bitsv, t)
    writer.flush()
    out += writer.out

    bands = [(1, 5), (6, 63)]
    frame = {"w": w, "h": h, "comps": [
        {"id": ci + 1, "h": factors[ci][0], "v": factors[ci][1]}
        for ci in range(nc)
    ]}
    # per-component AC first scans at Al=1 (spectral selection)
    for ci in range(nc):
        bh, bw = _comp_block_dims(frame, frame["comps"][ci])
        for ss, se in bands:
            out += sos_header(ci, ss, se, 0, 1)
            writer = _BitWriter()
            for u in range(bh * bw):
                _first_ac_encode_block(
                    writer, coeffs[ci][u // bw, u % bw], ss, se, 1,
                    ac_enc[0 if ci == 0 else 1])
            writer.flush()
            out += writer.out
    # DC refinement: raw bits, interleaved
    out += sos_header(None, 0, 0, 1, 0)
    writer = _BitWriter()
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            fh, fv = factors[ci]
            for by in range(fv):
                for bx in range(fh):
                    writer.write(int(coeffs[ci][my * fv + by, mx * fh + bx, 0]) & 1, 1)
    writer.flush()
    out += writer.out
    # per-component AC refinement scans to Al=0
    for ci in range(nc):
        bh, bw = _comp_block_dims(frame, frame["comps"][ci])
        for ss, se in bands:
            out += sos_header(ci, ss, se, 1, 0)
            writer = _BitWriter()
            for u in range(bh * bw):
                _refine_ac_encode_block(
                    writer, coeffs[ci][u // bw, u % bw], ss, se, 0,
                    ac_enc[0 if ci == 0 else 1])
            writer.flush()
            out += writer.out

    out += b"\xff\xd9"
    return bytes(out)
