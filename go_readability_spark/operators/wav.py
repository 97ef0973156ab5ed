"""Pure-stdlib RIFF/WAVE PCM codec (struct + numpy): the real decode path
for the multimodal *audio* operators, companion to the PNG codec in
operators/png.py. Supports the common web subset — uncompressed integer
PCM (format tag 1) and IEEE float PCM (format tag 3), 8/16/24/32-bit,
any channel count (spec: RIFF/WAVE, public; Microsoft multimedia file
format). The encoder exists so tests can round-trip deterministic
waveforms without external fixtures.

Like decode_png, decode_wav validates sizes BEFORE materializing sample
arrays so a hostile header (tiny file claiming 10^9 frames) can never
allocate gigabytes inside an executor.
"""

from __future__ import annotations

import struct

WAV_MAGIC = b"RIFF"

# format tags we decode (WAVE_FORMAT_PCM, WAVE_FORMAT_IEEE_FLOAT)
_PCM = 1
_FLOAT = 3
_EXTENSIBLE = 0xFFFE

_MAX_DECODED_BYTES = 256 * 1024 * 1024  # same hostile-input bound as PNG


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == WAV_MAGIC and data[8:12] == b"WAVE"


def _chunks(data: bytes):
    """Walk RIFF sub-chunks; tolerant of a RIFF size field that disagrees
    with the actual payload (common in streamed/truncated captures)."""
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated WAV chunk")
        yield ctype, body
        pos += 8 + length + (length & 1)  # chunks are word-aligned


def decode_wav(data: bytes):
    """-> (sample_rate, samples) with samples an (n_frames, channels)
    float32 numpy array scaled to [-1, 1]."""
    import numpy as np

    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    fmt = None
    fmt_body = b""
    pcm = None
    for ctype, body in _chunks(data):
        if ctype == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif ctype == b"data":
            pcm = body
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    if pcm is None:
        raise ValueError("WAV missing data chunk")
    tag, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if tag == _EXTENSIBLE:
        # WAVE_FORMAT_EXTENSIBLE carries the real tag in the first 2
        # bytes of the SubFormat GUID (offset 24 of the fmt body: 16
        # base + 2 cbSize + 6 → GUID); fall back to PCM if truncated
        if len(fmt_body) >= 26:
            (tag,) = struct.unpack("<H", fmt_body[24:26])
        else:
            tag = _PCM
    if tag not in (_PCM, _FLOAT):
        raise ValueError(f"unsupported WAV format tag {tag} (PCM/float only)")
    if channels == 0 or sample_rate == 0:
        raise ValueError("WAV with zero channels or sample rate")
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported WAV bit depth {bits}")
    bytes_per_sample = bits // 8
    frame_bytes = bytes_per_sample * channels
    n_frames = len(pcm) // frame_bytes
    if n_frames * frame_bytes * 4 > _MAX_DECODED_BYTES:
        raise ValueError(
            f"WAV too large: {n_frames} frames x {channels}ch needs "
            f"{n_frames * frame_bytes * 4} bytes decoded"
        )
    pcm = pcm[: n_frames * frame_bytes]
    if tag == _FLOAT:
        if bits != 32:
            raise ValueError("float WAV must be 32-bit")
        arr = np.frombuffer(pcm, dtype="<f4").astype(np.float32)
    elif bits == 8:
        # 8-bit PCM is unsigned, biased at 128
        arr = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif bits == 16:
        arr = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 24:
        raw = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3)
        vals = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        arr = vals.astype(np.float32) / float(1 << 23)
    else:  # 32-bit int
        arr = np.frombuffer(pcm, dtype="<i4").astype(np.float32) / float(1 << 31)
    return sample_rate, arr.reshape(n_frames, channels)


def encode_wav(samples, sample_rate: int, bits: int = 16) -> bytes:
    """Minimal PCM encoder for (n,) or (n, channels) arrays in [-1, 1]."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, channels = arr.shape
    # float64 math: float32 can't represent 2^31-1, and the overflowing
    # cast back to int32 is undefined (numpy "invalid value in cast")
    clipped = np.clip(arr.astype(np.float64), -1.0, 1.0)
    if bits == 16:
        pcm = np.round(clipped * 32767.0).astype("<i2").tobytes()
    elif bits == 8:
        pcm = np.round(clipped * 127.0 + 128.0).astype(np.uint8).tobytes()
    elif bits == 32:
        pcm = np.round(clipped * float((1 << 31) - 1)).astype("<i4").tobytes()
    else:
        raise ValueError(f"encoder supports 8/16/32-bit, not {bits}")
    bytes_per_sample = bits // 8
    block_align = bytes_per_sample * channels
    fmt = struct.pack(
        "<HHIIHH", _PCM, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_features(data: bytes) -> dict:
    """Scalar features of a decoded WAV: the audio analogue of the PNG
    width/height/mean-pixel features (duration, rms, peak, zero-crossing
    rate on the channel mean)."""
    import numpy as np

    sample_rate, samples = decode_wav(data)
    n_frames = samples.shape[0]
    mono = samples.mean(axis=1) if samples.size else samples.reshape(0)
    rms = float(np.sqrt(np.mean(mono * mono))) if n_frames else 0.0
    peak = float(np.max(np.abs(samples))) if samples.size else 0.0
    if n_frames > 1:
        signs = np.signbit(mono)
        zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) / (n_frames - 1)
    else:
        zcr = 0.0
    return {
        "sample_rate": int(sample_rate),
        "channels": int(samples.shape[1]),
        "n_frames": int(n_frames),
        "duration_s": float(n_frames / sample_rate),
        "rms": rms,
        "peak": peak,
        "zero_crossing_rate": zcr,
    }
