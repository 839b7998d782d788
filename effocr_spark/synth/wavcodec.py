"""Minimal REAL WAV (RIFF/PCM16) codec — pure stdlib+NumPy.

The multimodal plumbing (operators/multimodal.py) treats audio as opaque
binary columns; this codec makes the `audio/wav` branch real the same
way synth/imgcodec.py makes PNG real: a self-contained encoder/decoder
for the uncompressed common case (PCM16 little-endian), with compressed
formats raising cleanly for a library drop-in. RIFF layout per the
public WAVE spec: 'RIFF' size 'WAVE' then 'fmt ' and 'data' chunks.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """[n] or [n, ch] int16 samples → RIFF/PCM16 bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM16 bytes → ([n, ch] int16 samples, sample_rate).

    Walks the chunk list (extra chunks like LIST/INFO are skipped, as the
    spec allows); only format tag 1 (PCM) at 16 bits is decoded —
    anything else raises NotImplementedError for a real library to
    handle."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, _, _, bits = fmt
    if tag != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 is decoded here (got format tag {tag}, {bits} "
            f"bits); plug a real audio library in for compressed formats")
    samples = np.frombuffer(pcm, dtype="<i2")
    n = len(samples) // ch
    return samples[: n * ch].reshape(n, ch), rate
