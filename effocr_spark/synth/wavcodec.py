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
    """RIFF bytes → ([n, ch] int16 samples, sample_rate).

    Walks the chunk list (extra chunks like LIST/INFO are skipped, as
    the spec allows). REAL decode paths: PCM16 (tag 1), G.711 A-law /
    μ-law (tags 6/7), IMA ADPCM (tag 0x11) — the compressed WAVs a web
    corpus actually contains. Anything else (MP3-in-WAV, float PCM…)
    raises NotImplementedError for a real library to handle."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    fact_samples = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            pcm = body
        elif cid == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack("<I", body[:4])
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, _, block_align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if ch == 0:
        raise ValueError("zero channels")
    if tag == 1 and bits == 16:
        samples = np.frombuffer(pcm, dtype="<i2")
        n = len(samples) // ch
        return samples[: n * ch].reshape(n, ch), rate
    if tag in (6, 7) and bits == 8:  # G.711 A-law / μ-law
        table = ALAW2LIN if tag == 6 else ULAW2LIN
        samples = table[np.frombuffer(pcm, dtype=np.uint8)]
        n = len(samples) // ch
        return samples[: n * ch].reshape(n, ch), rate
    if tag == 0x11 and bits == 4:  # IMA ADPCM
        if block_align < 4 * ch:
            raise ValueError("IMA block_align smaller than its headers")
        out = []
        for s in range(0, len(pcm) - (len(pcm) % block_align), block_align):
            out.append(_ima_decode_block(pcm[s:s + block_align], ch))
        samples = (np.concatenate(out) if out
                   else np.zeros((0, ch), np.int16))
        if fact_samples is not None:  # trim final-block padding
            samples = samples[:fact_samples]
        return samples, rate
    raise NotImplementedError(
        f"format tag {tag} at {bits} bits is not decoded here; plug a "
        f"real audio library in")


# ------------------------------------------------- compressed formats
# G.711 μ-law / A-law (format tags 7 / 6) and IMA ADPCM (tag 0x11) are
# the compressed WAVs a web corpus actually contains (telephony dumps,
# old recorders). All three decoders below are REAL, from the public
# G.711 / IMA specifications; remaining tags (MP3-in-WAV etc.) still
# raise for a library drop-in.

_ULAW_BIAS = 0x84

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int64)


def _ulaw_table() -> np.ndarray:
    """byte → int16, the Sun g711.c ulaw2linear formula (public)."""
    out = np.empty(256, np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u & 0x70) >> 4)
        out[b] = (_ULAW_BIAS - t) if (u & 0x80) else (t - _ULAW_BIAS)
    return out


def _alaw_table() -> np.ndarray:
    """byte → int16, the g711.c alaw2linear formula (public)."""
    out = np.empty(256, np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[b] = t if (a & 0x80) else -t
    return out


ULAW2LIN = _ulaw_table()
ALAW2LIN = _alaw_table()


def _lin2ulaw(sample: int) -> int:
    pcm = max(min(int(sample), 32635), -32635)
    sign = 0x80 if pcm < 0 else 0
    if pcm < 0:
        pcm = -pcm
    pcm += _ULAW_BIAS
    seg = 0
    while seg < 8 and pcm >= (0x100 << seg):
        seg += 1
    if seg >= 8:
        return ~(sign | 0x7F) & 0xFF
    return ~(sign | (seg << 4) | ((pcm >> (seg + 3)) & 0x0F)) & 0xFF


def _lin2alaw(sample: int) -> int:
    """g711.c linear2alaw: segment search over the 16-bit magnitude,
    quantization midpoints matching _alaw_table exactly (invariant
    pinned in tests: encode(decode(b)) == b for all 256 bytes)."""
    pcm = max(min(int(sample), 32767), -32768)
    if pcm >= 0:
        mask = 0xD5  # sign bit set, pre-xored with 0x55
    else:
        mask = 0x55
        pcm = -pcm - 8
        if pcm < 0:
            pcm = 0
    seg = 0
    for end in (0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF):
        if pcm <= end:
            break
        seg += 1
    else:
        return 0x7F ^ mask
    mant = (pcm >> 4) & 0x0F if seg < 2 else (pcm >> (seg + 3)) & 0x0F
    return ((seg << 4) | mant) ^ mask


def encode_wav_alaw(samples: np.ndarray, rate: int = 8000) -> bytes:
    """[n] or [n, ch] int16 → RIFF with format tag 6 (G.711 A-law)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = bytes(_lin2alaw(v) for v in s.reshape(-1))
    fmt = struct.pack("<HHIIHHH", 6, ch, rate, rate * ch, ch, 8, 0)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ulaw(samples: np.ndarray, rate: int = 8000) -> bytes:
    """[n] or [n, ch] int16 → RIFF with format tag 7 (G.711 μ-law)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = bytes(_lin2ulaw(v) for v in s.reshape(-1))
    fmt = struct.pack("<HHIIHHH", 7, ch, rate, rate * ch, ch, 8, 0)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _ima_decode_block(block: bytes, ch: int) -> np.ndarray:
    """One IMA ADPCM block → [samples, ch] int16 (IMA spec algorithm)."""
    preds = np.empty(ch, np.int64)
    idxs = np.empty(ch, np.int64)
    for c in range(ch):
        p, i = struct.unpack_from("<hBx", block, 4 * c)
        if i > 88:
            raise ValueError("IMA step index out of range")
        preds[c], idxs[c] = p, i
    body = block[4 * ch:]
    groups = len(body) // (4 * ch)  # 4 bytes (8 nibbles) per channel
    out = np.empty((1 + groups * 8, ch), np.int16)
    out[0] = preds
    for g in range(groups):
        for c in range(ch):
            chunk = body[(g * ch + c) * 4:(g * ch + c) * 4 + 4]
            p, i = int(preds[c]), int(idxs[c])
            for k in range(8):
                nib = (chunk[k // 2] >> (4 * (k % 2))) & 0x0F
                step = int(_IMA_STEPS[i])
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                p = p - diff if nib & 8 else p + diff
                p = max(min(p, 32767), -32768)
                i = max(min(i + int(_IMA_INDEX[nib & 7]), 88), 0)
                out[1 + g * 8 + k, c] = p
            preds[c], idxs[c] = p, i
    return out


def _ima_encode_block(s: np.ndarray, idxs: np.ndarray) -> tuple[bytes, np.ndarray]:
    """[1 + 8*g, ch] int16 → one IMA block; returns (bytes, next idxs).
    The quantizer updates its predictor through the DECODER's exact
    reconstruction, so decode(encode(x)) drift is bounded per the spec."""
    n, ch = s.shape
    out = bytearray()
    preds = s[0].astype(np.int64).copy()
    idxs = idxs.copy()
    for c in range(ch):
        out += struct.pack("<hBx", int(preds[c]), int(idxs[c]))
    groups = (n - 1) // 8
    for g in range(groups):
        for c in range(ch):
            nibbles = []
            p, i = int(preds[c]), int(idxs[c])
            for k in range(8):
                target = int(s[1 + g * 8 + k, c])
                step = int(_IMA_STEPS[i])
                delta = target - p
                nib = 8 if delta < 0 else 0
                if delta < 0:
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                # reconstruct exactly like the decoder
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                p = p - diff if nib & 8 else p + diff
                p = max(min(p, 32767), -32768)
                i = max(min(i + int(_IMA_INDEX[nib & 7]), 88), 0)
                nibbles.append(nib)
            for k in range(0, 8, 2):
                out.append(nibbles[k] | (nibbles[k + 1] << 4))
            preds[c], idxs[c] = p, i
    return bytes(out), idxs


def encode_wav_adpcm(samples: np.ndarray, rate: int = 16000,
                     samples_per_block: int = 505) -> bytes:
    """[n] or [n, ch] int16 → RIFF with format tag 0x11 (IMA ADPCM)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    spb = 1 + ((samples_per_block - 1) // 8) * 8  # 1 + multiple of 8
    block_align = 4 * ch + ((spb - 1) // 8) * 4 * ch
    idxs = np.zeros(ch, np.int64)
    blocks = []
    for start in range(0, n, spb):
        seg = s[start:start + spb]
        if seg.shape[0] < spb:  # pad the tail block by repeating the end
            pad = np.repeat(seg[-1:], spb - seg.shape[0], axis=0) \
                if seg.shape[0] else np.zeros((spb, ch), np.int16)
            seg = np.concatenate([seg, pad])
        blk, idxs = _ima_encode_block(seg, idxs)
        blocks.append(blk)
    data = b"".join(blocks)
    fmt = struct.pack("<HHIIHHHH", 0x11, ch, rate,
                      rate * block_align // spb, block_align, 4, 2, spb)
    fact = struct.pack("<I", n)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", 4) + fact
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body
