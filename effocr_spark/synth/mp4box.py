"""Minimal REAL ISO-BMFF (MP4) box parser + fixture writer — pure stdlib.

Closes the "video" modality gap in the multimodal plumbing
(operators/multimodal.py): video rides as an opaque binary column, and
the useful metadata at pipeline scale — dimensions, duration, track
layout, brand — lives in the moov box tree, readable WITHOUT any codec.
Frame DECODE stays a declared library seam (no video codec in this
container and none needed for corpus curation); parse_mp4_meta is the
real production operation: a curation pipeline filters/buckets videos
by exactly these fields before any expensive decode.

Parser: box walk (32-bit and 64-bit `largesize` boxes), container
recursion (moov/trak/mdia/minf/stbl), ftyp brand, mvhd
timescale/duration (versions 0 and 1), tkhd width/height (16.16 fixed
point, versions 0 and 1), mdhd per-track timescale, hdlr handler type
(vide/soun). Structural corruption (truncated boxes, zero-size loops,
overrun) raises ValueError → quarantined `ok=False` rows upstream.

Layout reference: the public ISO/IEC 14496-12 specification.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def is_mp4(data: bytes) -> bool:
    return len(data) >= 8 and data[4:8] == b"ftyp"


def _walk(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize header")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos:
            raise ValueError(f"box {btype!r} size smaller than its header")
        if pos + size > end:
            raise ValueError(f"box {btype!r} overruns its container")
        yield btype, body, pos + size
        pos += size


def parse_mp4_meta(data: bytes) -> dict:
    """MP4 bytes → {'brand', 'duration_s', 'width', 'height',
    'n_tracks', 'handlers'} without touching any sample data."""
    if not is_mp4(data):
        raise ValueError("not an ISO-BMFF file (no ftyp)")
    meta = {"brand": None, "duration_s": 0.0, "width": 0, "height": 0,
            "n_tracks": 0, "handlers": []}
    for btype, b0, b1 in _walk(data, 0, len(data)):
        if btype == b"ftyp":
            meta["brand"] = data[b0:b0 + 4].decode("ascii", "replace")
        elif btype == b"moov":
            _parse_moov(data, b0, b1, meta)
    if meta["brand"] is None:
        raise ValueError("no ftyp box")
    return meta


def _parse_moov(data: bytes, start: int, end: int, meta: dict) -> None:
    for btype, b0, b1 in _walk(data, start, end):
        if btype == b"mvhd":
            ver = data[b0]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", data, b0 + 20)[0], \
                    struct.unpack_from(">Q", data, b0 + 24)[0]
            else:
                ts, dur = struct.unpack_from(">II", data, b0 + 12)
            if ts == 0:
                raise ValueError("mvhd timescale 0")
            meta["duration_s"] = round(dur / ts, 6)
        elif btype == b"trak":
            meta["n_tracks"] += 1
            _parse_trak(data, b0, b1, meta)


def _parse_trak(data: bytes, start: int, end: int, meta: dict) -> None:
    for btype, b0, b1 in _walk(data, start, end):
        if btype == b"tkhd":
            ver = data[b0]
            # width/height are the LAST two 16.16 fields of the box:
            # v0 body = 4 fullbox + 20 times/id + 8 rsvd + 8
            # layer/group/volume + 36 matrix = 76 before width; v1's
            # 64-bit times add 12
            w_off = b0 + (88 if ver == 1 else 76)
            if w_off + 8 > b1:
                raise ValueError("truncated tkhd")
            w, h = struct.unpack_from(">II", data, w_off)
            w, h = w >> 16, h >> 16
            if w and h:  # audio tracks carry 0x0 — keep the video dims
                meta["width"], meta["height"] = w, h
        elif btype == b"mdia":
            for t2, c0, c1 in _walk(data, b0, b1):
                if t2 == b"hdlr" and c0 + 12 <= c1:
                    meta["handlers"].append(
                        data[c0 + 8: c0 + 12].decode("ascii", "replace"))


# ------------------------------------------------------ fixture writer

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def make_mp4(width: int, height: int, duration_s: float,
             timescale: int = 1000, with_audio: bool = False,
             brand: bytes = b"isom") -> bytes:
    """Deterministic minimal-but-valid MP4: ftyp + moov(mvhd +
    video trak(tkhd+mdia(mdhd+hdlr)) [+ audio trak]) + tiny mdat.
    Enough structure for any box walker; no sample tables (the parser
    under test reads metadata only, like a curation pipeline would)."""
    dur = int(round(duration_s * timescale))
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0x200) + brand + b"mp41")
    mvhd = _box(b"mvhd", struct.pack(
        ">B3xIIII", 0, 0, 0, timescale, dur)
        + struct.pack(">IH2x", 0x00010000, 0x0100)
        + b"\x00" * 8
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 3))

    def trak(track_id: int, w: int, h: int, handler: bytes) -> bytes:
        tkhd = _box(b"tkhd", struct.pack(">I", 7)  # v0, flags=enabled
            + struct.pack(">IIII", 0, 0, track_id, 0)  # times, id, rsvd
            + struct.pack(">I", dur) + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0 if handler == b"vide" else 0x100,
                          0)
            + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", w << 16, h << 16))
        mdhd = _box(b"mdhd", struct.pack(
            ">B3xIIIIHH", 0, 0, 0, timescale, dur, 0x55C4, 0))
        hdlr = _box(b"hdlr", struct.pack(">B3xI", 0, 0) + handler
                    + b"\x00" * 12 + b"synthetic\x00")
        mdia = _box(b"mdia", mdhd + hdlr)
        return _box(b"trak", tkhd + mdia)

    traks = trak(1, width, height, b"vide")
    if with_audio:
        traks += trak(2, 0, 0, b"soun")
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat
