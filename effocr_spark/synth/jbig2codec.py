"""JBIG2 (ITU-T T.88) generic-region codec — from scratch, stdlib+numpy.

Scanned-document PDFs carry two bilevel encodings in practice: CCITT
G4 (synth/ccittcodec.py) and JBIG2. This implements the JBIG2 subset
those images need on the DECODE side — the embedded-stream segment
organization PDF's /JBIG2Decode uses (no file header), page
information segments, and immediate (lossless) generic region
segments coded with the MQ arithmetic coder over templates 0-3 with
optional TPGDON typical-prediction — plus a matching encoder for
fixture generation. Symbol dictionaries / text regions / halftone
regions / refinement (the compression-ratio features) are declared
seams: a generic-region-only stream is what image-oriented encoders
emit, and anything using the unimplemented segment types raises so
the caller quarantines.

Correctness strategy mirrors ccittcodec.py: the encoder and decoder
are independent walks of the published algorithm; tests pin (a) the
47-state MQ probability table structurally (spot values from T.88
Table E.1, Qe monotone envelope, index ranges), (b) MQ
encode→decode roundtrips over adversarial bit/context sequences
(incl. 0xFF-stuffing paths), and (c) generic-region roundtrips across
templates, TPGDON, AT-pixel placements, and sizes. No external JBIG2
oracle ships in this container, so cross-implementation interop rests
on following the spec's context layouts literally (6.2.5.7 figures);
that residual risk is documented here rather than hidden.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------ MQ coder (Annex E)
# (Qe, NMPS, NLPS, SWITCH) — T.88 Table E.1 (same table as JPEG2000).
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 Annex E software-conventions MQ decoder. Context state
    (index, MPS) lives in caller-supplied arrays so one decoder serves
    the whole region."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        d, bp = self.data, self.bp
        b = d[bp] if bp < len(d) else 0xFF
        if b == 0xFF:
            b1 = d[bp + 1] if bp + 1 < len(d) else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp += 1
            b1 = d[self.bp] if self.bp < len(d) else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, icx: np.ndarray, mps: np.ndarray, cx: int) -> int:
        qe, nmps, nlps, switch = _QE[icx[cx]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            if self.a < qe:  # conditional MPS/LPS exchange
                d = int(mps[cx])
                icx[cx] = nmps
            else:
                d = 1 - int(mps[cx])
                if switch:
                    mps[cx] = 1 - mps[cx]
                icx[cx] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return int(mps[cx])
            if self.a < qe:
                d = 1 - int(mps[cx])
                if switch:
                    mps[cx] = 1 - mps[cx]
                icx[cx] = nlps
            else:
                d = int(mps[cx])
                icx[cx] = nmps
        while True:  # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E MQ encoder (matching MQDecoder; roundtrip-pinned)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        # spec INITENC: BP = BPST - 1 — buffer[0] is the dummy
        # pre-byte that absorbs a leading carry; dropped at flush if
        # it stayed 0
        self.b: list[int] = [0]

    def _byteout(self) -> None:
        if self.b[-1] == 0xFF:
            self.b.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
            return
        if self.c >= 0x8000000:
            self.b[-1] += 1  # propagate carry into the last byte
            self.c &= 0x7FFFFFF
            if self.b[-1] == 0xFF:
                self.b.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
                return
        self.b.append((self.c >> 19) & 0xFF)
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, icx: np.ndarray, mps: np.ndarray, cx: int,
               d: int) -> None:
        qe, nmps, nlps, switch = _QE[icx[cx]]
        if d == int(mps[cx]):  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            icx[cx] = nmps
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                mps[cx] = 1 - mps[cx]
            icx[cx] = nlps
        while True:  # RENORME
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS
        tempc = self.c + self.a - 1
        tempc &= 0xFFFF0000
        if tempc < self.c:
            tempc += 0x8000
        self.c = tempc
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        body = self.b[1:] if self.b[0] == 0 else self.b
        # spec: discard trailing 0xFF bytes, then append the optional
        # 0xFF 0xAC marker
        while body and body[-1] == 0xFF:
            body = body[:-1]
        return bytes(body) + b"\xff\xac"


# ------------------------------- generic region coding (spec 6.2.5)

# nominal AT pixel placements per template (dx, dy)
_NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}
# TPGDON pseudo-pixel contexts per template (spec 6.2.5.7)
_TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}
_CTX_BITS = {0: 16, 1: 13, 2: 10, 3: 10}


def _ctx_fn(template: int, at: list[tuple[int, int]]):
    """Pixel-context builder for one template: (bitmap, x, y) → int.
    Bit layout follows the spec figures (LSB = nearest left pixel)."""
    if template == 0:
        a1, a2, a3, a4 = at
        spots = [(-1, 0), (-2, 0), (-3, 0), (-4, 0), a1,
                 (2, -1), (1, -1), (0, -1), (-1, -1), (-2, -1), a2,
                 a3, (1, -2), (0, -2), (-1, -2), a4]
    elif template == 1:
        (a1,) = at
        spots = [(-1, 0), (-2, 0), (-3, 0), a1,
                 (2, -1), (1, -1), (0, -1), (-1, -1), (-2, -1),
                 (2, -2), (1, -2), (0, -2), (-1, -2)]
    elif template == 2:
        (a1,) = at
        spots = [(-1, 0), (-2, 0), a1,
                 (1, -1), (0, -1), (-1, -1), (-2, -1),
                 (1, -2), (0, -2), (-1, -2)]
    elif template == 3:
        (a1,) = at
        spots = [(-1, 0), (-2, 0), (-3, 0), (-4, 0), a1,
                 (1, -1), (0, -1), (-1, -1), (-2, -1), (-3, -1)]
    else:
        raise ValueError(f"bad GBTEMPLATE {template}")

    def ctx(bm: np.ndarray, x: int, y: int) -> int:
        h, w = bm.shape
        c = 0
        for bit, (dx, dy) in enumerate(spots):
            xx, yy = x + dx, y + dy
            if 0 <= xx < w and 0 <= yy < h and bm[yy, xx]:
                c |= 1 << bit
        return c

    return ctx


def generic_region_decode(data: bytes, w: int, h: int,
                          template: int = 0, tpgdon: bool = False,
                          at: list[tuple[int, int]] | None = None
                          ) -> np.ndarray:
    """MQ-coded generic region → {0,1} bitmap (1 = black), spec
    6.2.5.7 per-pixel path (no skip bitmap, no refinement)."""
    at = at or _NOMINAL_AT[template]
    ctx = _ctx_fn(template, at)
    n_ctx = 1 << _CTX_BITS[template]
    icx = np.zeros(n_ctx, np.int64)
    mps = np.zeros(n_ctx, np.int64)
    dec = MQDecoder(data)
    bm = np.zeros((h, w), np.uint8)
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= dec.decode(icx, mps, _TPGDON_CTX[template])
            if ltp:
                if y > 0:
                    bm[y] = bm[y - 1]
                continue
        for x in range(w):
            bm[y, x] = dec.decode(icx, mps, ctx(bm, x, y))
    return bm


def generic_region_encode(bm: np.ndarray, template: int = 0,
                          tpgdon: bool = False,
                          at: list[tuple[int, int]] | None = None
                          ) -> bytes:
    """{0,1} bitmap → MQ-coded generic region (inverse of
    generic_region_decode; shared context builder ⇒ roundtrip by
    construction)."""
    at = at or _NOMINAL_AT[template]
    ctx = _ctx_fn(template, at)
    n_ctx = 1 << _CTX_BITS[template]
    icx = np.zeros(n_ctx, np.int64)
    mps = np.zeros(n_ctx, np.int64)
    enc = MQEncoder()
    h, w = bm.shape
    ltp = 0
    for y in range(h):
        if tpgdon:
            same = bool(y > 0 and np.array_equal(bm[y], bm[y - 1]))
            if ltp != same:
                enc.encode(icx, mps, _TPGDON_CTX[template], 1)
                ltp = int(same)
            else:
                enc.encode(icx, mps, _TPGDON_CTX[template], 0)
            if ltp:
                continue
        for x in range(w):
            enc.encode(icx, mps, ctx(bm, x, y), int(bm[y, x]))
    return enc.flush()


# --------------------------- embedded-stream segments (spec 7.2-7.4)

_SEG_PAGE_INFO = 48
_SEG_IMM_GENERIC = 38
_SEG_IMM_LOSSLESS_GENERIC = 39
_SEG_INTERMEDIATE_GENERIC = 36
_SEG_END_OF_PAGE = 49
_SEG_END_OF_STRIPE = 50
_SEG_END_OF_FILE = 51
_HARMLESS = {_SEG_END_OF_PAGE, _SEG_END_OF_STRIPE, _SEG_END_OF_FILE}


def parse_segments(data: bytes) -> list[tuple[int, int, bytes]]:
    """Embedded-organization JBIG2 (PDF /JBIG2Decode: no file header)
    → [(type, page, payload)]. Raises ValueError on structural
    corruption and on unknown-length segments."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 11 > n:
            if out:
                break  # trailing EOL padding after the last segment
                # (PDF stream framing includes the pre-endstream EOL)
            raise ValueError("truncated JBIG2 segment header")
        segnum = struct.unpack_from(">I", data, pos)[0]
        flags = data[pos + 4]
        stype = flags & 0x3F
        page4 = bool(flags & 0x40)
        pos += 5
        rts = data[pos]
        if (rts >> 5) == 7:
            cnt = struct.unpack_from(">I", data, pos)[0] & 0x1FFFFFFF
            pos += 4 + (cnt + 8) // 8
        else:
            cnt = rts >> 5
            pos += 1
        ref_size = 1 if segnum <= 256 else (2 if segnum <= 65536 else 4)
        pos += cnt * ref_size
        if page4:
            page = struct.unpack_from(">I", data, pos)[0]
            pos += 4
        else:
            page = data[pos]
            pos += 1
        length = struct.unpack_from(">I", data, pos)[0]
        pos += 4
        if length == 0xFFFFFFFF:
            raise ValueError("JBIG2 unknown-length segment")
        if pos + length > n:
            raise ValueError("truncated JBIG2 segment payload")
        out.append((stype, page, data[pos:pos + length]))
        pos += length
    return out


def jbig2_decode_embedded(data: bytes,
                          globals_data: bytes | None = None
                          ) -> np.ndarray:
    """PDF /JBIG2Decode stream → uint8 grayscale page (ink black = 0,
    background white = 255), same output contract as the CCITT codec.

    Supports the image-oriented subset: page information + immediate
    (lossless) generic regions, MQ-coded (templates 0-3, TPGDON, AT
    pixels) or MMR-coded (routed through the T.6 codec). Symbol/text/
    halftone/refinement segments raise NotImplementedError — the
    caller quarantines (skip, text layer still flows)."""
    segs = parse_segments(data)
    if globals_data:
        segs = parse_segments(globals_data) + segs
    page_w = page_h = None
    page: np.ndarray | None = None
    for stype, _pg, payload in segs:
        if stype == _SEG_PAGE_INFO:
            if len(payload) < 19:
                raise ValueError("short page info segment")
            page_w, page_h = struct.unpack_from(">II", payload, 0)
            if page_h == 0xFFFFFFFF:
                page_h = None  # striped page: grows with regions
            default = (payload[16] >> 2) & 1
            page = np.full((page_h or 0, page_w), default, np.uint8)
        elif stype in (_SEG_IMM_GENERIC, _SEG_IMM_LOSSLESS_GENERIC,
                       _SEG_INTERMEDIATE_GENERIC):
            if len(payload) < 18:
                raise ValueError("short generic region segment")
            rw, rh, rx, ry = struct.unpack_from(">IIII", payload, 0)
            flags = payload[17]
            mmr = flags & 1
            template = (flags >> 1) & 3
            tpgdon = bool(flags & 8)
            pos = 18
            at = None
            if not mmr:
                n_at = 4 if template == 0 else 1
                at = []
                for _ in range(n_at):
                    dx, dy = struct.unpack_from(">bb", payload, pos)
                    at.append((dx, dy))
                    pos += 2
            body = payload[pos:]
            if mmr:
                from .ccittcodec import g4_decode
                gray = g4_decode(body, rw, rh)
                bm = (gray == 0).astype(np.uint8)
            else:
                bm = generic_region_decode(body, rw, rh, template,
                                           tpgdon, at)
            if page is None:
                page_w, page_h = rx + rw, ry + rh
                page = np.zeros((page_h, page_w), np.uint8)
            if page.shape[0] < ry + rh:  # striped page grows
                grown = np.zeros((ry + rh, page.shape[1]), np.uint8)
                grown[: page.shape[0]] = page
                page = grown
            page[ry:ry + rh, rx:rx + rw] |= bm
        elif stype in _HARMLESS:
            continue
        else:
            raise NotImplementedError(
                f"JBIG2 segment type {stype} (symbol/text/halftone/"
                f"refinement); plug a real JBIG2 library in")
    if page is None or page.size == 0:
        raise ValueError("JBIG2 stream with no decodable page")
    return np.where(page == 1, np.uint8(0), np.uint8(255))


def _segment_header(segnum: int, stype: int, page: int,
                    length: int) -> bytes:
    return (struct.pack(">IB", segnum, stype & 0x3F)
            + b"\x00"  # no referred-to segments
            + struct.pack(">B", page)
            + struct.pack(">I", length))


def jbig2_encode_embedded(img: np.ndarray, template: int = 0,
                          tpgdon: bool = False, mmr: bool = False,
                          at: list[tuple[int, int]] | None = None
                          ) -> bytes:
    """uint8 grayscale (ink black = 0, threshold 128) → embedded-
    organization JBIG2: page info + one immediate lossless generic
    region + end of page. Inverse of jbig2_decode_embedded."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("jbig2_encode wants a 2-D uint8 array")
    bm = (img < 128).astype(np.uint8)
    h, w = bm.shape
    if mmr:
        from .ccittcodec import g4_encode
        body = g4_encode(img)
        flags = 1
        at_bytes = b""
    else:
        body = generic_region_encode(bm, template, tpgdon, at)
        flags = ((template & 3) << 1) | (8 if tpgdon else 0)
        at_list = at or _NOMINAL_AT[template]
        at_bytes = b"".join(struct.pack(">bb", dx, dy)
                            for dx, dy in at_list)
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01" + b"\x00\x00"
    region = (struct.pack(">IIII", w, h, 0, 0) + b"\x00"
              + struct.pack(">B", flags) + at_bytes + body)
    out = (_segment_header(0, _SEG_PAGE_INFO, 1, len(page_info))
           + page_info
           + _segment_header(1, _SEG_IMM_LOSSLESS_GENERIC, 1,
                             len(region)) + region
           + _segment_header(2, _SEG_END_OF_PAGE, 1, 0))
    return out
