"""Write data/tiny_font.ttf — a tiny, structurally valid TrueType font
whose cmap covers a known charset, committed as the S6 fixture (the
sandbox has no real .ttf and no fontTools; the parser under test is
effocr_spark/functions/ttf.py).

Deterministic and spec-correct where it counts:
- sfnt offset table with proper searchRange/entrySelector/rangeShift;
- per-table checksums + head.checkSumAdjustment (0xB1B0AFBA - sum);
- cmap with THREE encoding records — (0,3) and (3,1) sharing one
  format-4 subtable (offset sharing, like real fonts) and a (1,0)
  format-0 Macintosh table covering ASCII only;
- the format-4 table uses idDelta segments for contiguous glyph runs
  AND one glyphIdArray/idRangeOffset segment (the punctuation segment
  maps to deliberately non-contiguous glyph ids), so both decode paths
  in the parser are exercised by the committed fixture;
- glyf/loca/hmtx/hhea are minimal-but-present (every glyph an empty
  outline) so generic sfnt tooling accepts the file.

Usage: python tools/make_tiny_font.py
"""

from __future__ import annotations

import os
import struct

# the coverage contract: ASCII core + accents + CJK → multiple
# format-4 segments with gaps
DIGITS = [ord(c) for c in "0123456789"]
UPPER = list(range(ord("A"), ord("Z") + 1))
LOWER = list(range(ord("a"), ord("z") + 1))
PUNCT = [ord(c) for c in "!,.?"]          # → glyphIdArray segment
ACCENTS = [ord(c) for c in "éèñ"]          # 0xE9, 0xE8, 0xF1
CJK = [ord(c) for c in "日本語"]
CODEPOINTS = sorted(DIGITS + UPPER + LOWER + PUNCT + ACCENTS + CJK)


def _segments(cps: list[int]) -> list[tuple[int, int]]:
    segs, start, prev = [], cps[0], cps[0]
    for c in cps[1:]:
        if c != prev + 1:
            segs.append((start, prev))
            start = c
        prev = c
    segs.append((start, prev))
    return segs


def build_cmap(cp_to_gid: dict[int, int]) -> bytes:
    cps = sorted(cp_to_gid)
    segs = _segments(cps) + [(0xFFFF, 0xFFFF)]
    seg_count = len(segs)

    # decide the encoding per segment: contiguous glyph run → idDelta;
    # otherwise (or, to pin the decode path, any segment containing
    # '!') → glyphIdArray
    use_array = []
    for start, end in segs:
        if start == 0xFFFF:
            use_array.append(False)
            continue
        gids = [cp_to_gid[c] for c in range(start, end + 1)]
        contiguous = all(g == gids[0] + i for i, g in enumerate(gids))
        use_array.append(not contiguous or start <= ord("!") <= end)

    end_codes, start_codes, deltas, range_offsets = [], [], [], []
    glyph_array: list[int] = []
    # idRangeOffset is relative to its own word; compute after we know
    # the per-segment array positions
    array_pos: list[int | None] = []
    for i, (start, end) in enumerate(segs):
        end_codes.append(end)
        start_codes.append(start)
        if start == 0xFFFF:
            deltas.append(1)       # maps 0xFFFF → 0 (notdef), canonical
            array_pos.append(None)
            continue
        if use_array[i]:
            deltas.append(0)
            array_pos.append(len(glyph_array))
            glyph_array.extend(cp_to_gid[c] for c in range(start, end + 1))
        else:
            deltas.append((cp_to_gid[start] - start) & 0xFFFF)
            array_pos.append(None)

    for i, (start, end) in enumerate(segs):
        if array_pos[i] is None:
            range_offsets.append(0)
        else:
            # distance in bytes from idRangeOffset[i] to its entries:
            # remaining rangeOffset words + preceding glyphArray words
            words_to_array_start = (seg_count - i) + array_pos[i]
            range_offsets.append(2 * words_to_array_start)

    seg_x2 = seg_count * 2
    search_range = 2 ** (seg_count.bit_length() - 1) * 2
    entry_selector = seg_count.bit_length() - 1
    range_shift = seg_x2 - search_range
    fmt4 = struct.pack(">HHHHHHH", 4, 0, 0, seg_x2, search_range,
                       entry_selector, range_shift)
    fmt4 += struct.pack(f">{seg_count}H", *end_codes)
    fmt4 += b"\x00\x00"  # reservedPad
    fmt4 += struct.pack(f">{seg_count}H", *start_codes)
    fmt4 += struct.pack(f">{seg_count}H",
                        *[d & 0xFFFF for d in deltas])
    fmt4 += struct.pack(f">{seg_count}H", *range_offsets)
    fmt4 += struct.pack(f">{len(glyph_array)}H", *glyph_array)
    fmt4 = fmt4[:2] + struct.pack(">H", len(fmt4)) + fmt4[4:]  # length

    # format 0: ASCII subset only (legacy Mac table)
    f0 = bytearray(262)
    struct.pack_into(">HHH", f0, 0, 0, 262, 0)
    for c, g in cp_to_gid.items():
        if c < 256 and g < 256 and c < 128:
            f0[6 + c] = g
    fmt0 = bytes(f0)

    n_rec = 3
    header = struct.pack(">HH", 0, n_rec)
    rec_size = 8
    fmt4_off = 4 + n_rec * rec_size
    fmt0_off = fmt4_off + len(fmt4)
    records = (
        struct.pack(">HHI", 0, 3, fmt4_off) +   # Unicode BMP
        struct.pack(">HHI", 1, 0, fmt0_off) +   # Macintosh Roman
        struct.pack(">HHI", 3, 1, fmt4_off)     # Windows BMP (shared!)
    )
    return header + records + fmt4 + fmt0


def _checksum(tbl: bytes) -> int:
    tbl += b"\x00" * (-len(tbl) % 4)
    return sum(struct.unpack(f">{len(tbl) // 4}I", tbl)) & 0xFFFFFFFF


def build_font() -> bytes:
    n_glyphs = 1 + len(CODEPOINTS)  # gid 0 = .notdef
    cp_to_gid = {c: i + 1 for i, c in enumerate(CODEPOINTS)}
    # shuffle the punctuation glyph ids deterministically so their
    # segment is non-contiguous → must use glyphIdArray
    p = [cp_to_gid[c] for c in PUNCT]
    for c, g in zip(PUNCT, p[::-1]):
        cp_to_gid[c] = g

    head = struct.pack(
        ">IIIIHHqqhhhhHHhhh",
        0x00010000,          # version 1.0
        0x00010000,          # fontRevision
        0,                   # checkSumAdjustment (patched below)
        0x5F0F3CF5,          # magicNumber
        0b0000000000001011,  # flags
        1000,                # unitsPerEm
        3700000000, 3700000000,  # created/modified (fixed, deterministic)
        0, 0, 100, 100,      # xMin yMin xMax yMax
        0,                   # macStyle
        8,                   # lowestRecPPEM
        2,                   # fontDirectionHint
        0,                   # indexToLocFormat (short loca)
        0)                   # glyphDataFormat
    # version + numGlyphs + 13 limit fields (maxPoints..maxComponentDepth)
    maxp = struct.pack(">I14H", 0x00010000, n_glyphs,
                       0, 0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0)
    hhea = struct.pack(">IhhhHhhhhhhhhhhhH", 0x00010000, 800, -200, 0,
                       500, 0, 0, 0, 500, 0, 0, 0, 0, 0, 0, 0, n_glyphs)
    hmtx = struct.pack(f">{n_glyphs * 2}H",
                       *([500, 0] * n_glyphs))
    glyf = b"\x00\x00"                       # one empty outline, padded
    loca = struct.pack(f">{n_glyphs + 1}H", *([0] * (n_glyphs + 1)))
    cmap = build_cmap(cp_to_gid)

    tables = {b"cmap": cmap, b"glyf": glyf, b"head": head, b"hhea": hhea,
              b"hmtx": hmtx, b"loca": loca, b"maxp": maxp}
    tags = sorted(tables)
    n = len(tags)
    pow2 = 2 ** (n.bit_length() - 1)
    offset_table = struct.pack(">IHHHH", 0x00010000, n, pow2 * 16,
                               pow2.bit_length() - 1, n * 16 - pow2 * 16)
    dir_off = 12 + 16 * n
    entries, blobs, off = [], [], dir_off
    for tag in tags:
        tbl = tables[tag]
        entries.append(struct.pack(">4sIII", tag, _checksum(tbl), off,
                                   len(tbl)))
        padded = tbl + b"\x00" * (-len(tbl) % 4)
        blobs.append(padded)
        off += len(padded)
    font = offset_table + b"".join(entries) + b"".join(blobs)
    adjustment = (0xB1B0AFBA - _checksum(font)) & 0xFFFFFFFF
    head_off = dir_off + sum(
        len(blobs[i]) for i, t in enumerate(tags) if t < b"head")
    font = (font[:head_off + 8] + struct.pack(">I", adjustment)
            + font[head_off + 12:])
    return font


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "tiny_font.ttf")
    font = build_font()
    with open(out, "wb") as f:
        f.write(font)
    print(f"wrote {out}: {len(font)} bytes, {len(CODEPOINTS)} mapped chars")


if __name__ == "__main__":
    main()
