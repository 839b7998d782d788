"""CCITT Group 4 (T.6) codec + scanned-PDF fax integration.

No external fax oracle exists in this container, so correctness rests
on three independent legs: structural table properties a transcription
slip would break, hand-derived known-answer bitstreams for the 2-D
modes, and encoder↔decoder roundtrips over every code-path class
(terminating / makeup / multi-makeup runs, pass/vertical/horizontal
modes, BlackIs1, unsized images)."""

import numpy as np
import pytest

from effocr_spark.synth.ccittcodec import (_BLACK_MAKEUP, _BLACK_TERM,
                                           _EOFB, _EXT_MAKEUP,
                                           _WHITE_MAKEUP, _WHITE_TERM,
                                           g4_decode, g4_encode)


def _all_codes(color):
    term = _BLACK_TERM if color else _WHITE_TERM
    makeup = _BLACK_MAKEUP if color else _WHITE_MAKEUP
    return {**term, **makeup, **_EXT_MAKEUP}


@pytest.mark.parametrize("color", [0, 1])
def test_tables_prefix_free_and_unique(color):
    """The per-color code space must be prefix-free and duplicate-free
    — the structural property any transcription error in the published
    T.4 tables would almost surely break."""
    codes = list(_all_codes(color).values())
    assert len(codes) == len(set(codes))
    s = sorted(codes)
    for a, b in zip(s, s[1:]):
        assert not b.startswith(a), (a, b)


def test_table_shapes():
    """Counts and length ranges pinned to the published tables."""
    assert len(_WHITE_TERM) == 64 and len(_BLACK_TERM) == 64
    assert len(_WHITE_MAKEUP) == 27 and len(_BLACK_MAKEUP) == 27
    assert len(_EXT_MAKEUP) == 13
    assert set(_EXT_MAKEUP) == set(range(1792, 2561, 64))
    assert all(4 <= len(b) <= 9 for b in _WHITE_TERM.values())
    assert all(2 <= len(b) <= 12 for b in _BLACK_TERM.values())
    assert all(10 <= len(b) <= 13 for b in _BLACK_MAKEUP.values())


def test_kat_all_white_rows():
    """An all-white row against an all-white reference is exactly one
    V0 bit (b1 = a1 = width) — hand-derivable from T.6 directly."""
    enc = g4_encode(np.full((3, 8), 255, np.uint8))
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("111" + _EOFB)


def test_kat_all_black_rows():
    """All-black width-2 image, hand-derived: row 0 against the
    imaginary white reference has b1=2, a1=0 → VL2 (000010), then V0
    at width; rows 1-2 track the reference exactly → V0 V0. Vertical
    coding is REQUIRED here (|a1-b1| ≤ 3 prefers vertical over
    horizontal per T.6)."""
    enc = g4_encode(np.zeros((3, 2), np.uint8))
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("000010" + "1" + "11" + "11" + _EOFB)


def test_kat_pass_mode():
    """Reference has a black run the coding line skips entirely →
    pass mode (0001). Row0: black at cols 4-5 of 8; row1 all white:
    b1=4,b2=6 both left of a1=8 → 0001, then V0 at width."""
    img = np.full((2, 8), 255, np.uint8)
    img[0, 4:6] = 0
    enc = g4_encode(img)
    bits = "".join(f"{b:08b}" for b in enc)
    # row0: a1=4,b1=8 → horizontal 001 + white4(1011) + black2(11)
    row0 = "001" + "1011" + "11" + "1"  # trailing V0 closes at width
    assert bits.startswith(row0 + "0001" + "1" + _EOFB)


@pytest.mark.parametrize("h,w,p", [
    (1, 1, 0.5), (3, 8, 0.4), (5, 61, 0.2), (7, 64, 0.6),
    (4, 200, 0.4), (2, 3000, 0.5), (16, 16, 0.3),
])
def test_roundtrip_random(h, w, p):
    rng = np.random.RandomState(h * 1000 + w)
    img = np.where(rng.rand(h, w) < p, np.uint8(0), np.uint8(255))
    assert np.array_equal(g4_decode(g4_encode(img), w, h), img)


def test_roundtrip_long_runs_multi_makeup():
    """Runs > 2560 need chained extended makeup codes."""
    img = np.full((2, 6000), 255, np.uint8)
    img[1, 100:5800] = 0
    assert np.array_equal(g4_decode(g4_encode(img), 6000, 2), img)


def test_roundtrip_black_is_1_and_unsized():
    rng = np.random.RandomState(3)
    img = np.where(rng.rand(6, 50) < 0.3, np.uint8(0), np.uint8(255))
    assert np.array_equal(
        g4_decode(g4_encode(img, black_is_1=True), 50, 6,
                  black_is_1=True), img)
    # rows=None: decode until EOFB
    assert np.array_equal(g4_decode(g4_encode(img), 50, None), img)


def test_truncated_stream_raises():
    img = np.where(np.random.RandomState(5).rand(4, 40) < 0.4,
                   np.uint8(0), np.uint8(255))
    enc = g4_encode(img)
    with pytest.raises(ValueError):
        g4_decode(enc[: len(enc) // 3], 40, 4)


def test_fax_pdf_images_decode_to_png():
    from effocr_spark.functions.pdftext import (extract_pdf_images,
                                                extract_pdf_text)
    from effocr_spark.synth.font import render_line
    from effocr_spark.synth.imgcodec import decode_png
    from effocr_spark.synth.pdfgen import make_fax_pdf

    img = render_line("Farm house print line")[0]
    thr = np.where(img < 128, np.uint8(0), np.uint8(255))
    pdf = make_fax_pdf([img], text_lines=[["Fax page text layer"]])
    imgs = extract_pdf_images(pdf)
    assert len(imgs) == 1 and imgs[0][:4] == b"\x89PNG"
    assert np.array_equal(decode_png(imgs[0]), thr)
    assert "Fax page text layer" in extract_pdf_text(pdf)
    # BlackIs1 flips the coded bit sense, not the decoded image
    out = extract_pdf_images(make_fax_pdf([img], black_is_1=True,
                                          omit_rows=True))
    assert np.array_equal(decode_png(out[0]), thr)


def test_fax_scan_through_pipeline(spark, protos_bc):
    """End-to-end: a no-text-layer G4 fax PDF OCRs through the same
    branch as DCT scans and fuses per url."""
    from effocr_spark.pipeline import extract_pages
    from effocr_spark.synth.font import render_line
    from effocr_spark.synth.pdfgen import make_fax_pdf

    img = render_line("town gazette says 1890")[0]
    pdf = make_fax_pdf([img])
    df = spark.createDataFrame(
        [("pdf://fax/e2e", None, bytearray(pdf), None, "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    out = extract_pages(df, protos_bc, embedded_images=True).collect()
    assert len(out) == 1 and out[0]["ok"]
    assert out[0]["extracted_text"].lower() == "town gazette says 1890"


@pytest.mark.parametrize("eol", [False, True])
def test_g3_1d_roundtrip(eol):
    from effocr_spark.synth.ccittcodec import g3_decode, g3_encode

    rng = np.random.RandomState(21)
    for (h, w, p) in [(1, 1, 0.5), (4, 40, 0.3), (2, 3000, 0.5)]:
        img = np.where(rng.rand(h, w) < p, np.uint8(0), np.uint8(255))
        assert np.array_equal(
            g3_decode(g3_encode(img, eol=eol), w, h), img)


def test_g3_mixed_mode_roundtrip():
    """K > 0: per-line EOL + tag bit, alternating 1-D and 2-D lines
    (2-D lines reuse the T.6 mode coder against the previous line)."""
    from effocr_spark.synth.ccittcodec import g3_decode, g3_encode

    rng = np.random.RandomState(22)
    for (h, w, p) in [(5, 61, 0.4), (6, 130, 0.3), (1, 16, 0.5)]:
        img = np.where(rng.rand(h, w) < p, np.uint8(0), np.uint8(255))
        assert np.array_equal(
            g3_decode(g3_encode(img, k=4), w, h, k=4), img)


def test_g3_kat_all_white():
    """1-D all-white width-8 row is exactly the white-8 code 10011."""
    from effocr_spark.synth.ccittcodec import g3_encode

    enc = g3_encode(np.full((1, 8), 255, np.uint8))
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("10011")


def test_g3_pdf_images_decode():
    from effocr_spark.functions.pdftext import extract_pdf_images
    from effocr_spark.synth.font import render_line
    from effocr_spark.synth.imgcodec import decode_png
    from effocr_spark.synth.pdfgen import make_fax_pdf

    img = render_line("old fax line text")[0]
    thr = np.where(img < 128, np.uint8(0), np.uint8(255))
    for k in (0, 2):
        out = extract_pdf_images(make_fax_pdf([img], k=k))
        assert len(out) == 1 and np.array_equal(decode_png(out[0]), thr)
    # EncodedByteAlign decodes for real (byte-aligned row starts)
    out_ba = extract_pdf_images(make_fax_pdf([img], k=0,
                                             byte_align=True))
    assert len(out_ba) == 1 and np.array_equal(decode_png(out_ba[0]),
                                               thr)


@pytest.mark.parametrize("mode", ["g4", "g3", "mixed"])
def test_byte_align_roundtrip(mode):
    """/EncodedByteAlign: every row starts on a byte boundary."""
    from effocr_spark.synth.ccittcodec import (g3_decode, g3_encode,
                                               g4_decode, g4_encode)

    rng = np.random.RandomState(41)
    for (h, w, p) in [(4, 40, 0.3), (7, 61, 0.5), (1, 9, 0.5)]:
        img = np.where(rng.rand(h, w) < p, np.uint8(0), np.uint8(255))
        if mode == "g4":
            enc = g4_encode(img, byte_align=True)
            dec = g4_decode(enc, w, h, byte_align=True)
        elif mode == "g3":
            enc = g3_encode(img, byte_align=True)
            dec = g3_decode(enc, w, h, byte_align=True)
        else:
            enc = g3_encode(img, k=2, byte_align=True)
            dec = g3_decode(enc, w, h, k=2, byte_align=True)
        assert np.array_equal(dec, img), (mode, h, w)
