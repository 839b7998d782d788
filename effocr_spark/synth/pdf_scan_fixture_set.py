"""The extract_pdf_scanned driver-query fixture set, as COMMITTED files.

Same discipline as pdf_fixture_set.py (the data/pdf_fixtures pattern):
the scanned-PDF fixtures are deterministic bytes, but generating them
runs the from-scratch ENCODERS — JBIG2 MQ coding, JPEG2000 DWT, JPEG
DCT, CCITT G3/G4 — driver-side on every query invocation (~1.4s
measured at r7 start, over half the query's bench latency). The bytes
live in git (data/pdf_scan_fixtures/*.pdf) and the query READS them;
tests/test_pdf_scan_fixture_files.py asserts regeneration byte-matches
the committed copies, so the files can never drift from the writers.

Regenerate (after an intentional writer change):
    python tools/make_pdf_scan_fixtures.py
then re-run tools/make_goldens.py + tools/check_queries.py.
"""

from __future__ import annotations

import pathlib
from typing import Callable

FIXTURE_DIR = (pathlib.Path(__file__).resolve().parents[2]
               / "data" / "pdf_scan_fixtures")


def _scan(texts, **kw) -> bytes:
    import numpy as np

    from .font import render_line
    from .jpegcodec import encode_jpeg
    from .pdfgen import make_scanned_pdf

    jpegs = []
    for t in texts:
        img, _, _ = render_line(t)
        rgb = np.repeat(img[:, :, None], 3, axis=2)
        jpegs.append((encode_jpeg(rgb), rgb.shape[1], rgb.shape[0]))
    return make_scanned_pdf(jpegs, **kw)


def _fixture_factories() -> dict[str, Callable[[], bytes]]:
    """url → factory, byte-for-byte the construction q_extract_pdf_scanned
    used inline before round 7 (same seeds, same writer arguments)."""
    from .font import render_line
    from .pages import _en_ocr_line, _rng
    from .pdfgen import (make_fax_pdf, make_inline_image_pdf,
                         make_jbig2_pdf, make_jpx_pdf, make_pdf)

    f: dict[str, Callable[[], bytes]] = {}

    def _scan_i(i: int) -> bytes:
        rng = _rng(777000, i)
        texts = [_en_ocr_line(rng, 3 + i % 3) for _ in range(1 + i % 2)]
        if i % 4 == 3:  # mixed: text layer + scan
            return _scan(texts, text_lines=[["Layer line %d" % i]]
                         + [[]] * (len(texts) - 1))
        if i % 4 == 2:  # transport-filtered XObject
            return _scan(texts, image_filters=("ASCII85Decode",))
        return _scan(texts)

    for i in range(8):
        f[f"pdf://scan/{i:02d}"] = (lambda i=i: _scan_i(i))
    f["pdf://text/0"] = lambda: make_pdf([["Plain text page"]])

    def _fax_img(j: int):
        return render_line(_en_ocr_line(_rng(888000, j), 4))[0]

    f["pdf://fax/0"] = lambda: make_fax_pdf([_fax_img(0)])
    f["pdf://fax/1"] = lambda: make_fax_pdf(
        [_fax_img(1)], black_is_1=True, omit_rows=True,
        text_lines=[["Fax layer line"]])
    f["pdf://fax/g3"] = lambda: make_fax_pdf(
        [_fax_img(2)], k=0, text_lines=[["G3 layer line"]])

    def _jb_img(j: int):
        return render_line(_en_ocr_line(_rng(999000, j), 4))[0]

    f["pdf://jbig2/0"] = lambda: make_jbig2_pdf([_jb_img(0)])
    f["pdf://jbig2/glob"] = lambda: make_jbig2_pdf(
        [_jb_img(1)], use_globals=True,
        text_lines=[["JBIG2 layer line"]])

    def _jb_sym() -> bytes:
        symtxt = _en_ocr_line(_rng(999100, 0), 4)
        return make_jbig2_pdf([render_line(symtxt)[0]], symbol_text=symtxt)

    f["pdf://jbig2/sym"] = _jb_sym

    def _jb_huff() -> bytes:
        hufftxt = _en_ocr_line(_rng(999200, 0), 4)
        return make_jbig2_pdf([render_line(hufftxt)[0]],
                              symbol_text=hufftxt, symbol_huffman=True)

    f["pdf://jbig2/huff"] = _jb_huff

    def _jb_refine() -> bytes:
        from .jbig2codec import jbig2_encode_refined

        reftxt = _en_ocr_line(_rng(999300, 0), 4)
        refimg = render_line(reftxt)[0]
        noisy = refimg.copy()
        flip = _rng(999301, 0).random(refimg.shape) < 0.01
        noisy[flip] = 255 - noisy[flip]
        return make_jbig2_pdf(
            [refimg], raw_stream=jbig2_encode_refined(noisy, refimg))

    f["pdf://jbig2/refine"] = _jb_refine

    def _jb_tpgron() -> bytes:
        from .jbig2codec import jbig2_encode_refined

        tpg = _en_ocr_line(_rng(999310, 0), 4)
        tpgimg = render_line(tpg)[0]
        tpgnoisy = tpgimg.copy()
        flip2 = _rng(999311, 0).random(tpgimg.shape) < 0.01
        tpgnoisy[flip2] = 255 - tpgnoisy[flip2]
        return make_jbig2_pdf(
            [tpgimg], raw_stream=jbig2_encode_refined(
                tpgnoisy, tpgimg, tpgron=True))

    f["pdf://jbig2/tpgron"] = _jb_tpgron

    def _jb_halftone() -> bytes:
        from .jbig2codec import jbig2_encode_halftone

        httxt = _en_ocr_line(_rng(999500, 0), 4)
        htimg = render_line(httxt)[0]
        return make_jbig2_pdf(
            [htimg], raw_stream=jbig2_encode_halftone(
                htimg, n_levels=2, cell=1))

    f["pdf://jbig2/halftone"] = _jb_halftone

    f["pdf://jpx/0"] = lambda: make_jpx_pdf(
        [render_line(_en_ocr_line(_rng(999400, 0), 4))[0]])
    f["pdf://jpx/offs"] = lambda: make_jpx_pdf(
        [render_line(_en_ocr_line(_rng(999402, 0), 4))[0]],
        jp2_offsets=(8, 8), n_layers=2, progression="RPCL")
    f["pdf://jpx/prec"] = lambda: make_jpx_pdf(
        [render_line(_en_ocr_line(_rng(999403, 0), 4))[0]],
        precincts=(5, 5), n_layers=2, progression="PCRL")
    f["pdf://jpx/tiled"] = lambda: make_jpx_pdf(
        [render_line(_en_ocr_line(_rng(999401, 0), 4))[0]],
        levels=1, tile_size=64)
    f["pdf://inline/dct"] = lambda: make_inline_image_pdf(
        [render_line(_en_ocr_line(_rng(999600, 0), 4))[0]], mode="dct",
        text_lines=[["Inline layer line"]])
    return f


def fixture_filename(url: str) -> str:
    return url.removeprefix("pdf://").replace("/", "_") + ".pdf"


def generate_fixtures() -> dict[str, bytes]:
    """url → freshly generated bytes (slow path: runs the encoders)."""
    return {url: fac() for url, fac in _fixture_factories().items()}


def load_fixtures() -> list[tuple[str, bytes]]:
    """url → COMMITTED bytes, in the ROW ORDER q_extract_pdf_scanned
    historically emitted (fast path: pure file reads)."""
    order = (
        [f"pdf://scan/{i:02d}" for i in range(8)]
        + ["pdf://text/0", "pdf://fax/0", "pdf://fax/1", "pdf://fax/g3",
           "pdf://jbig2/0", "pdf://jbig2/glob", "pdf://jbig2/sym",
           "pdf://jbig2/huff", "pdf://jbig2/refine", "pdf://jbig2/tpgron",
           "pdf://jpx/0", "pdf://jpx/offs", "pdf://jpx/prec",
           "pdf://jpx/tiled", "pdf://inline/dct", "pdf://jbig2/halftone"]
    )
    return [(url, (FIXTURE_DIR / fixture_filename(url)).read_bytes())
            for url in order]
