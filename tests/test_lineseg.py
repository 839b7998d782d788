"""Line segmentation kernel: band detection + strip geometry."""

import numpy as np

from effocr_spark.functions.lineseg import line_strips, segment_lines
from effocr_spark.synth.font import render_line, render_page


def test_single_line_is_one_band():
    img, _, _ = render_line("The quick dog")
    bands = segment_lines(img)
    assert len(bands) == 1


def test_multiline_band_count_and_order():
    lines = ["The quick dog", "Jumps over 1874.", "Lazy gazette story"]
    img = render_page(lines)
    bands = segment_lines(img)
    assert len(bands) == 3
    assert all(b[0] < b[1] for b in bands)
    assert all(bands[i][1] < bands[i + 1][0] for i in range(2))


def test_strip_geometry_matches_single_line_render():
    """Coverage-constrained lines (capital + descender) produce strips
    pixel-identical in height to a standalone render_line image."""
    lines = ["The quick dog", "Jumps over pay"]
    img = render_page(lines)
    strips = line_strips(img)
    assert len(strips) == 2
    solo, _, _ = render_line(lines[0])
    assert strips[0].shape[0] == solo.shape[0]
    # content equal up to the solo width (page pads right with white)
    assert np.array_equal(strips[0][:, : solo.shape[1]], solo)


def test_blank_page_no_bands():
    blank = np.full((40, 60), 255, dtype=np.uint8)
    assert segment_lines(blank) == []
    assert line_strips(blank) == []
