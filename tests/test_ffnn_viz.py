"""FFNN classifier-head recognizer parity (GPU-path analog,
infer_effocr.py:325-333) + localizer-viz sink."""

import numpy as np

from effocr_spark import oracle, pipeline
from effocr_spark.functions import boxes as B
from effocr_spark.functions.viz import draw_boxes_png
from effocr_spark.synth import model as sm
from effocr_spark.synth.font import render_line
from effocr_spark.synth.imgcodec import decode_png, encode_png, is_png, to_rgb
from effocr_spark.synth.pages import generate_page, pages_df


def test_ffnn_oracle_roundtrip(prototypes):
    chars, protos = prototypes["en"]
    texts = ["The quick fox", "hello world 42"]
    imgs = [(t, encode_png(render_line(t)[0])) for t in texts]
    res = oracle.run_reference_ocr(imgs, chars, protos, lang="en",
                                   recognizer="ffnn")
    for t in texts:
        assert res[t] == t


def test_ffnn_pipeline_matches_oracle(spark, protos_bc, prototypes):
    n = 60
    en, jp = [], []
    for i in range(n):
        p = generate_page(i, seed=42)
        if is_png(p["html"]):
            (en if p["lang"] == "en" else jp).append((p["url"], p["html"]))
    exp = oracle.run_reference_extraction(en, *prototypes["en"], lang="en",
                                          recognizer="ffnn")
    exp.update(oracle.run_reference_extraction(jp, *prototypes["jp"], lang="jp",
                                               vertical=True, recognizer="ffnn"))
    pages, _ = pages_df(spark, n, seed=42)
    res = pipeline.extract_pages(pages, protos_bc, recognizer="ffnn")
    got = {r["url"]: r["extracted_text"]
           for r in res.filter("branch = 'ocr'").collect()}
    assert got == exp


def test_draw_boxes_png():
    img, _, _ = render_line("abc def")
    png = encode_png(img)
    head = sm.synthetic_yolo_head(to_rgb(img))
    det = B.non_max_suppression(head)
    out = draw_boxes_png(png, det[det[:, 5] == 0][:, :4])
    drawn = decode_png(out)
    assert drawn.shape[2] == 3
    red = (drawn[:, :, 0] == 255) & (drawn[:, :, 1] == 0) & (drawn[:, :, 2] == 0)
    assert red.sum() > 20  # rectangles actually drawn
    # original image had no red pixels
    orig = to_rgb(decode_png(png))
    assert not (((orig[:, :, 0] == 255) & (orig[:, :, 1] == 0)).any())
