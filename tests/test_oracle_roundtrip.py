"""The pinned oracle must reproduce the generator's ground truth exactly
on clean fixtures (OCR round trip), and quarantine degenerate inputs."""

import numpy as np

from effocr_spark import oracle
from effocr_spark.synth.font import render_line
from effocr_spark.synth.imgcodec import encode_png
from effocr_spark.synth.pages import generate_page


def test_en_roundtrip(prototypes):
    chars, protos = prototypes["en"]
    texts = [
        "The quick brown fox 1874.",
        "abc",
        "hello world",
        "A. B. Smith & Co.",
    ]
    imgs = [(t, encode_png(render_line(t)[0])) for t in texts]
    res = oracle.run_reference_ocr(imgs, chars, protos, lang="en")
    for t in texts:
        assert res[t] == t


def test_jp_roundtrip(prototypes):
    chars, protos = prototypes["jp"]
    texts = ["あいうえお", "かきくけこさし"]
    imgs = [(t, encode_png(render_line(t, vertical=True)[0])) for t in texts]
    res = oracle.run_reference_ocr(imgs, chars, protos, lang="jp", vertical=True)
    for t in texts:
        assert res[t] == t


def test_generated_ocr_pages_roundtrip(prototypes):
    en_imgs, jp_imgs, gold = [], [], {}
    for i in range(250):
        p = generate_page(i, seed=42)
        if p["branch"] != "ocr":
            continue
        gold[p["url"]] = p["true_text"]
        (en_imgs if p["lang"] == "en" else jp_imgs).append((p["url"], p["html"]))
    assert en_imgs and jp_imgs
    res = oracle.run_reference_extraction(en_imgs, *prototypes["en"], lang="en")
    res.update(oracle.run_reference_extraction(jp_imgs, *prototypes["jp"],
                                               lang="jp", vertical=True))
    for url, text in res.items():
        assert text == gold[url], url


def test_blank_image_quarantined(prototypes):
    chars, protos = prototypes["en"]
    blank = np.full((20, 100), 255, dtype=np.uint8)
    res = oracle.run_reference_ocr([("blank", encode_png(blank))],
                                   chars, protos, lang="en")
    # 0 chars → empty outputs → en_postprocess returns None (:96-97)
    assert res["blank"] is None


def test_gt_collect_left_outer():
    pairs = oracle.gt_collect({"a": "x"}, [("a", "x"), ("b", "y")])
    assert pairs == [("x", "x"), ("y", "")]
