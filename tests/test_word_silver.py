"""Word-level recognizer stream + silver-correction merge (the north
star's "silver-correction merge of char and word streams"; the released
reference CPU path uses word boxes for spacing only —
infer_effocr_onnx_multi.py:70-90 — this is the paper's two-stream
word-level variant as an opt-in pipeline flag)."""

import numpy as np
import pytest

from effocr_spark.functions.assemble import silver_correct
from effocr_spark.functions.recognize import (build_word_prototypes,
                                              knn_lookup_sim)

VOCAB = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
         "county", "gazette", "report", "spring", "market", "price"]


def test_silver_correct_kernel():
    # aligned: token k+1 <-> word k
    out, n = silver_correct("The quick brwn fox", ["quick", "brown", "fox"],
                            [0.99, 0.95, 0.99], 0.9)
    assert out == "The quick brown fox" and n == 1
    # below threshold: char stream stands
    out, n = silver_correct("The brwn", ["brown"], [0.5], 0.9)
    assert out == "The brwn" and n == 0
    # capitalization preserved on replacement
    out, n = silver_correct("A Brwn dog", ["brown", "dog"], [0.99, 0.99], 0.9)
    assert out == "A Brown dog" and n == 1
    # misalignment (token count != words+1) -> merge skipped, no mangle
    out, n = silver_correct("one two", ["a", "b", "c"], [1.0, 1.0, 1.0], 0.1)
    assert out == "one two" and n == 0
    # None / empty passthrough
    assert silver_correct(None, ["x"], [1.0], 0.5) == (None, 0)
    assert silver_correct("abc", [], [], 0.5) == ("abc", 0)

    # full-token casing is preserved, not collapsed to initial-cap
    out, n = silver_correct("The QUIKC fox", ["quick", "fox"],
                            [0.99, 0.99], 0.9)
    assert out == "The QUICK fox" and n == 1
    # single-char uppercase token is initial-cap, not shouting
    out, n = silver_correct("A brwn", ["brown"], [0.99], 0.9)
    assert out == "A brown" and n == 1


def test_word_bank_self_recognition():
    """Every vocabulary word's detector-cropped render is its nearest
    prototype with cosine ~1: prototypes and queries share crop geometry
    (both go through head → NMS → CLS_WORD → extract_crops)."""
    from effocr_spark.functions.recognize import (_word_prototype_crop,
                                                  embed_crops)

    words, mat = build_word_prototypes(VOCAB)
    assert words == VOCAB and mat.shape[0] == len(VOCAB)
    crops = [_word_prototype_crop(w) for w in VOCAB]
    idx, sim = knn_lookup_sim(embed_crops(crops), mat)
    assert [words[int(i)] for i in idx] == VOCAB
    assert (sim > 0.999).all()
    # and words IN CONTEXT (cropped out of a full line) hit their own
    # prototypes too — the geometry contract the pipeline relies on
    from effocr_spark.functions import boxes as boxes_fn
    from effocr_spark.functions import crops as crops_fn
    from effocr_spark.synth import model as synthmodel
    from effocr_spark.synth.font import render_line

    img, _, _ = render_line("the quick brown fox")
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    det = boxes_fn.non_max_suppression(
        synthmodel.synthetic_yolo_head(rgb, vertical=False),
        conf_thres=0.35, iou_thres=0.01, max_det=1000)
    det = det[det[:, 5] == synthmodel.CLS_WORD]
    det = det[np.argsort(det[:, 0], kind="stable")]
    wc = crops_fn.extract_crops(rgb, det[:, :4], vertical=False)
    idx, sim = knn_lookup_sim(embed_crops(wc), mat)
    assert [words[int(i)] for i in idx] == ["the", "quick", "brown", "fox"]
    assert (sim > 0.99).all()


def _damage(img: np.ndarray, x0: int, x1: int) -> np.ndarray:
    """Deterministic 'ink blot' over one char region — the char stream
    misreads it; the whole-word embedding still lands on the right
    prototype."""
    out = img.copy()
    y0 = img.shape[0] // 3
    out[y0:y0 + 3, x0:x1] = 0
    return out


def test_silver_merge_end_to_end(spark):
    """A damaged glyph garbles the char stream; the word stream's kNN
    over the whole word crop restores it — and an undamaged page is
    UNCHANGED by enabling the flag (silver only fires on disagreement
    with high word confidence)."""
    from effocr_spark.pipeline import broadcast_prototypes, extract_pages
    from effocr_spark.synth.font import render_line
    from effocr_spark.synth.imgcodec import encode_png

    text = "the quick brown fox"
    img, char_boxes, word_boxes = render_line(text)
    # damage the middle of "quick"'s second char
    q0 = int(word_boxes[1][0])
    damaged = _damage(img, q0 + 4, q0 + 8)

    rows = [("clean://0", None, bytearray(encode_png(img)), None, "en"),
            ("dmg://0", None, bytearray(encode_png(damaged)), None, "en")]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")

    protos = broadcast_prototypes(spark, word_vocab=VOCAB)
    base = {r["url"]: r["extracted_text"]
            for r in extract_pages(df, protos).collect()}
    silver = {r["url"]: r["extracted_text"]
              for r in extract_pages(df, protos,
                                     word_silver=0.8).collect()}

    assert base["clean://0"] == text
    assert silver["clean://0"] == text          # no-op on clean input
    assert base["dmg://0"] != text              # char stream garbled
    assert silver["dmg://0"] == text            # word stream restored


def test_word_silver_requires_bank(spark):
    from effocr_spark.pipeline import broadcast_prototypes, extract_pages
    from effocr_spark.synth.font import render_line
    from effocr_spark.synth.imgcodec import encode_png

    img, _, _ = render_line("the fox")
    df = spark.createDataFrame(
        [("u", None, bytearray(encode_png(img)), None, "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    protos = broadcast_prototypes(spark)  # no word bank
    with pytest.raises(Exception, match="en_words"):
        extract_pages(df, protos, word_silver=0.8).collect()


def test_emit_char_text_single_pass_matches_two_pass(spark):
    """r7 optimization: emit_char_text surfaces the pre-merge char
    stream from the SAME localize+encode pass. Both columns must be
    bit-identical to the old two-pass spelling (separate char-only and
    silver extractions)."""
    from effocr_spark.pipeline import broadcast_prototypes, extract_pages
    from effocr_spark.synth.font import render_line
    from effocr_spark.synth.imgcodec import encode_png

    text = "the quick brown fox"
    img, _, word_boxes = render_line(text)
    damaged = _damage(img, int(word_boxes[1][0]) + 4,
                      int(word_boxes[1][0]) + 8)
    rows = [("clean://0", None, bytearray(encode_png(img)), None, "en"),
            ("dmg://0", None, bytearray(encode_png(damaged)), None, "en")]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    protos = broadcast_prototypes(spark, word_vocab=VOCAB)

    one_pass = {r["url"]: (r["char_text"], r["extracted_text"])
                for r in extract_pages(df, protos, word_silver=0.8,
                                       emit_char_text=True).collect()}
    base = {r["url"]: r["extracted_text"]
            for r in extract_pages(df, protos).collect()}
    silver = {r["url"]: r["extracted_text"]
              for r in extract_pages(df, protos,
                                     word_silver=0.8).collect()}
    for url in base:
        assert one_pass[url] == (base[url], silver[url])
