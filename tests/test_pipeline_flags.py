"""Pipeline flags (anchor_margin casing correction, visual spell check,
conf threshold) must flow through the Spark path and match the oracle
run with the same flags (reference: --anchor_margin / --spell_check /
--localizer_conf_thresh, infer_effocr_onnx_multi.py:435-445)."""

import pytest

from effocr_spark import oracle, pipeline
from effocr_spark.synth.imgcodec import is_png
from effocr_spark.synth.pages import generate_page, pages_df

N = 80


def _ocr_pages():
    en, jp = [], []
    for i in range(N):
        p = generate_page(i, seed=42)
        if is_png(p["html"]):
            (en if p["lang"] == "en" else jp).append((p["url"], p["html"]))
    return en, jp


@pytest.mark.parametrize("flags", [
    dict(anchor_margin=0.25),
    dict(spell_check=True),
    dict(anchor_margin=0.25, spell_check=True),
    dict(conf_thres=0.5),
])
def test_flags_match_oracle(spark, protos_bc, prototypes, flags):
    en, jp = _ocr_pages()
    exp = oracle.run_reference_extraction(
        en, *prototypes["en"], lang="en",
        conf_thres=flags.get("conf_thres", 0.35),
        anchor_margin=flags.get("anchor_margin"),
        spell_check=flags.get("spell_check", False))
    exp.update(oracle.run_reference_extraction(
        jp, *prototypes["jp"], lang="jp", vertical=True,
        conf_thres=flags.get("conf_thres", 0.35),
        anchor_margin=flags.get("anchor_margin"),
        spell_check=flags.get("spell_check", False)))

    pages, _ = pages_df(spark, N, seed=42)
    res = pipeline.extract_pages(pages, protos_bc, **flags)
    got = {r["url"]: r["extracted_text"]
           for r in res.filter("branch = 'ocr'").collect()}
    assert set(got) == set(exp)
    for url in exp:
        assert got[url] == exp[url], (url, flags)
