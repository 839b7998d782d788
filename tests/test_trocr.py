"""TrOCR seq2seq baseline seam (reference trocr/infer_trocr.py):
generate() decoding semantics (beam, EOS, max_length, no-repeat-ngram,
length penalty) against hand-computable score tables, plus the Spark
end-to-end eval."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from effocr_spark.operators import trocr
from effocr_spark.operators.trocr import (
    BOS_ID, EOS_ID, N_SPECIALS, batch_decode, generate, line_images_df,
    trocr_branch, trocr_eval)

V = N_SPECIALS + 3  # vocab: specials + tokens a(3), b(4), c(5)


def scores_from_table(table):
    """table[t] = dict token->score; everything else -inf, EOS 0 past end."""
    def step(t):
        s = np.full(V, -np.inf)
        if t < len(table):
            for tok, v in table[t].items():
                s[tok] = v
        else:
            s[EOS_ID] = 0.0
        return s
    return step


def test_greedy_decode_and_eos_stop():
    ids = generate(scores_from_table([{3: 1.0}, {4: 1.0}, {5: 1.0}]), V)
    assert ids == [BOS_ID, 3, 4, 5, EOS_ID]
    assert batch_decode(ids, ["a", "b", "c"]) == "abc"


def test_max_length_truncates():
    # endless 'a' scores, never EOS: generation must stop at max_length
    def step(t):
        s = np.full(V, -np.inf)
        s[3] = 1.0 if t % 2 == 0 else 0.9
        s[4] = 0.9 if t % 2 == 0 else 1.0  # alternate to dodge ngram block
        return s
    ids = generate(step, V, max_length=8)
    assert len(ids) == 8  # BOS + 7 generated, like HF max_length
    assert EOS_ID not in ids


def test_no_repeat_ngram_blocks_third_repeat():
    # scores always prefer 'a'; with trigram blocking, 'a a a a' contains
    # the trigram (a,a,a) twice -> the 4th 'a' must be banned and the
    # decoder falls back to 'b'
    def step(t):
        s = np.full(V, -np.inf)
        s[3] = 1.0
        s[4] = 0.5
        s[EOS_ID] = -1e9 if t < 6 else 0.0
        return s
    ids = generate(step, V, max_length=8, no_repeat_ngram_size=3,
                   num_beams=1)
    gen = [i for i in ids if i >= N_SPECIALS]
    assert gen[:4] == [3, 3, 3, 4]  # a a a b — 4th a blocked


def test_beam_search_outscores_greedy():
    # greedy takes 'a' (1.0) then hits a dead end (-5); the 'b' branch
    # (0.9) leads to a high-score step — beams must recover it
    def step(t):
        s = np.full(V, -np.inf)
        if t == 0:
            s[3], s[4] = 1.0, 0.9
        elif t == 1:
            # continuing after either token; the scorer here is
            # context-free per HF logits seam, so emulate the dead end
            # via EOS: 'a' path must end now (only EOS, score -5),
            # 'b' path could take c at +5 — context-free scorer can't
            # distinguish, so give both c(+5) and EOS(-5)
            s[5], s[EOS_ID] = 5.0, -5.0
        else:
            s[EOS_ID] = 0.0
        return s

    ids = generate(step, V, num_beams=4, length_penalty=0.0)
    # both beams see the same steps; highest total = a, c
    assert ids[:3] == [BOS_ID, 3, 5]


def test_length_penalty_prefers_longer_on_ties():
    # two finishes: short seq total 2.0 (len 2), long seq total 2.4
    # (len 4); penalty 2.0 → 2.0/4=0.5 vs 2.4/16=0.15 → SHORT wins;
    # penalty 0 → totals compare directly → LONG wins
    def step(t):
        s = np.full(V, -np.inf)
        if t == 0:
            s[3] = 1.0
        elif t == 1:
            s[EOS_ID] = 1.0
            s[4] = 0.8
        elif t == 2:
            s[5] = 0.5
        else:
            s[EOS_ID] = 0.1
        return s

    short = generate(step, V, num_beams=2, length_penalty=2.0)
    longer = generate(step, V, num_beams=2, length_penalty=0.0)
    assert short == [BOS_ID, 3, EOS_ID]
    assert longer[-1] == EOS_ID and len(longer) > 3


def test_trocr_e2e_exact_on_fixture(spark, protos_bc):
    """With the n-gram blocker off, the seq2seq baseline decodes the
    exact line text (uncased accuracy 100, CER 0) — the blocker-free
    upper bound of the reference's eval printout."""
    res = trocr_eval(spark, protos_bc, n=24, seed=17,
                     no_repeat_ngram_size=0).collect()[0]
    assert res["n"] == 24
    assert res["accuracy"] == pytest.approx(100.0)
    assert res["cer"] == pytest.approx(0.0)


def test_trocr_faithful_config_blocks_repeated_trigrams(spark, protos_bc):
    """Under the reference's own decoding config (no_repeat_ngram=3,
    infer_trocr.py:105) repeated trigrams are unreproducible — 'fox fox'
    must come out mangled. This pins the n-gram processor as ACTIVE in
    the end-to-end path (and documents the faithful artifact)."""
    from effocr_spark.synth.font import render_line
    from effocr_spark.synth.imgcodec import encode_png

    text = "Press fox fox barn gazette"
    df = spark.createDataFrame(
        [("u1", bytearray(encode_png(render_line(text)[0])))],
        "url string, png binary")
    faithful = trocr_branch(df, protos_bc).collect()[0]["pred"]
    unblocked = trocr_branch(df, protos_bc,
                             no_repeat_ngram_size=0).collect()[0]["pred"]
    assert unblocked == text
    assert faithful != text  # the second 'fox' trigram is banned


def test_trocr_branch_rows(spark, protos_bc):
    lines = line_images_df(spark, 8, seed=5)
    out = trocr_branch(lines, protos_bc, no_repeat_ngram_size=0)
    rows = {r["url"]: r for r in out.collect()}
    gts = {r["url"]: r["text"] for r in lines.collect()}
    assert set(rows) == set(gts)
    for url, r in rows.items():
        assert r["ok"]
        # uncased match (casing correction belongs to en_postprocess,
        # which the seq2seq baseline deliberately bypasses); spaces ARE
        # predicted (word-gap positions emit the space token)
        assert r["pred"].lower() == gts[url].lower()
