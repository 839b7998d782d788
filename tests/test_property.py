"""Property-based tests (hypothesis): the vectorized kernels must agree
with the loop-based oracle transliterations on ARBITRARY inputs, not
just the fixture distribution. (The reference has no property testing —
SURVEY §5; this is our addition.)"""

import numpy as np
from hypothesis import given, settings, strategies as st

from effocr_spark.functions import assemble as A
from effocr_spark.functions import boxes as B
from effocr_spark import oracle as O

finite = st.floats(min_value=0.0, max_value=640.0, allow_nan=False,
                   width=32)


@st.composite
def head_rows(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    rows = []
    for _ in range(n):
        cx, cy = draw(finite), draw(finite)
        w = draw(st.floats(min_value=0.5, max_value=100, width=32))
        h = draw(st.floats(min_value=0.5, max_value=100, width=32))
        obj = draw(st.floats(min_value=0.0, max_value=1.0, width=32))
        c0 = draw(st.floats(min_value=0.0, max_value=1.0, width=32))
        rows.append([cx, cy, w, h, obj, c0, 1 - c0])
    return np.asarray(rows, dtype=np.float32).reshape(n, 7)


@settings(max_examples=80, deadline=None)
@given(head_rows(), st.floats(min_value=0.05, max_value=0.9),
       st.floats(min_value=0.01, max_value=0.9))
def test_nms_matches_oracle(pred, conf, iou):
    a = B.non_max_suppression(pred, conf_thres=conf, iou_thres=iou)
    b = O.oracle_nms(pred, conf_thres=conf, iou_thres=iou)
    assert a.shape == b.shape
    assert np.allclose(a, b, atol=1e-5)


@st.composite
def boxes_list(draw, max_n=25):
    n = draw(st.integers(min_value=0, max_value=max_n))
    out = []
    for _ in range(n):
        x0 = draw(st.floats(min_value=0, max_value=600, width=32))
        y0 = draw(st.floats(min_value=0, max_value=40, width=32))
        w = draw(st.floats(min_value=0.5, max_value=30, width=32))
        h = draw(st.floats(min_value=0.5, max_value=30, width=32))
        out.append((x0, y0, x0 + w, y0 + h))
    return out


@settings(max_examples=80, deadline=None)
@given(boxes_list(), boxes_list(max_n=8), st.booleans())
def test_en_preprocess_matches_oracle(chars, words, vertical):
    if not chars:
        return
    # both paths consume float32 NMS output in production — feed the
    # oracle the same float32-quantized values (float64 would change
    # tie/qualification decisions at the epsilon edge)
    c = np.asarray(chars, dtype=np.float32)
    w = (np.asarray(words, dtype=np.float32)
         if words else np.zeros((0, 4), np.float32))
    chars32 = [tuple(b) for b in c]
    words32 = [tuple(b) for b in w]
    got_c, got_we = A.en_preprocess(c, w, vertical=vertical)
    exp_c, exp_we = O.oracle_en_preprocess(chars32, words32, vertical=vertical)
    assert got_we == exp_we
    assert np.allclose(got_c[:, :4], np.asarray(exp_c)[:, :4])


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="abcdefgXYZ-. ,", min_size=0, max_size=30)
      .map(lambda s: s.replace(" ", "x")),
    st.lists(st.integers(min_value=0, max_value=35), max_size=6),
    st.one_of(st.none(), st.floats(min_value=0.05, max_value=1.0)),
    st.integers(min_value=0, max_value=1000),
)
def test_en_postprocess_matches_oracle(line, we, margin, seed):
    rng = np.random.RandomState(seed)
    heights = rng.uniform(0.5, 20, len(line)).tolist()
    bottoms = rng.uniform(0, 15, len(line)).tolist()
    got = A.en_postprocess(line, we, heights, bottoms, anchor_margin=margin)
    try:
        exp = O.oracle_en_postprocess(line, we, list(heights), list(bottoms),
                                      anchor_margin=margin)
    except AssertionError:
        # oracle mirrors the reference's assert-crash on misalignment;
        # the engine quarantines (returns None) instead
        assert got is None
        return
    assert got == exp


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
       st.sampled_from([8000, 16000, 44100]),
       st.integers(1, 3))
@settings(max_examples=40, deadline=None)
def test_wav_round_trip_property(samples, rate, ch):
    """encode→decode is the identity for any PCM16 payload/rate/channels."""
    import numpy as np
    from effocr_spark.synth.wavcodec import decode_wav, encode_wav

    n = (len(samples) // ch) * ch
    if n == 0:
        return
    arr = np.asarray(samples[:n], np.int16).reshape(-1, ch)
    back, r = decode_wav(encode_wav(arr, rate))
    assert r == rate and (back == arr).all()


@given(st.integers(2, 30), st.integers(2, 12), st.integers(1, 6),
       st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_knn_topk_property(nq, nprotos, k, seed):
    """knn_topk rows are always sorted desc by score and agree with the
    argsort oracle for any shapes/k (clamped when k > K)."""
    import numpy as np
    from effocr_spark.functions.recognize import knn_topk

    rng = np.random.RandomState(seed)
    q = rng.standard_normal((nq, 5)).astype(np.float64)
    p = rng.standard_normal((nprotos, 5)).astype(np.float64)
    idx, sc = knn_topk(q, p, k=k)
    kk = min(k, nprotos)
    assert idx.shape == (nq, kk)
    sims = q @ p.T
    for i in range(nq):
        assert (np.diff(sc[i]) <= 1e-12).all()
        want = np.argsort(-sims[i], kind="stable")[:kk]
        assert (idx[i] == want).all()
