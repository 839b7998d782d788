"""Line assembly: vectorized kernels vs the loop-based oracle
transliteration, plus hand-computed goldens.

Reference: /root/reference/infer_effocr_onnx_multi.py:70-131.
"""

import numpy as np

from effocr_spark.functions import assemble as A
from effocr_spark import oracle as O

LARGE = 1_000_000_000


def _rand_boxes(rng, n, x_span=500):
    x0 = np.sort(rng.uniform(0, x_span, n))
    w = rng.uniform(2, 15, n)
    y0 = rng.uniform(0, 5, n)
    h = rng.uniform(5, 12, n)
    return np.stack([x0, y0, x0 + w, y0 + h], axis=1).astype(np.float32)


def test_en_preprocess_matches_oracle_random():
    rng = np.random.RandomState(99)
    for _ in range(30):
        nc, nw = rng.randint(1, 30), rng.randint(0, 8)
        chars = _rand_boxes(rng, nc)
        words = _rand_boxes(rng, nw) if nw else np.zeros((0, 4), np.float32)
        got_c, got_w = A.en_preprocess(chars, words)
        exp_c, exp_w = O.oracle_en_preprocess(
            [tuple(b) for b in chars], [tuple(b) for b in words])
        assert np.allclose(got_c[:, :4], np.array(exp_c)[:, :4] if exp_c else got_c[:, :4])
        assert got_w == exp_w


def test_en_preprocess_word_end_golden():
    # chars at x:[0,10],[20,30],[40,50]; word starting at 18 → nearest
    # right-edge beyond 18 is char 1 (right=30)
    chars = np.array([[0, 0, 10, 9], [20, 0, 30, 9], [40, 0, 50, 9]], dtype=float)
    words = np.array([[18, 0, 52, 9]], dtype=float)
    _, we = A.en_preprocess(chars, words)
    assert we == [1]


def test_en_preprocess_carry_forward_quirk():
    # a word entirely to the right of all chars inherits the previous
    # closest_idx (reference :76-86 initializes closest_idx once)
    chars = np.array([[0, 0, 10, 9], [20, 0, 30, 9]], dtype=float)
    words = np.array([[5, 0, 30, 9], [100, 0, 120, 9]], dtype=float)
    _, we = A.en_preprocess(chars, words)
    exp_c, exp_we = O.oracle_en_preprocess(
        [tuple(b) for b in chars], [tuple(b) for b in words])
    assert we == exp_we


def test_en_postprocess_spaces():
    # "thecat" with word-ends at chars 0 and 3 → "the cat"
    out = A.en_postprocess("thecat", [0, 3], [6.0] * 6, [8.0] * 6)
    assert out == "the cat"
    assert out == O.oracle_en_postprocess("thecat", [0, 3], [6.0] * 6, [8.0] * 6)


def test_en_postprocess_empty_word_end_returns_none():
    assert A.en_postprocess("abc", [], [1, 1, 1], [2, 2, 2]) is None
    assert O.oracle_en_postprocess("abc", [], [1, 1, 1], [2, 2, 2]) is None


def test_en_postprocess_empty_line_returns_none():
    assert A.en_postprocess("", [0], [], []) is None


def test_en_postprocess_casing_anchor():
    # 'e','a' anchors (h=6); 'X' at h=6.2 within margin → lowered;
    # 'w' nondistinct at h=40 (>4*margin*6) → uppered
    line = "eaXw"
    heights = [6.0, 6.0, 6.2, 40.0]
    bottoms = [8.0, 8.0, 8.0, 8.0]
    got = A.en_postprocess(line, [0], heights, bottoms, anchor_margin=0.25)
    exp = O.oracle_en_postprocess(line, [0], heights, bottoms, anchor_margin=0.25)
    assert got == exp == "eaxW"


def test_en_postprocess_hyphen_to_period():
    # '-' whose bottom sits at the lowercase baseline → rewritten '.'
    line = "en-"
    heights = [6.0, 6.0, 1.0]
    bottoms = [8.0, 8.0, 8.1]
    got = A.en_postprocess(line, [0], heights, bottoms, anchor_margin=0.25)
    exp = O.oracle_en_postprocess(line, [0], heights, bottoms, anchor_margin=0.25)
    assert got == exp
    assert got.endswith(".")


def test_en_postprocess_matches_oracle_random():
    rng = np.random.RandomState(4242)
    chars = "abcdefghXYZ-.,"
    for _ in range(60):
        n = rng.randint(1, 25)
        line = "".join(chars[rng.randint(len(chars))] for _ in range(n))
        we = sorted(set(rng.randint(0, n, size=rng.randint(1, 5)).tolist()))
        heights = rng.uniform(1, 20, n).tolist()
        bottoms = rng.uniform(0, 15, n).tolist()
        margin = [None, 0.2, 0.5][rng.randint(3)]
        got = A.en_postprocess(line, we, heights, bottoms, anchor_margin=margin)
        exp = O.oracle_en_postprocess(line, we, list(heights), list(bottoms),
                                      anchor_margin=margin)
        assert got == exp, (line, we, margin)


def test_jp_preprocess_sort():
    boxes = np.array([[0, 30, 5, 40], [0, 10, 5, 20], [0, 50, 5, 60]], dtype=float)
    got = A.jp_preprocess(boxes, vertical=True)
    assert got[:, 1].tolist() == [10, 30, 50]
