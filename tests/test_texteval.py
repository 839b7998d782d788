"""Eval kernel goldens (reference: /root/reference/utils/eval_utils.py:14-70)."""

from effocr_spark.functions.texteval import (
    edit_distance,
    string_cleaner,
    textline_evaluation,
)


def test_string_cleaner():
    assert string_cleaner("“hi”\n") == '"hi"'
    assert string_cleaner("''a’’") == '"a"'


def test_edit_distance():
    assert edit_distance("", "") == 0
    assert edit_distance("abc", "abc") == 0
    assert edit_distance("abc", "") == 3
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("flaw", "lawn") == 2


def test_textline_accuracy_and_cer():
    pairs = [("abc", "abc"), ("abcd", "abxd")]
    acc, cer = textline_evaluation(pairs)
    assert acc == 50.0
    # 1 edit / 7 gt chars
    assert abs(cer - 1 / 7) < 1e-9


def test_no_spaces_and_uncased():
    pairs = [("A b", "ab")]
    acc, _ = textline_evaluation(pairs, no_spaces_in_eval=True, uncased=True)
    assert acc == 100.0


def test_norm_edit_distance_longer_side():
    # ICDAR2019: divide by max(len(gt), len(pred))
    pairs = [("abcd", "ab")]
    _, ned = textline_evaluation(pairs, norm_edit_distance=True)
    assert abs(ned - 2 / 4) < 1e-9
    pairs = [("ab", "abcd")]
    _, ned = textline_evaluation(pairs, norm_edit_distance=True)
    assert abs(ned - 2 / 4) < 1e-9


def test_missing_pred_counts_full_distance():
    pairs = [("hello", "")]
    acc, cer = textline_evaluation(pairs)
    assert acc == 0.0
    assert abs(cer - 1.0) < 1e-9
