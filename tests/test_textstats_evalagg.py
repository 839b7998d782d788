"""Text-stats operators + the Spark eval aggregate vs the pure kernel
(functions/texteval.py) — A1 cross-check including unicode quotes and
missing-pred edge cases."""

import pytest
from pyspark.sql import functions as F

from effocr_spark.functions.texteval import textline_evaluation
from effocr_spark.operators.evalagg import textline_eval
from effocr_spark.operators.textstats import document_stats, langid

PAIRS = [
    ("The quick fox", "The quick fox"),
    ("hello world", "hallo world"),
    ("“quoted” text\n", '"quoted" text'),
    ("CASE test", "case TEST"),
    ("missing pred", ""),
    ("a b c d", "abcd"),
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(PAIRS, "gt string, pred string")


@pytest.mark.parametrize("flags", [
    dict(),
    dict(no_spaces=True),
    dict(uncased=True),
    dict(norm_edit=True),
    dict(no_spaces=True, uncased=True, norm_edit=True),
])
def test_eval_agg_matches_kernel(pairs_df, flags):
    row = textline_eval(pairs_df, "gt", "pred", **flags).collect()[0]
    kflags = dict(no_spaces_in_eval=flags.get("no_spaces", False),
                  norm_edit_distance=flags.get("norm_edit", False),
                  uncased=flags.get("uncased", False))
    acc, cer = textline_evaluation(list(PAIRS), **kflags)
    assert abs(row["accuracy"] - acc) < 1e-9
    assert abs(row["cer"] - cer) < 1e-9
    assert row["n"] == len(PAIRS)


def test_langid_votes(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog is here"),
         (2, "el perro y la casa es con por"),
         (3, "der hund und das haus ist nicht"),
         (4, "le chat et la maison est pour les"),
         (5, "汉字文本"),
         (6, "zzz qqq xxx")],
        "id long, text string")
    out = {r["id"]: r["lp"] for r in
           df.select("id", langid(F.col("text")).alias("lp")).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "de"
    assert out[4] == "fr"
    assert out[5] == "zh"
    assert out[6] == "und"


def test_document_stats_shapes(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox. and the dog, ran!")],
        "doc_id long, text string")
    r = document_stats(df, "doc_id", "text").collect()[0]
    assert r["n_tokens"] == 8
    assert 0 < r["avg_token_len"] < 12
    assert 0 < r["punct_ratio"] < 0.2
    assert 0 <= r["quality"] <= 1
    assert r["lang_pred"] == "en"
    assert "-8" in r["fingerprint"]


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "a  b\tc"), (2, "a b c")], "doc_id long, text string")
    out = [r["fingerprint"] for r in
           document_stats(df, "doc_id", "text").collect()]
    # md5 component equal after whitespace normalization
    assert out[0].split("-")[0] == out[1].split("-")[0]
