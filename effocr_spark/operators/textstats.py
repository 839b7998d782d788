"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — the per-document filters a web-scale training
-data pipeline runs before anything expensive.

All pure JVM expressions (split / array_intersect / regexp / md5);
engine-portable so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword sets for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "los", "que", "de", "y", "es", "con", "por"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "pour", "une"],
}


def tokens(text_col) -> Column:
    return F.split(text_col, " ")


def token_count(text_col) -> Column:
    return F.size(tokens(text_col))


def avg_token_len(text_col) -> Column:
    # total non-space chars / token count
    return (
        F.length(F.regexp_replace(text_col, " ", ""))
        / F.greatest(token_count(text_col), F.lit(1))
    )


def stopword_hits(text_col, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.array_intersect(
        tokens(F.lower(text_col)),
        F.array(*[F.lit(w) for w in words]),
    ))


def punct_ratio(text_col) -> Column:
    total = F.greatest(F.length(text_col), F.lit(1))
    punct = F.length(text_col) - F.length(
        F.regexp_replace(text_col, r"[\.,;:!\?]", ""))
    return punct / total


def quality_score(text_col) -> Column:
    """Composite [0,1]-ish quality heuristic: long-enough docs with
    moderate word length, some stopwords, low punctuation density."""
    tc = token_count(text_col)
    len_ok = F.least(tc / F.lit(50.0), F.lit(1.0))
    wordlen = avg_token_len(text_col)
    wordlen_ok = F.when((wordlen >= 2) & (wordlen <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.least(stopword_hits(text_col, "en") / F.lit(3.0), F.lit(1.0))
    punct_ok = F.when(punct_ratio(text_col) < 0.1, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + wordlen_ok + stop_ok + punct_ok) / 4.0


# Actual CJK codepoint ranges (Han + Hiragana + Katakana) — NOT "any
# non-ASCII": accented Latin (é, ñ, ü) must stay with its stopword vote.
# The DuckDB oracle mirrors the same ranges (RE2 \x{...} spelling).
_CJK_CLASS = "[一-鿿぀-ヿ]"  # Han, Hiragana, Katakana


def langid(text_col) -> Column:
    """Stopword-vote language-ID over the supported set; 'zh' if CJK
    (Han/kana) chars present; 'und' when nothing votes. Winner = the
    FIRST language in code order achieving the maximum vote (same
    semantics the DuckDB oracle spells as a CASE chain).

    Spelled as greatest(scores) + one equality test per language
    rather than the old sequential best-score fold: that fold nested
    every earlier score inside each When branch, so the final
    expression tree held each stopword-intersect subtree ~8x — this
    form holds each twice (greatest + one compare), measured ~4x
    faster on the sf0.1 documents scan. CJK presence is rlike (first
    match wins) instead of regexp_replace over the whole text."""
    scores = {lang: stopword_hits(text_col, lang) for lang in STOPWORDS}
    return _langid_case(text_col.rlike(_CJK_CLASS), scores)


def _langid_case(cjk_col, scores: dict) -> Column:
    """The shared langid decision CASE over precomputed score columns:
    zh if CJK, 'und' if no votes, else first language in code order
    achieving the max vote."""
    order = sorted(scores)
    m = F.greatest(*[scores[lang] for lang in order])
    out = (F.when(cjk_col, F.lit("zh"))
           .when(m <= 0, F.lit("und")))
    for lang in order[:-1]:
        out = out.when(scores[lang] == m, F.lit(lang))
    return out.otherwise(F.lit(order[-1]))


def with_langid(df: DataFrame, text_col: str,
                out_col: str = "lang_pred") -> DataFrame:
    """df + a `lang_pred` column, with the stopword-hit scores and the
    CJK flag PROJECTED ONCE in a separate Project below the decision
    CASE (Catalyst does not collapse the non-cheap split/intersect
    aliases into their consumers, so each is evaluated once per row
    instead of once per CASE branch — guide §1.2 'per-task work')."""
    t = F.col(text_col)
    hits = df.select(
        "*",
        *[stopword_hits(t, lang).alias(f"_hit_{lang}")
          for lang in sorted(STOPWORDS)],
        t.rlike(_CJK_CLASS).alias("_cjk"))
    pred = _langid_case(F.col("_cjk"),
                        {lang: F.col(f"_hit_{lang}")
                         for lang in sorted(STOPWORDS)})
    return (hits.withColumn(out_col, pred)
            .drop("_cjk", *[f"_hit_{lang}" for lang in sorted(STOPWORDS)]))


def fingerprint(text_col) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    plus the token count — cheap exact-dup key."""
    norm = F.lower(F.regexp_replace(text_col, r"\s+", " "))
    return F.concat_ws("-", F.md5(norm), token_count(text_col).cast("string"))


def document_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per document with the full stat battery."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        F.round(avg_token_len(t), 4).alias("avg_token_len"),
        F.round(punct_ratio(t), 4).alias("punct_ratio"),
        F.round(quality_score(t), 4).alias("quality"),
        langid(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str,
                        k: int = 8, window: int = 4) -> DataFrame:
    """Winnowing document sketch (Schleimer/Wilkerson/Aiken, the MOSS
    local fingerprinting algorithm): hash every character k-gram, take
    the MINIMUM hash of each length-`window` sliding window of
    consecutive k-gram hashes, and emit the DISTINCT selected hashes —
    a locality-robust rolling-hash sketch (any shared substring of
    length ≥ k + window − 1 guarantees a shared fingerprint).

    Pure JVM expressions (transform / slice / array_min over a
    sequence — no Python, no shuffle beyond the final explode), so the
    sketch runs at scan speed on 100 TB; at scale the natural next op
    is exact_dedup/groupBy on the (fingerprint → doc) inversion.
    → (id, fp) one row per distinct selected hash per document."""
    t = F.col(text_col)
    n_grams = F.length(t) - F.lit(k - 1)
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.md5(t.substr(i, F.lit(k))))
    n_windows = n_grams - F.lit(window - 1)
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(hashes, i, window)))
    # Filter BEFORE the projection: rows shorter than one full window
    # must never reach the sequence/slice expressions (sequence(1, 0)
    # counts DOWN and slice throws on index 0) — correctness must not
    # depend on the optimizer pushing the filter below the Project.
    # Post-filter, n_grams/n_windows are provably >= 1, so the
    # greatest(..., 0) clamps are gone too.
    return (df.where(F.length(t) >= k + window - 1)
            .select(F.col(id_col),
                    F.explode(F.array_distinct(mins)).alias("fp")))
