"""Dedup operators vs plain-Python oracles (MinHash/SimHash/Jaccard
recomputed with hashlib; exact dedup vs pandas groupby)."""

import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

from effocr_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "totally different content here about spark engines"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (4, "a b"),  # fewer than 3 words → zero shingles
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _shingles(text: str, k: int = 3) -> list[str]:
    w = text.split(" ")
    if len(w) < k:
        return []
    return [" ".join(w[i: i + k]) for i in range(len(w) - k + 1)]


def test_minhash_matches_hashlib_oracle(docs_df):
    out = {r["doc_id"]: r for r in
           dedup.minhash_signatures(docs_df, "doc_id", "text").collect()}
    # doc 4 has no shingles → no row (groupBy over empty explode)
    assert 4 not in out
    for doc_id, text in DOCS:
        sh = _shingles(text)
        if not sh:
            continue
        for i in range(dedup.N_MINHASHES):
            exp = min(_md5(f"{s}#{i}") for s in sh)
            assert out[doc_id][f"sig_{i}"] == exp, (doc_id, i)


def test_minhash_identical_docs_identical_sigs(docs_df):
    out = {r["doc_id"]: tuple(r[f"sig_{i}"] for i in range(8))
           for r in dedup.minhash_signatures(docs_df, "doc_id", "text").collect()}
    assert out[0] == out[3]
    assert out[0] != out[2]


def test_lsh_candidate_pairs_find_near_dups(spark, docs_df):
    sigs = dedup.minhash_signatures(docs_df, "doc_id", "text")
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in dedup.lsh_candidate_pairs(sigs, "doc_id").collect()}
    assert pairs[(0, 3)] == 1.0          # exact dups share every band
    assert (0, 1) in pairs               # near dups share ≥1 band
    assert (0, 2) not in pairs           # unrelated docs share none


def test_simhash_oracle(docs_df):
    out = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash(docs_df, "doc_id", "text").collect()}
    for doc_id, text in DOCS:
        words = text.split(" ")
        bits = 0
        for i in range(dedup.SIMHASH_BITS):
            vote = sum(ord(_md5(w)[i]) % 2 for w in words) / len(words)
            if vote > 0.5:
                bits |= 1 << i
        assert out[doc_id] == bits, doc_id
    assert out[0] == out[3]


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 10), (3, "b", 20)],
        "id long, k string, v long")
    out = {(r["k"], r["v"]): (r["id"], r["dup_count"])
           for r in dedup.exact_dedup(df, ["k", "v"], "id").collect()}
    assert out[("a", 10)] == (1, 2)
    assert out[("b", 20)] == (3, 1)


def test_ngram_jaccard_oracle(spark, docs_df):
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(docs_df, "doc_id", "text").collect()}
    g = {d: set(_shingles(t)) for d, t in DOCS}
    for a, b in itertools.combinations([0, 1, 2, 3], 2):
        inter = len(g[a] & g[b])
        if inter == 0:
            assert (a, b) not in out
        else:
            exp = inter / len(g[a] | g[b])
            assert abs(out[(a, b)] - exp) < 1e-9, (a, b)
    assert out[(0, 3)] == 1.0


def test_lsh_candidate_pairs_hot_bucket_cap(spark):
    """A degenerate bucket (many identical docs) must be quarantined by
    max_bucket_size: bounded pair output instead of B^2 blowup, and the
    oversize-bucket metric reports it."""
    from pyspark.sql import functions as F
    from effocr_spark.operators.dedup import (
        lsh_candidate_pairs, lsh_oversize_buckets, minhash_signatures)

    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
              for i in range(30)]
    uniq = [(100 + i, f"distinct document number {i} with words {i * 7} "
             f"and {i * 13} padding tail") for i in range(4)]
    df = spark.createDataFrame(boiler + uniq, "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id", "text")

    uncapped = lsh_candidate_pairs(sigs, "doc_id").collect()
    assert len(uncapped) >= 30 * 29 // 2  # the blowup being defused

    capped = lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=10)
    rows = capped.collect()
    boiler_ids = {i for i, _ in boiler}
    assert not any(r["id_a"] in boiler_ids and r["id_b"] in boiler_ids
                   for r in rows)

    over = lsh_oversize_buckets(sigs, "doc_id", max_bucket_size=10).collect()
    assert len(over) >= 1
    assert all(r["bucket_size"] == 30 for r in over)


def test_exact_dedup_rows_returns_survivors(spark):
    from effocr_spark.operators.dedup import exact_dedup_rows

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "z"), (4, "b", "w"),
         (5, "c", "v")],
        "id long, key string, payload string")
    out = {(r["id"], r["key"], r["payload"])
           for r in exact_dedup_rows(df, ["key"], "id").collect()}
    assert out == {(1, "a", "x"), (3, "b", "z"), (5, "c", "v")}


def test_dedup_groups_connected_components(spark):
    """pairs → components by min-label propagation: a chain, a triangle,
    isolated ids; survivors = min id per component + isolated."""
    from effocr_spark.operators.dedup import dedup_groups, dedup_survivors

    ids = spark.createDataFrame([(i,) for i in range(10)], "id long")
    # chain 0-1-2-3 (only consecutive pairs), triangle 5-6-7, isolated 4,8,9
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7), (5, 7)],
        "id_a long, id_b long")
    groups = {r["id"]: r["group_id"]
              for r in dedup_groups(ids, pairs).collect()}
    assert groups == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4,
                      5: 5, 6: 5, 7: 5, 8: 8, 9: 9}
    surv = {r["id"] for r in dedup_survivors(ids, pairs).collect()}
    assert surv == {0, 4, 5, 8, 9}


def test_dedup_groups_long_chain_converges(spark):
    """A 17-node chain: min-label propagation moves the min one hop per
    round, so convergence takes diameter rounds — max_iter must cover
    it, and lineage truncation keeps round cost constant."""
    from effocr_spark.operators.dedup import dedup_groups

    n = 17
    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "id_a long, id_b long")
    groups = dedup_groups(ids, pairs, max_iter=n)
    assert groups.filter("group_id != 0").count() == 0


def test_dedup_groups_raises_on_non_convergence(spark):
    """A component whose diameter exceeds max_iter must raise, not
    return silently-partial labels (dedup_survivors would keep multiple
    representatives of one cluster)."""
    import pytest
    from effocr_spark.operators.dedup import dedup_groups

    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_groups(ids, pairs, max_iter=2).collect()


def test_dedup_groups_reliable_checkpoint(spark, tmp_path):
    """reliable_checkpoint=True truncates lineage via checkpoint() to the
    configured dir — the durability mode for long CC jobs on a real
    cluster (localCheckpoint blocks die with their executor)."""
    from effocr_spark.operators.dedup import dedup_groups

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    ids = spark.createDataFrame([(i,) for i in range(6)], "id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)],
                                  "id_a long, id_b long")
    groups = {r["id"]: r["group_id"]
              for r in dedup_groups(ids, pairs,
                                    reliable_checkpoint=True).collect()}
    assert groups == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
    # checkpoint files actually landed on disk
    import os
    hits = [f for _, _, fs in os.walk(tmp_path / "ckpt") for f in fs]
    assert hits, "reliable checkpoint wrote nothing"
