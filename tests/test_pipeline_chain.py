"""Training-data-pipeline chaining: extraction output feeds the dedup /
quality / similarity operators directly — the end-to-end story a
web-scale corpus build runs (extract → dedup → filter)."""

from pyspark.sql import functions as F

from effocr_spark import pipeline
from effocr_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from effocr_spark.operators.textstats import document_stats
from effocr_spark.synth.pages import pages_df


def test_extract_then_dedup_then_stats(spark, protos_bc):
    pages, _ = pages_df(spark, 120, seed=42)
    # plant exact duplicates under new urls (mirror hosts)
    mirrored = pages.withColumn(
        "url", F.concat(F.lit("https://mirror.example/"), F.col("url")))
    both = pages.unionByName(mirrored)

    res = pipeline.extract_pages(both, protos_bc, salt_partitions=8)
    docs = (res.filter(F.col("ok") & F.col("extracted_text").isNotNull())
            .select(F.xxhash64("url").alias("doc_id"),
                    F.col("url"),
                    F.col("extracted_text").alias("text")))
    n_docs = docs.count()
    assert n_docs > 180  # two copies of nearly every page

    # near-dup detection must pair every original with its mirror
    sigs = minhash_signatures(docs, "doc_id", "text")
    pairs = lsh_candidate_pairs(sigs, "doc_id") \
        .filter(F.col("est_jaccard") >= 1.0)
    n_exact_pairs = pairs.count()
    # docs with ≥3 words (shingle-able): every original↔mirror pair found
    eligible = docs.filter(F.size(F.split("text", " ")) >= 3).count()
    assert n_exact_pairs >= eligible // 2 - 2

    # quality stats run directly on extraction output
    stats = document_stats(docs, "doc_id", "text")
    row = stats.agg(F.avg("quality").alias("q"),
                    F.avg("n_tokens").alias("t")).collect()[0]
    assert 0.2 < row["q"] <= 1.0
    assert row["t"] > 2
