"""End-to-end extraction pipeline: route → OCR | DOM → fuse.

Dataflow (SURVEY.md §3.1 "Spark lifecycle"):

    pages ──sniff(html magic, JVM-side)──┬─ image pages ─ salted
                                         │   repartition ─ fused OCR
                                         │   mapInPandas stage
                                         └─ born-digital ─ strip_html
                                             pandas UDF
    branches are DISJOINT by construction (every row routes exactly one
    way), so the per-url fusion is a unionByName — same result as the
    full-outer-join+coalesce spelling but with zero shuffle.

Scale notes (the 100 TB design point):
 - the only repartition is the salted one in front of the OCR stage:
   page cost varies ~100x across hosts (image-heavy hosts) and AQE
   balances bytes, not Python-UDF compute, so we spread rows by
   xxhash64(url, salt) ourselves (SURVEY.md §4 custom item 1)
 - filters on lang / html prefix are Catalyst-pushable; the html column
   is never carried past the branch UDFs (column pruning)
 - the prototype matrix is a broadcast variable, never a join side
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions.recognize import build_prototypes
from .operators.extract import (dom_branch, is_image_page, is_pdf_page,
                                ocr_branch, pdf_branch)

RESULT_SCHEMA_HINT = (
    "url string, extracted_text string, n_chars int, ok boolean, "
    "error string, branch string"
)


def broadcast_prototypes(spark: SparkSession, langs=("en", "jp")):
    """Build the glyph-prototype index driver-side and broadcast it —
    the FAISS ref.index analog (infer_effocr_onnx_multi.py:496-505)."""
    protos = {lang: build_prototypes(lang) for lang in langs}
    return spark.sparkContext.broadcast(protos)


def extract_pages(
    pages: DataFrame,
    protos_bc,
    salt_partitions: int | None = None,
    conf_thres: float = 0.35,
    iou_thres: float = 0.01,
    anchor_margin: float | None = None,
    spell_check: bool = False,
    recognizer: str = "knn",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, ...) →
    (url, extracted_text, n_chars, ok, error, branch).

    Three-way content routing by JVM-side magic-byte sniff (no Python in
    the router): PNG → OCR, %PDF → PDF layout parse, else → DOM strip.
    Branches are disjoint by construction, so fusion stays a
    unionByName (zero shuffles outside the salted OCR repartition)."""
    image_rows = pages.filter(is_image_page(F.col("html")))
    pdf_rows = pages.filter(is_pdf_page(F.col("html")))
    dom_rows = pages.filter(~is_image_page(F.col("html"))
                            & ~is_pdf_page(F.col("html")))

    if salt_partitions:
        # defuse host skew: image-heavy hosts cluster in url space, and
        # input file splits preserve that; hash-spread rows before the
        # expensive UDF stage (cost ∝ rows, not bytes)
        image_rows = image_rows.repartition(
            salt_partitions, F.xxhash64(F.col("url"), F.lit(0x5A17)))

    ocr = ocr_branch(image_rows, protos_bc, conf_thres, iou_thres,
                     anchor_margin, spell_check, recognizer)
    dom = dom_branch(dom_rows)
    pdfs = pdf_branch(pdf_rows)
    return (
        ocr.withColumn("branch", F.lit("ocr"))
        .unionByName(dom.withColumn("branch", F.lit("dom")))
        .unionByName(pdfs.withColumn("branch", F.lit("pdf")))
    )


def run(spark: SparkSession, pages: DataFrame, out_path: str | None = None,
        **kwargs) -> DataFrame:
    """Convenience wrapper: broadcast prototypes, extract, optionally sink."""
    protos_bc = broadcast_prototypes(spark)
    result = extract_pages(pages, protos_bc, **kwargs)
    if out_path:
        result.write.mode("overwrite").parquet(out_path)
        return spark.read.parquet(out_path)
    return result
