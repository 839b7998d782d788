"""Explicit StructType schemas + CHECK-style validation (SURVEY.md §1.4).

The reference validates by convention + assert (crashes the run,
format_effocr_recognizer_dataset.py:335, infer_effocr_onnx_multi.py:94).
At table scale we validate declaratively: `validate` appends boolean
check columns and `quarantine_split` separates failing rows into a
quarantine DF with per-check violation counts — never an exception.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

RESULT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("extracted_text", StringType(), True),
    StructField("n_chars", IntegerType(), True),
    StructField("ok", BooleanType(), True),
    StructField("error", StringType(), True),
    StructField("branch", StringType(), True),
])

PROCESSED_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("chunk_id", IntegerType(), False),
    StructField("run_id", StringType(), False),
])

METRICS_SCHEMA = StructType([
    StructField("run_id", StringType(), False),
    StructField("chunk_id", IntegerType(), False),
    StructField("n_rows", LongType(), False),
    StructField("n_ok", LongType(), False),
    StructField("n_err", LongType(), False),
    StructField("wall_ms", LongType(), False),
])

def page_checks() -> dict:
    """CHECK-style predicates on the pages table (built lazily: Column
    construction needs an active JVM gateway)."""
    return {
        "chk_url_nonempty": F.length(F.col("url")) > 0,
        "chk_html_nonempty": F.length(F.col("html")) > 0,
        "chk_lang_known": F.col("lang").isin("en", "jp", "de", "es", "fr", "zh"),
    }


def validate(df: DataFrame, checks: dict | None = None) -> DataFrame:
    """Append one boolean column per check plus `_valid` (AND of all)."""
    checks = checks or page_checks()
    out = df
    valid = F.lit(True)
    for name, expr in checks.items():
        cond = F.coalesce(expr, F.lit(False))
        out = out.withColumn(name, cond)
        valid = valid & cond
    return out.withColumn("_valid", valid)


def quarantine_split(df: DataFrame, checks: dict | None = None):
    """→ (good DF without check columns, quarantine DF, violations DF
    with per-check counts) — the metrics-table replacement for the
    reference's assert-crash."""
    checks = checks or page_checks()
    v = validate(df, checks)
    good = v.filter(F.col("_valid")).drop("_valid", *checks.keys())
    bad = v.filter(~F.col("_valid"))
    counts = bad.agg(*[
        F.sum((~F.col(name)).cast("long")).alias(name) for name in checks
    ], F.count("*").alias("n_quarantined"))
    return good, bad, counts
