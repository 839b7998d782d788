"""Schema validation/quarantine + salted-repartition skew evidence."""

import pytest
from pyspark.sql import functions as F

from effocr_spark import schemas
from effocr_spark.synth.pages import pages_df


def test_validate_and_quarantine(spark):
    rows = [
        ("https://a/1", None, b"<html>x</html>", "", "en"),
        ("", None, b"x", "", "en"),            # empty url
        ("https://a/2", None, b"", "", "en"),  # empty html
        ("https://a/3", None, b"y", "", "xx"),  # unknown lang
    ]
    df = spark.createDataFrame(rows, schemas.PAGES_SCHEMA)
    good, bad, counts = schemas.quarantine_split(df)
    assert good.count() == 1
    assert bad.count() == 3
    c = counts.collect()[0]
    assert c["n_quarantined"] == 3
    assert c["chk_url_nonempty"] == 1
    assert c["chk_html_nonempty"] == 1
    assert c["chk_lang_known"] == 1


def test_generated_pages_all_valid(spark):
    pages, _ = pages_df(spark, 200, seed=42)
    good, bad, _ = schemas.quarantine_split(pages)
    assert bad.count() == 0
    assert good.count() == 200


def test_salted_repartition_balances_host_skew(spark):
    """Host-clustered input (the adversarial layout: one partition per
    host, image-heavy hosts dominate) → salted url-hash repartition must
    spread rows near-uniformly (SURVEY §4 custom item 1)."""
    pages, _ = pages_df(spark, 2000, seed=42)
    host = F.regexp_extract("url", r"https://([^.]*)\.", 1)
    clustered = pages.repartition(16, host)

    def sizes(df):
        return [r["count"] for r in
                df.groupBy(F.spark_partition_id().alias("p"))
                  .count().collect()]

    before = sizes(clustered)
    salted = clustered.repartition(16, F.xxhash64(F.col("url"), F.lit(0x5A17)))
    after = sizes(salted)

    # clustered-by-host is badly imbalanced (Zipf hosts), salted is not
    assert max(before) > 3 * (sum(before) / len(before))
    assert max(after) < 1.5 * (sum(after) / len(after))
    assert sum(after) == 2000
