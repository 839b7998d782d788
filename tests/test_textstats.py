"""Text-analysis operators over the documents table: winnowing
rolling-hash fingerprints (langid/quality/token stats are pinned
in test_textstats_evalagg.py and the doc_stats driver oracle)."""


def test_winnow_fingerprints(spark):
    """Winnowing sketch (MOSS): window-min selection over k-gram
    hashes — shared substrings of length ≥ k+w−1 guarantee a shared
    fingerprint; disjoint texts share almost none; short docs emit
    nothing; the plan is pure JVM (no Python UDF)."""
    from effocr_spark.operators.textstats import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [(1, shared + " alpha suffix one"),
            (2, "prefix two " + shared),
            (3, "completely different content about spark plans"),
            (4, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, "doc_id", "text")
    fps = {}
    for r in out.collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert 4 not in fps  # below k+w-1: no fingerprints
    # guarantee property: docs 1 and 2 share the long substring
    assert fps[1] & fps[2]
    # locality: overlap with the unrelated doc is (near-)empty
    assert len(fps[1] & fps[3]) <= 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
