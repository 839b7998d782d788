"""Serialized model artifact drop-in: the npz encoder loads through the
per-executor singleton seam (the ort-session analog,
/root/reference/localizer_engine.py:25-29 /
recognizer_engine.py:23-27), deserializes exactly once per worker
process, and produces byte-identical pipeline output to the in-module
weights (the committed artifact IS those weights, exported by
tools/make_model_artifact.py)."""

import os

import numpy as np
import pytest

from effocr_spark.synth import model as synthmodel

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "model_enc.npz")


def test_artifact_loads_and_is_singleton():
    before = synthmodel.artifact_load_count(ARTIFACT)
    m1 = synthmodel.load_projection(ARTIFACT)
    m2 = synthmodel.load_projection(ARTIFACT)
    assert m1 is m2  # cache hit returns the same object
    assert synthmodel.artifact_load_count(ARTIFACT) <= before + 1
    assert np.array_equal(m1, synthmodel._PROJ)


def test_artifact_validates_geometry(tmp_path):
    """A 768-dim artifact refuses to load into a 64-dim run — no silent
    mis-projection."""
    bad = tmp_path / "bad.npz"
    np.savez(bad, projection=np.zeros((256, 768), np.float32),
             crop_size=np.int64(224), embed_dim=np.int64(768))
    with pytest.raises(ValueError, match="exported for"):
        synthmodel.load_projection(str(bad))


def test_pipeline_with_artifact_is_byte_identical(spark, protos_bc):
    """extract_pages(encoder_artifact=npz) == extract_pages() row for
    row: a real serialized model drops in with zero operator changes."""
    from effocr_spark import pipeline
    from effocr_spark.synth.pages import pages_df

    pages, _ = pages_df(spark, 60, seed=13)
    base = {r["url"]: r.asDict() for r in
            pipeline.extract_pages(pages, protos_bc).collect()}
    protos_art = pipeline.broadcast_prototypes(
        spark, encoder_artifact=ARTIFACT)
    art = {r["url"]: r.asDict() for r in
           pipeline.extract_pages(pages, protos_art,
                                  encoder_artifact=ARTIFACT).collect()}
    assert art == base


def test_artifact_loads_once_per_executor(spark):
    """Run the loader inside a many-partition mapInPandas job and prove
    each worker process deserialized the artifact exactly once, however
    many partitions/batches it handled (worker reuse means #loads =
    #distinct worker pids, not #partitions)."""
    import pandas as pd

    def probe(batches):
        for pdf in batches:
            synthmodel.load_projection(ARTIFACT)
            synthmodel.load_projection(ARTIFACT)  # second call: cache hit
            yield pd.DataFrame({
                "pid": [os.getpid()] * len(pdf),
                "loads": [synthmodel.artifact_load_count(ARTIFACT)] * len(pdf),
            })

    df = spark.range(64).repartition(16)
    rows = df.mapInPandas(probe, "pid long, loads long").collect()
    assert rows
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], set()).add(r["loads"])
    # every worker process reports exactly one deserialize, ever
    assert all(v == {1} for v in by_pid.values()), by_pid
    # and worker reuse means fewer processes than partitions — the
    # singleton actually amortized across batches
    assert len(by_pid) <= 16
