"""Kill/resume: an interrupted checkpointed run, resumed, must equal the
uninterrupted run exactly (north rule: resumable from checkpoint with
per-partition lineage + metrics)."""

import pytest

from effocr_spark import lineage
from effocr_spark.synth.pages import pages_df

N_PAGES = 120


def _results_dict(spark, out_dir):
    return {
        r["url"]: (r["extracted_text"], r["branch"], r["ok"])
        for r in lineage.read_results(spark, out_dir).collect()
    }


def test_kill_and_resume_equals_uninterrupted(spark, protos_bc, tmp_path):
    pages, _ = pages_df(spark, N_PAGES, seed=42)

    full_dir = str(tmp_path / "full")
    lineage.run_extraction(spark, pages, full_dir, protos_bc,
                           run_id="full", n_chunks=4)
    full = _results_dict(spark, full_dir)
    assert len(full) == N_PAGES

    # interrupted run: crash injected after chunk 1
    part_dir = str(tmp_path / "partial")
    with pytest.raises(RuntimeError, match="injected failure"):
        lineage.run_extraction(spark, pages, part_dir, protos_bc,
                               run_id="r1", n_chunks=4, fail_after_chunk=1)
    partial = _results_dict(spark, part_dir)
    assert 0 < len(partial) < N_PAGES

    # resume: completes only the missing chunks
    lineage.run_extraction(spark, pages, part_dir, protos_bc,
                           run_id="r2", n_chunks=4)
    resumed = _results_dict(spark, part_dir)
    assert resumed == full

    # metrics cover all chunks, counts add up
    metrics = lineage.read_metrics(spark, part_dir)
    rows = metrics.collect()
    assert {r["chunk_id"] for r in rows} == {0, 1, 2, 3}
    assert sum(r["n_rows"] for r in rows) == N_PAGES
    assert all(r["wall_ms"] >= 0 for r in rows)

    # per-partition metrics sum to the same totals
    pm = lineage.read_partition_metrics(spark, part_dir).collect()
    assert sum(r["n_rows"] for r in pm) == N_PAGES
    assert {r["branch"] for r in pm} == {"ocr", "dom"}
    assert len({(r["chunk_id"], r["partition_id"], r["branch"])
                for r in pm}) == len(pm)


def test_resume_is_noop_when_complete(spark, protos_bc, tmp_path):
    pages, _ = pages_df(spark, 40, seed=7)
    out = str(tmp_path / "done")
    lineage.run_extraction(spark, pages, out, protos_bc, run_id="a", n_chunks=2)
    before = _results_dict(spark, out)
    lineage.run_extraction(spark, pages, out, protos_bc, run_id="b", n_chunks=2)
    after = _results_dict(spark, out)
    assert before == after
    # no duplicate chunks in metrics beyond the original two
    assert lineage.read_metrics(spark, out).count() == 2

def test_resume_with_different_n_chunks_fails_fast(spark, protos_bc, tmp_path):
    """Chunk membership is pmod(xxhash64(url), n_chunks): resuming with a
    different n_chunks would silently never process some urls. The
    manifest pins the value and resume must refuse the mismatch."""
    pages, _ = pages_df(spark, 40, seed=7)
    out = str(tmp_path / "mismatch")
    with pytest.raises(RuntimeError, match="injected failure"):
        lineage.run_extraction(spark, pages, out, protos_bc,
                               run_id="a", n_chunks=4, fail_after_chunk=0)
    with pytest.raises(ValueError, match="n_chunks=4"):
        lineage.run_extraction(spark, pages, out, protos_bc,
                               run_id="b", n_chunks=8)
    # same n_chunks resumes fine and completes
    lineage.run_extraction(spark, pages, out, protos_bc,
                           run_id="b", n_chunks=4)
    assert len(_results_dict(spark, out)) == 40


def test_same_run_id_resume_metrics_not_double_counted(spark, protos_bc,
                                                       tmp_path):
    """The documented resume flow is 're-run the SAME command' — same
    run_id. Metrics must come from the chunk's in-flight DataFrame, not a
    disk re-read that would also count the crashed attempt's partial rows
    under the same (chunk_id, run_id)."""
    pages, _ = pages_df(spark, 60, seed=11)
    out = str(tmp_path / "samerun")
    with pytest.raises(RuntimeError, match="injected failure"):
        lineage.run_extraction(spark, pages, out, protos_bc,
                               run_id="r", n_chunks=3, fail_after_chunk=0)
    # simulate "crashed between results and lineage writes" for chunk 1:
    # chunk 0's results+lineage are committed; re-run same run_id
    lineage.run_extraction(spark, pages, out, protos_bc,
                           run_id="r", n_chunks=3)
    metrics = lineage.read_metrics(spark, out).collect()
    assert sum(r["n_rows"] for r in metrics) == 60
    assert len(_results_dict(spark, out)) == 60
