"""The committed extract_pdf_scanned fixture files
(data/pdf_scan_fixtures/) must byte-match what the deterministic
writers generate — the data/pdf_fixtures pattern: commit the artifact,
pin regeneration parity, read the file in the hot path (the query pays
file reads, not JBIG2-MQ/JP2-DWT/JPEG-DCT encoder runs)."""

from effocr_spark.synth.pdf_scan_fixture_set import (FIXTURE_DIR,
                                                     fixture_filename,
                                                     generate_fixtures,
                                                     load_fixtures)


def test_committed_scan_fixtures_match_regeneration():
    fresh = generate_fixtures()
    assert fresh, "fixture factory table is empty"
    for url, blob in fresh.items():
        path = FIXTURE_DIR / fixture_filename(url)
        assert path.exists(), f"missing committed fixture {path}"
        assert path.read_bytes() == blob, (
            f"{path.name} drifted from its writer — if the writer "
            f"change was intentional, run tools/make_pdf_scan_fixtures.py "
            f"then tools/make_goldens.py + tools/check_queries.py")


def test_load_scan_fixtures_covers_every_factory_in_row_order():
    urls = [u for u, _ in load_fixtures()]
    assert set(urls) == set(generate_fixtures())
    # row order is the historical q_extract_pdf_scanned emission order
    # (scans, text layer, fax family, jbig2 family, jpx family, inline,
    # halftone) — goldens were pinned against it
    assert urls[0] == "pdf://scan/00"
    assert urls[-1] == "pdf://jbig2/halftone"
    assert len(urls) == 24
