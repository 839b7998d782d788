"""The committed extract_pdf fixture files (data/pdf_fixtures/) must
byte-match what the deterministic writers generate — the tiny_font.ttf
pattern: commit the artifact, pin regeneration parity, read the file
in the hot path (q_extract_pdf pays file reads, not R6 hash chains)."""

from effocr_spark.synth.pdf_fixture_set import (FIXTURE_DIR,
                                                fixture_filename,
                                                generate_fixtures,
                                                load_fixtures)


def test_committed_fixtures_match_regeneration():
    fresh = generate_fixtures()
    assert fresh, "fixture factory table is empty"
    for url, blob in fresh.items():
        path = FIXTURE_DIR / fixture_filename(url)
        assert path.exists(), f"missing committed fixture {path}"
        assert path.read_bytes() == blob, (
            f"{path.name} drifted from its writer — if the writer "
            f"change was intentional, run tools/make_pdf_fixtures.py "
            f"then tools/make_goldens.py + tools/check_queries.py")


def test_load_fixtures_covers_every_factory_and_is_ordered():
    urls = [u for u, _ in load_fixtures()]
    assert urls == sorted(urls)
    assert set(urls) == set(generate_fixtures())
    # the three headline families are all present
    assert any(u.startswith("pdf://enc/") for u in urls)
    assert any(u.startswith("pdf://cid/") for u in urls)
    assert "pdf://tm/doc" in urls
