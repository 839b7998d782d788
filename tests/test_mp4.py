"""MP4/ISO-BMFF metadata path: the stdlib box parser
(synth/mp4box.py) against deterministic fixture files, plus the Spark
video_metadata operator and its quarantine semantics."""

import struct

import pytest

from effocr_spark.synth.mp4box import is_mp4, make_mp4, parse_mp4_meta


def test_roundtrip_video_and_audio_tracks():
    b = make_mp4(640, 360, 12.5, with_audio=True)
    assert is_mp4(b)
    m = parse_mp4_meta(b)
    assert m == {"brand": "isom", "duration_s": 12.5, "width": 640,
                 "height": 360, "n_tracks": 2,
                 "handlers": ["vide", "soun"]}


def test_timescale_and_brand_variants():
    m = parse_mp4_meta(make_mp4(1920, 1080, 3.25, timescale=90000,
                                brand=b"mp42"))
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["duration_s"] == 3.25
    assert m["brand"] == "mp42" and m["n_tracks"] == 1


def test_largesize_box_supported():
    """A box rewritten with size=1 + 64-bit largesize must parse the
    same (big web MP4s use largesize for mdat)."""
    b = make_mp4(320, 240, 1.0)
    # rewrite the trailing mdat as a largesize box
    i = b.rfind(b"mdat") - 4
    (size,) = struct.unpack_from(">I", b, i)
    big = (b[:i] + struct.pack(">I", 1) + b"mdat"
           + struct.pack(">Q", size + 8) + b[i + 8:])
    assert parse_mp4_meta(big) == parse_mp4_meta(b)


def test_corruption_raises_cleanly():
    b = make_mp4(320, 240, 1.0)
    with pytest.raises(ValueError):
        parse_mp4_meta(b[:40])           # truncated inside moov
    with pytest.raises(ValueError):
        parse_mp4_meta(b"\x00" * 16)     # no ftyp
    # box that overruns its container
    bad = bytearray(b)
    i = bad.find(b"moov") - 4
    struct.pack_into(">I", bad, i, len(b) * 2)
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4_meta(bytes(bad))


def test_video_metadata_operator(spark):
    from pyspark.sql import functions as F

    from effocr_spark.operators.multimodal import (sniff_media_type,
                                                   video_metadata)

    rows = [(0, bytearray(make_mp4(640, 360, 2.0))),
            (1, bytearray(make_mp4(1280, 720, 5.5, with_audio=True))),
            (2, bytearray(b"not a video at all")),
            (3, bytearray(make_mp4(320, 240, 1.0)[:40]))]  # truncated
    df = spark.createDataFrame(rows, "id long, media binary")
    sniffed = {r["id"]: r["t"] for r in df.select(
        "id", sniff_media_type(F.col("media")).alias("t")).collect()}
    assert sniffed[0] == "video/mp4" and sniffed[2] != "video/mp4"
    assert sniffed[3] == "video/mp4"  # magic present, body truncated

    out = {r["id"]: r for r in video_metadata(df).collect()}
    assert out[0]["ok"] and (out[0]["width"], out[0]["height"]) == (640, 360)
    assert out[1]["ok"] and out[1]["n_tracks"] == 2 \
        and out[1]["handlers"] == ["vide", "soun"]
    assert not out[2]["ok"] and not out[3]["ok"]  # quarantined, job alive
    assert out[3]["error"]
