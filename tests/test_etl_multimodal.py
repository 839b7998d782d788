"""COCO ETL operators (combine/split/subset/join) + multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from effocr_spark.operators import etl_coco, multimodal
from effocr_spark.synth.imgcodec import decode_png, encode_png
import numpy as np


@pytest.fixture(scope="module")
def coco(spark):
    images = spark.createDataFrame(
        [(i, f"im{i}.png", 100, 20, "txt") for i in range(20)],
        "id long, file_name string, width int, height int, text string")
    annos = spark.createDataFrame(
        [(i * 10 + j, i, 0, [j, 0, 5, 9]) for i in range(20) for j in range(3)],
        "id long, image_id long, category_id int, bbox array<int>")
    return images, annos


def test_split_disjoint_and_complete(coco):
    """SURVEY §2.7 E3: split disjointness (recognizer_datasets.py:106-109)."""
    images, annos = coco
    parts = etl_coco.coco_split(images, annos, fracs=(0.6, 0.2, 0.2), seed=5)
    ids = [set(r["id"] for r in p[0].collect()) for p in parts]
    assert ids[0] | ids[1] | ids[2] == set(range(20))
    assert not (ids[0] & ids[1] or ids[0] & ids[2] or ids[1] & ids[2])
    # annotations follow their images
    for part_imgs, part_annos in parts:
        im_ids = {r["id"] for r in part_imgs.collect()}
        assert {r["image_id"] for r in part_annos.collect()} <= im_ids
    # deterministic
    parts2 = etl_coco.coco_split(images, annos, fracs=(0.6, 0.2, 0.2), seed=5)
    assert ids[0] == {r["id"] for r in parts2[0][0].collect()}


def test_subset(coco):
    images, annos = coco
    sub_i, sub_a = etl_coco.coco_subset(images, annos, 5)
    assert sub_i.count() == 5
    assert sub_a.count() == 15


def test_combine_reassigns_ids(spark, coco):
    images, annos = coco
    im2 = images.withColumn("id", F.col("id"))  # same ids on purpose
    ci, ca = etl_coco.coco_combine([images, im2], [annos, annos])
    new_ids = [r["new_image_id"] for r in ci.collect()]
    assert len(new_ids) == 40
    assert len(set(new_ids)) == 40  # globally unique after combine
    assert ca.count() == 120


def test_annotations_with_images_join(coco):
    images, annos = coco
    j = etl_coco.annotations_with_images(images, annos)
    assert j.count() == 60
    assert "file_name" in j.columns


def test_envelope_join(spark):
    """IoM ≥ 0.8 char↔word join vs the numpy box_iom kernel."""
    import itertools
    from effocr_spark.functions.boxes import box_iom

    chars = spark.createDataFrame(
        [(1, 10, [0, 0, 5, 9]), (2, 10, [20, 0, 5, 9]),
         (3, 11, [0, 0, 5, 9])],
        "id long, image_id long, bbox array<int>")
    words = spark.createDataFrame(
        [(100, 10, [0, 0, 12, 9]), (101, 10, [19, 0, 7, 9]),
         (102, 11, [40, 0, 5, 9])],
        "id long, image_id long, bbox array<int>")
    got = {(r["char_id"], r["word_id"])
           for r in etl_coco.envelope_join(chars, words).collect()}

    def to_xyxy(b):
        return [b[0], b[1], b[0] + b[2], b[1] + b[3]]
    exp = set()
    for c in chars.collect():
        for w in words.collect():
            if c["image_id"] != w["image_id"]:
                continue
            iom = box_iom(np.array([to_xyxy(c["bbox"])], dtype=float),
                          np.array([to_xyxy(w["bbox"])], dtype=float))[0, 0]
            if iom >= 0.8:
                exp.add((c["id"], w["id"]))
    assert got == exp
    assert (1, 100) in got and (3, 102) not in got


def test_media_features_real_png_and_quarantine(spark):
    img = np.full((7, 11), 128, dtype=np.uint8)
    rows = [(1, bytearray(encode_png(img))), (2, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "id long, media binary")
    out = {r["id"]: r for r in multimodal.media_features(df).collect()}
    assert out[1]["ok"] and out[1]["width"] == 11 and out[1]["height"] == 7
    assert abs(out[1]["mean_luma"] - 128.0) < 1e-6
    assert out[1]["media_type"] == "image/png"
    assert not out[2]["ok"] and "NotImplementedError" in out[2]["error"]


def test_media_resize_roundtrip(spark):
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    df = spark.createDataFrame([(1, bytearray(encode_png(img)))],
                               "id long, media binary")
    out = multimodal.media_resize(df, 4).collect()[0]
    assert out["ok"]
    back = decode_png(bytes(out["media"]))
    assert back.shape == (4, 4, 3)


def test_wav_codec_round_trip():
    import numpy as np
    from effocr_spark.synth.wavcodec import decode_wav, encode_wav, is_wav

    rng = np.random.RandomState(9)
    mono = (rng.standard_normal(16000) * 8000).astype(np.int16)
    blob = encode_wav(mono, rate=16000)
    assert is_wav(blob)
    back, rate = decode_wav(blob)
    assert rate == 16000 and back.shape == (16000, 1)
    assert (back[:, 0] == mono).all()

    stereo = (rng.standard_normal((800, 2)) * 1000).astype(np.int16)
    back2, rate2 = decode_wav(encode_wav(stereo, rate=8000))
    assert rate2 == 8000 and (back2 == stereo).all()


def test_wav_codec_skips_extra_chunks_and_rejects_compressed():
    import struct

    import numpy as np
    import pytest
    from effocr_spark.synth.wavcodec import decode_wav, encode_wav

    blob = encode_wav(np.ones(100, np.int16), rate=8000)
    # splice a LIST chunk between WAVE and fmt (legal per spec)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = blob[:12] + extra + blob[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, rate = decode_wav(spliced)
    assert rate == 8000 and back.shape[0] == 100

    # format tag 3 (IEEE float) must raise the library-seam error
    mutated = bytearray(blob)
    mutated[20] = 3
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(mutated))


def test_audio_features_spark(spark):
    import numpy as np
    from effocr_spark.operators.multimodal import audio_features
    from effocr_spark.synth.wavcodec import encode_wav

    rows = []
    for i in range(6):
        rng = np.random.RandomState(100 + i)
        n = 4000 + 1000 * i
        samples = (rng.standard_normal(n) * (500 * (i + 1))).astype(np.int16)
        rows.append((i, bytearray(encode_wav(samples, rate=8000))))
    rows.append((99, bytearray(b"not audio at all")))
    df = spark.createDataFrame(rows, "id long, media binary")
    out = {r["id"]: r for r in audio_features(df).collect()}
    assert len(out) == 7
    bad = out[99]
    assert not bad["ok"] and bad["media_type"] == "application/octet-stream"
    for i in range(6):
        r = out[i]
        assert r["ok"] and r["media_type"] == "audio/wav"
        assert r["sample_rate"] == 8000 and r["n_channels"] == 1
        assert r["duration_s"] == (4000 + 1000 * i) / 8000
        assert len(r["frame_rms"]) == (4000 + 1000 * i) // 800
        assert r["rms"] > 0 and r["peak"] > 0
