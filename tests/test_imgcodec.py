import numpy as np
import pytest

from effocr_spark.synth.imgcodec import decode_png, encode_png, is_png, to_rgb


def test_roundtrip_gray():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(23, 41), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_roundtrip_rgb():
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, size=(17, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_encode_deterministic():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    assert encode_png(img) == encode_png(img.copy())


def test_is_png_sniff():
    img = np.zeros((4, 4), dtype=np.uint8)
    assert is_png(encode_png(img))
    assert not is_png(b"<html><body>hi</body></html>")
    assert not is_png(b"")


def test_to_rgb():
    g = np.array([[0, 255]], dtype=np.uint8)
    rgb = to_rgb(g)
    assert rgb.shape == (1, 2, 3)
    assert np.array_equal(rgb[:, :, 0], g)


def test_reject_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
