"""The shape-grouped batched transform must be BIT-identical to the
per-crop paired_transform the oracle uses."""

import numpy as np

from effocr_spark.functions.crops import paired_transform
from effocr_spark.functions.recognize import ZERO_CROP, _transform_batched


def test_batched_equals_per_crop_bitwise():
    rng = np.random.RandomState(3)
    crops = []
    for _ in range(40):
        h = rng.randint(5, 25)
        w = rng.randint(2, 30)
        crops.append(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
    crops.insert(7, None)
    crops.append(None)
    batched = _transform_batched(crops)
    for i, c in enumerate(crops):
        exp = ZERO_CROP if c is None else paired_transform(c)
        assert np.array_equal(batched[i], exp), i


def test_greedy_nms_paths_agree():
    from effocr_spark.functions import boxes as B
    rng = np.random.RandomState(9)
    n = 300
    cx, cy = rng.uniform(0, 500, n), rng.uniform(0, 500, n)
    w, h = rng.uniform(2, 60, n), rng.uniform(2, 60, n)
    obj = rng.uniform(0.4, 1, n)
    pred = np.stack([cx, cy, w, h, obj, obj * 0 + 0.9, obj * 0 + 0.1],
                    axis=1).astype(np.float32)
    fast = B.non_max_suppression(pred, iou_thres=0.3)
    cap = B._NMS_MATRIX_CAP
    try:
        B._NMS_MATRIX_CAP = 0  # force the row-at-a-time fallback
        slow = B.non_max_suppression(pred, iou_thres=0.3)
    finally:
        B._NMS_MATRIX_CAP = cap
    assert np.array_equal(fast, slow)


def test_fused_features_equal_transform_then_encode_bitwise():
    """The fused feature kernel (_features_batched: normalize+chanmean on
    the small crop, THEN upsample, then pool) must be bitwise-identical
    to encode_features(_transform_batched(crops)) — the reordering is
    pure per-pixel maps + selections. Covers upsample (small crops),
    downsample (crop side > CROP_SIZE), and None slots."""
    from effocr_spark.functions.recognize import _features_batched
    from effocr_spark.synth import model as synthmodel

    rng = np.random.RandomState(11)
    crops = []
    for _ in range(30):
        h = rng.randint(4, 28)
        w = rng.randint(2, 34)
        crops.append(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
    # downsample cases: sides larger than any CROP_SIZE config
    crops.append(rng.randint(0, 256, size=(300, 41, 3), dtype=np.uint8))
    crops.append(rng.randint(0, 256, size=(17, 260, 3), dtype=np.uint8))
    crops.insert(3, None)
    crops.append(None)

    fused = _features_batched(crops)
    ref = synthmodel.encode_features(_transform_batched(crops))
    assert fused.dtype == ref.dtype and fused.shape == ref.shape
    assert np.array_equal(fused, ref)


def test_fused_embeddings_equal_standard_path_bitwise():
    """embed_crops (fused) == L2norm(encode_crops(_transform_batched))."""
    from effocr_spark.functions.recognize import embed_crops
    from effocr_spark.synth import model as synthmodel

    rng = np.random.RandomState(12)
    crops = [rng.randint(0, 256, size=(rng.randint(5, 20),
                                       rng.randint(3, 25), 3),
                         dtype=np.uint8) for _ in range(25)]
    crops.insert(5, None)
    emb = embed_crops(crops)
    ref = synthmodel.encode_crops(_transform_batched(crops))
    norms = np.linalg.norm(ref, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    assert np.array_equal(emb, (ref / norms).astype(np.float32))
