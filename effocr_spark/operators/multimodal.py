"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as `binary` columns with a sniffed `media_type`;
decode / feature-extract / resize run as Arrow-batched mapInPandas
stages. PNG decode is REAL (effocr_spark.synth.imgcodec); other codecs
are clearly-marked deterministic stubs (the container has no image/audio
libraries) — the Spark-side plumbing (schemas, batching, quarantine
semantics, partitioning) is what this module pins down, and a real codec
drops in behind `_decode_any`.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.crops import resize_nn
from ..synth.imgcodec import decode_png, is_png, to_rgb

MEDIA_FEATURE_SCHEMA = (
    "id long, media_type string, width int, height int, "
    "mean_luma double, ok boolean, error string"
)


def sniff_media_type(col):
    """JVM-side magic-byte sniff (no Python)."""
    head = F.substring(col, 1, 8)
    return (
        F.when(head == F.lit(bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])),
               "image/png")
        .when(F.substring(col, 1, 3) == F.lit(b"\xff\xd8\xff"), "image/jpeg")
        .when(F.substring(col, 1, 4) == F.lit(b"RIFF"), "audio/wav")
        .otherwise("application/octet-stream")
    )


def _decode_any(data: bytes) -> np.ndarray:
    """Decode to an HxWx3 uint8 array. PNG is real; everything else is a
    stub awaiting a real codec."""
    if is_png(data):
        return to_rgb(decode_png(data))
    raise NotImplementedError(
        "non-PNG decode requires an image library not present in this "
        "environment; plug a real decoder in here")


def media_features(df: DataFrame, id_col: str = "id",
                   media_col: str = "media") -> DataFrame:
    """Decode + featurize media rows (quarantine failures, never crash)."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "media_type", "width", "height",
                                   "mean_luma", "ok", "error")}
            for i, b in zip(pdf[id_col], pdf[media_col]):
                data = bytes(b) if b is not None else b""
                mt = "image/png" if is_png(data) else "application/octet-stream"
                try:
                    img = _decode_any(data)
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["mean_luma"].append(float(img.mean()))
                    out["ok"].append(True)
                    out["error"].append(None)
                except Exception as e:
                    out["width"].append(0)
                    out["height"].append(0)
                    out["mean_luma"].append(0.0)
                    out["ok"].append(False)
                    out["error"].append(repr(e)[:200])
                out["id"].append(int(i))
                out["media_type"].append(mt)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("id"), F.col(media_col).alias("media")) \
             .mapInPandas(fe, MEDIA_FEATURE_SCHEMA)


def media_resize(df: DataFrame, size: int, id_col: str = "id",
                 media_col: str = "media") -> DataFrame:
    """Decode → deterministic nearest-neighbor resize → re-encode PNG."""
    from ..synth.imgcodec import encode_png

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, oks = [], [], []
            for i, b in zip(pdf[id_col], pdf[media_col]):
                try:
                    img = _decode_any(bytes(b))
                    blobs.append(encode_png(resize_nn(img, size)))
                    oks.append(True)
                except Exception:
                    blobs.append(None)
                    oks.append(False)
                ids.append(int(i))
            yield pd.DataFrame({"id": ids, "media": blobs, "ok": oks})

    return df.select(F.col(id_col).alias("id"), F.col(media_col).alias("media")) \
             .mapInPandas(rz, "id long, media binary, ok boolean")
