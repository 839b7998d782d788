"""Memory-bandwidth roofline for the OCR transform+encode kernel at
REFERENCE tensor sizes (224/768).

Answers the one question the scaling table can't: when the per-core
docs/s stops growing with width, is the kernel at the host's memory-
bandwidth ceiling (expected on a shared bus — each machine of a real
cluster brings its own) or is it leaving cycles on the table?

Method, per width W in (1, 8, 32):
 - memcpy ceiling: W processes each np.copyto() over 64 MiB buffers
   (cache-defeating); aggregate GB/s = the practical bandwidth ceiling
   this host grants W streams.
 - kernel: W processes each loop `embed_crops` on a representative
   39-crop line batch; aggregate crops/s.
 - kernel GB/s = crops/s x bytes-moved/crop, where bytes/crop counts the
   fused kernel's big-tensor traffic exactly: the two-stage nearest-
   neighbor repeat writes side*S*4 + S*S*4 bytes and the 16x16 pool
   reads S*S*4 back (S = CROP_SIZE; the pre-chanmean small-crop passes
   are O(side^2) noise at side~18).

Prints ONE JSON line:
  {"<W>": {"memcpy_gbps": g, "crops_per_s": c, "kernel_gbps": k,
           "pct_of_ceiling": p}, ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("EFFOCR_CROP_SIZE", "224")
os.environ.setdefault("EFFOCR_EMBED_DIM", "768")
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

_COPY_N = 16 * 1024 * 1024  # 64 MiB float32 per buffer


def _memcpy_task(seconds: float) -> float:
    """→ bytes/s of np.copyto (read src + write dst) sustained for
    ~`seconds`."""
    src = np.ones(_COPY_N, np.float32)
    dst = np.empty(_COPY_N, np.float32)
    np.copyto(dst, src)  # warm / fault pages
    reps = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        np.copyto(dst, src)
        reps += 1
    dt = time.time() - t0
    return reps * 2 * _COPY_N * 4 / dt


def _make_batch():
    """A representative per-page crop batch (same construction as the
    pipeline: render line -> head -> NMS -> extract)."""
    from effocr_spark.functions import boxes as bf, crops as cf
    from effocr_spark.synth import model as sm
    from effocr_spark.synth.font import render_line

    img, _, _ = render_line(
        "The quick brown fox jumps over the lazy dog 1885")
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    det = bf.non_max_suppression(sm.synthetic_yolo_head(rgb))
    det = det[det[:, 5] == sm.CLS_CHAR]
    return [c for c in cf.extract_crops(rgb, det[:, :4]) if c is not None]


def _bytes_per_crop(crops) -> int:
    from effocr_spark.functions import crops as cf
    s = cf.CROP_SIZE
    total = 0
    for c in crops:
        side = max(c.shape[:2])
        if side < s:
            # repeat axis=1 writes side*S, repeat axis=2 reads that and
            # writes S*S; pool reads S*S back — all float32
            total += (side * s + 2 * s * s + side * s) * 4
        else:
            total += 2 * s * s * 4
    return total // len(crops)


def _embed_task(seconds: float) -> float:
    """→ crops/s of embed_crops sustained for ~`seconds`."""
    from effocr_spark.functions.recognize import embed_crops
    crops = _make_batch()
    embed_crops(crops)  # warm
    reps = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        embed_crops(crops)
        reps += 1
    dt = time.time() - t0
    return reps * len(crops) / dt


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--seconds", type=float, default=2.0)
    args = ap.parse_args()

    bpc = _bytes_per_crop(_make_batch())
    out = {"bytes_per_crop": bpc}
    for w in args.widths:
        with mp.Pool(w) as pool:
            pool.map(_memcpy_task, [0.3] * w)  # warm the pool
            mem = sum(pool.map(_memcpy_task, [args.seconds] * w))
            crops_s = sum(pool.map(_embed_task, [args.seconds] * w))
        kernel_gbps = crops_s * bpc / 1e9
        out[str(w)] = {
            "memcpy_gbps": round(mem / 1e9, 2),
            "crops_per_s": round(crops_s, 1),
            "kernel_gbps": round(kernel_gbps, 2),
            "pct_of_ceiling": round(100 * kernel_gbps * 1e9 / mem, 1),
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
