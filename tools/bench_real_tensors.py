"""Extraction throughput at REFERENCE tensor sizes (CROP_SIZE=224,
EMBED_DIM=768 — the timm-encoder geometry, datasets_utils.py:166-172 /
models/encoders.py). The default bench runs the 16x16/64-dim fixture
encoder; a real 224x224/768-dim model moves ~588x more tensor data per
crop, so this config is what makes the docs/s headline honest for a
real-ONNX drop-in. Invoked by bench.py as a subprocess (the sizes are
import-time constants, picked up from the env).

Prints ONE JSON line: {"pages": N, "cpus": W, "wall": s, "docs_per_sec": d}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("EFFOCR_CROP_SIZE", "224")
os.environ.setdefault("EFFOCR_EMBED_DIM", "768")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=1,
                    help="best-of passes (shared-host noise swings ~2x)")
    args = ap.parse_args()

    from effocr_spark import pipeline
    from effocr_spark.session import get_spark
    from effocr_spark.synth.pages import pages_df

    spark = get_spark(f"bench-real-{args.cpus}", cpus=args.cpus)
    pages, _ = pages_df(spark, args.pages, seed=42)
    src = "/tmp/effocr_bench_real_pages"
    pages.write.mode("overwrite").parquet(src)
    pages = spark.read.parquet(src)

    protos_bc = pipeline.broadcast_prototypes(spark)
    out = "/tmp/effocr_bench_real_out"
    # warmup (worker spinup + imports), excluded like the main bench
    pipeline.extract_pages(pages.limit(128), protos_bc, salt_partitions=None) \
        .write.mode("overwrite").parquet(out)

    wall = None
    for _ in range(max(args.repeats, 1)):
        t0 = time.time()
        pipeline.extract_pages(pages, protos_bc,
                               salt_partitions=max(args.cpus * 2, 8)) \
            .write.mode("overwrite").parquet(out)
        dt = time.time() - t0
        wall = dt if wall is None else min(wall, dt)
    n = spark.read.parquet(out).count()
    print(json.dumps({"pages": n, "cpus": args.cpus,
                      "wall": round(wall, 2),
                      "docs_per_sec": round(n / wall, 1)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
