"""spark-submit entry point for the extraction pipeline.

Cluster launch (the BASELINE.json deployment shape):

    zip -r effocr_spark.zip effocr_spark
    spark-submit \
        --py-files effocr_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.files.maxPartitionBytes=4m \
        --conf spark.executorEnv.OMP_NUM_THREADS=1 \
        scripts/run_extraction.py \
        --input  <pages parquet/iceberg path> \
        --output <run directory> \
        --run-id run1 --chunks 64

Local smoke (no cluster):

    python scripts/run_extraction.py --synthetic 5000 --output /tmp/run1

Resume after a crash: re-run the SAME command; completed chunks are
skipped via the lineage table (see effocr_spark/lineage.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (parquet)")
    ap.add_argument("--synthetic", type=int, default=None,
                    help="generate N synthetic pages instead of --input")
    ap.add_argument("--output", required=True, help="run output directory")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--chunks", type=int, default=8,
                    help="checkpoint chunk count (resume granularity)")
    ap.add_argument("--salt-partitions", type=int, default=None)
    ap.add_argument("--anchor-margin", type=float, default=None,
                    help="en casing-correction margin (reference --anchor_margin)")
    ap.add_argument("--spell-check", action="store_true", default=False)
    ap.add_argument("--embedded-images", action="store_true", default=False,
                    help="OCR data-URI PNGs inside HTML pages and fuse "
                         "their text onto the DOM output per url")
    ap.add_argument("--conf-thres", type=float, default=0.35)
    ap.add_argument("--iou-thres", type=float, default=0.01)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from effocr_spark.session import get_spark
    from effocr_spark import lineage, pipeline
    from effocr_spark.synth.pages import pages_df

    spark = get_spark("effocr-extract", cpus=args.cpus)
    if args.synthetic:
        pages, _ = pages_df(spark, args.synthetic, seed=42)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    protos_bc = pipeline.broadcast_prototypes(spark)
    salt = args.salt_partitions or spark.sparkContext.defaultParallelism * 2
    lineage.run_extraction(
        spark, pages, args.output, protos_bc,
        run_id=args.run_id, n_chunks=args.chunks,
        salt_partitions=salt,
        conf_thres=args.conf_thres, iou_thres=args.iou_thres,
        anchor_margin=args.anchor_margin, spell_check=args.spell_check,
        embedded_images=args.embedded_images,
    )
    res = lineage.read_results(spark, args.output)
    met = lineage.read_metrics(spark, args.output)
    n = res.count()
    print(f"extraction complete: {n} urls in {args.output}/results")
    met.orderBy("chunk_id").show(100, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
