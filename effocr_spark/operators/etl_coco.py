"""COCO-style ETL operators as Spark jobs.

Reference analogs: scripts/coco_combine.py:10-39 (union + id
reassignment), scripts/coco_split.py:9-42 (seeded train/val/test split),
scripts/coco_subset.py:8-14 (sample N), and the annotation↔image
equi-join of format_effocr_recognizer_dataset.py:311-336. Used for
fixture regeneration; written DataFrame-first (union/window/join) so the
same code runs at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dense_ids(df: DataFrame, out_col: str) -> DataFrame:
    """Globally-unique sequential ids ordered by (_src, id) WITHOUT a
    global no-partition Window (which funnels the whole union through
    one task): per-_src row_number + driver-side cumulative offsets from
    the tiny per-source counts. Identical ids to
    row_number().over(Window.orderBy('_src','id'))."""
    counts = {r["_src"]: r["n"] for r in
              df.groupBy("_src").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for src in sorted(counts):
        offsets[src] = acc
        acc += counts[src]
    off = F.lit(0)
    for src, o in offsets.items():
        off = F.when(F.col("_src") == src, F.lit(o)).otherwise(off)
    w = Window.partitionBy("_src").orderBy("id")
    return df.withColumn(out_col, F.row_number().over(w) + off)


def coco_combine(images_list: list[DataFrame],
                 annotations_list: list[DataFrame]):
    """Union several COCO datasets, reassigning globally-unique ids
    (coco_combine.py:10-39). Returns (images, annotations) with columns
    `new_image_id` / `new_anno_id` joined through the old ids."""
    tagged_imgs = []
    tagged_annos = []
    for src_id, (im, an) in enumerate(zip(images_list, annotations_list)):
        tagged_imgs.append(im.withColumn("_src", F.lit(src_id)))
        tagged_annos.append(an.withColumn("_src", F.lit(src_id)))
    images = tagged_imgs[0]
    for t in tagged_imgs[1:]:
        images = images.unionByName(t)
    annos = tagged_annos[0]
    for t in tagged_annos[1:]:
        annos = annos.unionByName(t)

    images = _dense_ids(images, "new_image_id")
    annos = _dense_ids(annos, "new_anno_id")
    key = images.select("_src", F.col("id").alias("image_id"),
                        "new_image_id")
    annos = annos.join(key, ["_src", "image_id"], "inner")
    return images.drop("_src"), annos.drop("_src")


def coco_split(images: DataFrame, annotations: DataFrame,
               fracs=(0.8, 0.1, 0.1), seed: int = 99):
    """Deterministic seeded split by image (coco_split.py:9-42): every
    annotation follows its image; splits are disjoint by construction."""
    assert abs(sum(fracs) - 1.0) < 1e-9
    # deterministic pseudo-random key: engine-stable (no rand())
    keyed = images.withColumn(
        "_r", F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(seed)),
                     F.lit(1_000_000)) / 1_000_000.0)
    train = keyed.filter(F.col("_r") < fracs[0]).drop("_r")
    val = keyed.filter((F.col("_r") >= fracs[0])
                       & (F.col("_r") < fracs[0] + fracs[1])).drop("_r")
    test = keyed.filter(F.col("_r") >= fracs[0] + fracs[1]).drop("_r")
    out = []
    for part in (train, val, test):
        ids = part.select(F.col("id").alias("image_id"))
        out.append((part, annotations.join(ids, "image_id", "inner")))
    return out


def coco_subset(images: DataFrame, annotations: DataFrame, n: int):
    """First-N-images subset (coco_subset.py:8-14: coco.images[:n])."""
    sub = images.orderBy("id").limit(n)
    ids = sub.select(F.col("id").alias("image_id"))
    return sub, annotations.join(ids, "image_id", "inner")


def envelope_join(chars: DataFrame, words: DataFrame,
                  iom_thresh: float = 0.8) -> DataFrame:
    """Enveloping-object interval join: char box ↔ word box on the same
    image with intersection-over-min-area ≥ threshold
    (format_effocr_recognizer_dataset.py:84-103, IoM math :44-81) —
    spelled as a JVM-side equi-join on image_id plus an IoM filter
    expression over [x, y, w, h] bbox arrays.

    Scale: the equi-join on image_id shuffles both sides once; the IoM
    predicate is whole-stage-codegen arithmetic, no UDF.
    """
    def xyxy(prefix):
        b = F.col(f"{prefix}.bbox")
        return (b[0].cast("double"), b[1].cast("double"),
                (b[0] + b[2]).cast("double"), (b[1] + b[3]).cast("double"))

    c = chars.alias("c")
    w = words.alias("w")
    cx0, cy0, cx1, cy1 = xyxy("c")
    wx0, wy0, wx1, wy1 = xyxy("w")
    inter_w = F.greatest(
        F.least(cx1, wx1) - F.greatest(cx0, wx0), F.lit(0.0))
    inter_h = F.greatest(
        F.least(cy1, wy1) - F.greatest(cy0, wy0), F.lit(0.0))
    inter = inter_w * inter_h
    area_c = (cx1 - cx0) * (cy1 - cy0)
    area_w = (wx1 - wx0) * (wy1 - wy0)
    iom = inter / (F.least(area_c, area_w) + F.lit(1e-7))
    return (
        c.join(w, F.col("c.image_id") == F.col("w.image_id"))
        .filter(iom >= iom_thresh)
        .select(F.col("c.id").alias("char_id"),
                F.col("w.id").alias("word_id"),
                F.col("c.image_id").alias("image_id"),
                iom.alias("iom"))
    )


def annotations_with_images(images: DataFrame,
                            annotations: DataFrame) -> DataFrame:
    """The annotation↔image equi-join the reference runs as a nested loop
    (format_effocr_recognizer_dataset.py:311-336); broadcast the image
    side when small."""
    im = images.select(F.col("id").alias("image_id"),
                       "file_name", "width", "height",
                       F.col("text").alias("image_text"))
    return annotations.join(F.broadcast(im), "image_id", "inner")
