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

    w = Window.orderBy("_src", "id")
    images = images.withColumn("new_image_id", F.row_number().over(w))
    annos = annos.withColumn("new_anno_id", F.row_number().over(Window.orderBy("_src", "id")))
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


def annotations_with_images(images: DataFrame,
                            annotations: DataFrame) -> DataFrame:
    """The annotation↔image equi-join the reference runs as a nested loop
    (format_effocr_recognizer_dataset.py:311-336); broadcast the image
    side when small."""
    im = images.select(F.col("id").alias("image_id"),
                       "file_name", "width", "height",
                       F.col("text").alias("image_text"))
    return annotations.join(F.broadcast(im), "image_id", "inner")
