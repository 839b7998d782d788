"""SparkSession factory with scale-appropriate defaults.

Settings chosen for the 100 TB design point (see SURVEY.md §4):
 - AQE on (runtime re-plan, skew-join splitting, partition coalescing)
 - Arrow on, bounded record batches (the Arrow batch replaces the
   reference's fixed 64-crop batching, infer_effocr_onnx_multi.py:143-158)
 - shuffle partitions sized to cores locally; on a real cluster this is
   set to ~2-3x total executor cores via spark-submit conf
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Cap Arrow batch size: one page can explode into hundreds of 224x224
# crops inside the OCR UDF; bounding rows-per-batch bounds UDF peak memory
# (SURVEY.md §7.4 "Memory in UDFs").
ARROW_MAX_RECORDS = 256


def get_spark(app_name: str = "effocr_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_MAX_RECORDS))
        # broadcast threshold: prototype/dim tables are tiny; 64MB headroom
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
