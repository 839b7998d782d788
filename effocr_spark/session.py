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
    # Pin per-worker BLAS/OMP threads to 1: tasks ARE the parallelism.
    # The reference does the same with ONNX intra_op_num_threads
    # (localizer_engine.py:18-20) — cores = tasks x intra_op must not
    # oversubscribe (SURVEY.md §4).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    # Make effocr_spark importable in executor Python workers regardless
    # of the launch cwd: local-mode workers inherit this process env, so
    # prepending the package root to PYTHONPATH is the local analog of
    # `spark-submit --py-files effocr_spark.zip` (the documented cluster
    # launch, scripts/run_extraction.py). Without it, running the CLI
    # from outside the repo root dies with ModuleNotFoundError in the
    # first UDF task.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + pypath if pypath else ""))
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
        # UDF-compute-bound scans (strip_html / OCR over page bytes) need
        # far finer input splits than the IO-oriented 128MB default: a
        # 128MB split of ~3KB pages is ~45k rows of Python work pinned to
        # ONE task. 4MB keeps every core fed without any shuffle.
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
