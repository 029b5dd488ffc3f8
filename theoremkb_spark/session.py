"""SparkSession factory tuned for the KG pipeline.

Local-mode testing runs on ``local[N]``; the same configs are what we would
ship in spark-defaults on a real cluster (AQE, skew join, Arrow). Shuffle
partitions default to the core count — at cluster scale the caller passes
an explicit value sized so post-shuffle partitions stay ~128-512 MB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "theoremkb_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # keep parallelismFirst effective on CPU-dense small-byte stages:
        # the default 1 MB minPartitionSize floor coalesces a ~3 MB
        # post-agg exchange to 2-3 partitions and serializes everything
        # downstream of it (band-join verify, jaccard, window) onto 2-3
        # cores. 64 KB keeps tiny stages at full width while still
        # folding genuinely empty partitions; at cluster scale the
        # advisory target (64 MB) governs big exchanges exactly as before.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep giant documents from blowing a single Arrow batch
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # split fat html-bearing parquet files across tasks (default 128 MB
        # would hand a whole small corpus to one scan task). 4 MB, not 32:
        # splits quantize to ROW GROUPS (a row group belongs to the split
        # containing its start offset), so a 42 MB file of ~1.4 MB groups
        # under 32 MB splits degenerates to a 13-vs-3-group task imbalance
        # — the event-log fingerprint was a 12 s max task on a 5 s mean in
        # the extraction stage, 40% of the local[4] wall. 4 MB splits carry
        # 2-4 groups each, bounding per-task spread at ~2x with per-file
        # task counts high enough to wash it out. A real cluster tunes
        # this per deployment (128-512 MB targets with matching row-group
        # sizing at write time); the corpus writers here emit ~1.4 MB
        # groups (100 html docs) to match.
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # fork python workers from a daemon that has pandas/pyarrow
        # preloaded — worker churn otherwise costs ~1.5 s of import per
        # fresh worker (see daemon_preload.py)
        .config("spark.python.daemon.module", "theoremkb_spark.daemon_preload")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def warm_python_workers(spark: SparkSession, cpus: int | None = None) -> None:
    """Force one Arrow-UDF task per core so every python worker pays its
    pandas/pyarrow import before any timed work. Long-lived executors on a
    real cluster amortize this once per executor; local-mode benchmarks
    must do the same or the 4N run bills 4x the import storm."""
    import pandas as pd  # noqa: F401 (imported here so the driver has it)

    cpus = cpus or spark.sparkContext.defaultParallelism

    def _touch(batches):
        for b in batches:
            yield b

    spark.range(0, cpus, 1, cpus).mapInPandas(_touch, "id long").count()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
