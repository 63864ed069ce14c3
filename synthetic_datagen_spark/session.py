"""SparkSession factory.

Defaults are chosen for the local[32] test harness but express the same
knobs a 1000-executor cluster run would set: AQE on (runtime coalesce +
skew-join), Arrow for every pandas-UDF exchange, explicit shuffle
partitioning, and a broadcast threshold that catches all dimension tables
of the star schema (region/nation/supplier/part are KB-to-MB sized even
at sf1000; lineitem/orders must never broadcast).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def get_spark(
    app_name: str = "synthetic-datagen-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- planner ----------------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        # dims (region/nation/supplier/part/customer) broadcast; facts never
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # -- python exchange -------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # -- scan sizing: at 100 TB this bounds per-task input ----------
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # timestamps in testdata are ns-parquet with exact-us values;
        # Spark has no ns TimestampType — read ns as long, convert in the
        # catalog (sources/registry.py) to a us timestamp.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # reliable-checkpoint hygiene: the pair/CC memos re-anchor on
        # checkpoint() when a dir is configured; let ContextCleaner
        # reclaim those files once the memoized frame is dropped
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # VERDICT r9 task 7: exercise the reliable-checkpoint memo path in
    # every local bench/test run, not just its dedicated test — point
    # the checkpoint dir at scratch space when none is configured yet.
    # On a real cluster setCheckpointDir targets durable storage via
    # spark-submit / SPARK_GRAFT_CHECKPOINT_DIR instead.
    if spark.sparkContext.getCheckpointDir() is None:
        ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        if ckpt is None and master.startswith("local"):
            import tempfile

            ckpt = os.path.join(
                tempfile.gettempdir(), f"sdg-ckpt-{spark.sparkContext.applicationId}"
            )
            # ContextCleaner only reclaims checkpoint files for RDDs
            # GC'd during the app's lifetime — the final memoized
            # frames' files survive shutdown, so without this the
            # auto-created dirs accumulate in /tmp across bench/test
            # runs (r10 ADVICE). Only the AUTO-created per-app dir is
            # removed; an explicitly configured dir is the caller's.
            import atexit
            import shutil

            atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
        if ckpt:
            spark.sparkContext.setCheckpointDir(ckpt)
    return spark
