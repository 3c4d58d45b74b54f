"""SparkSession factory tuned for this engine.

Local mode is the sandbox stand-in for a multi-executor cluster; every
setting here is also what we'd ship in ``spark-submit --conf`` form at
cluster scale (AQE on, Arrow on, shuffle partitions sized to cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "document_text_extraction_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; at cluster scale this is 2-3x total cores
        shuffle_partitions = int(master[6:-1]) if master.startswith("local[") \
            and master[6:-1].isdigit() else cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # the extraction map is CPU-bound per byte (~0.25 core-s/MB);
        # the 64MB SQL default would coalesce it into minute-long tasks
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.session.timeZone", "UTC")
        # HotSpot never JIT-compiles methods above 8000 bytecode bytes
        # (-XX:DontCompileHugeMethods, default on), so a whole-stage-
        # codegen method between 8000 and Spark's 65535 default limit
        # runs in the BYTECODE INTERPRETER for the stage's lifetime.
        # The wide-aggregate plans here (32 min(xxhash64) columns in
        # the MinHash signature, the simhash bit majorities) generate
        # exactly such methods: measured on the minhash query at sf1.0,
        # first-run 153 s / steady-state 129 s with the default vs
        # 7.6 s / 3.6 s with the limit at the HotSpot threshold, which
        # makes Spark fall back to its interpreted-expression path
        # (many small, JIT-able methods) for those stages only. Not a
        # local-mode tweak: every fresh executor JVM on a cluster pays
        # the same penalty.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
