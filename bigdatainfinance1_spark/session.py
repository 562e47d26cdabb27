"""SparkSession factory tuned for this engine.

Local-mode testing runs on local[N]; the configs below are the ones that also
matter on a real cluster (AQE, Arrow, UTC, broadcast threshold). At 100 TB the
same code runs unchanged — only `spark.sql.shuffle.partitions` and cluster
sizing change, which is why they are parameters here rather than constants.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bigdatainfinance1_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's standard config.

    - AQE on (runtime coalesce / skew-join split / join re-plan).
    - Arrow on (vectorized Python interchange for the few Pandas-UDF ops).
    - UTC session timezone (parquet timestamps are naive; the DuckDB oracle
      compares them as UTC — SURVEY.md §5 dialect hazards).
    - shuffle partitions sized to cores locally; on a cluster set this to
      ~2-3× total executor cores per the usual guidance.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.ts is parquet TIMESTAMP(NANOS); Spark 4 only reads it as long
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Pin the runtime confs every query depends on, on a session we did not
    build (the driver passes its own session to ``queries()`` callables).

    Only runtime-settable confs go here; they are idempotent and cheap.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # events.ts is parquet TIMESTAMP(NANOS); Spark 4 only reads it as long.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
