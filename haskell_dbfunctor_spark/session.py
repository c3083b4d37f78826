"""SparkSession factory.

One place to pin the configs that matter for correctness parity and for
scale: AQE (runtime re-plan + skew-join splitting), Arrow (vectorized
pandas UDF transfer), UTC session timezone (timestamp parity with the
DuckDB oracle), and a shuffle-partition count matched to the actual
parallelism instead of the 200 default.

In this sandbox Spark runs in local mode (one JVM, N executor threads);
on a real cluster the same code runs unchanged under spark-submit
--py-files — nothing here assumes local mode except the defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "haskell_dbfunctor_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` only affects the master URL when no session exists yet —
    local mode fixes parallelism at JVM start. bench.py therefore runs
    each parallelism level in its own subprocess.
    """
    cores = cores or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cores
    builder = (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
        )
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # snappy default; SPARK_GRAFT_PARQUET_CODEC overrides (lz4 /
        # uncompressed measured ~equal on this box's tmpfs — BENCH.md)
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "snappy"),
        )
        # saveAsTable targets (bucketed co-located joins) — keep the
        # warehouse out of the repo checkout
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/hdbf_warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # second-granularity timestamps parse leniently (reference
        # toRTimestamp is lenient, Core.hs:1182-1397)
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        # write timestamps as INT64 micros, NOT the legacy INT96:
        # INT96 columns carry no parquet min/max statistics, so every
        # ts-bounded read (the retention shape at 10^10 rows) loses
        # BOTH footer-level row-group skipping AND the manifest stats
        # catalog (analyze() finds no stats to collect). Measured here:
        # analyze(["ts"]) on INT96 files yields files_with_stats=0.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
