"""SparkSession factory.

One place to set the configs that matter for this engine:

* AQE on (runtime re-plan, skew-join splitting, small-partition coalescing)
  — the DataFrame analogue of the reference's degree-adaptive kernel
  routing (/root/reference/kernel_bblock.cu:622-692).
* Arrow on — all Python-side work is vectorized pandas UDFs.
* UTC session timezone — parity with DuckDB oracles.
* shuffle partitions sized to cores, not the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pagerank_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Create (or get) a local SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (itself defaulting to 32).
    In local mode there is one JVM; on a real cluster the same configs
    apply, with ``master``/memory supplied by spark-submit instead.
    ``master`` overrides the ``local[cpus]`` default (e.g.
    ``local-cluster[2,8,16384]`` for the multi-JVM scaling evidence —
    separate executor JVMs with a real network shuffle between them).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~2x cores: enough tasks to keep all threads busy through stragglers
        # without drowning tiny inputs in scheduling overhead. AQE coalesces
        # down when partitions come out small.
        shuffle_partitions = max(cpus * 2, 8)

    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
