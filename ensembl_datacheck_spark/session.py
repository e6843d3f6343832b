"""SparkSession construction tuned for the validation workload.

Local-mode testing (`local[N]`) with settings that translate to a real
multi-executor cluster: AQE on (runtime shuffle coalescing + skew-join
splitting), Arrow enabled for the vectorized pandas-UDF tier, shuffle
partitions sized to the parallelism level rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ensembl-datacheck-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "24g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``.  In local mode
    the driver JVM is the only process, so ``spark.driver.memory`` is the
    memory knob.  On a real cluster the same code is submitted via
    ``spark-submit --py-files`` (north_rule packaging): the submit owns
    master / deploy-mode / executor sizing, detected here via
    ``PYSPARK_GATEWAY_PORT`` (the gateway JVM spark-submit launched before
    this interpreter).  In that case master and driver-memory are never
    overridden — the JVM already exists, so static confs are immutable —
    and shuffle partitions are only touched when the submit didn't set
    them (``--conf`` wins), defaulting to the larger of Spark's 200 and
    the cluster's real ``sc.defaultParallelism`` (a runtime conf,
    settable post-launch) instead of the driver host's CPU count.
    """
    # spark-submit launches the gateway JVM before the Python driver runs;
    # its presence means resource config belongs to the submit, not us.
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n_threads = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n_threads = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # smaller splits -> enough map tasks to feed every core even on
        # medium inputs; AQE coalesces the reduce side back down
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    )
    if not submitted:
        builder = (
            builder.master(master)
            .config("spark.driver.memory", driver_memory)
            .config("spark.ui.enabled", "false")
        )
        if shuffle_partitions is None:
            shuffle_partitions = max(8, n_threads)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if (submitted and shuffle_partitions is None
            and not spark.sparkContext.getConf().contains(
                "spark.sql.shuffle.partitions")):
        # the operator didn't set it via --conf: scale Spark's 200
        # default UP to the cluster's parallelism, never below it —
        # under dynamic allocation defaultParallelism sampled at startup
        # (before executors register) can be tiny, and AQE only
        # coalesces DOWN from this number
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(200, spark.sparkContext.defaultParallelism)))
    spark.sparkContext.setLogLevel("WARN")
    return spark
