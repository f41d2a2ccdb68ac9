"""SparkSession factory tuned for the engine.

Defaults follow the scale posture of the project: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow on (all our Python-side
operators are vectorized pandas UDFs, never per-row Python), UTC session
timezone (oracle comparison against DuckDB's UTC-naive timestamps).

``shuffle_partitions`` defaults to the local core count: on a real cluster
this knob is set to ~2-3x total executor cores; the engine never assumes a
fixed value (AQE coalescing absorbs overshoot).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyetl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores). In cluster deployments the master comes from spark-submit and
    this builder only layers SQL confs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    # Python workers do NOT inherit the driver's sys.path — only PYTHONPATH
    # (and, on a cluster, --py-files). A driver that imported this package
    # via sys.path manipulation (embedding harnesses do) would otherwise
    # get ModuleNotFoundError from any worker-side `import pyetl_spark`
    # (mapInPandas closures import the codec/text modules there). Pin the
    # package root into PYTHONPATH before the JVM forks its first worker.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = os.cpu_count() if inner == "*" else int(inner)
        else:  # cluster: let spark-submit / AQE govern
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # broadcast threshold: rule/mapping tables are small dims — keep default 10m
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def iceberg_available(spark: SparkSession) -> bool:
    """Probe whether Iceberg runtime jars are on the classpath.

    The engine prefers Iceberg tables (atomic snapshot commits, schema
    evolution, partition-pruned MERGE); when absent it falls back to
    :class:`pyetl_spark.cdc.tableio.SnapshotTable`, which implements the same
    contract (manifest-listed immutable parquet files, atomic pointer swap,
    bucket-pruned copy-on-write MERGE, committed-batch ledger).
    """
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False
