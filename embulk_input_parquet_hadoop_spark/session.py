"""SparkSession factory with scale-appropriate defaults.

Plays the role of the reference's config layer
(``ConfigurationFactory.java:59-84`` building a Hadoop ``Configuration``
from files + overrides, and the ``parquet_log_level`` knob at
``ParquetHadoopInputPlugin.java:241-267``) — expressed as Spark conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "columnar-encode",
              master: str | None = None,
              cores: int | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch_rows: int = 16384,
              extra_conf: dict | None = None) -> SparkSession:
    """Build a session.

    ``arrow_batch_rows`` bounds the Arrow batch fed to ``mapInArrow`` — it is
    our *chunk size* knob, the analogue of the reference's one-row-group-at-
    a-time memory bound (``ParquetRowReader.java:105-118``).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if repo_root not in py_path.split(os.pathsep):
        py_path = f"{repo_root}{os.pathsep}{py_path}" if py_path else repo_root
    b = (SparkSession.builder.appName(app_name).master(master)
         # pre-forking daemon: workers inherit numpy/pyarrow/codec kernels
         # already imported + warmed (see daemon.py)
         .config("spark.python.daemon.module",
                 "embulk_input_parquet_hadoop_spark.daemon")
         .config("spark.executorEnv.PYTHONPATH", py_path)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.default.parallelism", str(cores))
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                 str(arrow_batch_rows))
         .config("spark.sql.parquet.compression.codec", "zstd")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
         .config("spark.sql.files.maxPartitionBytes", "268435456")
         .config("spark.ui.enabled", "false"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
