"""Pre-forking PySpark worker daemon with heavy imports already loaded.

PySpark forks one Python worker per concurrent task from a daemon process
(``pyspark/daemon.py``, selected via the documented
``spark.python.daemon.module`` conf). The stock daemon imports only pyspark,
so every fresh worker pays the numpy + pyarrow + codec-kernel import and
numpy cast-kernel warm-up on its first task (~1-2 s). At high parallelism
with few tasks per worker that fixed cost is the scaling-efficiency killer:
32 workers x 1 task each pays it 32 times on the critical path.

Importing the full encode/decode stack *here*, before the daemon starts
forking, lets every worker inherit the warm interpreter via copy-on-write
fork — worker start-up becomes milliseconds. ``session.get_spark`` points
``spark.python.daemon.module`` at this module and extends the executor
``PYTHONPATH`` so it is importable.

(The reference pays an analogous one-time cost per task JVM via its
classloader scope swap, ``PluginClassLoaderScope.java:28-47``; pre-forking
is the Python-side equivalent.)
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

# Importing the operators package runs the bitpack._warmup() cast-kernel
# initialization, so even numpy's lazily-created cast loops are inherited.
from embulk_input_parquet_hadoop_spark.operators import encode  # noqa: F401
from embulk_input_parquet_hadoop_spark.plans import pipeline  # noqa: F401
# (the encode import above also pulls in codecs.rans via intcodecs'
# codec registry, which builds/loads the optional C hot loop — forked
# workers inherit the bound library instead of compiling on first use)

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
