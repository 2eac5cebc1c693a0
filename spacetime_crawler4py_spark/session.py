"""SparkSession factory with scale-minded defaults.

Defaults are tuned so the same code runs on local[N] for tests and on
a multi-executor cluster: AQE on (runtime coalescing + skew-join
split), Arrow on (every Python crossing is a vectorized batch), and a
shuffle-partition count sized to the parallelism at hand rather than
the 200 default.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spacetime-crawler4py-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    32).  ``shuffle_partitions`` defaults to the local core count —
    on a real cluster set it to ~2-3x total executor cores.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N shuffle partitions; AQE coalesces small ones.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("*", "") else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # 128 MB input splits: right-sized for wide binary html rows.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    # Python workers don't inherit the driver's sys.path — without
    # this, any pandas UDF defined in this package raises
    # ModuleNotFoundError on the executors when the driver runs
    # outside the repo root.  PYTHONPATH covers local[N] forked
    # workers; addPyFile covers real clusters (spark-submit
    # --py-files equivalent, per north_rule).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    spark = builder.getOrCreate()

    if not spark.conf.get("spark.master", "").startswith("local"):
        zip_path = os.path.join(
            tempfile.gettempdir(), "spacetime_crawler4py_spark.zip"
        )
        if not os.path.exists(zip_path):
            shutil.make_archive(zip_path[:-4], "zip", pkg_root,
                                "spacetime_crawler4py_spark")
        spark.sparkContext.addPyFile(zip_path)
    return spark
