"""SparkSession helpers: package shipping + tuned session factory.

``ensure_shipped(spark)`` zips this package and ``addPyFile``s it so
executor Python workers can unpickle UDF closures that reference the
package — the programmatic equivalent of ``spark-submit --py-files
search_engine_spark.zip`` for interactive/driver-embedded use.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_ATTR = "_search_engine_spark_shipped"


def ensure_shipped(spark) -> None:
    """Ship this package to executors once per SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            pkg_name, os.path.relpath(full, pkg_dir)
                        )
                        z.write(full, rel)
    sc.addPyFile(zpath)
    setattr(sc, _SHIPPED_ATTR, True)


def get_spark(
    app_name: str = "search_engine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
):
    """Create/get a SparkSession tuned for this engine.

    Defaults follow the scale guidance: AQE on (runtime re-plan + skew
    join handling), Arrow enabled for pandas UDF exchange, shuffle
    partition count sized to the parallelism level.
    """
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ensure_shipped(spark)
    return spark
