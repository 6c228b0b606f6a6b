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

    # glibc munmaps large frees by default, so every numpy temp in a
    # UDF batch re-faults its pages — pathological on VMs where
    # first-touch faults are slow. Raising the thresholds keeps big
    # allocations on the heap (set BEFORE the JVM forks Python workers,
    # which inherit the env). Measured: the batched chunk encoder goes
    # 698us -> 20us/chunk steady-state with this set.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local mode: every executor thread shares the driver heap — the
        # 1g default throttles any parallelism above ~4 threads, while
        # very large heaps trigger page-fault storms on this VM
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # each JVM<->Python Arrow batch is a socket roundtrip; too-small
        # batches make UDF stages syscall-latency-bound, too-large ones
        # hurt pipelining + per-batch pandas memory
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
    )
    # GC: workload-dependent. The parallel (throughput) collector wins
    # on the long allocation-heavy batch build (4M-doc corpus, min of
    # reps: tokens stage local[4] 113.6s G1 -> 96.0s ParallelGC), but
    # its full-GC pauses are catastrophic for many-small-jobs query
    # workloads (sf0.1 headline suite, same host: 42.2s G1 vs 132.0s
    # ParallelGC — every query slower, worst 6x). Default is G1; the
    # scaling/batch-build harness opts into SPARK_GRAFT_GC=parallel.
    if os.environ.get("SPARK_GRAFT_GC", "g1") == "parallel":
        b = b.config(
            "spark.driver.extraJavaOptions", "-XX:+UseParallelGC"
        ).config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    # shuffle/spill dir: virtio-disk syscall latency dominates shuffle
    # cost in this sandbox; prefer tmpfs (a real cluster sets
    # spark.local.dir to fast local disks the same way)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # getOrCreate silently ignores builder configs when a session
    # already exists in the process — if the caller asked for the
    # parallel collector but the live JVM runs another GC, say so
    # (JVM flags cannot change post-launch; a fresh process is needed).
    if os.environ.get("SPARK_GRAFT_GC", "g1") == "parallel":
        live = spark.conf.get("spark.executor.extraJavaOptions", "") or ""
        if "-XX:+UseParallelGC" not in live:
            import warnings

            warnings.warn(
                "SPARK_GRAFT_GC=parallel requested but the existing "
                "SparkSession was launched without -XX:+UseParallelGC; "
                "the batch build will run under the first session's GC "
                "(start a fresh process to apply the flag)",
                RuntimeWarning,
                stacklevel=2,
            )
    ensure_shipped(spark)
    return spark
