"""SparkSession construction and per-session configuration.

Two entry points:

- ``get_spark()`` — build a local session with the engine's preferred
  configs (tests, bench).
- ``configure(spark)`` — apply the *runtime-settable* subset to a
  session we did not create (the correctness driver hands us one).
  Required because the fixture ``events.parquet`` stores
  TIMESTAMP(NANOS), which Spark only reads with
  ``spark.sql.legacy.parquet.nanosAsLong``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Settable at runtime (SQL confs) — safe to apply to a foreign session.
RUNTIME_CONFS: dict[str, str] = {
    # fixture events.parquet is TIMESTAMP(NANOS); read as long, the
    # catalog converts to timestamp_ntz (see catalog.load).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic wall-clock semantics identical to the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # runtime re-planning: coalesce shuffle partitions, skew-join split,
    # runtime broadcast-join switch — core of the 100 TB story.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # arrow for any pandas-UDF path
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # write instants as annotated INT64 micros, not legacy INT96:
    # INT96 carries NO parquet min/max statistics (so neither
    # footer-based commit stats nor any reader's row-group pruning
    # can see timestamp bounds), and the table-format specs (Iceberg)
    # require the annotated type anyway.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # non-settable on this build — keep going; readers have
            # fallbacks (catalog handles both long and timestamp ts).
            pass
    try:
        if spark.conf.get("spark.master", "").startswith("local"):
            # local mode reads single-file fixtures: split scans at
            # row-group granularity so joins/aggs use all cores. On a
            # real cluster the 128 MB default is correct — many input
            # files already provide the parallelism.
            spark.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
            spark.conf.set("spark.sql.files.openCostInBytes", "262144")
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "dataflowex-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Local-mode defaults are sized from ``SPARK_GRAFT_CPUS`` (driver
    contract); on a real cluster, master/partitions come from
    spark-submit and these are left alone.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    if master is None:
        master = f"local[{cpus}]" if cpus > 0 else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32) if cpus else 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # generous arrow batches for pandas-UDF operators
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # localCheckpoint blocks are reclaimed by the ContextCleaner
        # only after a JVM GC notices the dropped references; the
        # default 30min periodic GC lets hundreds of MB of dead
        # checkpoint blocks pile up across a many-query session
        # (measured: ~58 MB per PPJoin run, System.gc() frees them).
        # 2 minutes keeps long sessions flat for one ~100 ms pause.
        .config("spark.cleaner.periodicGC.interval", "2min")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    configure(spark)
    if os.environ.get("SPARK_GRAFT_PREWARM", "") == "1":
        # pay the one-per-core Python worker spawn (~5-10 s/session)
        # up front so the FIRST pandas-UDF query in a sweep/selfcheck
        # session measures its computation, not process forking (the
        # same warmup bench.py does; spark.python.worker.reuse is on
        # by default, so the daemon pool persists for the session).
        # Opt-in: a session that never runs a Python-eval path should
        # not pay it.
        n = spark.sparkContext.defaultParallelism

        def _touch(it):
            for pdf in it:
                yield pdf

        spark.range(n * 4, numPartitions=n).mapInPandas(
            _touch, "id long"
        ).count()
    return spark
