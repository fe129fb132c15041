"""SparkSession factory tuned for the local[32] test/bench environment,
with settings that also make sense on a real cluster (AQE, Arrow, UTC)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mcpvectordb_spark", shuffle_partitions: int | None = None) -> SparkSession:
    # Python workers don't inherit the driver's sys.path edits — a caller who
    # imported us via sys.path.insert from another cwd gets
    # ModuleNotFoundError inside every pandas_udf.  Exporting the package's
    # parent dir on PYTHONPATH before the JVM (and its worker daemons) start
    # makes the library importable on workers regardless of caller setup.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Older testdata events.parquet stores TIMESTAMP(NANOS); Spark reads
        # it as bigint nanos with this flag (io.load_events normalizes either
        # nanos-bigint or NTZ-micros files to a session-UTC timestamp).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # UI off for bench/test runs (allocating the HTTP server costs
        # startup time and the port can collide across parallel sessions);
        # profiling sessions opt in via SPARK_GRAFT_UI=1 so
        # tools/profile_query.py can read per-stage task metrics from the
        # REST API (guide §1.1/§7.1).
        .config("spark.ui.enabled", "true" if os.environ.get("SPARK_GRAFT_UI") else "false")
        # \r-terminated stage-progress bars flooded the round-5 driver's
        # bench tail capture (BENCH_r05.json parsed:null) — silence them;
        # bench.py prints its one-line JSON summary LAST so any tail window
        # retains it.
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark
