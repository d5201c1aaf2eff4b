"""SparkSession factory with scale-oriented defaults.

The engine is designed for a multi-executor cluster reading ~100 TB;
locally we run ``local[N]``. The configs below are the ones that matter
at both scales: AQE for runtime re-planning (skew joins, partition
coalescing), Arrow for the few pandas-UDF kernels, and a UTC session
timezone so timestamp semantics are stable across engines (the
reference works in naive local time; we keep naive timestamps + an
explicit UTC-offset column, see SURVEY.md §7.4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "melodist_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local: ~1 partition per core; on a real cluster leave this to
        # AQE (coalescePartitions) with a higher initial value.
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # parameter tables are tiny; make sure Spark is willing to
        # broadcast anything below 64 MB
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # long sessions compile hundreds of whole-stage-codegen classes;
        # the JVM's default 240 MB JIT code cache fills after a few dozen
        # expression-heavy queries and HotSpot silently stops compiling —
        # measured 4-10x slowdowns on lambda-heavy projections late in a
        # bench session. 1 GiB is reserved (not committed) address space.
        # local mode: driver == executor, one flag suffices.
        .config("spark.driver.extraJavaOptions", _JVM_OPTS)
        # Catalyst's generated-class cache holds only 100 entries by
        # default; a session running this engine's full registry (52
        # expression-heavy queries × ~10-20 codegen units each) evicts
        # constantly and re-pays Janino compilation on every re-plan.
        # Raising the entry cap cut warm met-query walls ~25% measured
        # (the cache stores compiled classes — thousands of entries is
        # a few hundred MB of metaspace, which ReservedCodeCacheSize
        # above already budgets for).
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        if k == "spark.driver.extraJavaOptions":
            # compose with (not clobber) our JIT-cache flag; the caller's
            # opts come last so they win on any duplicated -XX flag
            v = f"{_JVM_OPTS} {v}"
        builder = builder.config(k, v)
    return builder.getOrCreate()


_JVM_OPTS = "-XX:ReservedCodeCacheSize=1g"
