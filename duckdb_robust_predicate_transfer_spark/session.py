"""SparkSession factory tuned for this engine.

Settings chosen for correctness against a DuckDB oracle (UTC session
timezone, ANSI off to match permissive semantics) and for scale
(AQE on with skew-join handling; shuffle partitions sized by env).
On a real cluster only master/shuffle-partitions change — everything
else is scale-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "drpt-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("DRPT_SHUFFLE_PARTITIONS", cpus))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # one-hop native runtime bloom filters as belt-and-braces under our
        # multi-hop schedule (SURVEY.md section 7)
        # NOTE: do NOT enable runtimeFilter.semiJoinReduction — it hangs
        # local-mode jobs on Spark 4.1.2 (observed: any parquet action
        # deadlocks with that flag set)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # nanosecond parquet timestamps (events table) read as TIMESTAMP_NTZ
        .config("spark.sql.legacy.parquet.nanosAsLong", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # write INT64 micros (the modern representation), not INT96 —
        # deterministic roundtrips through our own footer probing
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.ansi.enabled", "false")
        # per-call origin capture for DataFrame error context costs THREE
        # py4j round-trips per wrapped DataFrame API call (conf.get +
        # PySparkCurrentOrigin.set/.clear) plus a Python stack walk — a
        # wide query makes hundreds of such calls while being built, and
        # the cost is per API call, not per row, so it never amortizes at
        # any scale. Measured: q_star_join_rpt construction 0.119->0.055 s
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Arrow speeds toPandas/createDataFrame but the DRIVER'S harness
        # session leaves it off, so DRPT_ARROW=0 gives a driver-parity
        # session for the local gate (r4 regression: code green under
        # Arrow failed at the driver on the non-Arrow verifier path)
        .config("spark.sql.execution.arrow.pyspark.enabled",
                "false" if os.environ.get("DRPT_ARROW") == "0" else "true")
        .config("spark.driver.memory", os.environ.get("DRPT_DRIVER_MEM", "8g"))
        # spill-aware (SURVEY §7): shuffle/spill files compress ~2x
        # smaller under zstd than the lz4 default — opt-in for
        # disk-bounded certification runs (x1000's Q21 triple-lineitem
        # self-join spills ~46 GB with lz4 against a ~49 GB-free /tmp,
        # the round-7 ENOSPC). Default stays lz4, Spark's own default.
        .config("spark.io.compression.codec",
                os.environ.get("DRPT_IO_CODEC", "lz4"))
        .config("spark.ui.enabled", "false")
        # artifact hygiene (VERDICT r5 #2): stage-progress bars written
        # to stdout interleave with, and corrupt, captured JSON lines
        # from the tools/ harnesses — keep stdout machine-readable
        .config("spark.ui.showConsoleProgress", "false")
        # saved (bucketed) tables land outside the repo; static conf, so
        # it must be set at session build
        .config("spark.sql.warehouse.dir",
                os.environ.get("DRPT_WAREHOUSE_DIR", "/tmp/drpt-warehouse"))
        # shuffle/block-manager scratch pinned to a dedicated dir that
        # no fixture-reclaim script touches: BENCH_r08 was invalidated
        # by blockmgr-*/shuffle_*.index vanishing mid-run when a chain
        # step's rm -rf swept the default /tmp scratch (VERDICT r8 #2)
        .config("spark.local.dir",
                os.environ.get("DRPT_LOCAL_DIR", "/tmp/drpt-spark-local"))
    )
    return b.getOrCreate()
