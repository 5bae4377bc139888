"""Minimal repro: runtimeFilter.semiJoinReduction hangs Spark 4.x local mode.

Context (VERDICT r2 "Next round" #8 / session.py): Spark's
``spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled`` is the
built-in analogue of our exact-key transfer tier — it rewrites a join to
pre-filter the big side with a semi join on the small side's keys. On a
cluster it could serve as the missing BF-into-scan pushdown path. But
with it enabled, ANY parquet-backed join action deadlocks in local mode
on Spark 4.1.2 (observed: driver blocks forever planning the adaptive
stage; no task ever launches).

This script is the self-contained evidence: it runs the same tiny join
twice in subprocesses — conf off (completes in seconds) and conf on
(killed by watchdog after ``HANG_SECS``) — and emits one JSON line. An
upstream report needs exactly this: version, master, conf, minimal
query, and the divergent outcomes.

Usage:  python -u tools/repro_semijoin_hang.py
Exit 0 always (the repro *documents*; it does not gate CI).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

HANG_SECS = int(os.environ.get("DRPT_REPRO_HANG_SECS", "60"))

_CHILD = r"""
import sys, time
from pyspark.sql import SparkSession, functions as F

conf_on = sys.argv[1] == "on"
data_dir = sys.argv[2]
b = (SparkSession.builder.master("local[4]")
     .appName("semijoin-repro")
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.ui.enabled", "false")
     .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true"))
if conf_on:
    b = b.config(
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
        "true")
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
big = spark.read.parquet(data_dir + "/big.parquet")
small = spark.read.parquet(data_dir + "/small.parquet").filter("k % 10 = 0")
t0 = time.time()
n = big.join(small, "k").count()
print(f"JOIN_OK rows={n} sec={time.time() - t0:.2f}", flush=True)
spark.stop()
"""


def main() -> int:
    import pyspark

    with tempfile.TemporaryDirectory(prefix="drpt_repro_") as d:
        # tiny fixture written by a plain session (no suspect conf)
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.master("local[4]")
                 .appName("repro-gen")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1_000_000).selectExpr("id % 1000 AS k", "id AS v") \
            .write.mode("overwrite").parquet(d + "/big.parquet")
        spark.range(1000).selectExpr("id AS k") \
            .write.mode("overwrite").parquet(d + "/small.parquet")
        spark.stop()

        child = os.path.join(d, "child.py")
        with open(child, "w") as f:
            f.write(_CHILD)

        results = {}
        for mode in ("off", "on"):
            t0 = time.time()
            try:
                p = subprocess.run(
                    [sys.executable, "-u", child, mode, d],
                    capture_output=True, text=True, timeout=HANG_SECS)
                out = (p.stdout or "").strip().splitlines()
                results[mode] = {
                    "completed": any("JOIN_OK" in l for l in out),
                    "sec": round(time.time() - t0, 1),
                    "detail": next((l for l in out if "JOIN_OK" in l), ""),
                }
            except subprocess.TimeoutExpired:
                results[mode] = {"completed": False,
                                 "sec": round(time.time() - t0, 1),
                                 "detail": f"KILLED after {HANG_SECS}s"}

    out = {
        "repro": "runtimeFilter.semiJoinReduction local-mode hang",
        "spark_version": pyspark.__version__,
        "master": "local[4]",
        "conf": "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
        "off": results["off"],
        "on": results["on"],
        "reproduced": bool(results["off"]["completed"]
                           and not results["on"]["completed"]),
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
