"""Benchmark harness (the analogue of the reference's
test_job_queries.sh timing protocol: per-query min-of-N latency +
geometric-mean aggregate, README.md:92-109).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with a noop sink (full pipeline runs, no
driver-side collect cost). Set BENCH_RUNS (default 2) for min-of-N;
BENCH_ABLATION=1 additionally times the flagship with the rewrite off.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time


HEADLINE = [
    "q_star_join_rpt",
    "q_snowflake_agg",
    "q_cyclic_join_graph",
    "q_multi_col_join",
    "q_in_subquery_mark",
    "q_join_2way_inner",
    "q_groupby_having",
    "q_topk",
    "q_dedup_exact",
    "q_ngram_jaccard",
    "q_cosine_topk",
    "q_events_sessionize",
]


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from duckdb_robust_predicate_transfer_spark.session import get_spark
    from duckdb_robust_predicate_transfer_spark.workload import QUERIES

    spark = get_spark(app_name="drpt-bench")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = math.inf
        for _ in range(runs):
            t0 = time.time()
            force(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]}s", file=sys.stderr, flush=True)

    extra = {}
    if os.environ.get("BENCH_ABLATION"):
        from duckdb_robust_predicate_transfer_spark.config import RPTConfig
        from duckdb_robust_predicate_transfer_spark.workload.queries import (
            q_star_join_rpt)
        best_off = math.inf
        for _ in range(runs):
            t0 = time.time()
            force(q_star_join_rpt(spark, sf_dir, config=RPTConfig(enabled=False)))
            best_off = min(best_off, time.time() - t0)
        extra["flagship_rpt_off_sec"] = round(best_off, 3)

    geomean = math.exp(sum(math.log(max(t, 1e-3)) for t in times.values())
                       / len(times))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "geomean_headline_query_sec",
        "value": round(geomean, 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf else sf_dir,
        "total_sec": round(sum(times.values()), 3),
        **extra,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
