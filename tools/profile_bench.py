"""Per-query cost breakdown for the bench headline set (guide §1).

For every headline query: time the CONSTRUCTION (Python planning +
the engine's eager transfer jobs) separately from the EXECUTION (noop
sink), independent min-of-N each, and dump `.explain("formatted")` to
plans/<round>/<name>_<tag>.txt. Prints one JSON line per query plus a
summary, so before/after diffs are mechanical.

Usage:
  python -u tools/profile_bench.py [--tag before] [--runs 3]
      [--plans-dir r11] [q_name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default="r10",
                    help="subdirectory of plans/ for the explain dumps")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from duckdb_robust_predicate_transfer_spark.session import get_spark
    from duckdb_robust_predicate_transfer_spark.workload import QUERIES

    spark = get_spark(app_name="drpt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.plans_dir)
    os.makedirs(plans_dir, exist_ok=True)

    names = args.names or HEADLINE
    # warmup: session/codegen spin-up not attributed to the first query
    try:
        QUERIES[names[0]](spark, args.sf_dir).write.format("noop") \
            .mode("overwrite").save()
    except Exception as exc:  # noqa: BLE001
        print(f"# warmup ERROR {exc}", file=sys.stderr)

    results = {}
    for name in names:
        fn = QUERIES[name]
        best_c = best_e = float("inf")
        df = None
        try:
            for _ in range(args.runs):
                sc.setJobDescription(f"{name}: construct")
                t0 = time.time()
                df = fn(spark, args.sf_dir)
                dt_c = time.time() - t0
                sc.setJobDescription(f"{name}: execute")
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt_e = time.time() - t0
                sc.setJobDescription(None)
                best_c = min(best_c, dt_c)
                best_e = min(best_e, dt_e)
                spark.catalog.clearCache()
            # plan dump from the last constructed df (what
            # df.explain("formatted") prints, captured as a string)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as f:
                f.write(plan)
            nexch = plan.count("Exchange")
            res = {"construct_sec": round(best_c, 3),
                   "execute_sec": round(best_e, 3),
                   "total_sec": round(best_c + best_e, 3),
                   "exchanges": nexch,
                   "smj": plan.count("SortMergeJoin"),
                   "bhj": plan.count("BroadcastHashJoin"),
                   "python_eval": (plan.count("BatchEvalPython")
                                   + plan.count("ArrowEvalPython")
                                   + plan.count("MapInPandas")
                                   + plan.count("MapInArrow"))}
            results[name] = res
            print(json.dumps({name: res}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
            results[name] = {"error": str(exc).splitlines()[0][:160]}
    print(json.dumps({"tag": args.tag, "sf_dir": args.sf_dir,
                      "results": results}), flush=True)
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass


if __name__ == "__main__":
    main()
