"""Clean-room A/B for the sketch tier at x1000 (config.sketch_auto).

The bitmap-sketch escalation targets builds too big to broadcast
(>2M keys): instead of a shuffled semi (whose exchange of the probe
gate 2b3 showed is a net loss) or no transfer at all, ship a distributed
bit_or-folded Bloom bitmap and probe it scan-locally. Its designed
regime is exactly the queries where 2b3 now leaves a big build
untransferred: Q5/Q8 (orders->lineitem, ~9M keys into 600M rows) and
Q7's supplier/customer cascades.

Protocol (the bench-methodology rules this repo learned the hard way):
one FRESH session per query; an untimed off-mode warmup; min-of-N over
leg orders rotated per rep; spark.catalog.clearCache() after every leg
(all modes equally); exclusive machine. An earlier in-session A/B was
invalidated by the per-instance persist leak (fixed at HEAD — the rpt
leg of a no-clearCache harness measured the leak, not the engine).

Run:  python -u tools/sketch_regime.py [--json OUT] [--runs N]
Env:  DRPT_SKETCH_DIR (default /tmp/drpt_tpch_x1000)
      DRPT_SKETCH_QUERIES (default q_tpch_q5,q_tpch_q7,q_tpch_q8)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DRPT_DRIVER_MEM", "16g")
os.environ.setdefault("DRPT_SHUFFLE_PARTITIONS", "128")

SF = os.environ.get("DRPT_SKETCH_DIR", "/tmp/drpt_tpch_x1000")
QUERIES_ARG = os.environ.get("DRPT_SKETCH_QUERIES",
                             "q_tpch_q5,q_tpch_q7,q_tpch_q8")


def main() -> int:
    argv = sys.argv[1:]
    out_json, runs = None, 3
    i = 0
    while i < len(argv):
        if argv[i] == "--json":
            out_json = argv[i + 1]; i += 2
        elif argv[i] == "--runs":
            runs = int(argv[i + 1]); i += 2
        else:
            i += 1

    from duckdb_robust_predicate_transfer_spark.config import RPTConfig
    from duckdb_robust_predicate_transfer_spark.session import get_spark
    from duckdb_robust_predicate_transfer_spark.workload.common import (
        set_default_config)
    from duckdb_robust_predicate_transfer_spark.workload import tpch  # noqa
    from duckdb_robust_predicate_transfer_spark.workload.registry import (
        QUERIES)

    MODES = {"off": RPTConfig(enabled=False),
             "rpt": RPTConfig(),
             "rpt_sketch": RPTConfig(sketch_auto=True)}
    names = list(MODES)

    per_query: dict = {}
    for q in QUERIES_ARG.split(","):
        spark = get_spark(app_name="drpt-sketch-regime")
        spark.sparkContext.setLogLevel("ERROR")
        best = {m: math.inf for m in names}
        rows = {}
        # untimed warmup: page cache + codegen, charged to no mode
        set_default_config(MODES["off"])
        QUERIES[q](spark, SF).collect()
        set_default_config(None)
        spark.catalog.clearCache()
        for rep in range(runs):
            order = names[rep % len(names):] + names[:rep % len(names)]
            for m in order:
                set_default_config(MODES[m])
                try:
                    t = time.time()
                    rows[m] = sorted(
                        tuple(r) for r in QUERIES[q](spark, SF).collect())
                    best[m] = min(best[m], time.time() - t)
                finally:
                    set_default_config(None)
                    spark.catalog.clearCache()
        per_query[q] = {
            "sec": {m: round(best[m], 2) for m in names},
            "results_match": all(rows[m] == rows["off"] for m in names),
            "sketch_vs_off": round(best["off"] / best["rpt_sketch"], 3),
            "sketch_vs_rpt": round(best["rpt"] / best["rpt_sketch"], 3),
        }
        print(f"# {q}: " + " ".join(f"{m}={best[m]:.2f}" for m in names),
              file=sys.stderr, flush=True)
        spark.stop()

    out = {
        "suite": "sketch-regime",
        "fixture": SF,
        "runs": runs,
        "per_query": per_query,
        "all_match": all(v["results_match"] for v in per_query.values()),
    }
    print(json.dumps(out), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if out["all_match"] else 1


if __name__ == "__main__":
    sys.exit(main())
