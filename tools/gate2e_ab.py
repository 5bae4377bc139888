"""Gate-2e ablation A/B (r7 verdict item 7): prove the semis gate 2e
suppresses are pure duplication of the host plan's own pre-exchange
broadcast hash joins — not merely correlated with healing.

Protocol: for each query in the 2e-affected set (TPC-H Q8/Q9 at scale,
where gate 2e removed part->lineitem / part->partsupp semis and healed
the r5/r6 0.92x residuals, plus Q5/Q17 as controls where 2e must NOT
change the op set), run two engine configs on the SAME session with
rotated min-of-N legs:

  2e_on   — default config (skip_host_prefiltered_semi=True)
  2e_off  — identical but skip_host_prefiltered_semi=False

and record each config's applied-op inventory plus result equality.
"Pure duplication" shows up as: identical results, 2e_off carrying the
extra semi(s), and 2e_on at least as fast on every affected query while
the control queries' op sets (and times, within noise) are unchanged.

Run:  python -u tools/gate2e_ab.py [--json OUT] [--runs N]
Env:  DRPT_TPCH_SCALE_DIR / DRPT_TPCH_SCALE_REP / DRPT_TPCH_SCALE_BASE
      (same fixture as tools/tpch_scale.py; the fixture must exist or
      is built on first use)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.environ.get("DRPT_TPCH_SCALE_DIR", "/tmp/drpt_tpch_x10")
SHUFFLE = int(os.environ.get("DRPT_TPCH_SCALE_SHUFFLE", "64"))

#: 2e-affected queries and controls (Q18_Q21_DIAG_r07's inventory:
#: gate 2e removes ops only from Q8/Q9; Q5's cascade and Q17's
#: virtual-edge op must survive untouched)
AFFECTED = ["q_tpch_q8", "q_tpch_q9"]
CONTROLS = ["q_tpch_q5", "q_tpch_q17"]


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

    from tools.tpch_scale import ensure_fixture

    ensure_fixture()

    from duckdb_robust_predicate_transfer_spark.config import RPTConfig
    from duckdb_robust_predicate_transfer_spark.session import get_spark
    from duckdb_robust_predicate_transfer_spark.workload import QUERIES
    from duckdb_robust_predicate_transfer_spark.workload.common import (
        set_default_config)

    spark = get_spark(app_name="drpt-gate2e-ab",
                      shuffle_partitions=SHUFFLE)
    spark.sparkContext.setLogLevel("ERROR")

    CFGS = {"2e_on": RPTConfig(),
            "2e_off": RPTConfig(skip_host_prefiltered_semi=False)}

    def run_once(q: str, mode: str, collect: bool):
        set_default_config(CFGS[mode])
        try:
            t = time.time()
            df = QUERIES[q](spark, OUT_DIR)
            rows = df.collect()
            dt = time.time() - t
            return dt, (sorted(map(tuple, rows)) if collect else None)
        finally:
            set_default_config(None)
            spark.catalog.clearCache()

    # op inventories + result equality (one pass per config per query)
    import duckdb_robust_predicate_transfer_spark.workload.common as wc

    queries = AFFECTED + CONTROLS
    ops: dict = {q: {} for q in queries}
    match: dict = {}
    for q in queries:
        res = {}
        for mode in CFGS:
            set_default_config(CFGS[mode])
            try:
                df = QUERIES[q](spark, OUT_DIR)
                eng = getattr(wc, "last_engine", None)
                lr = eng.last_result if eng is not None else None
                ops[q][mode] = (
                    [f"{op.phase[0]}:{op.build}->{op.probe}[{t}]"
                     for op, t in zip(lr.applied, lr.applied_tiers)]
                    if lr is not None else [])
                res[mode] = sorted(map(tuple, df.collect()))
            finally:
                set_default_config(None)
                spark.catalog.clearCache()
        match[q] = res["2e_on"] == res["2e_off"]
        print(f"# {q}: match={match[q]} on={ops[q]['2e_on']} "
              f"off={ops[q]['2e_off']}", file=sys.stderr, flush=True)

    best = {q: {m: math.inf for m in CFGS} for q in queries}
    run_once(queries[0], "2e_on", collect=False)  # untimed warmup
    modes = list(CFGS)
    for r_i in range(runs):
        order = modes[r_i % 2:] + modes[:r_i % 2]
        for q in queries:
            for mode in order:
                dt, _ = run_once(q, mode, collect=False)
                best[q][mode] = min(best[q][mode], dt)
        print(f"# run {r_i + 1}/{runs} done", file=sys.stderr, flush=True)

    summary = {
        "suite": "gate2e-ab",
        "fixture": OUT_DIR,
        "replication": int(os.environ.get("DRPT_TPCH_SCALE_REP", 10)),
        "runs": runs,
        "affected": AFFECTED,
        "controls": CONTROLS,
        "results_match": match,
        "ops": ops,
        "per_query_sec": {q: {m: round(v, 3) for m, v in best[q].items()}
                          for q in queries},
        "speedup_2e_on": {q: (round(best[q]["2e_off"] / best[q]["2e_on"],
                                    3)
                              if best[q]["2e_on"] < math.inf else None)
                          for q in queries},
    }
    print(json.dumps(summary), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(summary, f, indent=1)
    spark.stop()
    control_ok = all(ops[q]["2e_on"] == ops[q]["2e_off"]
                     for q in CONTROLS)
    return 0 if (all(match.values()) and control_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
