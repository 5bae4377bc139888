"""A/B the suppressed-eager-planning assumption on JOB-regime shapes
(VERDICT r9 next #4).

Since r6, composed mode suppresses native bloom injection BEFORE the
transfer's eager jobs run (the Q22 lesson: blooms planted inside
observe/min-max/key-set jobs were pure planning-job overhead,
TPCH_SCALE_X1000_r06). JOB_REGIME_r09 read composed_vs_dual 0.939 —
raw dual (injection live throughout) beat composed on jq7/jq18/jq25 —
so the assumption deserves its regime-specific A/B: same engine, same
arbitration, only ``config.suppress_during_eager`` flipped, i.e. the
eager jobs themselves run WITH the host's blooms live while the final
plan keeps identical arbitration semantics.

Interpretation note: the r10 cession hands the jq3/jq7/jq18/jq25 class
to plain native outright, so the A/B population is the queries that
STAY engaged under cession — the ones whose eager jobs still exist.

Run:  python -u tools/eager_ab.py [--json OUT] [--runs N] [--queries a,b]
Env:  DRPT_JOB_DIR / DRPT_JOB_FACT as tools/job_regime.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.job_regime import FACT, OUT_DIR, QUERIES, ensure_fixture

#: default population: queries that remain engaged under the r10
#: cession on the v3 fixture (dev-run verified) and pay eager jobs
DEFAULT_QS = ("jq5", "jq13", "jq14", "jq15", "jq24")


def main() -> int:
    argv = sys.argv[1:]
    out_json, runs, qs = None, 3, list(DEFAULT_QS)
    i = 0
    while i < len(argv):
        if argv[i] == "--json":
            out_json = argv[i + 1]; i += 2
        elif argv[i] == "--runs":
            runs = int(argv[i + 1]); i += 2
        elif argv[i] == "--queries":
            qs = argv[i + 1].split(","); i += 2
        else:
            i += 1

    ensure_fixture()

    from duckdb_robust_predicate_transfer_spark.config import RPTConfig
    from duckdb_robust_predicate_transfer_spark.engine import Engine
    from duckdb_robust_predicate_transfer_spark.session import get_spark
    from duckdb_robust_predicate_transfer_spark.workload.common import (
        set_native_rf)

    spark = get_spark(app_name="drpt-eager-ab",
                      shuffle_partitions=int(os.environ.get(
                          "DRPT_SHUFFLE_PARTITIONS", "64")))
    spark.sparkContext.setLogLevel("ERROR")

    MODES = {"suppressed": RPTConfig(),
             "eager_live": RPTConfig(suppress_during_eager=False)}

    engaged: dict = {q: {} for q in qs}

    def leg(q: str, mode: str) -> float:
        set_native_rf(spark, True)
        try:
            t = time.time()
            e = Engine(spark, OUT_DIR, MODES[mode])
            e.sql(QUERIES[q]).collect()
            engaged[q][mode] = bool(e.last_sql_rewritten)
            return time.time() - t
        finally:
            set_native_rf(spark, False)
            spark.catalog.clearCache()

    best = {q: {m: math.inf for m in MODES} for q in qs}
    leg(qs[0], "suppressed")  # warmup, untimed
    order = list(MODES)
    for r in range(runs):
        for q in qs:
            for m in (order if r % 2 == 0 else order[::-1]):
                best[q][m] = min(best[q][m], leg(q, m))
        print(f"# run {r + 1}/{runs} done", file=sys.stderr, flush=True)

    def geo(m):
        vals = [best[q][m] for q in qs if math.isfinite(best[q][m])]
        return round(math.exp(sum(math.log(v) for v in vals)
                              / len(vals)), 3) if vals else None

    summary = {
        "suite": "eager-suppression-ab",
        "fact_rows": FACT,
        "runs": runs,
        "queries": qs,
        "engaged": engaged,
        "per_query_sec": {q: {m: (None if best[q][m] is math.inf
                                  else round(best[q][m], 3))
                              for m in MODES} for q in qs},
        "geomean_sec": {m: geo(m) for m in MODES},
        "suppressed_vs_eager_live": (
            round(geo("eager_live") / geo("suppressed"), 3)
            if geo("suppressed") and geo("eager_live") else None),
    }
    print(json.dumps(summary), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(summary, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
