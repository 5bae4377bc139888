"""Composed-vs-dual A/B at x1000 — the TPC-H side of the regime
boundary JOB_REGIME_r08's `dual` leg measured (suppression-while-
engaged cost 21% geomean there because native subtree blooms and the
transfer covered DIFFERENT edges).

Legs, all with Spark's runtime bloom injection at true production
defaults (no emulation — the x1000 lineitem scan clears the 10 GB
gate on its own):

  rpt      — transfer only, injection off (anchor)
  composed — transfer + injection, session-wide suppression while a
             rewrite is engaged (the certified r6/r7 cluster default)
  dual     — transfer + injection with suppression disabled
             (RPTConfig(suppress_native_rf=False)): both mechanisms
             live on every edge

The question: does dual's JOB-regime dominance carry to star shapes
where the transfer already covers every selective edge (duplicated
blooms are then pure overhead — the measured x100 Q7 composed loss
that motivated suppression), or is suppression's win TPC-H-specific?
The answer scopes the composed default's regime boundary (VERDICT r7
items 2-3).

Run:  python -u tools/dual_x1000.py [--json OUT] [--runs N]
Env:  DRPT_TPCH_SCALE_DIR / DRPT_TPCH_SCALE_REP / DRPT_TPCH_SCALE_BASE
      (the tools/tpch_scale.py fixture — reused, built if absent)
      DRPT_DUAL_QUERIES (comma-separated, default the 8-query probe
      set below)
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
REP = int(os.environ.get("DRPT_TPCH_SCALE_REP", 10))

#: probe set: the transfer-engaged queries (Q5/Q7/Q8/Q9/Q17 — where
#: suppression's duplication argument applies) plus the queries the
#: r6/r7 artifacts showed native blooms winning for composed (Q21's
#: self-join, Q22's planning-job interaction, Q3's broadcast-tier mid)
DEFAULT_QUERIES = ["q_tpch_q3", "q_tpch_q5", "q_tpch_q7", "q_tpch_q8",
                   "q_tpch_q9", "q_tpch_q17", "q_tpch_q21", "q_tpch_q22"]
QUERIES = [q for q in os.environ.get(
    "DRPT_DUAL_QUERIES", ",".join(DEFAULT_QUERIES)).split(",") if q]


def main() -> int:
    argv = sys.argv[1:]
    out_json, runs = None, 2
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
    from duckdb_robust_predicate_transfer_spark.workload import QUERIES as Q
    from duckdb_robust_predicate_transfer_spark.workload.common import (
        set_default_config)

    spark = get_spark(app_name="drpt-dual-x1000",
                      shuffle_partitions=SHUFFLE)
    spark.sparkContext.setLogLevel("ERROR")

    def restart_spark() -> None:
        # same bounded-disk discipline as tools/tpch_scale.py: one
        # query's legs of spill max (stop() drops the blockmgr tree)
        nonlocal spark
        try:
            spark.stop()
        except Exception:
            pass
        spark = get_spark(app_name="drpt-dual-x1000",
                          shuffle_partitions=SHUFFLE)
        spark.sparkContext.setLogLevel("ERROR")

    RF_KEY = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    CFGS = {
        "rpt": (RPTConfig(), False),
        "composed": (RPTConfig(), True),
        "dual": (RPTConfig(suppress_native_rf=False), True),
    }

    def leg(name: str, mode: str) -> float:
        cfg, rf = CFGS[mode]
        set_default_config(cfg)
        spark.conf.set(RF_KEY, "true" if rf else "false")
        spark._drpt_rf_stash = None  # this leg owns the conf now
        try:
            t = time.time()
            Q[name](spark, OUT_DIR).collect()
            return time.time() - t
        finally:
            set_default_config(None)
            spark.conf.set(RF_KEY, "false")
            spark.catalog.clearCache()

    MODES = ("rpt", "composed", "dual")
    best = {q: {m: math.inf for m in MODES} for q in QUERIES}
    failed: list = []
    for r_i in range(runs):
        order = MODES[r_i % len(MODES):] + MODES[:r_i % len(MODES)]
        for q in QUERIES:
            if q in failed:
                continue
            try:
                if REP >= 300:
                    leg(q, "rpt")  # untimed per-session warmup
                for mode in order:
                    best[q][mode] = min(best[q][mode], leg(q, mode))
            except Exception as exc:
                print(f"# FAIL {q}: {str(exc)[:200]}", file=sys.stderr,
                      flush=True)
                failed.append(q)
                restart_spark()
            if REP >= 300:
                restart_spark()
        print(f"# run {r_i + 1}/{runs} done", file=sys.stderr, flush=True)

    ok_qs = [q for q in QUERIES if q not in failed]

    def geo(mode: str):
        vals = [best[q][mode] for q in ok_qs
                if math.isfinite(best[q][mode])]
        if not vals:
            return None
        return round(math.exp(sum(math.log(v) for v in vals) / len(vals)), 3)

    def _ratio(num, den):
        return round(num / den, 3) if num and den else None

    summary = {
        "suite": "dual-x1000",
        "fixture": OUT_DIR,
        "replication": REP,
        "runs": runs,
        "queries": QUERIES,
        "failed": failed,
        "geomean_sec": {m: geo(m) for m in MODES},
        "composed_vs_dual_geomean": _ratio(geo("dual"), geo("composed")),
        "rpt_vs_dual_geomean": _ratio(geo("dual"), geo("rpt")),
        "per_query_sec": {q: {m: (None if best[q][m] is math.inf
                                  else round(best[q][m], 3))
                              for m in MODES} for q in QUERIES},
    }
    print(json.dumps(summary), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(summary, f, indent=1)
    spark.stop()
    return 0 if not failed else 1


if __name__ == "__main__":
    sys.exit(main())
