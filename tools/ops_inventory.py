"""Applied-transfer-op inventory for the 22 TPC-H texts on any fixture.

For each query, constructs the DataFrame through ``Engine.sql()`` (the
transfer's eager jobs run; nothing is collected) and records which ops
the gate stack actually APPLIED — the per-query plan-shape evidence
behind Q18_Q21_DIAG_r07.json and the gate-2e rollout check (only Q8/Q9
lost their host-duplicated part->lineitem semi; Q17's shared-subquery
op and every cascade op survived).

Optionally diffs two configs: pass ``--knob name`` to compare the
default config against the same config with that boolean knob disabled.

Run:  python -u tools/ops_inventory.py [fixture_dir] [--knob skip_host_prefiltered_semi] [--json OUT]
Env:  DRPT_DRIVER_MEM, DRPT_SHUFFLE_PARTITIONS (session sizing)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DRPT_DRIVER_MEM", "16g")


def main() -> int:
    argv = sys.argv[1:]
    fixture, knob, out_json = "/root/testdata/sf0.1", None, None
    i = 0
    while i < len(argv):
        if argv[i] == "--knob":
            knob = argv[i + 1]; i += 2
        elif argv[i] == "--json":
            out_json = argv[i + 1]; i += 2
        else:
            fixture = argv[i]; i += 1

    from duckdb_robust_predicate_transfer_spark.config import RPTConfig
    from duckdb_robust_predicate_transfer_spark.session import get_spark
    from duckdb_robust_predicate_transfer_spark.workload import QUERIES
    from duckdb_robust_predicate_transfer_spark.workload.common import (
        set_default_config)

    spark = get_spark(app_name="drpt-ops-inventory")
    spark.sparkContext.setLogLevel("ERROR")

    variants = [("default", RPTConfig())]
    if knob:
        variants.insert(0, (f"{knob}=False", RPTConfig(**{knob: False})))

    out: dict = {}
    for label, cfg in variants:
        inv = {}
        for n in range(1, 23):
            q = f"q_tpch_q{n}"
            set_default_config(cfg)
            spark._drpt_prev_result = None
            t0 = time.time()
            try:
                QUERIES[q](spark, fixture)  # construction runs the transfer
                res = getattr(spark, "_drpt_prev_result", None)
                ops = ([f"{o.phase[:1]}:{o.build}->{o.probe}"
                        for o in res.applied] if res is not None else [])
            except Exception as ex:
                ops = [f"ERR {str(ex)[:120]}"]
            inv[q] = ops
            print(f"# {label} {q}: {ops} ({time.time() - t0:.1f}s)",
                  file=sys.stderr, flush=True)
            set_default_config(None)
            spark.catalog.clearCache()
        out[label] = inv

    if knob:
        out["diff"] = {q: {"off": out[f"{knob}=False"][q],
                           "on": out["default"][q]}
                       for q in out["default"]
                       if out["default"][q] != out[f"{knob}=False"][q]}
    print(json.dumps(out), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
