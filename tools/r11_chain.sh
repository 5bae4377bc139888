#!/bin/bash
# Round-11 certification chain: the two at-scale legs VERDICT r10 found
# missing (tools/r10_chain.sh launched but never landed their
# artifacts), run at the r11 engine. Strictly sequential; artifacts
# commit as they land so an overrun still preserves the earlier legs.
set -x
cd /root/repo

# 1. JOB regime at the v3 fixture: 57 queries, 5 legs, runs=2 — the
#    first committed certification of the cession arbitration + floor
#    at 100M fact rows (now with the r11 verdict cache live).
DRPT_JOB_DIR=/tmp/drpt_job DRPT_JOB_FACT=100000000 \
  python -u tools/job_regime.py --runs 2 --json JOB_REGIME_r11.json \
  > /tmp/job_regime_r11.log 2>&1
echo "JOB rc=$?"
git add JOB_REGIME_r11.json 2>/dev/null && \
  git commit -q -m "JOB regime at 100M: 57 queries, cession arbitration + verdict cache live" || true

# 2. Reclaim the JOB fixtures before the x1000 leg needs the disk.
rm -rf /tmp/drpt_job /tmp/drpt_job_v2

# 3. TPC-H x1000: full 22, runs=3, in-run oracle, 24g driver, zstd —
#    the same protocol as TPCH_SCALE_X1000_r09. Bloom counts reused
#    from the r9 artifact (native-plan evidence is engine-independent).
DRPT_TPCH_SCALE_DIR=/tmp/drpt_tpch_x1000 DRPT_TPCH_SCALE_REP=1000 \
  DRPT_TPCH_SCALE_SHUFFLE=128 DRPT_TPCH_SCALE_EMULATE_RF=0 \
  DRPT_IO_CODEC=zstd DRPT_DRIVER_MEM=24g \
  DRPT_TPCH_SCALE_BLOOMS_FROM=TPCH_SCALE_X1000_r09.json \
  python -u tools/tpch_scale.py --runs 3 --json TPCH_SCALE_X1000_r11.json \
  > /tmp/tpch_x1000_r11.log 2>&1
echo "X1000 rc=$?"
ORACLE_SRC=$(python3 -c "import json;print(json.load(open('TPCH_SCALE_X1000_r11.json')).get('oracle_log') or '')" 2>/dev/null)
if [ -n "$ORACLE_SRC" ] && [ -f "$ORACLE_SRC" ]; then
  cp "$ORACLE_SRC" ORACLE_X1000_r11.log
fi
rm -rf /tmp/drpt_tpch_x1000
git add TPCH_SCALE_X1000_r11.json ORACLE_X1000_r11.log 2>/dev/null && \
  git commit -q -m "TPC-H x1000: full 22, runs=3, in-run oracle, engaged-only geomeans" || true
echo "R11 CHAIN DONE"
