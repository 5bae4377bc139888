#!/bin/bash
# Round-8 certification chain — strictly sequential so every timing run
# has the machine to itself. Artifacts land in the repo root.
set -x
cd /root/repo

# 1. JOB regime: 25 queries, 5 modes (off/rpt/native/composed/dual),
#    oracle-checked at full scale, runs=3
DRPT_JOB_DIR=/tmp/drpt_job DRPT_JOB_FACT=100000000 \
  python -u tools/job_regime.py --runs 3 --json JOB_REGIME_r08.json \
  > /tmp/job_r08.log 2>&1
echo "JOB rc=$?"
git add JOB_REGIME_r08.json 2>/dev/null && \
  git commit -q -m "JOB regime r8 artifact: 25 queries, 5 legs, rescued subtree hops" || true

rm -rf /tmp/drpt_job_dev   # reclaim disk before the x1000 fixture

# 2. TPC-H x1000 (600M lineitem): full 22, runs=3, in-run oracle,
#    24g driver so Q21's legs run in the main pipeline (r7 OOM fix)
DRPT_TPCH_SCALE_DIR=/tmp/drpt_tpch_x1000 DRPT_TPCH_SCALE_REP=1000 \
  DRPT_TPCH_SCALE_SHUFFLE=128 DRPT_TPCH_SCALE_EMULATE_RF=0 \
  DRPT_IO_CODEC=zstd DRPT_DRIVER_MEM=24g \
  python -u tools/tpch_scale.py --runs 3 --json TPCH_SCALE_X1000_r08.json \
  > /tmp/tpch_x1000_r08.log 2>&1
echo "X1000 rc=$?"
cp /tmp/tpch_scale_oracle_x1000_*.log ORACLE_X1000_r08.log 2>/dev/null || true
git add TPCH_SCALE_X1000_r08.json ORACLE_X1000_r08.log 2>/dev/null && \
  git commit -q -m "TPC-H x1000 r8 artifact: full 22, runs=3, in-run oracle, 24g driver" || true

# 3. gate-2e ablation A/B at the same x1000 fixture
DRPT_TPCH_SCALE_DIR=/tmp/drpt_tpch_x1000 DRPT_TPCH_SCALE_REP=1000 \
  DRPT_TPCH_SCALE_SHUFFLE=128 DRPT_IO_CODEC=zstd DRPT_DRIVER_MEM=24g \
  python -u tools/gate2e_ab.py --runs 2 --json GATE2E_AB_r08.json \
  > /tmp/gate2e_x1000_r08.log 2>&1
echo "GATE2E rc=$?"
git add GATE2E_AB_r08.json 2>/dev/null && \
  git commit -q -m "Gate-2e ablation A/B at x1000" || true
