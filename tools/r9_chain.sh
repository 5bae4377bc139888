#!/bin/bash
# Round-9 certification chain — strictly sequential so every timing run
# has the machine to itself (r5 lesson; memory: r8-dual-arbitration).
# Both heavy legs run at the FINAL engine; artifacts commit as they
# land so an overrun still preserves the earlier legs.
#
# NOTE: fixture reclaim below only ever touches /tmp/drpt_job* and the
# x1000 fixture dir — never /tmp/drpt-spark-local (spark.local.dir),
# whose mid-run loss invalidated BENCH_r08.
set -x
cd /root/repo

# 1. TPC-H x1000: full 22, runs=3, in-run oracle, 24g driver, zstd —
#    the same protocol as TPCH_SCALE_X1000_r08 (781e408), now on the
#    string-key-conditioned engine (VERDICT r8 next #2). Bloom counts
#    reused from the r8 artifact (native-plan evidence is engine-
#    independent; saves the ~45min eager pass).
DRPT_TPCH_SCALE_DIR=/tmp/drpt_tpch_x1000 DRPT_TPCH_SCALE_REP=1000 \
  DRPT_TPCH_SCALE_SHUFFLE=128 DRPT_TPCH_SCALE_EMULATE_RF=0 \
  DRPT_IO_CODEC=zstd DRPT_DRIVER_MEM=24g \
  DRPT_TPCH_SCALE_BLOOMS_FROM=TPCH_SCALE_X1000_r08.json \
  python -u tools/tpch_scale.py --runs 3 --json TPCH_SCALE_X1000_r09.json \
  > /tmp/tpch_x1000_r09.log 2>&1
echo "X1000 rc=$?"
cp /tmp/tpch_scale_oracle_x1000_*.log ORACLE_X1000_r09.log 2>/dev/null || true
git add TPCH_SCALE_X1000_r09.json ORACLE_X1000_r09.log 2>/dev/null && \
  git commit -q -m "TPC-H x1000 r9: full 22 on the conditioned engine, runs=3, in-run oracle" || true

# 2. JOB regime at the v3 fixture (33 queries: +8 mixed-key /
#    weak-LIKE shapes), runs=3 — re-certifies the r8 wins AND the
#    gate-2g weak-build retirements at 100M fact rows.
#    runs=2 (33 queries x 5 legs: the extra 8 shapes cost what the
#    third run would have; min-of-2 on a quiet machine is stable)
DRPT_JOB_DIR=/tmp/drpt_job DRPT_JOB_FACT=100000000 \
  python -u tools/job_regime.py --runs 2 --json JOB_REGIME_r09.json \
  > /tmp/job_regime_r09.log 2>&1
echo "JOB rc=$?"
git add JOB_REGIME_r09.json 2>/dev/null && \
  git commit -q -m "JOB regime r9: 33 queries at 100M on the final engine (gate 2g + dual arbitration)" || true
echo "R9 CHAIN DONE"
