#!/bin/bash
# Round-9 at-HEAD sweep discipline (VERDICT r8 next #7): full oracle
# sweep x3 SFs + Arrow-off parity, breadth, plan audit — all on the
# final engine. Correctness-only (no timing), so safe to run alongside
# other work; logs land in /tmp, JSON artifacts are assembled after.
set -x
cd /root/repo

python -u tools/oracle_check.py /root/testdata/sf0.001 \
  > /tmp/sweep_r9_sf0001.log 2>/dev/null
echo "sf0.001 rc=$?"
python -u tools/oracle_check.py /root/testdata/sf0.01 \
  > /tmp/sweep_r9_sf001.log 2>/dev/null
echo "sf0.01 rc=$?"
python -u tools/oracle_check.py /root/testdata/sf0.1 \
  > /tmp/sweep_r9_sf01.log 2>/dev/null
echo "sf0.1 rc=$?"
DRPT_ARROW=0 python -u tools/oracle_check.py /root/testdata/sf0.01 \
  > /tmp/sweep_r9_sf001_arrowoff.log 2>/dev/null
echo "arrow-off rc=$?"
python -u tools/breadth_check.py /root/testdata/sf0.01 \
  --json /tmp/BREADTH_r09.json > /tmp/sweep_r9_breadth.log 2>/dev/null
echo "breadth rc=$?"
# plan_audit prints its JSON on stdout
python -u tools/plan_audit.py /root/testdata/sf0.01 \
  > /tmp/PLAN_AUDIT_r09.json 2>/dev/null
echo "audit rc=$?"
echo "SWEEPS DONE"
