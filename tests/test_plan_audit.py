"""The whole-surface plan audit (tools/plan_audit.py) on a
representative subset — the full 108-query sweep is the committed
PLAN_AUDIT_r{N}.json artifact; here a transfer query, a pipeline
query, a waived-NLJ query and the multimodal Arrow surface prove the
tool's gates and waiver bookkeeping stay wired."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plan_audit_subset():
    proc = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "tools", "plan_audit.py"),
         "/root/testdata/sf0.001",
         "q_star_join_rpt", "q_corpus_curation", "q_dedup_minhash",
         "q_cosine_topk_batch", "q_multimodal_features"],
        capture_output=True, text=True, timeout=420)
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith('{"suite"')]
    assert lines, f"no result; stderr tail: {proc.stderr[-2000:]}"
    out = json.loads(lines[-1])
    assert out["ok"], out["violations"]
    assert out["audited"] == 5
    waived = {w["query"] for w in out["waived"]}
    assert "q_cosine_topk_batch" in waived      # justified NLJ
    assert "q_multimodal_features" in waived    # the Arrow surface
