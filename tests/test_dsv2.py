"""The optional jvm/ DSv2 runtime-filter prototype, certified end-to-end.

Runs tools/dsv2_runtime_filter.py in a SUBPROCESS because the jar must
be on the driver classpath at JVM launch — the suite's shared session
cannot load it after the fact. Skips cleanly when no JDK is present
(the jar is optional by design)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dsv2_runtime_filter_prunes_row_groups():
    if shutil.which("javac") is None:
        pytest.skip("no JDK: the optional DSv2 jar cannot be built")
    env = dict(os.environ)
    env.update({
        "DRPT_DSV2_FIX": "/tmp/drpt_dsv2_test_fix",
        "DRPT_DSV2_FACT_ROWS": "2000000",
        "DRPT_DSV2_CPUS": "8",
    })
    proc = subprocess.run(
        [sys.executable, "-u",
         os.path.join(REPO, "tools", "dsv2_runtime_filter.py")],
        env=env, capture_output=True, text=True, timeout=420)
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith('{"suite"')]
    assert lines, f"no result line; stderr tail: {proc.stderr[-2000:]}"
    out = json.loads(lines[-1])
    # the mechanism: DPP planned, our filter() invoked with the runtime
    # IN-set, row groups actually dropped, results byte-identical to the
    # native reader
    assert out["dpp_planned"]
    assert out["filter_called"]
    assert out["row_groups_after"] < out["row_groups_before"]
    assert out["results_match"]


@pytest.mark.slow
def test_dsv2_composes_with_transfer_engine():
    """Multi-hop composition: the engine's transfer key set (built two
    hops away, dim -> mid -> fact) reaches the rptparquet fact SCAN via
    runtime V2 filtering and drops row groups — the reference's
    BF-into-scan cascade (rpt_optimizer.cpp:1401-1501) end-to-end, with
    zero engine changes (the fact enters as Rel(df=...))."""
    if shutil.which("javac") is None:
        pytest.skip("no JDK: the optional DSv2 jar cannot be built")
    env = dict(os.environ)
    env.update({
        "DRPT_COMPOSE_DIR": "/tmp/drpt_dsv2_compose_test_fix",
        # mid must exceed the engine's all_broadcast_bail_rows gate
        # (400k) or the transfer legitimately skips itself
        "DRPT_COMPOSE_FACT_ROWS": "4000000",
        "DRPT_COMPOSE_MID_ROWS": "600000",
        "DRPT_COMPOSE_DIM_ROWS": "60000",
        "DRPT_COMPOSE_RUNS": "1",
        "SPARK_GRAFT_CPUS": "8",
    })
    proc = subprocess.run(
        [sys.executable, "-u",
         os.path.join(REPO, "tools", "dsv2_transfer_compose.py")],
        env=env, capture_output=True, text=True, timeout=420)
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith('{"suite"')]
    assert lines, f"no result line; stderr tail: {proc.stderr[-2000:]}"
    out = json.loads(lines[-1])
    assert out["filter_called"]
    assert out["row_groups_after"] < out["row_groups_before"]
    assert out["results_match"]


@pytest.mark.slow
def test_dsv2_nested_schema_reads_and_prunes():
    """Nested structs/arrays/maps + decimal/date through the rptparquet
    vectorized path: schema inference via Spark's own converter, reads
    byte-identical to the native source, and runtime V2 filtering still
    drops row groups when the join keys on the flat int64 column."""
    if shutil.which("javac") is None:
        pytest.skip("no JDK: the optional DSv2 jar cannot be built")
    env = dict(os.environ)
    env.update({
        "DRPT_NESTED_FIX": "/tmp/drpt_dsv2_nested_test_fix",
        "DRPT_NESTED_ROWS": "2000000",
        "SPARK_GRAFT_CPUS": "8",
    })
    proc = subprocess.run(
        [sys.executable, "-u",
         os.path.join(REPO, "tools", "dsv2_nested.py")],
        env=env, capture_output=True, text=True, timeout=420)
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith('{"suite"')]
    assert lines, f"no result line; stderr tail: {proc.stderr[-2000:]}"
    out = json.loads(lines[-1])
    assert out["schema_match"]
    assert out["read_match"]
    assert out["join_match"]
    assert out["filter_called"]
    assert out["row_groups_after"] < out["row_groups_before"]


@pytest.mark.slow
def test_dsv2_adaptive_row_filter():
    """SelectivityOptionalFilter parity (physical_create_bf.cpp:324-329):
    per-row in-scan probing of the runtime key set over an UNCLUSTERED
    fact (zone maps powerless), exact results either way, and the
    adaptive self-disable — zero tasks disable at 2% pass rate, every
    observing task disables at ~90%."""
    if shutil.which("javac") is None:
        pytest.skip("no JDK: the optional DSv2 jar cannot be built")
    env = dict(os.environ)
    env.update({
        "DRPT_ADAPT_FIX": "/tmp/drpt_dsv2_adapt_test_fix",
        "DRPT_ADAPT_FACT_ROWS": "3000000",
        "SPARK_GRAFT_CPUS": "8",
    })
    proc = subprocess.run(
        [sys.executable, "-u",
         os.path.join(REPO, "tools", "dsv2_adaptive.py")],
        env=env, capture_output=True, text=True, timeout=420)
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith('{"suite"')]
    assert lines, f"no result line; stderr tail: {proc.stderr[-2000:]}"
    out = json.loads(lines[-1])
    assert out["ok"], out
    assert out["selective"]["pass_rate"] < 0.2
    assert out["selective"]["tasks_disabled"] == 0
    assert out["unselective"]["tasks_disabled"] > 0
    assert out["selective"]["results_match"]
    assert out["unselective"]["results_match"]
