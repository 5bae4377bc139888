"""Property test of the transfer-schedule semantics (pure Python).

The claim inherited from the reference (and the Yannakakis result it
builds on): over an acyclic join graph, ONE forward pass
(leaves->root) followed by ONE backward pass (root->leaves) of
semi-join reductions leaves every table holding exactly the rows that
participate in at least one full-join result — the same fixpoint that
running all-pairs semi-joins to convergence reaches
(rpt_optimizer.cpp:826-995; SURVEY.md section 7 "What's hard" #1).

We verify it by simulation: random trees, random tiny relations,
apply the planner's op list with dict-based semi-join semantics, and
compare against the brute-force fixpoint. No Spark involved.
"""

from hypothesis import given, settings, strategies as st

from duckdb_robust_predicate_transfer_spark.plans.graph import (
    JoinGraph, largest_root_tree)
from duckdb_robust_predicate_transfer_spark.plans.ir import (
    JoinEdge, TableNode)
from duckdb_robust_predicate_transfer_spark.plans.schedule import plan_schedule


@st.composite
def tree_instance(draw):
    n = draw(st.integers(min_value=3, max_value=6))
    # random tree: node i>0 attaches to a random earlier node
    parents = [draw(st.integers(min_value=0, max_value=i - 1))
               for i in range(1, n)]
    edges = []
    cols: dict = {i: [] for i in range(n)}
    for i, p in enumerate(parents, start=1):
        ca, cb = f"e{i}_p", f"e{i}_c"
        edges.append((p, i, ca, cb))
        cols[p].append(ca)
        cols[i].append(cb)
    # rows: per table, 1..5 rows of small-domain values for its edge cols
    tables = {}
    for t in range(n):
        n_rows = draw(st.integers(min_value=1, max_value=5))
        rows = []
        for _ in range(n_rows):
            rows.append({c: draw(st.integers(min_value=0, max_value=3))
                         for c in cols[t]})
        tables[t] = rows
    return n, edges, tables


def semi(probe_rows, build_rows, probe_col, build_col):
    keys = {r[build_col] for r in build_rows}
    return [r for r in probe_rows if r[probe_col] in keys]


def fixpoint(tables, edges):
    """All-pairs semi-joins to convergence — the specification."""
    cur = {t: list(rows) for t, rows in tables.items()}
    changed = True
    while changed:
        changed = False
        for a, b, ca, cb in edges:
            for probe, build, pc, bc in ((a, b, ca, cb), (b, a, cb, ca)):
                out = semi(cur[probe], cur[build], pc, bc)
                if len(out) != len(cur[probe]):
                    cur[probe] = out
                    changed = True
    return cur


@settings(max_examples=60, deadline=None)
@given(tree_instance())
def test_one_forward_backward_pass_reaches_fixpoint(inst):
    n, edges, tables = inst
    nodes = [TableNode(str(t), rows=float(len(tables[t]))) for t in range(n)]
    jedges = [JoinEdge(str(a), str(b), (ca,), (cb,))
              for a, b, ca, cb in edges]
    graph = JoinGraph.build(nodes, jedges)
    plan = plan_schedule(largest_root_tree(graph), "both")

    cur = {str(t): list(rows) for t, rows in tables.items()}
    for op in plan.ops:
        cur[op.probe] = semi(cur[op.probe], cur[op.build],
                             op.probe_cols[0], op.build_cols[0])

    want = fixpoint(tables, edges)
    for t in range(n):
        got = sorted((sorted(r.items()) for r in cur[str(t)]))
        exp = sorted((sorted(r.items()) for r in want[t]))
        assert got == exp, f"table {t}: schedule missed the fixpoint"


@settings(max_examples=40, deadline=None)
@given(tree_instance())
def test_forward_pass_fully_reduces_root(inst):
    """After the forward pass alone, the ROOT already holds only
    globally-joinable rows (the one-pass guarantee the root gets)."""
    n, edges, tables = inst
    nodes = [TableNode(str(t), rows=float(len(tables[t]))) for t in range(n)]
    jedges = [JoinEdge(str(a), str(b), (ca,), (cb,))
              for a, b, ca, cb in edges]
    tree = largest_root_tree(JoinGraph.build(nodes, jedges))
    plan = plan_schedule(tree, "forward_only")

    cur = {str(t): list(rows) for t, rows in tables.items()}
    for op in plan.ops:
        cur[op.probe] = semi(cur[op.probe], cur[op.build],
                             op.probe_cols[0], op.build_cols[0])
    want = fixpoint(tables, edges)
    root = int(tree.root)
    got = sorted((sorted(r.items()) for r in cur[tree.root]))
    exp = sorted((sorted(r.items()) for r in want[root]))
    assert got == exp
