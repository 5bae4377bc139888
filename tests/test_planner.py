"""Pure-Python planner unit tests — no Spark needed.

The reference ships zero unit tests for its planner (SURVEY.md
section 5); these lock the schedule semantics re-derived from
rpt_optimizer.cpp behavior.
"""

from duckdb_robust_predicate_transfer_spark.plans.graph import (
    JoinGraph, join_order_dag, largest_root_tree)
from duckdb_robust_predicate_transfer_spark.plans.ir import (
    JoinEdge, TableNode)
from duckdb_robust_predicate_transfer_spark.plans.schedule import plan_schedule


def star_graph():
    nodes = [
        TableNode("l", 60000), TableNode("o", 15000),
        TableNode("c", 1500), TableNode("n", 25), TableNode("rg", 5),
    ]
    edges = [
        JoinEdge("l", "o", ("l_orderkey",), ("o_orderkey",)),
        JoinEdge("o", "c", ("o_custkey",), ("c_custkey",)),
        JoinEdge("c", "n", ("c_nationkey",), ("n_nationkey",)),
        JoinEdge("n", "rg", ("n_regionkey",), ("r_regionkey",)),
    ]
    return JoinGraph.build(nodes, edges)


def test_largest_root_is_fact_table():
    tree = largest_root_tree(star_graph())
    # root = largest cardinality (rpt_optimizer.cpp:215-224)
    assert tree.root == "l"
    # chain l <- o <- c <- n <- rg => levels mirror the join path
    assert tree.levels == [["l"], ["o"], ["c"], ["n"], ["rg"]]


def test_forward_then_backward_schedule():
    plan = plan_schedule(largest_root_tree(star_graph()), "both")
    phases = [(op.phase, op.build, op.probe) for op in plan.ops]
    # forward: deepest level first (leaves -> root), child builds
    assert phases[:4] == [
        ("forward", "rg", "n"), ("forward", "n", "c"),
        ("forward", "c", "o"), ("forward", "o", "l"),
    ]
    # backward: root -> leaves, parent builds
    assert phases[4:] == [
        ("backward", "l", "o"), ("backward", "o", "c"),
        ("backward", "c", "n"), ("backward", "n", "rg"),
    ]


def test_forward_only_mode():
    plan = plan_schedule(largest_root_tree(star_graph()), "forward_only")
    assert all(op.phase == "forward" for op in plan.ops)
    assert len(plan.ops) == 4


def test_cycle_drops_exactly_one_edge():
    nodes = [TableNode("l", 60000), TableNode("o", 15000),
             TableNode("c", 1500), TableNode("s", 100), TableNode("n", 25)]
    edges = [
        JoinEdge("l", "o", ("l_orderkey",), ("o_orderkey",)),
        JoinEdge("o", "c", ("o_custkey",), ("c_custkey",)),
        JoinEdge("l", "s", ("l_suppkey",), ("s_suppkey",)),
        JoinEdge("c", "n", ("c_nationkey",), ("n_nationkey",)),
        JoinEdge("s", "n", ("s_nationkey",), ("n_nationkey",)),
    ]
    g = JoinGraph.build(nodes, edges)
    tree = largest_root_tree(g)
    # spanning tree over 5 nodes has 4 edges; one cycle edge dropped
    assert len(tree.parent) == 4
    assert tree.root == "l"


def test_multicolumn_edge_preferred():
    # weight = #cols wins over cardinality tie-break
    # (graph_manager.hpp:37-43)
    nodes = [TableNode("a", 100), TableNode("b", 50), TableNode("c", 10)]
    edges = [
        JoinEdge("a", "b", ("x",), ("x",)),
        JoinEdge("a", "c", ("x", "y"), ("x", "y")),
        JoinEdge("b", "c", ("y",), ("y",)),
    ]
    tree = largest_root_tree(JoinGraph.build(nodes, edges))
    # a-c (weight 2) must be a tree edge
    tree_pairs = {frozenset((p, ch)) for ch, (p, _) in tree.parent.items()}
    assert frozenset(("a", "c")) in tree_pairs


def test_left_join_preserved_side_never_probed():
    nodes = [TableNode("c", 1500), TableNode("o", 15000), TableNode("n", 25)]
    edges = [
        JoinEdge("c", "o", ("c_custkey",), ("o_custkey",), how="left"),
        JoinEdge("c", "n", ("c_nationkey",), ("n_nationkey",)),
    ]
    plan = plan_schedule(largest_root_tree(JoinGraph.build(nodes, edges)))
    for op in plan.ops:
        if {op.build, op.probe} == {"c", "o"}:
            # only the non-preserved side (o) may be filtered
            assert op.probe == "o", op


def test_ineligible_join_excluded():
    nodes = [TableNode("a", 10), TableNode("b", 5)]
    edges = [JoinEdge("a", "b", ("x",), ("x",), how="left_anti")]
    g = JoinGraph.build(nodes, edges)
    assert g.n_edges() == 0


def test_join_order_heuristic_roots_at_largest():
    tree = join_order_dag(star_graph(), flip_roots=True)
    assert tree.root == "l"
    assert len(tree.parent) == 4


def test_full_reduction_property():
    """Forward+backward over a tree must touch every table at least once
    (the Yannakakis full-reduction property)."""
    plan = plan_schedule(largest_root_tree(star_graph()), "both")
    probed = {op.probe for op in plan.ops}
    assert probed == {"l", "o", "c", "n", "rg"}


def chain_graph_same_key():
    """r - a - b - c all joined on one transitive key: a single column
    equivalence class spanning every table."""
    nodes = [TableNode("r", 100000), TableNode("a", 10000),
             TableNode("b", 1000), TableNode("c", 100)]
    edges = [
        JoinEdge("r", "a", ("r_k",), ("a_k",)),
        JoinEdge("a", "b", ("a_k",), ("b_k",)),
        JoinEdge("b", "c", ("b_k",), ("c_k",)),
    ]
    return JoinGraph.build(nodes, edges)


def test_equivalence_classes_transitive():
    from duckdb_robust_predicate_transfer_spark.plans.graph import (
        column_equivalence_classes)

    g = chain_graph_same_key()
    cls = column_equivalence_classes(g.edges)
    reps = {cls[("r", "r_k")], cls[("a", "a_k")],
            cls[("b", "b_k")], cls[("c", "c_k")]}
    assert len(reps) == 1  # one transitive class


def test_equivalence_classes_ignore_outer_edges():
    from duckdb_robust_predicate_transfer_spark.plans.graph import (
        column_equivalence_classes)

    edges = [
        JoinEdge("a", "b", ("k",), ("k",)),
        JoinEdge("b", "c", ("k",), ("k",), how="left"),
    ]
    cls = column_equivalence_classes(edges)
    assert cls[("a", "k")] == cls[("b", "k")]
    assert ("c", "k") not in cls  # left edge does not union


def test_backward_broadcast_builds_at_root():
    """On a same-key chain the backward pass must CREATE once at the
    root (the class's highest ancestor) and USE it at every
    descendant — the reference's one-CREATE-per-class broadcast
    (rpt_optimizer.cpp:1070-1158)."""
    g = chain_graph_same_key()
    tree = join_order_dag(g, flip_roots=True)
    assert tree.root == "r"
    plan = plan_schedule(tree, "both", class_broadcast=True, edges=g.edges)
    backward = [op for op in plan.ops if op.phase == "backward"]
    assert len(backward) == 3
    assert all(op.build == "r" and op.build_cols == ("r_k",)
               for op in backward)
    assert {op.probe for op in backward} == {"a", "b", "c"}
    # without the broadcast, builds cascade parent-by-parent
    plan0 = plan_schedule(tree, "both", class_broadcast=False)
    assert [op.build for op in plan0.ops if op.phase == "backward"] == \
        ["r", "a", "b"]


def test_backward_broadcast_distinct_keys_untouched():
    # star_graph joins each hop on a DIFFERENT key: no class spans more
    # than one edge, so the broadcast must change nothing
    g = star_graph()
    tree = join_order_dag(g, flip_roots=True)
    with_bc = plan_schedule(tree, "both", class_broadcast=True,
                            edges=g.edges)
    without = plan_schedule(tree, "both", class_broadcast=False)
    assert with_bc.ops == without.ops


def test_dag_render():
    from duckdb_robust_predicate_transfer_spark.plans.dag_print import (
        fmt_card, render_tree)

    tree = largest_root_tree(star_graph())
    out = render_tree(tree, {"l": 60000, "o": 15000, "c": 1500,
                             "n": 25, "rg": 5})
    for alias in ("l", "o", "c", "n", "rg"):
        assert f"+- {alias} " in out
    assert "60.0K" in out and "[l_orderkey = o_orderkey]" in out
    assert fmt_card(2_500_000_000) == "2.5B"


def test_dag_render_boxes():
    """2-D box rendering (display_physical_dag parity with the
    reference's RenderSubtree, dag_printer.cpp:38-180): every node gets
    a bordered box with its cardinality, children sit under connector
    bars with parent_col / child_col edge labels."""
    from duckdb_robust_predicate_transfer_spark.plans.dag_print import (
        render_boxes)

    tree = largest_root_tree(star_graph())
    out = render_boxes(tree, {"l": 60000, "o": 15000, "c": 1500,
                              "n": 25, "rg": 5})
    assert "| l" in out and "| 60.0K rows" in out
    assert "l_orderkey / o_orderkey" in out
    assert out.count("+--") >= 5  # five boxes
    assert "|" in out.splitlines()[4]  # connector under the root box


def cyclic_graph():
    """Triangle a-b-c plus pendant d: one edge must be dropped."""
    nodes = [TableNode("a", 1000), TableNode("b", 500),
             TableNode("c", 100), TableNode("d", 10)]
    edges = [
        JoinEdge("a", "b", ("k1",), ("k1",)),
        JoinEdge("b", "c", ("k2",), ("k2",)),
        JoinEdge("a", "c", ("k3",), ("k3",)),
        JoinEdge("c", "d", ("k4",), ("k4",)),
    ]
    return JoinGraph.build(nodes, edges)


def test_execution_order_dag_follows_order():
    """Cycle-breaking must follow the host's execution order, not
    declaration order: with c,a executing before b, the a-c edge (later
    endpoint a) ranks before both b edges and survives; the b-c edge
    (later endpoint b) closes the cycle and is dropped."""
    from duckdb_robust_predicate_transfer_spark.plans.graph import (
        execution_order_dag)

    tree = execution_order_dag(cyclic_graph(), order=["c", "a", "b", "d"])
    kept = {frozenset((p, c)) for p, c, _ in tree.tree_edges()}
    assert frozenset(("a", "c")) in kept
    assert frozenset(("b", "c")) not in kept
    # flip_roots=True anchors at the largest table (FlipRootsToLeaves
    # terminal state, rpt_optimizer.cpp:715-810)
    assert tree.root == "a"


def test_execution_order_dag_no_flip_roots_last_executed():
    from duckdb_robust_predicate_transfer_spark.plans.graph import (
        execution_order_dag)

    tree = execution_order_dag(cyclic_graph(), order=["c", "a", "b", "d"],
                               flip_roots=False)
    # later-executed = parent (rpt_optimizer.cpp:575-601): the
    # last-executed table anchors the DAG
    assert tree.root == "d"
    assert len(tree.parent) == 3
