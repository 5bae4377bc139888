"""Transfer schedule generation.

Given a rooted transfer tree, emit the ordered TransferOp list:

- forward pass (leaves -> root): every child CREATEs a key filter on
  its side of the parent edge; the parent USEs it. Levels processed
  deepest-first so that by the time a node builds the filter for its
  own parent it has already been reduced by all of its children —
  the cascade that makes multi-hop transfer strictly stronger than
  Spark's built-in one-hop runtime filters
  (rpt_optimizer.cpp:884-937).
- backward pass (root -> leaves): each parent (now fully reduced)
  CREATEs; the child USEs — completing the Yannakakis-style full
  reduction (rpt_optimizer.cpp:941-992). Skipped in
  ``forward_only`` mode.

Within a level, nodes are processed in ascending-cardinality order
(rpt_optimizer.cpp:876-879, :1092-1095): smallest filters first so
later builds in the same pass see maximally-reduced inputs.

Outer-join preserved sides are never reduced (ir.JoinEdge.may_filter);
the op is simply dropped, which is always sound (transfer is a pure
optimization — applying any subset of ops is correct).
"""

from __future__ import annotations

from .graph import RootedTree
from .ir import TransferOp, TransferPlan


def plan_schedule(tree: RootedTree, pass_mode: str = "both") -> TransferPlan:
    plan = TransferPlan(root=tree.root)
    plan.tree = [(p, c) for c, (p, _) in tree.parent.items()]

    # forward: levels deepest-first; child builds, parent uses
    for level in reversed(tree.levels[1:]):
        for child in level:
            par, e = tree.parent[child]
            if not e.may_filter(par):
                continue
            plan.ops.append(TransferOp(
                build=child, probe=par,
                build_cols=e.cols_of(child), probe_cols=e.cols_of(par),
                phase="forward",
            ))

    if pass_mode == "both":
        # backward: levels top-down; parent builds, child uses
        for level in tree.levels[1:]:
            for child in level:
                par, e = tree.parent[child]
                if not e.may_filter(child):
                    continue
                plan.ops.append(TransferOp(
                    build=par, probe=child,
                    build_cols=e.cols_of(par), probe_cols=e.cols_of(child),
                    phase="backward",
                ))
    return plan
