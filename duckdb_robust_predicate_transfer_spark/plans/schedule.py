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

from .graph import RootedTree, column_equivalence_classes
from .ir import TransferOp, TransferPlan


def _redirect_map(tree: RootedTree, edges) -> dict:
    """For each backward tree edge, find the shallowest table whose
    columns are class-equivalent to the parent's build columns — the
    reference's backward broadcast: one CREATE per equivalence class at
    its highest ancestor, USE-only by every descendant in the class
    (rpt_optimizer.cpp:1070-1158; classes :494-511, shallowest-table
    edge redirection :566-574).

    Returns ``{child: (build_alias, build_cols)}`` for redirected edges.
    """
    classes = column_equivalence_classes(edges)
    depth = {a: i for i, lvl in enumerate(tree.levels) for a in lvl}
    # class representative -> {alias: column} (first column wins; a table
    # with two columns in one class only ever builds on one of them)
    members: dict = {}
    for (alias, col), rep in classes.items():
        members.setdefault(rep, {}).setdefault(alias, col)

    out: dict = {}
    for child, (par, e) in tree.parent.items():
        build_cols = e.cols_of(par)
        reps = [classes.get((par, c)) for c in build_cols]
        if any(r is None for r in reps):
            continue
        # candidate tables must hold a column in EVERY position's class
        cands = set(members[reps[0]])
        for r in reps[1:]:
            cands &= set(members[r])
        cands -= {child}
        cands = [a for a in cands if a in depth]
        if not cands:
            continue
        best = min(cands, key=lambda a: (depth[a], a))
        if depth[best] < depth[par]:
            out[child] = (best, tuple(members[r][best] for r in reps))
    return out


def plan_schedule(tree: RootedTree, pass_mode: str = "both",
                  class_broadcast: bool = False,
                  edges: "list | None" = None) -> TransferPlan:
    plan = TransferPlan(root=tree.root)
    plan.tree = [(p, c) for c, (p, _) in tree.parent.items()]
    redirect: dict = {}
    if class_broadcast:
        redirect = _redirect_map(
            tree, edges if edges is not None
            else [e for _, e in tree.parent.values()])

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
                build, build_cols = redirect.get(
                    child, (par, e.cols_of(par)))
                plan.ops.append(TransferOp(
                    build=build, probe=child,
                    build_cols=build_cols, probe_cols=e.cols_of(child),
                    phase="backward",
                ))
    return plan
