"""Tiny relational IR for the transfer planner.

The reference plans over DuckDB's logical operator tree using
``ColumnBinding {table_index, column_index}`` keys and a
``NodesManager`` of table units (graph_manager.hpp:11-57,
table_manager.hpp:9-15). Our planner runs at the DataFrame
construction layer, so the IR is simply: aliased table nodes with
cardinality estimates, and multi-column equi-join edges between them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: join types eligible for transfer-edge extraction, and which sides may be
#: filtered. The reference accepts INNER / LEFT / RIGHT / SEMI / RIGHT_SEMI
#: joins as edge sources (rpt_optimizer.cpp:49-67). For outer joins the
#: *preserved* side must never be reduced (its rows survive regardless of a
#: match), so transfer may only flow toward the non-preserved side.
ELIGIBLE_JOINS = {"inner", "left", "right", "left_semi", "semi", "right_semi"}


@dataclass(frozen=True)
class TableNode:
    """A transfer unit: a (possibly filtered) base relation."""

    alias: str
    #: estimated cardinality after local filters; drives root selection, MST
    #: tie-breaks and per-level ordering (table_manager.cpp:64-69)
    rows: float = 0.0
    #: whether a local filter was applied (enables the bounded-downside gate)
    filtered: bool = False


@dataclass(frozen=True)
class JoinEdge:
    """Multi-column equi-join edge ``left.left_cols == right.right_cols``."""

    left: str
    right: str
    left_cols: tuple
    right_cols: tuple
    how: str = "inner"

    def __post_init__(self):
        object.__setattr__(self, "left_cols", tuple(self.left_cols))
        object.__setattr__(self, "right_cols", tuple(self.right_cols))
        assert len(self.left_cols) == len(self.right_cols)

    @property
    def weight(self) -> int:
        # edge weight = number of join columns (graph_manager.hpp:37-43):
        # multi-column edges are preferred in the max spanning tree because
        # one multi-column filter is more selective than one single-column
        return len(self.left_cols)

    def eligible(self) -> bool:
        return self.how in ELIGIBLE_JOINS

    def may_filter(self, side_alias: str) -> bool:
        """May transfer reduce the given side of this edge?

        Inner/semi: both sides. Left join: only the right (non-preserved)
        side may be reduced. Right join: only the left.
        """
        if self.how in ("inner", "left_semi", "semi", "right_semi"):
            return True
        if self.how == "left":
            return side_alias == self.right
        if self.how == "right":
            return side_alias == self.left
        return False

    def cols_of(self, alias: str) -> tuple:
        if alias == self.left:
            return self.left_cols
        if alias == self.right:
            return self.right_cols
        raise KeyError(alias)

    def other(self, alias: str) -> str:
        return self.right if alias == self.left else self.left


@dataclass(frozen=True)
class TransferOp:
    """One scheduled transfer step: build a key filter on ``build`` and
    apply it to ``probe`` (the analogue of a CREATE_BF/USE_BF pair,
    logical_create_bf.hpp:20, logical_use_bf.hpp:19).

    ``build_cols[i]`` joins against ``probe_cols[i]``.
    """

    build: str
    probe: str
    build_cols: tuple
    probe_cols: tuple
    #: "forward" (leaves->root) or "backward" (root->leaves)
    phase: str = "forward"


@dataclass
class TransferPlan:
    root: str
    #: tree edges as (parent, child) pairs (for DAG display / tests)
    tree: list = field(default_factory=list)
    ops: list = field(default_factory=list)

    def describe(self) -> str:
        lines = [f"TransferPlan(root={self.root})"]
        for op in self.ops:
            lines.append(
                f"  [{op.phase:8s}] CREATE({op.build}.{','.join(op.build_cols)})"
                f" -> USE({op.probe}.{','.join(op.probe_cols)})"
            )
        return "\n".join(lines)
