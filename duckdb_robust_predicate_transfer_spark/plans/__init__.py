from .ir import JoinEdge, TableNode, TransferOp
from .graph import JoinGraph, largest_root_tree, join_order_dag
from .schedule import plan_schedule

__all__ = [
    "JoinEdge", "TableNode", "TransferOp",
    "JoinGraph", "largest_root_tree", "join_order_dag", "plan_schedule",
]
