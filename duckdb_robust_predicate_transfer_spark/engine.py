"""Engine facade: catalog + config + the transfer rewrite.

Usage (the declared-query style):

    eng = Engine(spark, sf_dir)
    r = eng.reduce(
        {"l": "lineitem",
         "o": Rel("orders", "o_orderstatus = 'F'"),
         "c": "customer"},
        [("l", "o", "l_orderkey", "o_orderkey"),
         ("o", "c", "o_custkey", "c_custkey")])
    out = (r["l"].join(r["o"], on=[...]) ...)

``reduce`` is the whole predicate-transfer pipeline: join-graph IR ->
spanning-tree/DAG heuristic -> forward+backward schedule -> semi-join
/ min-max rewrite. With ``cfg.enabled=False`` it returns the filtered
inputs untouched (the "extension not loaded" baseline), which is the
reference's core invariant surface: results must be identical either
way (README.md:21).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession

from .catalog import Catalog, get_catalog
from .config import DEFAULT, RPTConfig
from .operators.rewrite import TransferResult, apply_transfer
from .plans.graph import (JoinGraph, execution_order_dag, join_order_dag,
                          largest_root_tree)
from .plans.ir import JoinEdge, TableNode
from .plans.schedule import plan_schedule

#: default guess for the selectivity of a local filter, used only to rank
#: tables for root choice / level ordering (the reference leans on host
#: cardinality estimates, table_manager.cpp:66)
FILTER_SELECTIVITY = 0.2


@dataclass
class Rel:
    """A transfer unit: base table plus optional local filter.

    The reference treats FILTER+GET as one unit so filters apply before
    any Bloom filter is built (rpt_optimizer.cpp:74-83, :1551-1576); we
    get the same by construction — the filter is applied to the
    DataFrame before it enters the join graph.
    """

    name: str
    filter: "str | Column | None" = None
    df: "DataFrame | None" = None  # override: pre-built relation


def _norm_cols(c) -> tuple:
    if isinstance(c, str):
        return (c,)
    return tuple(c)


def normalize_edges(edges: list) -> list:
    out = []
    for e in edges:
        if isinstance(e, JoinEdge):
            out.append(e)
        else:
            l, r, lc, rc, *rest = e
            how = rest[0] if rest else "inner"
            out.append(JoinEdge(l, r, _norm_cols(lc), _norm_cols(rc), how))
    return out


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str | None = None,
                 config: RPTConfig | None = None):
        self.spark = spark
        self.config = (config or DEFAULT).validate()
        self.catalog: Catalog | None = (
            get_catalog(spark, sf_dir) if sf_dir else None
        )
        self.last_result: TransferResult | None = None

    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)

    t = table

    def sql(self, query: str) -> DataFrame:
        self.catalog.register_views()
        return self.spark.sql(query)

    # -- the rewrite ---------------------------------------------------

    def reduce(self, rels: dict, edges: list,
               config: RPTConfig | None = None) -> dict:
        """Apply robust predicate transfer; returns alias -> reduced DF."""
        cfg = (config or self.config).validate()

        dfs: dict = {}
        nodes: list = []
        filtered: set = set()
        rows_est: dict = {}
        for alias, spec in rels.items():
            if isinstance(spec, str):
                spec = Rel(spec)
            elif isinstance(spec, DataFrame):
                spec = Rel(alias, df=spec)
            df = spec.df if spec.df is not None else self.table(spec.name)
            base_rows = 0.0
            if spec.df is None and self.catalog is not None:
                base_rows = float(self.catalog.row_count(spec.name))
            if spec.filter is not None:
                df = df.filter(spec.filter)
                filtered.add(alias)
                base_rows *= FILTER_SELECTIVITY
            dfs[alias] = df
            rows_est[alias] = base_rows
            nodes.append(TableNode(alias=alias, rows=base_rows,
                                   filtered=alias in filtered))

        jedges = normalize_edges(edges)

        graph = JoinGraph.build(nodes, jedges)
        # reference bails out unchanged when the graph has <=1 edge
        # (rpt_optimizer.cpp:1592-1595)
        if not cfg.enabled or graph.n_edges() <= 1:
            return dfs

        if cfg.heuristic == "largest_root":
            tree = largest_root_tree(graph)
        elif cfg.heuristic == "catalyst":
            from .plans.catalyst_order import physical_alias_order

            # plan (never execute) the un-rewritten join and read the
            # host's real join order out of it — the analogue of the
            # reference reusing DuckDB's join order as the transfer DAG
            # (rpt_optimizer.cpp:494-713); fall back to declaration
            # order when leaves can't be resolved
            order = physical_alias_order(self.join_all(dfs, jedges), dfs)
            if order is not None:
                tree = execution_order_dag(graph, order,
                                           flip_roots=cfg.flip_roots)
            else:
                tree = join_order_dag(graph, flip_roots=cfg.flip_roots)
        else:
            tree = join_order_dag(graph, flip_roots=cfg.flip_roots)
        plan = plan_schedule(
            tree, pass_mode=cfg.pass_mode,
            # the reference's backward broadcast belongs to the DAG
            # (join_order) schedule, GenerateStageModificationsFromDAG
            class_broadcast=(cfg.class_broadcast
                             and cfg.heuristic in ("join_order", "catalyst")),
            edges=graph.edges)

        if cfg.display_dag:
            from .plans.dag_print import render_tree

            print(render_tree(tree, rows_est))
            print(plan.describe())

        res = apply_transfer(dfs, rows_est, filtered, plan, cfg)
        if cfg.profiling:
            # the reference prints its per-op summary at QueryEnd when
            # rpt_profiling is set (rpt_profiling.hpp:114-216)
            print(res.format_profile())
        self.last_result = res
        return res.dfs

    # -- final-join composition -----------------------------------------

    def join_all(self, dfs: dict, edges: list):
        """Chain the reduced relations back into the query's join, edge by
        edge, using name-based conditions (column names are unique across
        our tables; attribute-based refs would trip Spark's ambiguous
        self-join check because reduced DataFrames share key-set lineage).

        An edge whose endpoints are both already joined (a cycle-closing
        edge dropped by the spanning tree) is applied as a post-join
        filter — the transfer tree may drop it, the query must not.
        """
        from pyspark.sql import functions as F

        edges = normalize_edges(edges)
        if not edges:
            raise ValueError("join_all needs at least one edge")
        joined = dfs[edges[0].left]
        included = {edges[0].left}
        pending = list(edges)
        while pending:
            progressed = False
            for e in list(pending):
                cond = None
                for lc, rc in zip(e.left_cols, e.right_cols):
                    p = F.col(lc) == F.col(rc)
                    cond = p if cond is None else (cond & p)
                if e.left in included and e.right in included:
                    joined = joined.where(cond)
                    pending.remove(e)
                    progressed = True
                elif e.left in included:
                    joined = joined.join(dfs[e.right], cond, e.how)
                    included.add(e.right)
                    pending.remove(e)
                    progressed = True
                elif e.right in included:
                    how = {"left": "right", "right": "left"}.get(e.how, e.how)
                    joined = joined.join(dfs[e.left], cond, how)
                    included.add(e.left)
                    pending.remove(e)
                    progressed = True
            if not progressed:
                raise ValueError(f"disconnected join edges: {pending}")
        return joined

    def reduce_and_join(self, rels: dict, edges: list,
                        config: RPTConfig | None = None):
        """reduce() then join_all() — the common whole-query path."""
        r = self.reduce(rels, edges, config)
        return self.join_all(r, edges)
