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
    #: the override df already carries a local filter (so the rewrite may
    #: treat it as selective even though ``filter`` is None)
    prefiltered: bool = False
    #: columns this relation is bucketed/co-partitioned on. When BOTH
    #: endpoints of a join edge declare the edge's own key columns here,
    #: that join is already exchange-free (bucket-local), and transfer
    #: along the edge is skipped: measured on the bucketed cascade, the
    #: probe work buys nothing a co-located merge join wasn't already
    #: doing (BUCKETED_r03.json, rpt 0.79x there) — the bounded-downside
    #: gate turned into a declaration
    colocated_on: tuple = ()


def _norm_cols(c) -> tuple:
    if isinstance(c, str):
        return (c,)
    return tuple(c)


#: module-level statement -> Extraction cache (engines are constructed
#: per call by the workload layer; the graph is engine-independent)
_EXT_CACHE: dict = {}

#: (statement cache key, config repr) -> True when reduce() gated every
#: op away for that statement+data+config: repeats skip the planning
#: path entirely (see _auto_transfer_sql). Only BAILS are cached — an
#: engaged statement re-plans each run because its eager builds are the
#: mechanism itself.
_BAIL_CACHE: dict = {}

#: (statement cache key, broadcast threshold) -> scan_prefilter_pairs
#: result (possibly None): the gate-2d/2e host-plan evidence, cached
#: because it costs a physical planning pass per statement
_PREFILTER_CACHE: dict = {}

#: (statement cache key, rf-threshold confs, config) -> bool: whether
#: the REWRITTEN plan carries a native bloom on an edge no applied op
#: covers (the compose_subtree_rf arbitration evidence) — one planning
#: pass each
_DUAL_RF_CACHE: dict = {}

#: (statement cache key, rf-threshold confs) -> frozenset of lowercased
#: (probe_table, probe_col, build_table) native bloom edges of the
#: ORIGINAL (un-rewritten) statement — the cession arbitration's
#: coverage evidence (config.cede_covered_edges); one planning pass per
#: novel statement
_ORIG_RF_CACHE: dict = {}

#: (statement cache key, rf-threshold confs, footer-row stats, filtered
#: aliases, cede config knobs) -> (cede, ride_off): the arbitration
#: VERDICT itself. plan_candidates' job-free dry run of the gate stack
#: is pure Python but still cost 20-40 ms per call on the widest
#: flagship queries (r11 pricing: 15-19% of their construction), and
#: its inputs are all deterministic functions of the key — the footer
#: row estimates join the key so a fixture change invalidates the
#: entry (same rationale as the catalog's path+mtime+size-keyed
#: footer cache: metadata keying, not result caching).
_CEDE_CACHE: dict = {}


import re as _re

_LIKE_PAT = _re.compile(r"LIKE\s+'([^']*)'", _re.IGNORECASE)


def _pred_prior(conjunct: str) -> float:
    """Predicate-shape selectivity prior for ONE WHERE conjunct (SQL
    text, plans/extract.py LeafInstance.filters). Selinger-style
    constants, used ONLY by the cession floor (cede_suppress_max_probe_
    rows) — never by the transfer gates, which keep the certified flat
    0.2 guess plus observation. The flat guess cannot tell
    mc_note LIKE '%(presents)%' (selective — JOB jq1's off plan is
    already minimal) from mc_note NOT LIKE '...' (anti-selective —
    jq6's fact arm stays full-size and blooms pay); the shapes can."""
    s = f" {conjunct.upper()} "
    if " NOT LIKE " in s:
        return 0.85
    if " LIKE " in s:
        m = _LIKE_PAT.search(conjunct)
        if m and not m.group(1).startswith("%"):
            return 0.1  # prefix pattern: range-like
        return 0.2
    if " NOT IN " in s or " IS NOT NULL " in s:
        return 0.9
    if " BETWEEN " in s:
        return 0.3
    if " IN " in s or " IN(" in s:
        return 0.25
    if "!=" in s or "<>" in s:
        return 0.9
    if any(o in s for o in (">=", "<=", ">", "<")):
        return 0.4
    if "=" in s:
        return 0.1
    return 0.2


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
        #: alias -> rows as of the last reduce(): local-filter-discounted
        #: footer estimates, overwritten in place with OBSERVED counts by
        #: the transfer's min/max+bloom jobs (apply_transfer mutates the
        #: dict). join_all reads this to broadcast-hint small sides.
        self.last_rows_est: dict = {}
        self._host_broadcast_rows: int = self.config.host_broadcast_rows

    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)

    t = table

    def sql(self, query: str, auto_rpt: bool = True,
            config: RPTConfig | None = None) -> DataFrame:
        """Run SQL with automatic predicate transfer.

        The reference's optimizer hook rewrites any statement with more
        than one eligible join edge, no user involvement
        (rpt_optimizer.cpp:1702-1722). Here: analyze the query, extract
        the join graph from the Catalyst analyzed plan
        (plans/extract.py), run the standard ``reduce`` over the
        extracted relations, then re-run the same SQL with temp views
        shadowed by their reduced DataFrames. Reduction only removes
        rows the query's own joins/filters would drop, and re-applied
        deterministic WHERE clauses are idempotent, so results are
        identical — the reference's core invariant (README.md:21).

        Any extraction bail-out (unsupported construct, <=2 edges after
        gating, no instance actually reduced) returns the plain result.
        """
        self.catalog.register_views()
        df = self.spark.sql(query)
        cfg = (config or self.config).validate()
        #: True when the last sql() call actually applied the transfer
        #: rewrite (extraction succeeded AND the planner's gates kept at
        #: least one reduction) — the observable analogue of the
        #: reference's "rules_applied" profiling counter
        #: (rpt_profiling.hpp:40-55). Read by tools/breadth_check.py.
        self.last_sql_rewritten = False
        #: set by _auto_transfer_sql when an UN-engaged query's bail
        #: evidence is pure duplication economics (every lost candidate
        #: died to gates 2d/2e): the query's joins are all broadcast-
        #: hash joins that drop the same rows a filter would, so
        #: native runtime blooms are the same pure overhead our semis
        #: would be — keep injection suppressed for it (JOB jq1: native
        #: 1.65 s vs off 0.95 s on exactly this shape, JOB_REGIME_r07).
        self._keep_rf_suppressed = False
        #: set inside _auto_transfer_sql's shadow window when the
        #: rewritten plan carries an uncovered native bloom edge
        #: (compose_subtree_rf): sql() then restores injection for the
        #: final run — per-query dual
        self._dual_rf = False
        #: set by reduce() when the cession arbitration disengaged the
        #: query to hand its covered edges to native runtime blooms
        #: (config.cede_covered_edges); _cede_ride_off additionally
        #: means the floor kept native suppressed too (ride off)
        self.last_cede = False
        self._cede_ride_off = False
        try:
            # session-stashed observability twin (workload functions
            # construct Engines internally; harnesses read this)
            self.spark._drpt_last_cede = None
        except Exception:
            pass
        if not auto_rpt or not cfg.enabled or self.catalog is None:
            return df
        if cfg.suppress_native_rf and cfg.suppress_during_eager:
            # suppress BEFORE the transfer runs, not after: reduce()'s
            # eager jobs (observe counts, min/max aggs, key-set builds,
            # persists) are real queries, and with injection still live
            # Spark plants bloom filters inside THEM — pure planning-job
            # overhead that showed up as a composed-only Q22 loss at
            # x1000 (8.2 s vs rpt 5.1 s with ZERO blooms in the final
            # plan, TPCH_SCALE_X1000_r06). Restored below when the
            # rewrite does not engage.
            self._sync_native_rf(engaged=True)
        try:
            out = self._auto_transfer_sql(query, df, cfg)
        except Exception:
            # the transfer's eager jobs (observe counts, min/max aggs,
            # key-set builds) are real Spark jobs that can throw; leave
            # the session's bloom-injection conf as the caller had it
            if cfg.suppress_native_rf:
                self._sync_native_rf(engaged=False)
            raise
        self.last_sql_rewritten = out is not None
        if (cfg.suppress_native_rf and out is None
                and not self._keep_rf_suppressed):
            self._sync_native_rf(engaged=False)
        elif out is not None and getattr(self, "_dual_rf", False):
            # per-query dual: the REWRITTEN plan would carry >=1 native
            # bloom on an edge the transfer's applied ops do NOT cover —
            # selectivity the rewrite leaves on the table
            # (cfg.compose_subtree_rf docstring). Restore injection for
            # the final run; the transfer's eager planning jobs above
            # already ran suppressed, so the Q22-class interaction loss
            # the early suppression was built for cannot recur.
            self._sync_native_rf(engaged=False)
        return out if out is not None else df

    def _uncovered_rf_evidence(self, query: str, cfg: RPTConfig) -> bool:
        """True when the REWRITTEN plan (views currently shadowed by
        their reduced DataFrames — call only from _auto_transfer_sql's
        shadow window) would carry at least one native bloom on a
        (probe_table, probe_col, build_table) edge no applied op covers.

        Why the rewritten plan, not the original: InjectRuntimeFilter
        re-evaluates against the reduced sizes and fires on exactly the
        arms the transfer could not serve (measured at the 100M JOB
        fixture: jq2's rewritten plan blooms keyword->movie_keyword —
        the hop whose exact-key build the gates refused — while its
        un-rewritten plan only blooms the company edge the ops already
        cover). Planning is a fresh spark.sql against the shadows, so
        the RETURNED DataFrame's QueryExecution is never optimized
        under the temporarily-enabled conf — a bloom-laden cached plan
        executing under nominal suppression would silently defeat the
        arbitration.

        Costs one planning pass (~0.2-0.5 s), cached per
        statement+data+config like the gate-2e prefilter evidence.
        Only meaningful when the session had injection on (a stash
        exists) — otherwise there is nothing to restore. Unresolvable
        bloom edges count as covered: suppression is the certified
        default and flipping to dual needs positive evidence."""
        if getattr(self.spark, "_drpt_rf_stash", None) != "true":
            return False
        from .plans.catalyst_order import native_bloom_edges

        rf_confs = []
        for k in ("spark.sql.optimizer.runtime.bloomFilter."
                  "applicationSideScanSizeThreshold",
                  "spark.sql.optimizer.runtime.bloomFilter."
                  "creationSideThreshold",
                  "spark.sql.autoBroadcastJoinThreshold"):
            try:
                rf_confs.append(self.spark.conf.get(k))
            except Exception:
                rf_confs.append("")
        ek = (getattr(self, "_stmt_ck", None) or query,
              tuple(rf_confs), repr(cfg))
        if ek in _DUAL_RF_CACHE:
            return _DUAL_RF_CACHE[ek]
        key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
        dual = False
        try:
            prior = self.spark.conf.get(key, "false")
        except Exception:
            prior = "false"
        try:
            self.spark.conf.set(key, "true")
            table_paths = {t: self.catalog.path(t)
                           for t in self.catalog.known_tables()}
            blooms = native_bloom_edges(self.spark.sql(query),
                                        table_paths,
                                        self._table_cols())
            covered = set()
            alias_t = getattr(self, "_last_alias_tables", {})
            if self.last_result is not None:
                for op in self.last_result.applied:
                    pt = alias_t.get(op.probe, op.probe)
                    bt = alias_t.get(op.build, op.build)
                    for pc in op.probe_cols:
                        # case-insensitive like _string_keys: a
                        # mixed-case identifier must not fabricate an
                        # "uncovered" verdict (ADVICE r8)
                        covered.add((str(pt).lower(), pc.lower(),
                                     str(bt).lower()))
            for b in blooms or ():
                if None in (b["probe_table"], b["probe_col"],
                            b["build_table"]):
                    continue
                if (b["probe_table"].lower(), b["probe_col"].lower(),
                        b["build_table"].lower()) not in covered:
                    dual = True
                    break
        except Exception:
            dual = False
        finally:
            try:
                # restore the observed pre-call value, not a literal:
                # the stash-exists precondition makes "false" safe
                # TODAY, but a future call site outside the shadow
                # window would clobber a user-enabled conf (ADVICE r8)
                self.spark.conf.set(key, prior)
            except Exception:
                pass
        if len(_DUAL_RF_CACHE) >= 256:
            _DUAL_RF_CACHE.pop(next(iter(_DUAL_RF_CACHE)))
        _DUAL_RF_CACHE[ek] = dual
        return dual

    def _orig_bloom_edges(self, query: str, cfg: RPTConfig) -> frozenset:
        """Lowercased (probe_table, probe_col, build_table) edges of the
        native runtime blooms Spark would plant in the ORIGINAL
        statement — the cession arbitration's coverage evidence.

        Must be called BEFORE the views are shadowed (the evidence is
        what the host does when the transfer stands down entirely, i.e.
        the plain native leg's plan). Edges with an unresolvable side
        are omitted: a candidate op can then never count as covered by
        them, which refuses cession — the safe direction, since
        suppression+engagement is the certified default. One planning
        pass (~0.2-0.5 s) per novel statement, cached like the
        gate-2e/dual evidence."""
        rf_confs = []
        for k in ("spark.sql.optimizer.runtime.bloomFilter."
                  "applicationSideScanSizeThreshold",
                  "spark.sql.optimizer.runtime.bloomFilter."
                  "creationSideThreshold",
                  "spark.sql.autoBroadcastJoinThreshold"):
            try:
                rf_confs.append(self.spark.conf.get(k))
            except Exception:
                rf_confs.append("")
        ek = (getattr(self, "_stmt_ck", None) or query, tuple(rf_confs))
        if ek in _ORIG_RF_CACHE:
            return _ORIG_RF_CACHE[ek]
        from .plans.catalyst_order import native_bloom_edges

        key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
        edges: frozenset = frozenset()
        try:
            prior = self.spark.conf.get(key, "false")
        except Exception:
            prior = "false"
        try:
            self.spark.conf.set(key, "true")
            table_paths = {t: self.catalog.path(t)
                           for t in self.catalog.known_tables()}
            blooms = native_bloom_edges(self.spark.sql(query),
                                        table_paths,
                                        self._table_cols())
            edges = frozenset(
                (b["probe_table"].lower(), b["probe_col"].lower(),
                 b["build_table"].lower())
                for b in blooms or ()
                if None not in (b["probe_table"], b["probe_col"],
                                b["build_table"]))
        except Exception:
            edges = frozenset()
        finally:
            try:
                self.spark.conf.set(key, prior)
            except Exception:
                pass
        if len(_ORIG_RF_CACHE) >= 256:
            _ORIG_RF_CACHE.pop(next(iter(_ORIG_RF_CACHE)))
        _ORIG_RF_CACHE[ek] = edges
        return edges

    def _cede_verdict(self, query: str, cfg: RPTConfig, plan, dfs: dict,
                      rows_est: dict, filtered: set, rows_base: dict,
                      neighbor_edges: dict, opaque: set,
                      host_prefiltered) -> "tuple[bool, bool]":
        """(cede, ride_off): should this query DISENGAGE and hand its
        edges to native runtime blooms (config.cede_covered_edges)?

        Runs inside reduce() after scheduling but BEFORE any eager job
        — the whole point is not to sink the jobs the cession avoids.
        Candidates come from the job-free dry run of the gate stack
        (rewrite.plan_candidates); coverage from the ORIGINAL plan's
        native bloom edges. Cede when every candidate edge is covered
        or the uncovered candidates' probe mass is within
        cede_extra_probe_frac of the query's largest relation — the
        host then expresses (almost) everything our eager ops would,
        lazily. ride_off additionally keeps native suppressed when the
        shape-prior probe mass is under cede_suppress_max_probe_rows
        (the jq1 floor: the off plan's pushed filters already leave
        nothing worth blooming)."""
        if not (cfg.suppress_native_rf and cfg.compose_subtree_rf
                and cfg.cede_covered_edges):
            return False, False
        if getattr(self.spark, "_drpt_rf_stash", None) != "true":
            return False, False
        # verdict cache (_CEDE_CACHE): every input below is a
        # deterministic function of (statement, planner confs, footer
        # stats, config) — skip the per-call dry run on repeats
        vk = None
        try:
            rf_confs = []
            for k in ("spark.sql.optimizer.runtime.bloomFilter."
                      "applicationSideScanSizeThreshold",
                      "spark.sql.optimizer.runtime.bloomFilter."
                      "creationSideThreshold",
                      "spark.sql.autoBroadcastJoinThreshold"):
                try:
                    rf_confs.append(self.spark.conf.get(k))
                except Exception:
                    rf_confs.append("")
            # repr(cfg) (the _BAIL_CACHE convention) keys the WHOLE
            # config: plan_candidates reads the full gate stack, not
            # just the cede knobs
            vk = (getattr(self, "_stmt_ck", None) or query,
                  tuple(rf_confs),
                  frozenset((rows_base or {}).items()),
                  frozenset(filtered or ()),
                  repr(cfg))
            if vk in _CEDE_CACHE:
                return _CEDE_CACHE[vk]
        except TypeError:
            vk = None  # unhashable component: fall through uncached
        res = self._cede_verdict_uncached(query, cfg, plan, dfs,
                                          rows_est, filtered, rows_base,
                                          neighbor_edges, opaque,
                                          host_prefiltered)
        if vk is not None:
            if len(_CEDE_CACHE) >= 256:
                _CEDE_CACHE.pop(next(iter(_CEDE_CACHE)))
            _CEDE_CACHE[vk] = res
        return res

    def _cede_verdict_uncached(self, query, cfg, plan, dfs, rows_est,
                               filtered, rows_base, neighbor_edges,
                               opaque, host_prefiltered):
        from .operators.rewrite import plan_candidates

        cand = plan_candidates(dfs, rows_est, filtered, plan, cfg,
                               rows_base=rows_base,
                               neighbor_edges=neighbor_edges,
                               opaque_rels=opaque,
                               host_prefiltered=host_prefiltered)
        if not cand:
            return False, False
        alias_t = getattr(self, "_last_alias_tables", {})
        # correlated-subquery virtual nodes: their reduction reaches
        # subquery occurrences through the shadowed view — value no
        # host bloom can express (TPC-H Q17's 2.5x); never cede
        if any(str(a).startswith("__sub")
               for op, _t in cand for a in (op.build, op.probe)):
            return False, False
        covered = self._orig_bloom_edges(query, cfg)
        if not covered:
            return False, False
        maxrows = max((r for r in (rows_base or {}).values() if r),
                      default=0.0)
        if maxrows <= 0:
            return False, False
        extra = 0.0
        for op, _tier in cand:
            pt = str(alias_t.get(op.probe, op.probe)).lower()
            bt = str(alias_t.get(op.build, op.build)).lower()
            if all((pt, str(pc).lower(), bt) in covered
                   for pc in op.probe_cols):
                continue
            pr = (rows_base or {}).get(op.probe) or float("inf")
            extra = max(extra, pr)
        if extra > cfg.cede_extra_probe_frac * maxrows:
            return False, False
        ride_off = False
        if cfg.cede_suppress_max_probe_rows > 0:
            alias_filters = getattr(self, "_last_alias_filters", {})
            mass = 0.0
            for op, _tier in cand:
                base = (rows_base or {}).get(op.probe, 0.0) or 0.0
                pri = 1.0
                for f in alias_filters.get(op.probe, ()):
                    try:
                        pri *= _pred_prior(str(f))
                    except Exception:
                        pri *= 0.2
                mass = max(mass, base * max(pri, 0.02))
            ride_off = mass <= cfg.cede_suppress_max_probe_rows
        return True, ride_off

    def _table_cols(self) -> dict:
        """table -> lowercase column-name set for every known table,
        used by native_bloom_edges to resolve a bloom side whose
        lineage spans several leaves (a shadowed reduced view). Cached
        on the Catalog, keyed by the table-name set — a table
        registered after the first arbitration re-enters the map
        instead of being skipped for the life of the session
        (ADVICE r9); schema reads are parquet-footer-only and the
        arbitration runs once per novel statement."""
        names = frozenset(self.catalog.known_tables())
        stamped = getattr(self.catalog, "_drpt_table_cols", None)
        if stamped is not None and stamped[0] == names:
            return stamped[1]
        cache = {}
        for t in sorted(names):
            # known_tables() lists the standard catalog; a fixture
            # dir may materialize only a subset (the JOB dir has no
            # part.parquet) — reading a missing one raised out of
            # _table_cols and silently disabled the arbitration for
            # EVERY query on that fixture (r9 in-round regression:
            # composed_dual_rf all-False at 100M)
            try:
                cache[t] = {c.lower()
                            for c in self.catalog.table(t).columns}
            except Exception:
                continue
        self.catalog._drpt_table_cols = (names, cache)
        return cache

    def _sync_native_rf(self, engaged: bool) -> None:
        """One mechanism per edge (config.suppress_native_rf): disable
        Spark's runtime bloom injection while a rewritten query is the
        latest planned one; restore the session's value when a query
        runs un-rewritten. Only called on the enabled-rewrite path, so
        benchmark legs that drive the conf directly (rpt/native/off
        ablations re-assert it before every leg) are never fought.

        The stashed conf value lives ON the SparkSession object (not on
        this Engine): the workload layer builds a fresh Engine per query
        (workload/common.py), so instance state would die between the
        engaged query that suppressed injection and the later
        un-engaged query that must restore it (ADVICE r5)."""
        key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
        try:
            if engaged:
                cur = self.spark.conf.get(key, "false")
                if cur == "true":
                    self.spark._drpt_rf_stash = cur
                    self.spark.conf.set(key, "false")
            else:
                stash = getattr(self.spark, "_drpt_rf_stash", None)
                if stash is not None:
                    self.spark.conf.set(key, stash)
                    self.spark._drpt_rf_stash = None
        except Exception:
            pass

    def _auto_transfer_sql(self, query: str, df: DataFrame,
                           cfg: RPTConfig) -> "DataFrame | None":
        import os

        from .plans.extract import extract_join_graph

        known = {t for t in self.catalog.known_tables()
                 if os.path.exists(self.catalog.path(t))}
        # statement-level extraction cache: the join graph is a pure
        # function of the query TEXT, the registered views, and their
        # SCHEMAS (never of table contents), and the py4j analyzed-plan
        # walk costs 30-170ms per statement — the entire rpt-vs-off gap
        # on sub-second TPC-H queries (Q2/Q11/Q14/Q16/Q19 at x100).
        # Every real engine caches this: DuckDB's prepared statements,
        # Spark's own analysis cache. The key carries a per-table file
        # fingerprint (path, mtime, size) so re-registering a same-named
        # fixture with different columns cannot replay a stale graph
        # (ADVICE r5). Shape bails (None) are sentinel-cached — a bail
        # must also be free on re-run — but transient extraction
        # failures are NOT (a one-off py4j hiccup must not disable the
        # rewrite for the session).
        from .plans.extract import TRANSIENT_BAIL

        from .catalog import _path_stamp

        # per-member fingerprint (catalog._path_stamp): a directory-backed
        # table whose member files are rewritten in place can leave the
        # directory's own mtime/size unchanged — os.stat on the dir alone
        # would serve a stale cached bail on changed data
        fp = tuple((t, self.catalog.path(t),
                    _path_stamp(self.catalog.path(t)))
                   for t in sorted(known))
        ck = (query, fp)
        #: read by _uncovered_rf_evidence — the dual-arbitration cache
        #: keys on the same statement+data fingerprint so a
        #: re-registered fixture cannot replay stale bloom evidence
        self._stmt_ck = ck
        if ck in _EXT_CACHE:
            ext = _EXT_CACHE[ck]
        else:
            ext = extract_join_graph(df, known)
            if ext is not TRANSIENT_BAIL:
                if len(_EXT_CACHE) >= 256:
                    _EXT_CACHE.pop(next(iter(_EXT_CACHE)))
                _EXT_CACHE[ck] = ext
        if ext is None or ext is TRANSIENT_BAIL:
            return None
        #: alias -> base table name, read by _uncovered_rf_evidence to
        #: compare native bloom edges with the applied ops' edges
        self._last_alias_tables = {a: i.table
                                   for a, i in ext.instances.items()}
        #: alias -> local-filter conjunct texts, read by the cession
        #: floor's shape priors (_pred_prior)
        self._last_alias_filters = {a: list(i.filters)
                                    for a, i in ext.instances.items()}
        # gate-bail cache: when this exact statement on this exact data
        # already went through reduce() under this config and EVERY op
        # was gated away, re-running the whole planning path (catalog
        # row counts, graph, schedule, gate evaluation) is pure driver
        # latency on a query the engine will not touch — ~0.3 s, the
        # dominant cost of repeated small JOB-regime queries after gate
        # 2d disengages them. Data changes invalidate via the mtime/size
        # fingerprints in ck; the config repr keys gate-relevant knobs.
        # The key also carries whether native injection is live for
        # this leg (the suppression stash): the cession arbitration's
        # bail depends on it, and one cfg serves both the rpt leg
        # (injection off — must engage) and the composed leg (injection
        # on — may cede); sharing their entries would replay one leg's
        # verdict into the other.
        rf_live = getattr(self.spark, "_drpt_rf_stash", None) == "true"
        bk = (ck, repr(cfg), rf_live)
        if _BAIL_CACHE.get(bk):
            # a bail-cache hit returns before reduce() runs, so the
            # PREVIOUS engaged query's persists (stashed on the session)
            # must be released here too, or repeated cached-bail
            # statements reintroduce the cross-query persist leak
            prev = getattr(self.spark, "_drpt_prev_result", None)
            if prev is not None:
                prev.release()
                self.spark._drpt_prev_result = None
            # replay the composed arbitration the first run decided
            cached = _BAIL_CACHE.get(bk)
            if cached == "dup":
                self._keep_rf_suppressed = True
            elif cached == "cede":
                self.last_cede = True  # plain bail path restores RF
            elif cached == "cede_off":
                self.last_cede = True
                self._cede_ride_off = True
                self._keep_rf_suppressed = True
            if cached in ("cede", "cede_off"):
                try:
                    self.spark._drpt_last_cede = (
                        "off" if cached == "cede_off" else "native")
                except Exception:
                    pass
            return None
        # correlated-scalar-subquery (DELIM) edges: the reference walks
        # LOGICAL_DELIM_JOIN as an edge source (rpt_optimizer.cpp:49-50)
        # so its transfer reaches the scan inside Q17-style correlated
        # aggregates. Our replay shadows the TABLE VIEW, which reaches
        # both occurrences at once — each recognized occurrence becomes
        # a virtual graph node + edge so the planner sees the topology;
        # soundness is enforced at shadow time (allowed-keys check).
        shared_tables = {t: groups for t, groups in ext.shared_sub.items()
                         if any(i.table == t and not i.protected
                                and ext.occurrences(t) == 1
                                for i in ext.instances.values())}
        virt_edges: list = []
        virt_rels: dict = {}
        for vi, (t, groups) in enumerate(sorted(shared_tables.items())):
            for gi, group in enumerate(groups):
                # one virtual node per subquery occurrence; one edge per
                # outer instance it correlates with
                valias = f"__sub{vi}_{gi}_{t}"
                virt_rels[valias] = Rel(t)
                by_outer: dict = {}
                for inner_col, oalias, ocol in group:
                    by_outer.setdefault(oalias, []).append(
                        (inner_col, ocol))
                for oalias, pairs in by_outer.items():
                    # "left" = only the virtual (inner) side may be
                    # reduced. The reverse direction — outer reduced by
                    # the subquery table's keys — is unsound when the
                    # scalar's consumption tolerates an empty group
                    # (COUNT(*) returns 0, not NULL; or `(SELECT ...)
                    # IS NULL`): those outer rows must SURVIVE having
                    # no inner match, exactly like an outer join's
                    # preserved side. Same discipline as the reference,
                    # whose delim joins preserve the probe side.
                    virt_edges.append(
                        (oalias, valias,
                         tuple(p[1] for p in pairs),
                         tuple(p[0] for p in pairs),
                         "left"))
        if len(ext.edges) + len(virt_edges) <= 1:
            return None
        # at least one relation must be substitutable (single-occurrence
        # table) for the rewrite to have any effect — e.g. a pure
        # self-join offers nothing to shadow
        if not any(ext.occurrences(i.table) == 1 and not i.protected
                   for i in ext.instances.values()):
            return None

        rels: dict = {}
        for alias, inst in ext.instances.items():
            d = self.table(inst.table).alias(alias)
            if inst.table in shared_tables:
                # a local filter baked into a shared-subquery table's
                # shadow would leak into the subquery's own scan and
                # change its groups; leave filters to the replayed SQL
                rels[alias] = Rel(inst.table, df=d)
                continue
            for f in inst.filters:
                d = d.filter(f)
            rels[alias] = Rel(inst.table, df=d,
                              prefiltered=bool(inst.filters))
        rels.update(virt_rels)
        # gate 2e input: which (probe, build) pairs does the HOST plan
        # already filter below the probe's first exchange? Read from the
        # un-rewritten physical plan (pure planning, no jobs). Probes
        # carrying shared-subquery/virtual edges are excluded: their
        # semi's reduction reaches the SUBQUERY occurrence through the
        # shadowed view — value the host's own join cannot deliver
        # (TPC-H Q17's 2.5x win is exactly that op).
        host_pre: "set | None" = None
        if cfg.skip_host_prefiltered_semi or cfg.skip_no_exchange_probe:
            from .plans.catalyst_order import scan_prefilter_pairs

            alias_paths = {}
            for alias, inst in ext.instances.items():
                try:
                    alias_paths[alias] = self.catalog.path(inst.table)
                except Exception:
                    pass
            # statement-level cache (the _EXT_CACHE rationale): the
            # pair evidence is a pure function of the query, the table
            # schemas/sizes and the planner confs — and computing it
            # forces a physical planning pass (~0.2-0.5 s) that
            # dominated repeated 1-2 s JOB queries. The broadcast
            # threshold joins the key because it decides which BHJs
            # exist at all.
            try:
                thresh = self.spark.conf.get(
                    "spark.sql.autoBroadcastJoinThreshold")
            except Exception:
                thresh = ""
            pk = (ck, thresh)
            if pk in _PREFILTER_CACHE:
                host_pre = _PREFILTER_CACHE[pk]
            else:
                host_pre = scan_prefilter_pairs(df, alias_paths)
                if len(_PREFILTER_CACHE) >= 256:
                    _PREFILTER_CACHE.pop(next(iter(_PREFILTER_CACHE)))
                _PREFILTER_CACHE[pk] = host_pre
            if host_pre:
                excl = ({v[0] for v in virt_edges}
                        | set(virt_rels)
                        | {a for a, i in ext.instances.items()
                           if i.table in shared_tables})
                host_pre = {(p, b, k) for p, b, k in host_pre
                            if p not in excl}
        # reduce() releases the previous query's persists at entry; nulling
        # last_result here instead would leak them for the life of the
        # session (CacheManager plan pollution — see reduce()'s docstring)
        def _cede(plan, dfs_, rows_est_, filtered_, rows_base_, nbr,
                  opq, hp):
            v, off = self._cede_verdict(query, cfg, plan, dfs_,
                                        rows_est_, filtered_,
                                        rows_base_, nbr, opq, hp)
            self._cede_ride_off = off
            return v

        red = self.reduce(rels, list(ext.edges) + virt_edges, cfg,
                          opaque=getattr(ext, "opaque", None),
                          host_prefiltered=host_pre,
                          cede_check=_cede)
        if getattr(self, "last_cede", False):
            # cession (config.cede_covered_edges): the host's lazy
            # blooms cover everything the ops would do — disengage.
            # Plain return restores injection (ride native) unless the
            # floor said the off plan is already minimal (ride off).
            if self._cede_ride_off:
                self._keep_rf_suppressed = True
            try:
                self.spark._drpt_last_cede = (
                    "off" if self._cede_ride_off else "native")
            except Exception:
                pass
            if len(_BAIL_CACHE) >= 512:
                _BAIL_CACHE.pop(next(iter(_BAIL_CACHE)))
            _BAIL_CACHE[bk] = ("cede_off" if self._cede_ride_off
                               else "cede")
            return None
        if self.last_result is None:
            if len(_BAIL_CACHE) >= 512:
                _BAIL_CACHE.pop(next(iter(_BAIL_CACHE)))
            _BAIL_CACHE[bk] = True
            return None  # planner bailed (gates / <=1 edge)
        if cfg.suppress_native_rf and not cfg.suppress_during_eager:
            # A/B path (config.suppress_during_eager=False): the eager
            # jobs above ran with injection live; suppress now so the
            # final-plan arbitration semantics stay identical
            self._sync_native_rf(engaged=True)

        # shadow each single-occurrence table whose relation the rewrite
        # actually reduced, re-analyze the same SQL against the shadows,
        # then restore the original views (analysis is eager, so the
        # returned DataFrame keeps the reduced plan). A shadow the
        # transfer measured as small carries an explicit broadcast hint
        # — the view keeps the hint through re-analysis, giving the SQL
        # path the same host-size feedback as join_all (a filtered dim's
        # static footer estimate otherwise plans a sort-merge join past
        # the broadcast threshold; see host_broadcast_rows)
        from pyspark.sql import functions as F

        # a broadcast hint on a view input only reaches that view's OWN
        # first join, where it beats Catalyst's size heuristic outright —
        # so hinting a mid-size reduced table whose join partner is even
        # smaller DISPLACES the natural small-side broadcast (measured at
        # TPCH_SCALE x100 Q3: the hint put 1.45M reduced-orders rows on
        # the build side of a join whose other input was 3k customers).
        # Hint only relations that are the smallest among their neighbors.
        nbr: dict = {}
        for e in ext.edges:
            nbr.setdefault(e.left, set()).add(e.right)
            nbr.setdefault(e.right, set()).add(e.left)
        def _shared_ops_ok(alias: str, groups: list) -> bool:
            """Every op applied to ``alias`` must be keyed exactly by
            the correlation columns of EVERY subquery occurrence —
            otherwise the shared view's reduction could change a
            subquery group some surviving outer row still references."""
            if self.last_result is None:
                return False
            for op in self.last_result.applied:
                if op.probe != alias:
                    continue
                pairs = set(zip(op.probe_cols, op.build_cols))
                for group in groups:
                    gset = {(ic, oc) for ic, oa, oc in group
                            if oa == op.build}
                    if not pairs <= gset:
                        return False
            return True

        shadowed = False
        try:
            for alias, inst in ext.instances.items():
                if (ext.occurrences(inst.table) == 1
                        and red[alias] is not rels[alias].df):
                    if (inst.table in shared_tables
                            and not _shared_ops_ok(
                                alias, shared_tables[inst.table])):
                        continue
                    shadow = red[alias]
                    rows = self.last_rows_est.get(alias, 0.0)
                    if (0.0 < rows <= self._host_broadcast_rows
                            and all(self.last_rows_est.get(n, float("inf"))
                                    >= rows for n in nbr.get(alias, ()))):
                        shadow = F.broadcast(shadow)
                    shadow.createOrReplaceTempView(inst.table)
                    shadowed = True
            if not shadowed:
                # all ops gated away (e.g. gate 2d on an all-broadcast
                # probe): deterministic for this statement+data+config,
                # so repeats skip the planning path entirely. When the
                # ONLY forward candidates lost died to the duplication
                # gates (2d/2e — the host's broadcast joins already do
                # the filtering), native runtime blooms would duplicate
                # the same joins too: the composed arbitration keeps
                # injection suppressed for this query (_keep_rf_
                # suppressed). Shuffle-economics drops (gates 2/2b/2b3,
                # incl. a refused sketch rescue) instead mean a shape
                # we could NOT serve scan-locally — there native's
                # subtree blooms stay welcome.
                lr = self.last_result
                dup_bail = (lr is not None and not lr.applied
                            and lr.drops.get("dup", 0) > 0
                            and not any(k in ("gate2", "gate2b",
                                              "gate2b3", "gate2c",
                                              "noop")
                                        for k in lr.drops))
                if dup_bail:
                    self._keep_rf_suppressed = True
                if len(_BAIL_CACHE) >= 512:
                    _BAIL_CACHE.pop(next(iter(_BAIL_CACHE)))
                _BAIL_CACHE[bk] = "dup" if dup_bail else True
                return None
            if (cfg.suppress_native_rf and cfg.compose_subtree_rf
                    and "empty" not in self.last_result.applied_tiers):
                # must run inside the shadow window: the evidence is
                # the REWRITTEN plan's bloom edges (see the docstring).
                # An empty-build cascade skips the pass outright: the
                # short-circuit leaves ~nothing for native to filter,
                # and the ~0.3 s planning pass was the whole composed
                # overhead on JOB jq24 (0.91 s vs rpt 0.33 s)
                self._dual_rf = self._uncovered_rf_evidence(query, cfg)
            return self.spark.sql(query)
        finally:
            self.catalog.register_views()

    # -- the rewrite ---------------------------------------------------

    def reduce(self, rels: dict, edges: list,
               config: RPTConfig | None = None,
               opaque: set | None = None,
               host_prefiltered: "set | None" = None,
               cede_check=None) -> dict:
        """Apply robust predicate transfer; returns alias -> reduced DF.

        ``cede_check`` (the SQL path's cession arbitration closure,
        config.cede_covered_edges) is invoked after scheduling but
        before ANY eager job, with the planned schedule and the same
        evidence apply_transfer would get; returning True makes reduce
        disengage — inputs returned untouched, ``self.last_cede`` set.

        Persisted build sides from the PREVIOUS reduce are released
        here: Spark's CacheManager substitutes any matching subplan
        with a leaked cached relation, so an unreleased persist from
        query N silently rewrites query N+1's scans (full-width
        InMemoryRelation instead of a pruned FileScan). One query's
        persists live exactly until the next query plans.
        """
        cfg = (config or self.config).validate()
        self.last_cede = False
        if self.last_result is not None:
            self.last_result.release()
            self.last_result = None
        # cross-instance release: the workload layer builds a fresh
        # Engine per query, so the PREVIOUS query's persists can belong
        # to an Engine this instance never saw — stashed on the session
        # (the _rf_stash pattern, ADVICE r5). Without it a long-lived
        # session accumulates one query's persisted builds per
        # execution, and CacheManager substitution plus storage-memory
        # pressure make repeat timings bimodal (Q5 at x1000 measured
        # 13 s with per-leg clearCache vs 32 s without).
        prev = getattr(self.spark, "_drpt_prev_result", None)
        if prev is not None:
            prev.release()
        self.spark._drpt_prev_result = None

        dfs: dict = {}
        nodes: list = []
        filtered: set = set()
        rows_est: dict = {}
        rows_base: dict = {}
        paths: dict = {}
        colocated: dict = {}
        for alias, spec in rels.items():
            if isinstance(spec, str):
                spec = Rel(spec)
            elif isinstance(spec, DataFrame):
                spec = Rel(alias, df=spec)
            df = spec.df if spec.df is not None else self.table(spec.name)
            base_rows = 0.0
            if self.catalog is not None:
                try:
                    # footer stats apply to df overrides too when they are
                    # (filtered) base tables, e.g. the auto-SQL path
                    base_rows = float(self.catalog.row_count(spec.name))
                    paths[alias] = self.catalog.path(spec.name)
                except Exception:
                    base_rows = 0.0
            if spec.filter is not None:
                df = df.filter(spec.filter)
            if spec.filter is not None or spec.prefiltered:
                filtered.add(alias)
                base_rows *= FILTER_SELECTIVITY
            dfs[alias] = df
            rows_est[alias] = base_rows
            # raw footer rows (no filter-selectivity guess): the
            # shuffle-tier selectivity gate's denominator
            rows_base[alias] = (base_rows / FILTER_SELECTIVITY
                                if alias in filtered else base_rows)
            if spec.colocated_on:
                colocated[alias] = frozenset(spec.colocated_on)
            nodes.append(TableNode(alias=alias, rows=base_rows,
                                   filtered=alias in filtered))

        # live handle: apply_transfer's observed counts flow through to
        # join_all's broadcast decisions without another stash. Gated on
        # cfg.enabled — host-size feedback is part of the extension
        # (cfg.enabled=False must reproduce native Spark exactly, or the
        # off leg of every benchmark stops being the reference baseline)
        if cfg.enabled and cfg.host_broadcast_rows > 0:
            self.last_rows_est = rows_est
            self._host_broadcast_rows = cfg.host_broadcast_rows
        else:
            self.last_rows_est = {}
            self._host_broadcast_rows = 0

        jedges = normalize_edges(edges)

        graph = JoinGraph.build(nodes, jedges)
        # reference bails out unchanged when the graph has <=1 edge
        # (rpt_optimizer.cpp:1592-1595)
        if not cfg.enabled or graph.n_edges() <= 1:
            return dfs
        # all-broadcast bail-out: when every relation but the largest fits
        # a broadcast, Catalyst's plan is already optimal (one fact pass,
        # no shuffle) and any transfer op is pure overhead
        if cfg.all_broadcast_bail_rows > 0 and len(rows_est) >= 2:
            ordered = sorted(rows_est.values())
            if ordered[-2] <= cfg.all_broadcast_bail_rows:
                return dfs

        import time as _time
        t_plan = _time.perf_counter()
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
        if cfg.display_physical_dag:
            # the DAG as derived from the host's actual join order,
            # boxed 2-D like the reference's PrintPhysicalPlanDAG
            # (rpt_optimizer.cpp:812-824, dag_printer.cpp:13-180)
            from .plans.catalyst_order import physical_alias_order
            from .plans.dag_print import render_boxes

            order = physical_alias_order(self.join_all(dfs, jedges), dfs)
            ptree = (execution_order_dag(graph, order,
                                         flip_roots=cfg.flip_roots)
                     if order is not None else tree)
            print(render_boxes(ptree, rows_est))

        planning_ms = (_time.perf_counter() - t_plan) * 1e3

        # join-graph neighborhood per alias, with the key columns each
        # edge uses on that alias: gate 2b3 keeps a shuffle-tier semi
        # only when the probe has a DIFFERENT-key edge to a
        # non-broadcastable neighbor (the reduction then shrinks a
        # second, otherwise-unavoidable exchange of the probe)
        neighbors: dict = {}
        neighbor_edges: dict = {}
        for e in graph.edges:
            neighbors.setdefault(e.left, set()).add(e.right)
            neighbors.setdefault(e.right, set()).add(e.left)
            neighbor_edges.setdefault(e.left, []).append(
                (e.right, tuple(e.left_cols)))
            neighbor_edges.setdefault(e.right, []).append(
                (e.left, tuple(e.right_cols)))
        degrees = {a: len(ns) for a, ns in neighbors.items()}

        if cede_check is not None and cede_check(
                plan, dfs, rows_est, filtered, rows_base,
                neighbor_edges, opaque or set(), host_prefiltered):
            # cession: hand the query to the host's native blooms —
            # nothing eager has run yet, nothing to release
            self.last_cede = True
            return dfs

        res = apply_transfer(dfs, rows_est, filtered, plan, cfg,
                             probe_paths=paths, colocated=colocated,
                             rows_base=rows_base, degrees=degrees,
                             neighbor_edges=neighbor_edges,
                             opaque_rels=opaque or set(),
                             host_prefiltered=host_prefiltered)
        res.planning_ms = planning_ms
        if cfg.profiling:
            # the reference prints its per-op summary at QueryEnd when
            # rpt_profiling is set (rpt_profiling.hpp:114-216)
            print(res.format_profile())
        self.last_result = res
        try:
            self.spark._drpt_prev_result = res
        except Exception:
            pass
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

        Size feedback into the host join: any non-anchor relation whose
        last_rows_est entry (observed by the transfer where it measured,
        filter-discounted footer estimate otherwise) is at or below
        ``host_broadcast_rows`` gets an explicit broadcast hint. This is
        what the static planner cannot do — it weighs a filtered dim at
        its full footer size, plans a sort-merge join, and shuffles the
        entire upstream join output (BUCKETED_r04's off-leg cost). Rows
        <= 0 mean "unknown" and are never hinted.
        """
        from pyspark.sql import functions as F

        edges = normalize_edges(edges)
        if not edges:
            raise ValueError("join_all needs at least one edge")

        def side(alias):
            df = dfs[alias]
            rows = self.last_rows_est.get(alias, 0.0)
            if 0.0 < rows <= self._host_broadcast_rows:
                return F.broadcast(df)
            return df

        joined = dfs[edges[0].left]
        included = {edges[0].left}
        pending = list(edges)
        while pending:
            progressed = False
            for e in list(pending):
                # one expr() round trip builds the whole conjunction
                # JVM-side; F.col(lc) == F.col(rc) per pair costs 3
                # py4j calls each and parses to the same unresolved
                # EqualTo attributes (plan-identical, construction-only)
                cond = F.expr(" AND ".join(
                    f"`{lc}` = `{rc}`"
                    for lc, rc in zip(e.left_cols, e.right_cols)))
                if e.left in included and e.right in included:
                    joined = joined.where(cond)
                    pending.remove(e)
                    progressed = True
                elif e.left in included:
                    joined = joined.join(side(e.right), cond, e.how)
                    included.add(e.right)
                    pending.remove(e)
                    progressed = True
                elif e.right in included:
                    how = {"left": "right", "right": "left"}.get(e.how, e.how)
                    joined = joined.join(side(e.left), cond, how)
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
