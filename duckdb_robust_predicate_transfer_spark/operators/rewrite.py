"""Apply a TransferPlan to live DataFrames.

This is the Spark-native re-expression of the reference's physical
CREATE_BF / USE_BF operator pair (physical_create_bf.cpp,
physical_use_bf.cpp):

- CREATE_BF materializes the build side and produces a Bloom filter
  -> here: ``build.select(keys).dropDuplicates()`` — an *exact* key
  set, i.e. a perfect Bloom filter (zero false positives), persisted
  when reused. AQE broadcasts small key sets automatically; we hint
  ``broadcast()`` when statistics say the build side is small.
- USE_BF probes the filter and drops non-joinable rows
  -> here: ``probe.join(keys, on, "left_semi")``.
- dynamic min/max scan pushdown (physical_create_bf.cpp:331-345)
  -> here: ``col BETWEEN lo AND hi`` predicates computed from the
  reduced build side; Catalyst pushes these into the Parquet scan
  (visible as PushedFilters), which is the distributed analogue of
  the reference's ConstantFilter-into-LogicalGet push.
- empty build side => always-false filter (physical_create_bf.cpp:
  290-297) -> here: ``probe.where(lit(False))`` short-circuit.
- the BF-as-table-filter push itself (rpt_optimizer.cpp:1401-1501,
  the probe SCAN dropping excluded data) has no pure-PySpark hook;
  the optional jvm/rpt-dsv2.jar closes it with a DSv2 scan whose
  SupportsRuntimeV2Filtering.filter() drops whole row groups against
  the runtime IN-set (certified in DSV2_RF_r04.json).

Ordering dependencies (the reference's cross-pipeline scheduling,
physical_create_bf.cpp:559-613) are free: a key-set is just a
DataFrame consumed by a later join, so Spark's scheduler sequences
the stages.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..config import RPTConfig
from ..plans.ir import TransferPlan, TransferOp

#: Spark atomic types eligible for min/max transfer. The reference pushes
#: min/max for 13 orderable types incl. VARCHAR (physical_create_bf.cpp:
#: 131-176); in Spark any orderable atomic type works.
_MINMAX_TYPES = (
    "tinyint", "smallint", "int", "integer", "bigint", "long",
    "float", "double", "date", "timestamp", "timestamp_ntz", "string",
)

#: estimated fraction of probe rows surviving one key-filter application.
#: Propagating this through the schedule is what lets a mid table reduced
#: by a selective dim qualify for the broadcast-key path on its own
#: downstream CREATE (the reference propagates estimated cardinality
#: through CREATE_BF the same way, table_manager.cpp:64-69).
REDUCTION_DECAY = 0.2


@dataclass
class StepStat:
    op: TransferOp
    rows_in: int = -1
    rows_out: int = -1
    build_rows: int = -1
    #: wall time of the eager min/max agg job (runs whenever the tier is
    #: active — the one transfer op that is not lazy)
    minmax_ms: float = 0.0
    #: wall time to materialize the build key set / bloom sketch
    #: (profiling only: forced with a count, like the reference's
    #: sink+finalize timers, rpt_profiling.hpp:16-90)
    build_ms: float = 0.0
    #: wall time of the forced probe-side count (profiling only — the
    #: probe op is lazy in production, fused into the consumer's stage)
    probe_ms: float = 0.0


@dataclass
class TransferResult:
    dfs: dict
    plan: TransferPlan
    stats: list = field(default_factory=list)
    persisted: list = field(default_factory=list)
    #: ops that actually landed a predicate/semi join on their probe
    #: (gate survivors) — lets callers audit WHICH keys reduced a
    #: relation, e.g. the shared-subquery shadow soundness check
    applied: list = field(default_factory=list)
    #: wall time spent in graph build + heuristic + scheduling (set by
    #: Engine.reduce — the reference's optimizer-time probe,
    #: rpt_profiling.hpp:16-40)
    planning_ms: float = 0.0
    #: tier each applied op landed as, parallel to ``applied``:
    #: "sketch" | "exact_broadcast" | "exact_shuffle" | "minmax" |
    #: "empty" — certification tooling reads it to attribute wins to
    #: the gate-2f rescue vs the ordinary tiers
    applied_tiers: list = field(default_factory=list)
    #: gate-name -> count of scheduled ops that gate dropped. "dup" =
    #: duplication economics (gates 2d/2e: the host plan performs the
    #: same filtering itself); Engine.sql's composed arbitration reads
    #: it — a query whose ONLY lost candidates were dup-drops is an
    #: all-BHJ shape where native runtime blooms duplicate the same
    #: joins too, so injection stays suppressed for it (JOB jq1/jq4/jq6
    #: measured native 0.6-1.3x of off on exactly these).
    drops: dict = field(default_factory=dict)

    def release(self):
        for df in self.persisted:
            try:
                df.unpersist()
            except Exception:
                pass
        self.persisted.clear()

    def format_profile(self) -> str:
        """Per-step and per-pass reduction summary — the analogue of the
        reference's rpt_profiling printed table (rpt_profiling.hpp:
        114-216: optimizer time, per-op rows in/out AND per-op timers,
        forward/backward rollups with % rows removed). Meaningful only
        when profiling was enabled."""
        lines = [f"planning: {self.planning_ms:.2f} ms",
                 "step  phase     build -> probe           build_rows"
                 "     rows_in    rows_out   removed"
                 "   minmax_ms  build_ms  probe_ms"]
        totals = {"forward": [0, 0, 0.0], "backward": [0, 0, 0.0]}
        for i, st in enumerate(self.stats):
            op = st.op
            pct = ""
            step_ms = st.minmax_ms + st.build_ms + st.probe_ms
            totals[op.phase][2] += step_ms
            if st.rows_in > 0 and st.rows_out >= 0:
                totals[op.phase][0] += st.rows_in
                totals[op.phase][1] += st.rows_out
                pct = f"{100.0 * (st.rows_in - st.rows_out) / st.rows_in:6.2f}%"
            edge = f"{op.build}({','.join(op.build_cols)}) -> {op.probe}"
            lines.append(
                f"{i:>4}  {op.phase:<8}  {edge:<24} {st.build_rows:>10}"
                f"  {st.rows_in:>10}  {st.rows_out:>10}   {pct:>7}"
                f"  {st.minmax_ms:>9.1f} {st.build_ms:>9.1f}"
                f" {st.probe_ms:>9.1f}")
        for phase, (tin, tout, tms) in totals.items():
            if tin or tms:
                pct = (f"{100.0 * (tin - tout) / tin:6.2f}%" if tin else "")
                lines.append(
                    f"      {phase:<8}  TOTAL{'':<20} {'':>10}  {tin:>10}"
                    f"  {tout:>10}   {pct:>7}  {tms:>29.1f}")
        return "\n".join(lines)


def _minmax_filter(probe: DataFrame, build: DataFrame, op: TransferOp,
                   probe_path: str | None = None):
    """Compute per-column min/max on the build side (one small agg job)
    and return (n_build_rows, between-predicate or None).

    When the probe is a base-table scan whose parquet footer range is
    known (free — no scan), a per-column predicate is attached ONLY if
    the build's range actually narrows it: on hash-uniform FKs the
    reduced build still spans the probe's whole key range, and a
    non-narrowing BETWEEN costs two comparisons per probe row while
    pruning zero row groups (measured on the cascade2 fixture:
    the useless min/max legs ate the entire transfer win). The
    reference attaches unconditionally because its in-process filters
    are free (physical_create_bf.cpp:331-345); ours are not."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    usable = _minmax_cols(build, op)
    for c in usable:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    row = build.agg(*aggs).collect()[0]
    n = row["__n"]
    if n == 0:
        return 0, None
    build_ranges = {c: (row[f"__min_{c}"], row[f"__max_{c}"])
                    for c in usable}
    return n, _range_pred(build_ranges, op, probe_path)


def _minmax_cols(build: DataFrame, op: TransferOp) -> list:
    """The build columns whose min/max can become a probe BETWEEN."""
    dtypes = dict(build.dtypes)
    return [c for c in op.build_cols if dtypes.get(c) in _MINMAX_TYPES]


def _probe_clustered(probe_path: str | None, probe_cols,
                     max_clustering: float) -> bool:
    """Payoff-possibility check for the eager min/max agg: at least one
    probe key column's row groups must be range-clustered (footer-only,
    cached). Unknown layouts pass — absence of evidence must not turn
    the tier off for non-parquet probes."""
    if max_clustering >= 1.0:
        return True
    if probe_path is None:
        return True
    from ..catalog import parquet_col_clustering

    saw_any = False
    for pc in probe_cols:
        try:
            c = parquet_col_clustering(probe_path, pc)
        except Exception:
            c = None
        if c is None:
            continue
        saw_any = True
        if c < max_clustering:
            return True
    return not saw_any


def _range_pred(build_ranges: dict, op: TransferOp,
                probe_path: str | None):
    """{build_col: (lo, hi)} -> probe BETWEEN predicate (or None),
    skipping any column whose build range does not narrow the probe's
    parquet footer range (see _minmax_filter's rationale)."""
    footer = {}
    if probe_path is not None:
        from ..catalog import parquet_col_range
        for pc in op.probe_cols:
            try:
                r = parquet_col_range(probe_path, pc)
            except Exception:
                r = None
            if r is not None:
                footer[pc] = r
    pred = None
    for bc, pc in zip(op.build_cols, op.probe_cols):
        if bc not in build_ranges:
            continue
        lo, hi = build_ranges[bc]
        if lo is None:
            continue
        pr = footer.get(pc)
        try:
            if pr is not None and lo <= pr[0] and hi >= pr[1]:
                continue  # cannot narrow the scan: skip the per-row cost
        except TypeError:
            # footer stats and Spark values can surface as different
            # Python types (bytes vs str for non-UTF8-annotated binary,
            # Decimal vs raw); an incomparable pair must degrade to
            # "attach the predicate", not abort the query
            pass
        p = F.col(pc).between(F.lit(lo), F.lit(hi))
        pred = p if pred is None else (pred & p)
    return pred


def _downstream_weight(alias: str, plan_ops, rows: dict) -> float:
    """Max footer-row count over ``alias`` and every probe reachable
    from it through scheduled build->probe chains (either pass) — the
    transitive value of reducing ``alias`` (a reduced mid-table feeds
    every later hop it builds for; gate 2f prices its rescue against
    this, not against the immediate probe alone: jq13's
    movie_company->title hop is paid for by castinfo, not by title;
    jq15's backward movie_keyword->title hop by movie_info)."""
    best = rows.get(alias, 0.0)
    seen = {alias}
    stack = [alias]
    while stack:
        a = stack.pop()
        for o in plan_ops:
            if o.build == a and o.probe not in seen:
                seen.add(o.probe)
                stack.append(o.probe)
                best = max(best, rows.get(o.probe, 0.0))
    return best


def _string_keys(df: DataFrame, cols) -> bool:
    """True when ANY of ``cols`` is string/binary-typed in ``df``.

    The bitmap probe tier's measured 4-5x per-row advantage over a
    broadcast-hash semi exists where the hash relation pays per-row
    string hashing + equality; integer keys probe a hash relation as
    cheaply as a bloom's bit-test, and the lazy semi additionally keeps
    AQE's integrated replanning (the r5/r6 sketch A/Bs' Q7 lesson).
    Unknown schemas return False: the exact tier is the certified
    default and escalation needs positive evidence."""
    try:
        types = {f.name.lower(): f.dataType.typeName()
                 for f in df.schema.fields}
        return any(types.get(str(c).lower()) in ("string", "binary")
                   for c in cols)
    except Exception:
        return False


def _sketch_tier(cfg, est: float) -> bool:
    """Does this build ship as a Bloom bitmap instead of exact keys?

    Two routes: the explicit opt-in (``use_sketch`` above
    ``sketch_threshold_rows``, the q_sketch_transfer surface) and the
    default auto-escalation (``sketch_auto``) for builds whose exact key
    set is too big to broadcast — there the alternative is a shuffled
    semi join that re-shuffles the whole probe, the measured
    TPCH_SCALE_X1000 Q3/Q8/Q9 downside, while the bitmap's membership
    test fuses into the probe scan (the reference's PTBloomFilter never
    shuffles the probe, physical_use_bf.cpp:128-190). Capped at
    ``sketch_max_keys``: an unknown (inf) or huge estimate keeps the
    exact tier."""
    if cfg.use_sketch and est > cfg.sketch_threshold_rows:
        return True
    return (cfg.sketch_auto and cfg.broadcast_key_rows < est
            and est <= cfg.sketch_max_keys)


def plan_candidates(dfs: dict, rows_est: dict, filtered: set,
                    plan: TransferPlan, cfg: RPTConfig,
                    rows_base: dict | None = None,
                    neighbor_edges: dict | None = None,
                    opaque_rels: set | None = None,
                    host_prefiltered: "set | None" = None) -> list:
    """Job-free dry run of ``apply_transfer``'s gate stack: which ops
    WOULD apply (and on which tier), using estimates only — no
    observation counts, no bloom builds, no min/max aggs, no persists.

    Feeds the cession arbitration (engine._cede_verdict): the decision
    whether to disengage and hand a query to native runtime blooms must
    come BEFORE any eager job runs, or the jobs it exists to avoid are
    already sunk. Divergence from the real pass is one-sided by
    construction: observation-driven drops (gate 2g, the rescue's
    post-observation re-checks) cannot be seen here, so the dry run may
    list a candidate the real pass would drop — which can only make the
    "extra reach" look bigger and REFUSE a cession, never fabricate
    one. Minmax-only applications are ignored (an op whose key tier is
    suppressed and whose only landing would be a BETWEEN predicate does
    not count as reach).

    Returns [(op, tier)] with tier in "exact_broadcast" |
    "exact_shuffle" | "sketch" | "empty"-free (no empty detection
    without jobs).
    """
    opaque_rels = opaque_rels or set()
    rows_est = dict(rows_est)
    rows_pre = dict(rows_est)
    reduced: set = set()
    out: list = []
    info: dict = {a: ({a} if (a in filtered
                              or not cfg.require_selective_build)
                      else set()) for a in dfs}
    scan_local: dict = {a: True for a in dfs}

    def _is_dsv2(alias: str) -> bool:
        try:
            return "rptparquet" in (
                dfs[alias]._jdf.queryExecution().analyzed().toString())
        except Exception:
            return True

    for op in plan.ops:
        est = rows_est.get(op.build, float("inf"))
        if not (info[op.build] - info[op.probe] - {op.probe}):
            continue
        if (op.build not in filtered and op.build not in reduced
                and (cfg.require_selective_build
                     or est > cfg.max_unfiltered_build_rows)):
            continue
        if (est > cfg.broadcast_key_rows
                and rows_est.get(op.probe, float("inf"))
                < cfg.min_probe_rows):
            continue
        if est > cfg.broadcast_key_rows and rows_base is not None:
            base = rows_base.get(op.build, 0.0)
            if base > 0 and est >= cfg.max_build_keep_frac * base:
                continue
        force_sketch = False
        if (cfg.skip_redundant_shuffle_semi
                and neighbor_edges is not None
                and est > cfg.broadcast_key_rows
                and not _sketch_tier(cfg, est)):
            others = neighbor_edges.get(op.probe, [])
            saves_exchange = any(
                n != op.build and set(cols) != set(op.probe_cols)
                and rows_est.get(n, float("inf")) > cfg.host_broadcast_rows
                for n, cols in others)
            if not saves_exchange:
                build_base = (rows_base or {}).get(op.build, 0.0) or est
                ok = (cfg.sketch_rescue
                      and est <= cfg.sketch_max_keys
                      and _string_keys(dfs[op.probe], op.probe_cols)
                      and (op.phase == "forward"
                           or rows_est.get(op.probe, float("inf"))
                           >= cfg.backward_min_probe_rows)
                      and scan_local.get(op.build, True)
                      and _downstream_weight(
                          op.probe, plan.ops, rows_base or rows_est)
                      >= cfg.sketch_rescue_probe_factor * build_base)
                if not ok:
                    continue
                force_sketch = True
        probe_big = (cfg.bloom_probe_min_rows > 0
                     and rows_est.get(op.probe, 0.0)
                     >= cfg.bloom_probe_min_rows
                     and _string_keys(dfs[op.probe], op.probe_cols))
        suppress_bf = False
        if (cfg.bf_benefit_probe_ratio > 0
                and cfg.filter_type != "minmax_only"
                and est <= cfg.broadcast_key_rows
                and not force_sketch
                and not _sketch_tier(cfg, est)):
            pre = rows_pre.get(op.build, est)
            if (pre > cfg.bf_cheap_keys
                    and rows_est.get(op.probe, float("inf"))
                    < cfg.bf_benefit_probe_ratio * pre):
                if probe_big and not _is_dsv2(op.probe):
                    force_sketch = True
                else:
                    suppress_bf = True
        if (not suppress_bf and cfg.skip_no_exchange_probe
                and cfg.host_broadcast_rows > 0
                and not any(o.build == op.probe and o.phase == "forward"
                            for o in plan.ops)
                and est <= cfg.broadcast_key_rows
                and not force_sketch
                and est <= cfg.host_broadcast_rows
                and not _sketch_tier(cfg, est)
                and op.probe not in opaque_rels
                and op.probe in (neighbor_edges or {})):
            others = [(n, cols) for n, cols in neighbor_edges[op.probe]
                      if n != op.build]
            crosses_exchange = any(
                rows_est.get(n, float("inf")) > cfg.host_broadcast_rows
                for n, _cols in others)
            host_really_filters = (host_prefiltered is None or any(
                p == op.probe and b == op.build
                and (k is None or set(op.probe_cols) <= k)
                for p, b, k in host_prefiltered))
            if (not crosses_exchange and host_really_filters
                    and not _is_dsv2(op.probe)):
                suppress_bf = True
        if (not suppress_bf and cfg.skip_host_prefiltered_semi
                and host_prefiltered
                and any(p == op.probe and b == op.build
                        and (k is None or set(op.probe_cols) <= k)
                        for p, b, k in host_prefiltered)
                and est <= cfg.broadcast_key_rows
                and not force_sketch
                and not _sketch_tier(cfg, est)
                and op.build not in reduced
                and not any(o.build == op.probe and o.phase == "forward"
                            for o in plan.ops)
                and cfg.backward_broadcast_only
                and rows_est.get(op.probe, 0.0)
                > 10 * cfg.broadcast_key_rows
                and not _is_dsv2(op.probe)):
            suppress_bf = True
        if (op.phase == "backward"
                and rows_est.get(op.probe, float("inf"))
                < cfg.backward_min_probe_rows):
            continue
        if (op.phase == "backward" and cfg.backward_broadcast_only
                and est > cfg.broadcast_key_rows and not force_sketch):
            continue
        if (op.phase == "backward" and cfg.host_broadcast_rows
                and rows_est.get(op.probe, float("inf"))
                <= cfg.host_broadcast_rows):
            continue
        if suppress_bf or cfg.filter_type == "minmax_only":
            continue
        sketch = _sketch_tier(cfg, est) or force_sketch or probe_big
        if sketch:
            tier = "sketch"
            scan_local[op.probe] = scan_local.get(op.probe, True)
        elif est > cfg.broadcast_key_rows:
            tier = "exact_shuffle"
            scan_local[op.probe] = False
        else:
            tier = "exact_broadcast"
        out.append((op, tier))
        reduced.add(op.probe)
        info[op.probe] |= info[op.build]
        if op.probe in rows_est:
            rows_est[op.probe] *= REDUCTION_DECAY
    return out


def apply_transfer(dfs: dict, rows_est: dict, filtered: set,
                   plan: TransferPlan, cfg: RPTConfig,
                   probe_paths: dict | None = None,
                   colocated: dict | None = None,
                   rows_base: dict | None = None,
                   degrees: dict | None = None,
                   neighbor_edges: dict | None = None,
                   opaque_rels: set | None = None,
                   host_prefiltered: "set | None" = None) -> TransferResult:
    """Execute the schedule over ``dfs`` (alias -> DataFrame), mutating a
    copy; returns reduced DataFrames plus optional per-step stats.
    ``probe_paths`` (alias -> parquet path) enables footer-range-aware
    min/max skipping for base-table probes. ``colocated``
    (alias -> frozenset of bucket columns) marks relations whose join on
    those columns is already exchange-free — transfer along such an edge
    is skipped (Rel.colocated_on). ``rows_base`` (alias -> raw footer
    rows, no filter guesses) feeds the shuffle-tier selectivity gate.
    ``neighbor_edges`` (alias -> list of (neighbor alias, key cols on
    this alias)) feeds the exchange-saving gates 2b3 and 2d.
    ``opaque_rels`` marks aliases whose final plan holds joins the edge
    graph cannot see (anti / full outer) — gate 2d never suppresses
    transfer into them. ``host_prefiltered`` ((probe, build) pairs the
    host plan already filters below the probe's first exchange,
    plans/catalyst_order.scan_prefilter_pairs) feeds gate 2e."""
    probe_paths = probe_paths or {}
    colocated = colocated or {}
    opaque_rels = opaque_rels or set()
    #: alias -> probe scan is the DSv2 rptparquet source (computed
    #: lazily, once per alias): a broadcast semi into a key-prunable
    #: scan pays AT THE SCAN (runtime row-group pruning, cold IO) with
    #: no downstream exchange needed, so gate 2d exempts it
    dsv2_probe: dict = {}

    def _is_dsv2(alias: str) -> bool:
        if alias not in dsv2_probe:
            try:
                dsv2_probe[alias] = "rptparquet" in (
                    dfs[alias]._jdf.queryExecution().analyzed().toString())
            except Exception:
                dsv2_probe[alias] = True  # unknown: do not suppress
        return dsv2_probe[alias]
    dfs = dict(dfs)
    res = TransferResult(dfs=dfs, plan=plan)

    def _drop(reason: str) -> None:
        res.drops[reason] = res.drops.get(reason, 0) + 1
    reduced: set = set()
    #: pre-decay estimates: local-filter selectivity only, updated by
    #: OBSERVED counts (min/max agg, bloom build) but never by the fixed
    #: semi-reduction decay guess — the conservative key-count figure
    #: for the broadcast-benefit gate (decay undershot Q3's true key
    #: count 2.4x at TPCH_SCALE x100)
    rows_pre: dict = dict(rows_est)
    #: (build alias, build_cols, reduction epoch) -> keys DataFrame; when
    #: one build side feeds several probes on the same columns (a column
    #: equivalence class, e.g. nation.n_nationkey into both customer and
    #: supplier), build the key set once and share the broadcast — the
    #: reference's one-CREATE-per-class broadcast, rpt_optimizer.cpp:
    #: 1070-1158. The epoch (number of reductions applied to the build so
    #: far) keys the cache so a later, further-reduced build is not
    #: served a stale key set.
    epochs: dict = {}
    keys_cache: dict = {}
    #: same sharing for the bitmap tier: one build feeding several
    #: probes on the same columns builds the bloom once
    bloom_cache: dict = {}

    # stacked-CREATE merge (the analogue of BuildStackedBFOperators,
    # rpt_optimizer.cpp:1174-1216: adjacent CREATEs over one table share
    # ONE materialization pass building n filters): a build side feeding
    # several DIFFERENT column sets is persisted at first use regardless
    # of the size bound, so each extra key set reads the materialized
    # rows instead of re-running the build's reduction lineage.
    colsets: dict = {}
    for op in plan.ops:
        colsets.setdefault(op.build, set()).add(op.build_cols)
    multi_filter_builds = {b for b, cs in colsets.items() if len(cs) > 1}

    #: alias -> set of aliases whose base filters have influenced it via
    #: applied ops (itself included when base-filtered). An op only
    #: carries NEW information when the build knows something the probe
    #: doesn't — otherwise it is a provable no-op: e.g. after forward
    #: lineitem->orders, the backward orders->lineitem hop removes
    #: exactly 0 rows (every kept lineitem orderkey is, by construction,
    #: in the kept orders), yet costs a full pass over the fact's
    #: lineage (measured 0.00% removed for ~10 s at TPCH_SCALE 100x).
    #: The reference schedules such ops too, but its in-process filters
    #: are ~free; Spark's cost real jobs, so provable no-ops must die.
    #: (Pure FK-orphan removal is intentionally not modeled as
    #: information — that is gate 1's require_selective_build.)
    #: identity counts as information only when FK-orphan-removal ops
    #: are enabled (require_selective_build=False, the reference's
    #: always-transfer mode): an unfiltered build can then still remove
    #: probe rows with no matching build row at all.
    info: dict = {a: ({a} if (a in filtered
                              or not cfg.require_selective_build)
                      else set()) for a in dfs}

    #: builds whose rows were observed exactly this schedule (count paid)
    observed: set = set()
    #: the subset observed BY GATE 2g (weak-build observation): the
    #: keep-frac drop below prices only these — a build observed via
    #: gate 0b's near-boundary tiering or the 2f rescue's backward path
    #: keeps its r8 behavior, and weak_observe_max_base=0 genuinely
    #: disables the whole feature (ADVICE r9)
    observed_weak: set = set()

    #: alias -> its reduction lineage is scan-local (no shuffled semi
    #: applied to it): broadcast semis, bloom probes, min/max BETWEENs
    #: and empty-build short-circuits all fuse into the relation's own
    #: scan stage, so an eager job over the lineage (gate 2f's observe
    #: count / bloom build) costs one scan and no exchange. A shuffled
    #: semi breaks that — re-deriving it eagerly pays a full exchange,
    #: which is the r6 sketch-regime Q7 loss (SKETCH_REGIME_r06).
    scan_local: dict = {a: True for a in dfs}

    for op in plan.ops:
        build, probe = dfs[op.build], dfs[op.probe]
        est = rows_est.get(op.build, float("inf"))

        # 0. information gate: skip ops that provably cannot remove rows
        if not (info[op.build] - info[op.probe] - {op.probe}):
            _drop("info")
            continue

        # 0b. near-boundary tier observation (config.observe_est_factor):
        # a guessed estimate just above the broadcast ceiling may hide a
        # genuinely broadcastable key set (x300 Q10: guess 9M, actual
        # 1.7M — the difference between a scan-fused broadcast semi and
        # re-shuffling the 60M-row probe). Pay one scan+filter count on
        # UNREDUCED filtered builds only (a reduced build's lineage is a
        # real join; its ops already run on observed/decayed figures),
        # then let every gate below see the exact number.
        if (cfg.observe_est_factor > 0 and op.build not in reduced
                and op.build in filtered and op.build not in observed
                and cfg.broadcast_key_rows < est
                <= cfg.observe_est_factor * cfg.broadcast_key_rows):
            observed.add(op.build)
            est = float(build.count())
            rows_est[op.build] = est
            rows_pre[op.build] = est

        # bounded-downside gates — the robustness margin the reference
        # lacks (it always applies when >1 edge; its in-process filters
        # are ~free, ours cost real Spark exchanges):
        # 1. an unfiltered, never-reduced build side only removes
        #    FK-orphan probe rows — skip unless allowed
        if (op.build not in filtered and op.build not in reduced
                and (cfg.require_selective_build
                     or est > cfg.max_unfiltered_build_rows)):
            _drop("gate1")
            continue
        # 2g. weak-build observation (config.weak_observe_max_base):
        #     a local filter's true selectivity is unproven — LIKE
        #     '%Pictures%' keeps 100% where the decay guess says 20% —
        #     so for dim-sized bases pay one scan+filter count and
        #     apply gate 2b's keep-frac rule to EVERY tier: a build
        #     still holding most of its domain removes almost nothing
        #     while its eager key-set jobs are real (JOB jq17/jq23).
        #     Dropping here (not "dup") leaves native runtime blooms
        #     welcome on the edge: the composed arbitration hands weak
        #     arms to the host's lazy AQE-planned blooms.
        if (cfg.weak_observe_max_base > 0 and rows_base is not None
                and op.build not in reduced and op.build in filtered
                and op.build not in observed
                and cfg.weak_observe_min_base
                <= rows_base.get(op.build, 0.0)
                <= cfg.weak_observe_max_base):
            observed.add(op.build)
            observed_weak.add(op.build)
            est = float(build.count())
            rows_est[op.build] = est
            rows_pre[op.build] = est
        if (op.build in observed_weak and op.build not in reduced
                and rows_base is not None):
            bb = rows_base.get(op.build, 0.0)
            if bb > 0 and est >= cfg.max_build_keep_frac * bb:
                _drop("gate2g")
                continue
        # 2. transfer only into probes big enough to repay an exchange —
        #    but ONLY for shuffle-tier builds. A broadcast-tier build
        #    (est <= broadcast_key_rows) costs no exchange at all: the
        #    semi join rides the probe's own scan stage as a broadcast
        #    hash join, exactly like the reference's free in-process
        #    filters. Skipping those breaks the CASCADE: an unreduced
        #    tiny dim (supplier, customer) then fails gate 1 as a build
        #    side and its parent's selective filter (the nation gate in
        #    TPC-H Q5/Q7/Q8/Q9) never reaches the fact tables — measured
        #    at TPCH_SCALE 100x as the whole rpt-leg regression.
        if (est > cfg.broadcast_key_rows
                and rows_est.get(op.probe, float("inf"))
                < cfg.min_probe_rows):
            _drop("gate2")
            continue
        # 2b. shuffle-tier builds must also be SELECTIVE: the op costs a
        #     distinct-key shuffle + a shuffled semi join + (big probes)
        #     an eager min/max job, so a build side still holding most
        #     of its base table can only remove a minority of probe rows
        #     — bounded downside says skip it. Broadcast-tier builds are
        #     exempt (free), as is any build with no footer baseline.
        if (est > cfg.broadcast_key_rows and rows_base is not None):
            base = rows_base.get(op.build, 0.0)
            if base > 0 and est >= cfg.max_build_keep_frac * base:
                _drop("gate2b")
                continue
        # 2b2/2b3. a shuffled semi never SAVES an exchange of the probe:
        #      it shuffles the probe's full current rows by the op keys —
        #      the same exchange the final probe<->build join pays — and
        #      only reduces per-row work downstream. It is therefore
        #      redundant unless the reduction reaches ANOTHER exchange:
        #      the probe must have a different join edge (different keys,
        #      different neighbor) whose other side is itself too big to
        #      broadcast, i.e. the final plan will shuffle the probe
        #      AGAIN and the semi shrinks that second shuffle. Only
        #      scan-local tiers (broadcast, sketch) can land a reduction
        #      BEFORE the first exchange, the way the reference's
        #      in-process filters always do. r5 shipped the degree-1
        #      special case (Q3/Q10); the r6 clean-room A/B generalized
        #      it: on EVERY full-22 x1000 query with a shuffle-tier op
        #      the no-shuffle-semi leg was faster (Q5 13.8->11.1s,
        #      Q7 10.7->5.5s, Q8 13.6->10.3s, Q17 7.4->6.4s vs off
        #      30.3/15.1/14.3/14.2) — their downstream joins are all
        #      broadcast dims, so the "reduction feeds the probe's other
        #      joins" rationale priced at zero exchanges saved.
        force_sketch = False
        rescue_post_check = False
        if (cfg.skip_redundant_shuffle_semi
                and neighbor_edges is not None
                and est > cfg.broadcast_key_rows
                and not _sketch_tier(cfg, est)):
            others = neighbor_edges.get(op.probe, [])
            saves_exchange = any(
                n != op.build and set(cols) != set(op.probe_cols)
                and rows_est.get(n, float("inf")) > cfg.host_broadcast_rows
                for n, cols in others)
            if not saves_exchange:
                # gate 2f: subtree sketch rescue (config.sketch_rescue)
                # — the hop is otherwise LOST, and with it the
                # transitive selectivity of the build's whole reduced
                # subtree (the jq10/jq11/jq13 gap vs native's
                # subtree-built blooms, JOB_REGIME_r07). Re-express it
                # scan-locally when the guards hold; never replace a
                # live shuffled semi (the r6 sketch_auto mistake).
                # both passes are eligible: a backward hop whose
                # observed build turns out broadcast-tier (jq15's
                # 234-key movie_keyword after its kw semi) passes gate
                # 3a below on the observed number; one that stays
                # shuffle-tier is still killed there (the r6 lesson —
                # an eager bloom over the root's lineage never pays)
                build_base = (rows_base or {}).get(op.build, 0.0) or est
                ok = (cfg.sketch_rescue
                      and est <= cfg.sketch_max_keys
                      # string/binary probe keys only — the rescue's
                      # repay is the probe join's PER-ROW cost (string
                      # hashing + equality on every surviving row),
                      # which the pre-exchange cut removes; integer-key
                      # joins are too cheap per row to repay an eager
                      # bloom over a 100M+-row build lineage (measured
                      # in-round at x1000: the unconditioned rescue
                      # planted orders->lineitem on Q3/Q10 and
                      # lineitem->orders on Q7, turning Q7's 2.8x win
                      # into 0.89x via 15-31 s eager builds; the JOB
                      # wins jq10/jq11/jq13 are all string-key)
                      and _string_keys(probe, op.probe_cols)
                      # gate 3's observation-independent backward check,
                      # hoisted so a doomed hop never pays the count
                      and (op.phase == "forward"
                           or rows_est.get(op.probe, float("inf"))
                           >= cfg.backward_min_probe_rows)
                      and scan_local.get(op.build, True)
                      and _downstream_weight(
                          op.probe, plan.ops, rows_base or rows_est)
                      >= cfg.sketch_rescue_probe_factor * build_base)
                if not ok:
                    _drop("gate2b3")
                    continue
                # PERSIST the build: its materialization (selective
                # by gate 2b, so small) makes the bloom build plus the
                # final join read the cached rows instead of
                # re-deriving the multi-million-row scan-local lineage
                # once each (measured on jq13: 3 extra 12.5M-row
                # movie_company scans behind a 124k-row reduction).
                # Released with the schedule's other persists on the
                # next reduce().
                if (op.phase == "forward" and op.build not in observed):
                    # forward rescue goes straight to the bitmap: the
                    # bloom build's word-count totals the observed
                    # cardinality for free (_build_once), so a
                    # separate count scan would only duplicate it;
                    # weakness/overflow are re-checked post-build and
                    # the probe withheld then (rescue_post_check)
                    if (cfg.persist_reduced
                            and build not in res.persisted):
                        build = build.persist()
                        dfs[op.build] = build
                        res.persisted.append(build)
                    force_sketch = True
                    rescue_post_check = True
                else:
                    # backward hops must PROVE broadcast-tier — gate 3a
                    # reads the observed number (an eager bitmap over a
                    # shuffle-tier ROOT lineage is the r6-documented
                    # loser); already-observed builds re-tier for free
                    if op.build not in observed:
                        observed.add(op.build)
                        if (cfg.persist_reduced
                                and build not in res.persisted):
                            build = build.persist()
                            dfs[op.build] = build
                            res.persisted.append(build)
                        est = float(build.count())
                        rows_est[op.build] = est
                        rows_pre[op.build] = est
                    else:
                        est = rows_est.get(op.build, est)
                    # re-check size and selectivity on the OBSERVED
                    # count: a weak build (keeps >= max_build_keep_frac
                    # of its base) cuts too little to repay the eager
                    # bloom build (jq7's 50%-country company arm), and
                    # an over-large one is beyond the bitmap's
                    # broadcast ceiling
                    if est > cfg.sketch_max_keys:
                        _drop("gate2b3")
                        continue
                    if (rows_base is not None and build_base > 0
                            and est >= cfg.max_build_keep_frac
                            * build_base):
                        _drop("gate2b3")
                        continue
                    # est == 0 rides the sketch branch too: its
                    # empty-build short-circuit (probe WHERE false) is
                    # the reference's always-false filter
                    # (physical_create_bf.cpp:290-297), and the
                    # broadcast-tier gates below must not reclaim the
                    # op (a zero-key build duplicates no host join)
                    force_sketch = (est > cfg.broadcast_key_rows
                                    or est == 0)
        # 2c. broadcast-tier benefit gate: BroadcastExchange collects the
        #     key set to the driver and builds the hash relation single-
        #     threaded, so a MID-SIZE key set (above bf_cheap_keys) is a
        #     real fixed cost — require the probe to dwarf it. Priced on
        #     the PRE-DECAY build estimate: the per-semi decay is a fixed
        #     0.2 guess that can undershoot the true key count severalfold
        #     and sneak an expensive build under the bar (TPC-H Q3 at
        #     x100/x300, the r4 bounded-downside break). Minmax-only mode
        #     ships no keys, and the sketch tier's parallel JVM build +
        #     bitmap broadcast has no driver hash relation — both exempt.
        #     Failing this gate suppresses ONLY the key-set tier: the
        #     minmax tier ships two scalars per column (no driver hash
        #     relation) and is separately payoff-checked below
        #     (clustering + base-size bounds), so it must not be lost
        #     with the keys (ADVICE r5).
        #: probe-side tier choice (config.bloom_probe_min_rows): on a
        #: huge probe the per-row filter cost IS the op, and the
        #: bitmap's bit-tests are 4-5x cheaper than a broadcast-hash
        #: semi's hash lookups — but ONLY for string/binary keys, where
        #: the hash relation pays per-row string hashing + equality
        #: (measured, 50M-row string-key fact). On integer keys the
        #: broadcast-hash semi's lookup is as cheap as the bit-test AND
        #: stays lazy inside AQE's replanning, which the eager bitmap
        #: build forfeits — the r5/r6 clean-room sketch A/Bs measured
        #: exactly that as Q7's win turning into a loss (SKETCH_AB_r05,
        #: SKETCH_REGIME_r06), and the unconditioned escalation
        #: reproduced it at x1000 (Q7 6.3->19.0 s, Q3/Q10 engaging ops
        #: gate 2c used to drop — the r8 in-round regression).
        probe_big = (cfg.bloom_probe_min_rows > 0
                     and rows_est.get(op.probe, 0.0)
                     >= cfg.bloom_probe_min_rows
                     and _string_keys(probe, op.probe_cols))
        suppress_bf = False
        dup_evidence = False  # suppression specifically by gates 2d/2e
        if (cfg.bf_benefit_probe_ratio > 0 and cfg.filter_type != "minmax_only"
                and est <= cfg.broadcast_key_rows
                and not force_sketch
                and not _sketch_tier(cfg, est)):
            pre = rows_pre.get(op.build, est)
            if (pre > cfg.bf_cheap_keys
                    and rows_est.get(op.probe, float("inf"))
                    < cfg.bf_benefit_probe_ratio * pre):
                if probe_big and not _is_dsv2(op.probe):
                    # the bitmap ships no driver hash relation — gate
                    # 2c's fixed cost vanishes, so escalate the tier
                    # instead of losing the op
                    force_sketch = True
                else:
                    suppress_bf = True
        # 2d. exchange-benefit gate for the BROADCAST tier (gate 2b3's
        #     insight one tier down): when every other neighbor of the
        #     probe is itself broadcastable, the final plan joins the
        #     probe with broadcast-hash joins only — which drop misses
        #     at the same per-row hash cost our semi pays — so the semi
        #     duplicates work row for row and adds its build jobs on
        #     top (JOB-regime jq1/jq4: 0.6-0.7x on 1-2 s queries whose
        #     dims all broadcast). Reduction pays only when it crosses
        #     an exchange: keep the semi if ANY other neighbor is too
        #     big to broadcast (a shuffle join of the probe exists), if
        #     the probe holds plan edges the graph cannot see
        #     (anti/full outer -> opaque), or if the probe scan is
        #     key-prunable (DSv2: the reduction lands IN the scan).
        #     The min/max tier is exempt as in gate 2c — it prunes the
        #     scan itself and is separately payoff-checked.
        #     CASCADE GUARD: never suppress an op whose probe is the
        #     BUILD of a later forward op — reduction through an
        #     intermediate dim is transitive (Q5: region->nation looks
        #     all-broadcast locally, but reduced nation is what shrinks
        #     customer, then orders, then lineitem; suppressing the hop
        #     collapsed the whole cascade, x1000 subset recheck). A
        #     probe no forward op ever builds from (a terminal fact:
        #     jq1's movie_company, a star fact) has no transitive value
        #     — only there can local all-broadcast duplication hold.
        if (not suppress_bf and cfg.skip_no_exchange_probe
                and cfg.host_broadcast_rows > 0
                and not any(o.build == op.probe and o.phase == "forward"
                            for o in plan.ops)
                and est <= cfg.broadcast_key_rows
                and not force_sketch
                # the build itself may be broadcast-SEMI-able for us yet
                # too big for the HOST to broadcast in the final join —
                # that join is then a shuffle of the probe, and the semi's
                # reduction lands before it: a crossed exchange, keep
                and est <= cfg.host_broadcast_rows
                and not _sketch_tier(cfg, est)
                and op.probe not in opaque_rels
                and op.probe in (neighbor_edges or {})):
            others = [(n, cols) for n, cols in neighbor_edges[op.probe]
                      if n != op.build]
            crosses_exchange = any(
                rows_est.get(n, float("inf")) > cfg.host_broadcast_rows
                for n, _cols in others)
            # SQL-path refinement (r8): gate 2d's graph estimates model
            # the plan join_all would build (size-hinted BHJs), but the
            # REPLAYED host plan broadcasts by Catalyst's STATIC
            # sizeInBytes, which ignores filter selectivity — a
            # year-filtered 60MB title stays SMJ, the probe fact pays
            # its full shuffle map-write, and the suppressed semi was
            # the only thing that could have landed the reduction
            # before it (JOB jq13: castinfo's 50M-row exchange behind a
            # suppressed title->castinfo hop; native's subtree bloom
            # wins exactly by filtering that write). When host-plan
            # evidence exists, suppression additionally requires the
            # host to REALLY pre-filter this pair below the probe's
            # first exchange — the same certainty bar as gate 2e.
            host_really_filters = (host_prefiltered is None or any(
                p == op.probe and b == op.build
                and (k is None or set(op.probe_cols) <= k)
                for p, b, k in host_prefiltered))
            if (not crosses_exchange and host_really_filters
                    and not _is_dsv2(op.probe)):
                suppress_bf = True
                dup_evidence = True
        # 2e. host-prefiltered duplication: the un-rewritten host plan
        #     already inner-BHJ-joins this build into the probe's scan
        #     pipeline below the probe's first shuffle — same rows
        #     dropped, same per-row hash cost, same pre-exchange
        #     position — so the semi duplicates it even though the
        #     probe crosses an exchange later (Q9's part->lineitem at
        #     x1000: the one residual gate 2d's graph-only evidence
        #     could not see). Guards: forward-cascade as in 2d; the
        #     BUILD must not itself carry transfer reductions (a
        #     cascade INTO the build means the semi filters on
        #     already-reduced keys the host's bare-table BHJ cannot
        #     express — ADVICE r7); the host join's probe-side keys
        #     must cover the op's probe columns (unknown keys = no
        #     suppression); probe huge enough (10x broadcast_key_rows)
        #     that any backward op building from it stays shuffle-tier,
        #     which gate 3a (backward_broadcast_only) already skips —
        #     so no transitive reduction is lost; DSv2 probes keep the
        #     op (scan-local reduction is strictly cheaper than the
        #     host join). The engine excludes shared-subquery/virtual
        #     probes before handing over the pairs (config docstring).
        if (not suppress_bf and cfg.skip_host_prefiltered_semi
                and host_prefiltered
                and any(p == op.probe and b == op.build
                        and (k is None or set(op.probe_cols) <= k)
                        for p, b, k in host_prefiltered)
                and est <= cfg.broadcast_key_rows
                and not force_sketch
                and not _sketch_tier(cfg, est)
                and op.build not in reduced
                and not any(o.build == op.probe and o.phase == "forward"
                            for o in plan.ops)
                and cfg.backward_broadcast_only
                and rows_est.get(op.probe, 0.0)
                > 10 * cfg.broadcast_key_rows
                and not _is_dsv2(op.probe)):
            suppress_bf = True
            dup_evidence = True
        if suppress_bf and cfg.filter_type == "bf_only":
            _drop("dup" if dup_evidence else "gate2c")
            continue  # no minmax tier to fall back to
        # 3. backward ops need an even bigger probe: the forward pass
        #    already reduced the root, so the marginal win is smaller
        if (op.phase == "backward"
                and rows_est.get(op.probe, float("inf"))
                < cfg.backward_min_probe_rows):
            _drop("gate3")
            continue
        # 3a. shuffle-tier backward hops are opt-in (see config docstring)
        if (op.phase == "backward" and cfg.backward_broadcast_only
                and est > cfg.broadcast_key_rows):
            _drop("gate3a")
            continue
        # 3b. benefit gate: a probe whose reduced size already fits the
        #     host broadcast hint will be BROADCAST in the final join —
        #     reducing it further cannot convert row savings into
        #     shuffle savings (it only trims a hash table the host
        #     builds once), while the backward key-set re-derives the
        #     root's reduced lineage: a full extra pass over the
        #     biggest table. The forward cascade is exempt — its
        #     reductions feed the NEXT hop's build regardless of how
        #     the final join consumes the probe. Scale-adaptive via the
        #     min/max jobs' observed-rows feedback (rows_est is the
        #     measured count once a relation has served as a build
        #     side): at cluster scale a still-huge probe stays above
        #     the bar and the backward pass engages. Measured at
        #     TPCH_SCALE 100x: Q7 rpt 10.6s -> 4.2s with the backward
        #     legs' broadcastable probes skipped, no cascade-fixture
        #     regression (the cascade's backward ops target facts).
        if (op.phase == "backward" and cfg.host_broadcast_rows
                and rows_est.get(op.probe, float("inf"))
                <= cfg.host_broadcast_rows):
            _drop("gate3b")
            continue
        # 4. both endpoints declared bucketed on this edge's keys: the
        #    join is already exchange-free, and transfer along it only
        #    adds probe work (measured: BUCKETED_r03.json)
        if (colocated.get(op.build) == frozenset(op.build_cols)
                and colocated.get(op.probe) == frozenset(op.probe_cols)):
            _drop("gate4")
            continue

        st = StepStat(op=op)
        if cfg.profiling:
            st.rows_in = probe.count()
            st.build_rows = build.count()

        # persist a build side that was itself reduced: it feeds the
        # key-set job(s) AND the final join (the analogue of CREATE_BF's
        # materialize-and-re-emit, physical_create_bf.cpp:201-242,441-557).
        # Tiny builds recompute for free — persist only above the bound.
        # Sketch-tier builds measured FASTER without a forced persist
        # here: the bloom aggregation needs only the key columns, so a
        # column-pruned recompute of the reduction lineage beats
        # materializing the build's full (wide) row payload.
        sketch_tier = (cfg.filter_type in ("all", "bf_only")
                       and (_sketch_tier(cfg, est) or force_sketch
                            or (probe_big and not suppress_bf
                                and not _is_dsv2(op.probe))))
        if (cfg.persist_reduced and op.build in reduced
                and (est >= cfg.persist_min_rows
                     or op.build in multi_filter_builds)
                and build not in res.persisted):
            build = build.persist()
            dfs[op.build] = build
            res.persisted.append(build)

        # min/max pushdown is an *eager* driver-side agg job per op; it
        # only pays when the probe side is a big scan whose PushedFilters
        # benefit (the reference pushes unconditionally because its
        # filters are free in-process; ours cost a Spark job)
        probe_est = rows_est.get(op.probe, float("inf"))
        empty = False
        #: did any predicate / semi join actually land on the probe? A
        #: provable no-op (minmax range prunes nothing, no bf tier) must
        #: NOT mark the probe reduced or propagate info — the later
        #: information gate would then skip ops that could still prune
        #: (ADVICE r4)
        applied = False
        tier = "minmax"
        # ... and only from broadcast-tier builds (unless minmax_only is
        # forced): a shuffle-tier build's eager agg re-derives a
        # multi-million-row lineage for a range that, on hash-uniform
        # FKs, never narrows the probe footer anyway (measured at
        # TPCH_SCALE 100x: 3.6 s agg, predicate dropped by the footer
        # skip, zero pruning). Builds that carry range-correlated
        # filters are precisely the small, already-reduced ones.
        # ... and the eager agg's cost scales with the build's BASE scan
        # (it re-derives the whole reduction lineage), so huge-base builds
        # skip it even in "all" mode — measured 0.5-0.8s per op on the
        # 15M-row orders lineage at x100 for a predicate the footer skip
        # then dropped. minmax_only mode stays unbounded (explicit ask).
        base_rows = (rows_base or {}).get(op.build, 0.0)
        minmax_base_ok = (cfg.minmax_max_build_base <= 0 or base_rows <= 0
                          or base_rows <= cfg.minmax_max_build_base)
        want_minmax = (cfg.filter_type in ("all", "minmax_only")
                       and ((probe_est >= cfg.minmax_min_probe_rows
                             and est <= cfg.broadcast_key_rows
                             and minmax_base_ok
                             and _probe_clustered(
                                 probe_paths.get(op.probe), op.probe_cols,
                                 cfg.minmax_max_clustering))
                            or cfg.filter_type == "minmax_only"))
        if want_minmax and not sketch_tier:
            t0 = time.perf_counter()
            # the footer range is a superset of the probe's actual range
            # (reductions only shrink it), so "build range covers the
            # footer range => the predicate prunes nothing" stays valid
            # even for an already-reduced probe
            n, pred = _minmax_filter(probe, build, op,
                                     probe_path=probe_paths.get(op.probe))
            st.minmax_ms = (time.perf_counter() - t0) * 1e3
            # AQE-style mid-schedule feedback (SURVEY §7: "measure at
            # persist time ... a place we can beat the reference"): the
            # agg just measured this relation exactly, so every later
            # gate/broadcast/persist decision involving it uses the
            # observed size instead of a decayed footer guess — including
            # THIS op's own key-set tier choice below (a decayed estimate
            # that undershot a genuinely huge build must not force a
            # driver-side broadcast of its keys)
            rows_est[op.build] = float(n)
            rows_pre[op.build] = float(n)  # observed beats any estimate
            est = float(n)
            if n == 0:
                dfs[op.probe] = probe.where(F.lit(False))
                empty = True
                applied = True
            elif pred is not None:
                probe = probe.where(pred)
                dfs[op.probe] = probe
                applied = True

        if not empty and sketch_tier:
            # sketch tier: ship a fixed-size bitmap instead of the key
            # set — for build sides whose distinct-key shuffle would
            # dominate (PTBloomFilter's role, bloom_filter.cpp:27-78).
            # count + min/max + bitmap all ride ONE scan of the build
            # lineage (bloom._build_once's per-word partials): r3
            # measured the old separate eager min/max job as the entire
            # 1.37x sketch-vs-exact residual on the cascade.
            from .bloom import build_bloom, probe_bloom

            t0 = time.perf_counter()
            bck = (op.build, op.build_cols, epochs.get(op.build, 0))
            bloom = bloom_cache.get(bck)
            if bloom is None:
                stat_cols = _minmax_cols(build, op) if want_minmax else []
                # a decayed estimate can undershoot the reduced build;
                # build_bloom's resize rule self-corrects with one
                # rebuild (ref physical_create_bf.cpp:385-406)
                bloom = build_bloom(build, list(op.build_cols),
                                    est if est != float("inf") else 1e6,
                                    stat_cols=stat_cols)
                bloom_cache[bck] = bloom
            st.build_ms = (time.perf_counter() - t0) * 1e3
            rows_est[op.build] = float(bloom.n_rows)
            rows_pre[op.build] = float(bloom.n_rows)
            observed.add(op.build)
            if rescue_post_check and bloom.n_rows > 0:
                bb = (rows_base or {}).get(op.build, 0.0)
                if (bloom.n_rows > cfg.sketch_max_keys
                        or (bb > 0 and bloom.n_rows
                            >= cfg.max_build_keep_frac * bb)):
                    # the observed build is too weak/big to probe with:
                    # the bitmap job is sunk (one scan, same as the
                    # observe-then-refuse path), the probe is withheld
                    _drop("gate2b3")
                    res.stats.append(st)
                    continue
            if bloom.n_rows == 0:
                dfs[op.probe] = probe.where(F.lit(False))
            else:
                pred = _range_pred(bloom.ranges, op,
                                   probe_paths.get(op.probe))
                if pred is not None:
                    probe = probe.where(pred)
                dfs[op.probe] = probe_bloom(probe, list(op.probe_cols),
                                            bloom)
            res.applied.append(op)
            res.applied_tiers.append("sketch")
            reduced.add(op.probe)
            info[op.probe] |= info[op.build]
            epochs[op.probe] = epochs.get(op.probe, 0) + 1
            if op.probe in rows_est:
                rows_est[op.probe] *= REDUCTION_DECAY
            if cfg.profiling:
                t0 = time.perf_counter()
                st.rows_out = dfs[op.probe].count()
                st.probe_ms = (time.perf_counter() - t0) * 1e3
            res.stats.append(st)
            continue

        if not empty and not suppress_bf and cfg.filter_type in ("all", "bf_only"):
            ck = (op.build, op.build_cols, epochs.get(op.build, 0))
            cached = keys_cache.get(ck)
            if cached is None:
                keys = build.select(
                    *[F.col(b).alias(f"__k{i}")
                      for i, b in enumerate(op.build_cols)])
                if est <= cfg.broadcast_key_rows:
                    # broadcast semi join dedups in hash-table build; an
                    # extra distinct shuffle would only slow it down
                    keys = F.broadcast(keys)
                else:
                    keys = keys.dropDuplicates()
                keys_cache[ck] = keys
                if cfg.profiling:
                    # force the key-set materialization so its cost is
                    # attributed to the CREATE, not the consumer stage
                    # (the reference's sink+finalize timers)
                    t0 = time.perf_counter()
                    keys.count()
                    st.build_ms = (time.perf_counter() - t0) * 1e3
            else:
                keys = cached
            cond = None
            for i, p in enumerate(op.probe_cols):
                c = F.col(p) == F.col(f"__k{i}")
                cond = c if cond is None else (cond & c)
            dfs[op.probe] = probe.join(keys, cond, "left_semi")
            if est > cfg.broadcast_key_rows:
                scan_local[op.probe] = False
                tier = "exact_shuffle"
            else:
                tier = "exact_broadcast"
            applied = True

        if applied or empty:
            res.applied.append(op)
            res.applied_tiers.append(
                "empty" if empty else tier)
            reduced.add(op.probe)
            info[op.probe] |= info[op.build]
            epochs[op.probe] = epochs.get(op.probe, 0) + 1
            if op.probe in rows_est:
                rows_est[op.probe] *= REDUCTION_DECAY
        else:
            # op survived every skip but landed nothing (suppressed key
            # tier with a no-op minmax range, usually)
            _drop("dup" if dup_evidence
                  else ("gate2c" if suppress_bf else "noop"))
        if cfg.profiling:
            t0 = time.perf_counter()
            st.rows_out = dfs[op.probe].count()
            st.probe_ms = (time.perf_counter() - t0) * 1e3
        res.stats.append(st)

    return res
