"""Lock the native-runtime-filter benchmark-leg mechanics.

Round-4 finding: Spark's InjectRuntimeFilter gates on the application
side's scan exceeding ``applicationSideScanSizeThreshold`` (default
10GB), so at local fixture sizes a "native runtime filter" benchmark
leg that only flips ``runtime.bloomFilter.enabled`` times the plain
baseline plan — zero ``might_contain`` anywhere. These tests pin:

1. the detection needle (``count_native_blooms``) actually sees an
   injected bloom when the gates allow one (guards against the probe
   expression being renamed across Spark versions, which would make
   every recorded injection count silently read 0);
2. at default thresholds nothing injects at our fixture sizes (the
   original bug: if this ever starts injecting, the lowered-threshold
   emulation in set_native_rf should be revisited);
3. ``set_native_rf`` round-trips the session confs (benchmark legs must
   not leak lowered gates into later legs).
"""

import pytest
from pyspark.sql import functions as F

from duckdb_robust_predicate_transfer_spark.workload.common import (
    count_native_blooms, set_native_rf)

SF = "/root/testdata/sf0.01"

_ENABLED = "spark.sql.optimizer.runtime.bloomFilter.enabled"
_APP = ("spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold")
_CREATE = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"


def _shuffle_join(spark):
    """lineitem |><| filtered orders, forced to shuffle (broadcast off):
    the shape InjectRuntimeFilter targets."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    od = spark.read.parquet(f"{SF}/orders.parquet")
    return (li.join(od.filter(F.col("o_orderpriority") == "1-URGENT"),
                    li.l_orderkey == od.o_orderkey)
            .groupBy("l_returnflag").count())


def test_bloom_injects_when_gates_open(spark):
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(_ENABLED, "true")
    spark.conf.set(_APP, "1")
    spark.conf.set(_CREATE, "8GB")
    try:
        assert count_native_blooms(_shuffle_join(spark)) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(_ENABLED, "false")
        spark.conf.unset(_APP)
        spark.conf.unset(_CREATE)


def test_no_bloom_at_default_thresholds(spark):
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(_ENABLED, "true")
    try:
        # the 10GB default application-side gate swallows every local
        # fixture: enabling the flag alone injects nothing
        assert count_native_blooms(_shuffle_join(spark)) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(_ENABLED, "false")


def test_set_native_rf_roundtrip(spark):
    default_app = spark.conf.get(_APP)
    set_native_rf(spark, True)
    assert spark.conf.get(_ENABLED) == "true"
    assert spark.conf.get(_APP) == "64MB"
    assert spark.conf.get(_CREATE) == "1GB"
    set_native_rf(spark, False)
    assert spark.conf.get(_ENABLED) == "false"
    assert spark.conf.get(_APP) == default_app


def test_composed_arbitration_dup_bail_keeps_suppression(spark):
    """Composed-mode per-query arbitration: a query whose only lost
    transfer candidates died to the duplication gates (2d/2e) is an
    all-broadcast-join shape where native runtime blooms duplicate the
    same joins — Engine.sql must keep injection suppressed for it even
    though the rewrite did not engage (JOB jq1/jq4/jq6). A query that
    bails for any other reason must restore the session value (Q21's
    self-join class, where native blooms reach shapes we skip)."""
    from duckdb_robust_predicate_transfer_spark.config import RPTConfig
    from duckdb_robust_predicate_transfer_spark.engine import Engine

    sf = "/root/testdata/sf0.001"
    cfg = RPTConfig(all_broadcast_bail_rows=0, min_probe_rows=0,
                    host_broadcast_rows=1_000_000)
    dup_sql = """
        SELECT COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE o_orderstatus = 'F' AND s_nationkey = 1
    """
    one_edge_sql = """
        SELECT COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    """
    spark.conf.set(_ENABLED, "true")
    try:
        for attempt in ("first", "bail-cache"):  # cached path must match
            e = Engine(spark, sf, cfg)
            e.sql(dup_sql)
            assert not e.last_sql_rewritten
            assert e._keep_rf_suppressed, attempt
            assert spark.conf.get(_ENABLED) == "false", attempt
            assert e.last_result is None or (
                not e.last_result.applied
                and e.last_result.drops.get("dup", 0) > 0)
            # a non-dup bail restores the stashed session value
            e2 = Engine(spark, sf, cfg)
            e2.sql(one_edge_sql)
            assert not e2._keep_rf_suppressed, attempt
            assert spark.conf.get(_ENABLED) == "true", attempt
    finally:
        spark.conf.set(_ENABLED, "false")


def test_leg_assertion_clears_stale_suppression_stash(spark):
    """Benchmark-leg integrity (r8): an ENGAGED query under composed
    mode leaves the suppression stash ('restore true later') on the
    session; when a later leg asserts injection OFF via set_native_rf,
    that leg owns the conf — the first un-engaged query afterwards must
    NOT restore the stale 'true' mid-leg (pre-fix, un-engaged rpt legs
    timed with native injection live whenever any earlier composed leg
    had engaged)."""
    from duckdb_robust_predicate_transfer_spark.config import RPTConfig
    from duckdb_robust_predicate_transfer_spark.engine import Engine

    sf = "/root/testdata/sf0.001"
    # force engagement: no duplication gates, everything transferable
    cfg = RPTConfig(min_probe_rows=0, all_broadcast_bail_rows=0,
                    skip_no_exchange_probe=False,
                    skip_host_prefiltered_semi=False)
    star_sql = """
        SELECT COUNT(*) AS n
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
    """
    bail_sql = """
        SELECT COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """
    # composed leg: injection on; the engaged query stashes + suppresses
    set_native_rf(spark, True)
    try:
        e = Engine(spark, sf, cfg)
        e.sql(star_sql)
        assert e.last_sql_rewritten, "engagement premise broken"
        assert spark.conf.get(_ENABLED) == "false"  # suppressed while engaged
        # rpt leg: the harness asserts injection OFF (owns the conf)
        set_native_rf(spark, False)
        # un-engaged query inside the rpt leg: must stay off
        e2 = Engine(spark, sf, cfg)
        e2.sql(bail_sql)
        assert not e2.last_sql_rewritten
        assert spark.conf.get(_ENABLED) == "false", \
            "stale stash restored injection into an off-asserted leg"
    finally:
        set_native_rf(spark, False)

def test_native_bloom_edges_extraction(spark):
    """Pin native_bloom_edges against Spark renames: an injected bloom
    on the lineitem |><| filtered-orders shuffle join must come back as
    the (orders -> lineitem, l_orderkey) edge with both sides resolved
    structurally from the scan rootPaths."""
    from duckdb_robust_predicate_transfer_spark.plans.catalyst_order import (
        native_bloom_edges)

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(_ENABLED, "true")
    spark.conf.set(_APP, "1")
    spark.conf.set(_CREATE, "8GB")
    try:
        edges = native_bloom_edges(
            _shuffle_join(spark),
            {"lineitem": f"{SF}/lineitem.parquet",
             "orders": f"{SF}/orders.parquet"})
        assert edges, "no bloom extracted where one must inject"
        assert {"probe_table": "lineitem", "probe_col": "l_orderkey",
                "build_table": "orders", "build_col": "o_orderkey"
                } in edges
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(_ENABLED, "false")
        spark.conf.unset(_APP)
        spark.conf.unset(_CREATE)


def test_composed_dual_arbitration_by_bloom_coverage(spark):
    """compose_subtree_rf: an ENGAGED query keeps injection suppressed
    when every native bloom's edge is covered by an applied op (single
    mechanism per edge), but restores injection for the final run when
    the host would plant a bloom on an edge the transfer left on the
    table (per-query dual — JOB_REGIME_r08: jq2 6.25->2.37 s)."""
    from duckdb_robust_predicate_transfer_spark.config import RPTConfig
    from duckdb_robust_predicate_transfer_spark.engine import Engine

    sf = "/root/testdata/sf0.001"
    chain_sql = """
        SELECT COUNT(*) AS n
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '1-URGENT' AND c_mktsegment = 'BUILDING'
    """
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(_ENABLED, "true")
    spark.conf.set(_APP, "1")
    spark.conf.set(_CREATE, "8GB")
    base = dict(all_broadcast_bail_rows=0, skip_no_exchange_probe=False,
                skip_host_prefiltered_semi=False,
                require_selective_build=False,
                # this test pins the ENGAGED path's per-edge dual; the
                # r10 cession would (correctly) disengage the fully-
                # covered scenario first — tested separately in
                # test_cession_arbitration
                cede_covered_edges=False)
    try:
        # covered: ops land on BOTH filtered edges -> blooms are pure
        # duplication -> suppression holds through the final run
        e = Engine(spark, sf, RPTConfig(min_probe_rows=0, **base))
        covered_df = e.sql(chain_sql)
        assert e.last_sql_rewritten
        ops = {(o.build, o.probe) for o in e.last_result.applied}
        assert ("customer", "orders") in ops, ops
        assert spark.conf.get(_ENABLED) == "false"
        # the suppression must hold through EXECUTION, not just the
        # conf: a bloom-laden cached plan running under nominal
        # suppression would silently defeat the arbitration
        covered_df.collect()
        assert count_native_blooms(covered_df) == 0, \
            "covered leg executed with native blooms under suppression"
        spark.conf.set(_ENABLED, "true")  # next leg re-asserts

        # uncovered: gate 2c (bf_benefit_probe_ratio) suppresses the
        # orders->lineitem key set (orders' ~700 filtered keys sit above
        # bf_cheap_keys=100, probe under ratio x pre, probe too small
        # for both the bitmap escalation and the minmax tier) while
        # customer->orders keeps its op (~30 keys = cheap-exempt) ->
        # the orders->lineitem bloom is selectivity the transfer left
        # on the table -> injection restored for the final run
        # (host_broadcast_rows=0: a broadcast-hinted reduced orders
        # would make the final join a BHJ, where InjectRuntimeFilter
        # correctly injects nothing and suppression correctly holds)
        unc = dict(base, bf_cheap_keys=100, bf_benefit_probe_ratio=100,
                   host_broadcast_rows=0)
        e2 = Engine(spark, sf, RPTConfig(min_probe_rows=0, **unc))
        dual_df = e2.sql(chain_sql)
        assert e2.last_sql_rewritten
        ops2 = {(o.build, o.probe) for o in e2.last_result.applied}
        assert ("orders", "lineitem") not in ops2, ops2
        assert ("customer", "orders") in ops2, ops2
        assert spark.conf.get(_ENABLED) == "true", \
            "uncovered native bloom must flip the engaged query to dual"
        # ...and the restored injection must reach the EXECUTED plan
        # (the optimized-plan-caching failure mode the engine docstring
        # warns about: a plan cached under suppression would execute
        # bloom-less while the conf reads true)
        dual_df.collect()
        assert count_native_blooms(dual_df) > 0, \
            "dual leg executed without native blooms despite the flip"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(_ENABLED, "false")
        spark.conf.unset(_APP)
        spark.conf.unset(_CREATE)


def test_cession_arbitration(spark):
    """r10 cession (config.cede_covered_edges): when the ORIGINAL
    plan's native blooms cover every candidate op edge, the engine
    disengages BEFORE any eager job and hands the query to the host —
    riding native when the shape-prior probe mass is real, riding OFF
    (suppression kept) when the off plan's pushed filters already
    leave nothing worth blooming (the jq1 floor). A query whose
    candidates reach beyond the blooms stays engaged."""
    from duckdb_robust_predicate_transfer_spark.config import RPTConfig
    from duckdb_robust_predicate_transfer_spark.engine import Engine

    sf = "/root/testdata/sf0.001"
    covered_sql = """
        SELECT COUNT(*) AS n
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F' AND c_mktsegment = 'BUILDING'
    """
    # orders carries no local filter -> no native bloom can exist on
    # the orders->lineitem edge, but the reduced-orders op still
    # applies (transfer reach native cannot express) -> no cession
    reach_sql = """
        SELECT COUNT(*) AS n
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
    """
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(_ENABLED, "true")
    spark.conf.set(_APP, "1")
    spark.conf.set(_CREATE, "8GB")
    base = dict(min_probe_rows=0, all_broadcast_bail_rows=0,
                skip_no_exchange_probe=False,
                skip_host_prefiltered_semi=False)
    try:
        # floor: sf0.001 probe masses are tiny -> cede AND ride off
        e = Engine(spark, sf, RPTConfig(**base))
        e.sql(covered_sql)
        assert e.last_cede and e._cede_ride_off, \
            (e.last_cede, e._cede_ride_off)
        assert not e.last_sql_rewritten
        assert spark.conf.get(_ENABLED) == "false", "floor must ride off"
        spark.conf.set(_ENABLED, "true")

        # floor disabled -> cede and ride native (injection restored);
        # exercise the bail-cache replay on the second pass
        for attempt in ("first", "cached"):
            e2 = Engine(spark, sf, RPTConfig(
                **base, cede_suppress_max_probe_rows=0))
            e2.sql(covered_sql)
            assert e2.last_cede and not e2._cede_ride_off, attempt
            assert not e2.last_sql_rewritten, attempt
            assert spark.conf.get(_ENABLED) == "true", \
                f"cession must restore injection ({attempt})"

        # master switch off -> engaged as before
        e3 = Engine(spark, sf, RPTConfig(**base, cede_covered_edges=False))
        e3.sql(covered_sql)
        assert not e3.last_cede and e3.last_sql_rewritten
        spark.conf.set(_ENABLED, "true")

        # uncovered reach -> no cession, engaged
        e4 = Engine(spark, sf, RPTConfig(**base))
        e4.sql(reach_sql)
        assert not e4.last_cede, "reach beyond blooms must refuse cession"
        assert e4.last_sql_rewritten
        ops = {(o.build, o.probe) for o in e4.last_result.applied}
        assert ("orders", "lineitem") in ops, ops
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(_ENABLED, "false")
        spark.conf.unset(_APP)
        spark.conf.unset(_CREATE)
