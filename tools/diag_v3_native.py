"""DIAG: why did the v3 JOB fixture make Spark's native runtime-bloom
leg ~3x faster on IDENTICAL v2 query texts? (VERDICT r9 next #2)

JOB_REGIME_r08 (fixture v2) vs _r09 (v3, + integer twin key columns)
measured, on unchanged query texts: jq2 native 5.63 -> 1.98 s while off
held ~8-9 s, and `native_blooms_injected` rose on exactly the faster
queries (jq2 1->2, jq3 4->6, jq10 4->6, jq13 2->4, jq18 1->3,
jq25 2->3). This tool isolates the mechanism with PLAN evidence only
(no timing): it regenerates the v2 fixture (same generator SQL minus
the `_i` twin columns) next to the v3 one, then for each query and
fixture records

  - per-table parquet file bytes (what Catalyst's static sizeInBytes
    derives from),
  - the native bloom edge set (plans/catalyst_order.native_bloom_edges)
    under the benchmark leg's exact confs (workload.common.set_native_rf),
  - the physical join inventory (BroadcastHashJoin vs SortMergeJoin /
    ShuffledHashJoin) of the un-rewritten plan,

because Spark's InjectRuntimeFilter only injects on a join it judges
"probably shuffle" (both sides above spark.sql.autoBroadcastJoinThreshold
— InjectRuntimeFilter.isProbablyShuffleJoin) with the application-side
scan above the application gate: a dim whose file grew past a threshold
between fixtures flips its joins from broadcast to shuffle, turning
previously bloom-ineligible edges eligible.

Run:  python -u tools/diag_v3_native.py [--json OUT]
Env:  DRPT_JOB_DIR (v3 fixture, default /tmp/drpt_job)
      DRPT_JOB_V2_DIR (v2 twin, default <v3>_v2; generated if absent)
      DRPT_JOB_FACT (default 100_000_000 — must match the v3 fixture)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.job_regime import FACT, NT, NC, NK, NP, OUT_DIR, QUERIES, WORDS

V2_DIR = os.environ.get("DRPT_JOB_V2_DIR", OUT_DIR.rstrip("/") + "_v2")

#: queries whose texts are v2/v3-identical (no `_i` columns) and whose
#: native leg sped up most between r8 and r9
DIAG_QUERIES = ("jq2", "jq3", "jq13", "jq18", "jq25")


def ensure_v2_fixture() -> None:
    """The r8 fixture: job_regime's generator minus the integer twin
    key columns (t_id_i / co_id_i / ci_tid_i / mc_tid_i / mc_coid_i /
    mk_tid_i). Everything else — row counts, hash layouts, payloads,
    ROW_GROUP_SIZE — is byte-identical logic, so any plan difference
    against v3 is attributable to the twin columns alone."""
    import duckdb

    marker = os.path.join(V2_DIR, f"_DONE_f{FACT}_v2diag")
    if os.path.exists(marker):
        return
    os.makedirs(V2_DIR, exist_ok=True)
    t0 = time.time()
    con = duckdb.connect()
    con.sql(f"SET threads={os.cpu_count()}")
    wl = "[" + ", ".join(f"'{w}'" for w in WORDS) + "]"

    def copy(sql: str, name: str) -> None:
        con.sql(f"COPY ({sql}) TO '{V2_DIR}/{name}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 1048576)")

    def cap(expr: str) -> str:
        return f"(upper(substr({expr}, 1, 1)) || substr({expr}, 2))"

    cap1 = cap(f"list_extract({wl}, 1 + i % 20)")
    cap2 = cap(f"list_extract({wl}, 1 + (i // 11) % 20)")
    cap3 = cap(f"list_extract({wl}, 1 + (i // 13) % 20)")

    copy(f"""
      SELECT 't_' || lpad(i::VARCHAR, 9, '0') AS t_id,
             'kind_' || (i % 10) AS t_kind,
             1950 + (hash(i + 31337) % 70) AS t_year,
             'The ' || list_extract({wl}, 1 + i % 20) || ' ' ||
             list_extract({wl}, 1 + (i // 7) % 20) ||
             CASE WHEN i % 50 = 7 THEN ' Returns' ELSE '' END AS t_title
      FROM generate_series(1, {NT}) s(i)""", "title")
    copy(f"""
      SELECT 'co_' || lpad(i::VARCHAR, 7, '0') AS co_id,
             CASE WHEN i % 100 = 3 THEN 'Warner '
                  WHEN i % 100 = 4 THEN 'Universal '
                  ELSE '' END ||
             {cap1} || ' ' ||
             {cap2} ||
             ' Pictures' AS co_name,
             CASE WHEN i % 10 < 3 THEN '[us]'
                  WHEN i % 10 < 5 THEN '[de]'
                  WHEN i % 10 < 7 THEN '[fr]'
                  ELSE '[' || list_extract({wl}, 1 + i % 13) || ']'
             END AS co_country
      FROM generate_series(1, {NC}) s(i)""", "company")
    copy(f"""
      SELECT 'kw_' || lpad(i::VARCHAR, 7, '0') AS kw_id,
             CASE WHEN i = 77 THEN 'sequel'
                  WHEN i = 78 THEN 'based-on-novel'
                  WHEN i % 500 = 9 THEN 'character-name-in-title'
                  ELSE list_extract({wl}, 1 + i % 20) || '-' ||
                       (i % 997)::VARCHAR END AS kw_word
      FROM generate_series(1, {NK}) s(i)""", "keyword")
    copy(f"""
      SELECT 'p_' || lpad(i::VARCHAR, 8, '0') AS p_id,
             {cap1} || ', ' ||
             {cap3} AS p_name
      FROM generate_series(1, {NP}) s(i)""", "person")
    copy(f"""
      SELECT i AS ci_id,
             't_' || lpad((1 + (hash(i) % {NT}))::VARCHAR, 9, '0') AS ci_tid,
             'p_' || lpad((1 + (hash(i + 123457) % {NP}))::VARCHAR, 8, '0') AS ci_pid,
             'role_' || (i % 11) AS ci_role
      FROM generate_series(1, {FACT}) s(i)""", "castinfo")
    copy(f"""
      SELECT 't_' || lpad((1 + (hash(i + 777) % {NT}))::VARCHAR, 9, '0') AS mc_tid,
             'co_' || lpad((1 + (hash(i + 999331) % {NC}))::VARCHAR, 7, '0') AS mc_coid,
             CASE WHEN i % 20 = 3 THEN '(presents) (co-production)'
                  WHEN i % 20 = 4 THEN '(as metro pictures)'
                  ELSE '(' || (i % 1009)::VARCHAR || ')' END AS mc_note
      FROM generate_series(1, {FACT // 4}) s(i)""", "movie_company")
    copy(f"""
      SELECT 't_' || lpad((1 + (hash(i + 424243) % {NT}))::VARCHAR, 9, '0') AS mk_tid,
             'kw_' || lpad((1 + (hash(i + 515151) % {NK}))::VARCHAR, 7, '0') AS mk_kwid
      FROM generate_series(1, {FACT // 3}) s(i)""", "movie_keyword")
    copy(f"""
      SELECT CASE WHEN i % 10 < 3
                  THEN 't_' || lpad((1 + (hash(i * 7 + 11) % 1000))::VARCHAR, 9, '0')
                  ELSE 't_' || lpad((1 + (hash(i + 616161) % {NT}))::VARCHAR, 9, '0')
             END AS mi_tid,
             CASE WHEN i % 25 = 3 THEN 'rating: ' || (i % 10)::VARCHAR
                  WHEN i % 25 = 4 THEN 'runtime: ' || (60 + i % 120)::VARCHAR
                  ELSE 'info-' || (i % 499)::VARCHAR END AS mi_info,
             1950 + (hash(i + 99) % 70) AS mi_year
      FROM generate_series(1, {FACT // 5}) s(i)""", "movie_info")
    open(marker, "w").close()
    print(f"# v2 fixture at {V2_DIR} in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)


def _jseq(seq) -> list:
    return [seq.apply(i) for i in range(seq.size())]


def join_inventory(df) -> list:
    """[(join class, join type, build side)] of the physical plan."""
    out = []
    try:
        jplan = df._jdf.queryExecution().executedPlan()
        if "AdaptiveSparkPlan" in jplan.getClass().getSimpleName():
            jplan = jplan.initialPlan()
        stack = [jplan]
        while stack:
            n = stack.pop()
            stack.extend(_jseq(n.children()))
            cname = n.getClass().getSimpleName()
            if "Join" in cname:
                try:
                    jt = n.joinType().toString()
                except Exception:
                    jt = "?"
                try:
                    bs = n.buildSide().toString()
                except Exception:
                    bs = "-"
                out.append(f"{cname}[{jt},{bs}]")
    except Exception as exc:
        out.append(f"<{exc}>")
    return out


def main() -> int:
    out_json = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--json":
            out_json = argv[i + 1]

    ensure_v2_fixture()

    from duckdb_robust_predicate_transfer_spark.config import RPTConfig
    from duckdb_robust_predicate_transfer_spark.engine import Engine
    from duckdb_robust_predicate_transfer_spark.plans.catalyst_order import (
        native_bloom_edges)
    from duckdb_robust_predicate_transfer_spark.session import get_spark
    from duckdb_robust_predicate_transfer_spark.workload.common import (
        set_native_rf)

    spark = get_spark(app_name="drpt-diag-v3",
                      shuffle_partitions=int(os.environ.get(
                          "DRPT_SHUFFLE_PARTITIONS", "64")))
    spark.sparkContext.setLogLevel("ERROR")

    fixtures = {"v2": V2_DIR, "v3": OUT_DIR}
    result: dict = {"suite": "diag-v3-native", "fact_rows": FACT,
                    "fixtures": {}, "queries": {}}
    for tag, d in fixtures.items():
        result["fixtures"][tag] = {
            "dir": d,
            "file_bytes": {t: os.path.getsize(os.path.join(d, f))
                           for f in sorted(os.listdir(d))
                           if f.endswith(".parquet")
                           for t in [f[:-len(".parquet")]]},
        }

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    result["autoBroadcastJoinThreshold"] = thresh
    for q in DIAG_QUERIES:
        sql = QUERIES[q]
        per: dict = {}
        for tag, d in fixtures.items():
            eng = Engine(spark, d, RPTConfig(enabled=False))
            eng.catalog.register_views()
            set_native_rf(spark, True)
            try:
                df = spark.sql(sql)
                paths = {t: eng.catalog.path(t)
                         for t in eng.catalog.known_tables()
                         if os.path.exists(eng.catalog.path(t))}
                edges = native_bloom_edges(df, paths, eng._table_cols())
                per[tag] = {
                    "bloom_edges": [
                        f"{e['build_table']}({e['build_col']})->"
                        f"{e['probe_table']}({e['probe_col']})"
                        for e in (edges or [])],
                    "n_blooms": len(edges or []),
                    "joins": join_inventory(df),
                }
            finally:
                set_native_rf(spark, False)
        per["flipped_edges"] = sorted(
            set(per["v3"]["bloom_edges"]) - set(per["v2"]["bloom_edges"]))
        result["queries"][q] = per
        print(f"# {q}: v2 blooms={per['v2']['n_blooms']} "
              f"v3 blooms={per['v3']['n_blooms']} "
              f"flipped={per['flipped_edges']}", file=sys.stderr, flush=True)

    print(json.dumps(result), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
