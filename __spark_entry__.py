"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship predicate-transfer star join at
sf0.001; ``queries()``/``oracle_sql()`` expose the declared surface
from SURVEY.md section 2d plus the LLM-pipeline extras, implemented in
``duckdb_robust_predicate_transfer_spark.workload``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable no matter where the loading process's cwd is
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from duckdb_robust_predicate_transfer_spark.workload import ORACLE, QUERIES  # noqa: E402

# The driver grades the first 50 entries of queries() against oracle_sql().
# There are more oracle-bearing queries than graded slots, so order matters:
#   1. _GRADE_FIRST — oracle-bearing queries that had no CORRECTNESS row in
#      round 1 (the driver never reached them).
#   2. every other oracle-bearing query in registration order — newly added
#      queries land here automatically and therefore get graded.
#   3. _GRADE_LAST — oracle-bearing queries already proven green in round 1
#      whose family is still represented above (e.g. q_rollup/q_cube are
#      demoted because q_grouping_sets + q_rollup_star stay graded).
#   4. rows-only queries (no oracle) — the driver's weaker check.
_GRADE_FIRST = [
    "q_embedding_norms", "q_events_tumbling", "q_events_sessionize",
    "q_langid_heuristic", "q_quality_score", "q_token_regex_count",
    "q_embed_neardup_exact", "q_events_json", "q_skew_salted_join",
    "q_events_funnel", "q_events_asof", "q_events_interval_join",
    "q_events_retention",
    # round-2 flagship TPC-H shapes (workload/tpch.py): 6-way transfer
    # star, nation-alias self-join, 8-relation graph, LIKE-filtered
    # 5-way, IN-over-HAVING, correlated EXISTS/NOT-EXISTS
    "q_tpch_q5", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q18",
    "q_tpch_q21",
    # round-2 pipeline flagship: the curation funnel composing the
    # langid/quality/dedup gates end-to-end
    "q_corpus_curation",
]
_GRADE_LAST = [
    # mirror/edge-case queries green in round 1, demoted to make room
    # for the TPC-H flagships (their families stay graded: q_left_join,
    # q_window_rank, q_cosine_topk, unit tests cover the empty build)
    "q_right_join", "q_window_running_sum", "q_cosine_topk_batch",
    "q_empty_build_side",
    # anti-join family stays graded through q_tpch_q21/q22's NOT EXISTS
    "q_anti_join",
    # remaining TPC-H breadth: verified locally by tools/oracle_check
    # + the committed BREADTH artifact at the driver's own SF
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q4", "q_tpch_q6", "q_tpch_q10",
    "q_tpch_q12", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15",
    "q_tpch_q16", "q_tpch_q17", "q_tpch_q19", "q_tpch_q20",
    "q_tpch_q22",
    "q_scan_project", "q_filter_scan", "q_values_join", "q_distinct",
    "q_count_distinct", "q_rollup", "q_cube", "q_except", "q_intersect",
    "q_string_funcs", "q_date_funcs", "q_math_funcs", "q_case_expr",
    "q_window_range_frame", "q_orderby_limit",
]


def _ordered() -> list[str]:
    names = list(QUERIES)

    def key(n: str) -> tuple[int, int]:
        if n not in ORACLE:
            tier = 3
        elif n in _GRADE_FIRST:
            tier = 0
        elif n in _GRADE_LAST:
            tier = 2
        else:
            tier = 1
        return (tier, names.index(n))

    return sorted(names, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_star_join_rpt"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
