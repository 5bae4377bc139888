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
#   1. _GRADE_FIRST — oracle-bearing queries with no green driver
#      CORRECTNESS row yet: the round-2 red rows (now fixed) plus the
#      14 TPC-H oracle queries that have never been in the graded window
#      (VERDICT r2 "Next round" #4).
#   2. every other oracle-bearing query in registration order — newly added
#      queries land here automatically and therefore get graded.
#   3. _GRADE_LAST — oracle-bearing queries already proven green in a
#      prior round's CORRECTNESS artifact (r1 or r2); they re-grade only
#      when slots remain.
#   4. rows-only queries (no oracle) — the driver's weaker check.
_GRADE_FIRST = [
    # the r4 red row: numpy int64 hit the driver's non-Arrow
    # createDataFrame verifier (operators/bloom.py, fixed r5: plain
    # Python ints on both the build return and the probe broadcast row;
    # regression-locked by test_bloom_probe_without_arrow)
    "q_sketch_transfer",
]
_GRADE_LAST = [
    # green in CORRECTNESS_r03
    "q_events_sessionize", "q_events_interval_join", "q_corpus_curation",
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q4", "q_tpch_q6", "q_tpch_q10",
    "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q16", "q_tpch_q17",
    "q_tpch_q19", "q_tpch_q20", "q_tpch_q22", "q_minhash_lsh_pairs",
    "q_tpch_q2", "q_tpch_q11",
    # green in CORRECTNESS_r01 (see VERDICT r1/r2 §2c notes)
    "q_right_join", "q_window_running_sum", "q_cosine_topk_batch",
    "q_empty_build_side", "q_anti_join",
    "q_scan_project", "q_filter_scan", "q_values_join", "q_distinct",
    "q_count_distinct", "q_rollup", "q_cube", "q_except", "q_intersect",
    "q_string_funcs", "q_date_funcs", "q_math_funcs", "q_case_expr",
    "q_window_range_frame", "q_orderby_limit",
    # green in CORRECTNESS_r02
    "q_embedding_norms", "q_events_tumbling", "q_langid_heuristic",
    "q_quality_score", "q_token_regex_count", "q_embed_neardup_exact",
    "q_events_json", "q_skew_salted_join", "q_events_funnel",
    "q_events_asof", "q_events_retention",
    "q_tpch_q5", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q18",
    "q_tpch_q21",
    "q_join_2way_inner", "q_star_join_rpt", "q_star_join_forced",
    "q_tpch_q12", "q_sql_auto_rpt", "q_snowflake_agg",
    "q_multi_col_join", "q_cyclic_join_graph", "q_left_join",
    "q_semi_join", "q_in_subquery_mark", "q_correlated_exists",
    "q_scalar_agg", "q_groupby_having", "q_grouping_sets",
    "q_rollup_star", "q_union", "q_window_rank", "q_topk",
    "q_job_style_wide", "q_percentiles", "q_job_style_like_in",
    "q_job_style_dim_fanout", "q_full_outer_join",
    "q_text_stats", "q_lang_quality", "q_doc_fingerprint",
    "q_dedup_exact", "q_ngram_jaccard", "q_cosine_topk",
    # green in CORRECTNESS_r04
    "q_ann_ivf_portable", "q_csv_source", "q_dedup_clusters",
    "q_distinct_on", "q_embed_neardup_lsh_portable", "q_events_hopping",
    "q_greatest_least", "q_json_source", "q_lateral_topn",
    "q_multimodal_features_portable", "q_pack_sequences",
    "q_partitioned_sink", "q_pivot", "q_qualify", "q_sample_hash",
    "q_simhash_pairs", "q_stratified_sample", "q_stream_asof",
    "q_stream_conversions", "q_stream_curated_ingest", "q_stream_dedup",
    "q_stream_enriched", "q_stream_sessionize",
    "q_stream_windowed_counts", "q_string_agg", "q_unnest_array",
    "q_window_navigation", "q_window_ntile",
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
