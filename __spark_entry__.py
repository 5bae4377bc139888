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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_star_join_rpt"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
