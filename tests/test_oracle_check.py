"""The local gate must catch driver-hash type divergence.

Twice (r2 ``q_corpus_curation``, r3 ``q_tpch_q12``) an oracle using a
bare ``SUM(integer CASE)`` shipped green through the local value-level
check and failed the driver's hash, because DuckDB types that
expression HUGEINT while Spark returns BIGINT and Python ints compare
equal. ``tools/oracle_check.type_problems`` closes that hole; these
tests pin it open-and-shut:

* an uncast integer SUM oracle must be FLAGGED,
* the ``CAST(... AS BIGINT)`` fix must be clean,
* benign timestamp spelling differences must NOT be flagged.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from oracle_check import type_problems  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_uncast_hugeint_sum_is_flagged(spark, duck):
    sdf = spark.sql(
        "SELECT SUM(CASE WHEN id > 1 THEN 1 ELSE 0 END) AS c FROM RANGE(5)")
    res = duck.sql(
        "SELECT SUM(CASE WHEN i > 1 THEN 1 ELSE 0 END) AS c "
        "FROM generate_series(1, 5) t(i)")
    probs = type_problems(sdf, res)
    assert probs and "hugeint" in probs[0].lower()


def test_cast_bigint_sum_is_clean(spark, duck):
    sdf = spark.sql(
        "SELECT CAST(SUM(CASE WHEN id > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS c FROM RANGE(5)")
    res = duck.sql(
        "SELECT CAST(SUM(CASE WHEN i > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS c FROM generate_series(1, 5) t(i)")
    assert type_problems(sdf, res) == []


def test_timestamp_spelling_not_flagged(spark, duck):
    sdf = spark.sql("SELECT TIMESTAMP'2024-01-01 00:00:00' AS ts")
    res = duck.sql("SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts")
    assert type_problems(sdf, res) == []


def test_double_vs_decimal_is_flagged(spark, duck):
    sdf = spark.sql("SELECT CAST(SUM(id) AS DOUBLE) AS v FROM RANGE(5)")
    res = duck.sql(
        "SELECT CAST(SUM(i) AS DECIMAL(18,2)) AS v "
        "FROM generate_series(1, 5) t(i)")
    probs = type_problems(sdf, res)
    assert probs and "type[v]" in probs[0]
