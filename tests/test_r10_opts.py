"""Round-10 optimization internals: JVM-literal one-row DataFrames,
adaptive stateful-shuffle width, literal centroid DataFrames."""

import os

from pyspark.sql import functions as F

from duckdb_robust_predicate_transfer_spark.operators.similarity import (
    _literal_centroids_df, ivf_centroids)
from duckdb_robust_predicate_transfer_spark.streaming.ops import (
    adaptive_state_partitions)
from duckdb_robust_predicate_transfer_spark.workload.pipeline import (
    _one_row_df)


def test_one_row_df_matches_schema_and_values(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from datetime import datetime
    ts = datetime(2031, 1, 2, 3, 4, 5)
    vals = (-1, ts, -1, "view", 0.0, "{}")
    df = _one_row_df(spark, ev.schema, vals)
    assert [f.name for f in df.schema.fields] == \
        [f.name for f in ev.schema.fields]
    row = df.collect()[0]
    assert row[0] == -1 and row[3] == "view" and row[4] == 0.0
    # the point of the helper: the plan must stay JVM-side (no Python
    # RDD slices whose coalesce(1) write serializes 32 worker trips)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan and "PythonRDD" not in plan


def test_adaptive_state_partitions_scales_with_bytes(spark, tmp_path):
    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # empty dir -> session conf unchanged
    assert adaptive_state_partitions(spark, str(tmp_path)) == conf
    # tiny input -> the floor of 4 (one partition serializes pandas work)
    (tmp_path / "a.parquet").write_bytes(b"x" * 1024)
    assert adaptive_state_partitions(spark, str(tmp_path)) == min(conf, 4)
    # ~2 MB -> 8 partitions of >=256 KB each
    (tmp_path / "b.parquet").write_bytes(b"x" * (2 << 20))
    assert adaptive_state_partitions(spark, str(tmp_path)) == min(conf, 9)
    # production-sized input -> the session conf, untouched (nothing is
    # tuned to local mode)
    (tmp_path / "c.parquet").write_bytes(b"x" * (64 << 20))
    assert adaptive_state_partitions(spark, str(tmp_path)) == conf


def test_literal_centroids_df_roundtrips_exactly(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(emb.filter(F.col("vec_id") != 0),
                          n_centroids=4, hasher="md5_64")
    rows = cents.select("centroid_id", "cd").collect()
    lit = _literal_centroids_df(spark, rows)
    got = {r.centroid_id: list(r.cd) for r in lit.collect()}
    want = {r.centroid_id: list(r.cd) for r in rows}
    assert got == want  # float repr round-trips bit-exactly
    plan = lit._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
