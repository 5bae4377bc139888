"""fan_out (operators/layout.py): scale-adaptive scan redistribution."""

from pyspark.sql import functions as F

from duckdb_robust_predicate_transfer_spark.operators.layout import fan_out


def test_fan_out_spreads_single_row_group_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    out = fan_out(df)
    # the fixture is one row group well under maxPartitionBytes -> the
    # scan cannot fill the session's cores itself; fan_out must insert
    # a round-robin redistribution to defaultParallelism
    assert out is not df
    assert (out.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)
    # results unchanged (multiset of rows)
    assert (sorted(r.doc_id for r in out.collect())
            == sorted(r.doc_id for r in df.collect()))


def test_fan_out_noop_when_scan_already_parallel(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # emulate the at-scale regime: with a tiny split size the scan
    # already yields >= parallelism tasks, so fan_out must pass the
    # DataFrame through untouched (no inserted exchange)
    prior = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        assert fan_out(df) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prior)


def test_fan_out_noop_on_non_file_source(spark):
    df = spark.range(10).select(F.col("id"))
    assert fan_out(df) is df
