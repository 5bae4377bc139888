"""Nested-schema certification for the optional rptparquet DSv2 source.

The reference's BF-into-scan pushdown is schema-agnostic (the table
filter hangs off one key column; DuckDB's scan decodes whatever the
projection asks — rpt_optimizer.cpp:1401-1501). Round 4 shipped the
Spark counterpart flat-only; this closes the gap: schema inference now
delegates to Spark's ParquetToSparkSchemaConverter and decoding rides
the VectorizedParquetRecordReader, so struct / array / map payloads,
decimals, dates and timestamps read through the same runtime-filtered
scan.

Certifies, in one subprocess session with the jar on the classpath:
  1. inferred schema == native reader's schema on a nested fixture;
  2. full-table read byte-identical to the native reader;
  3. runtime V2 filtering still prunes row groups when a broadcast-dim
     join keys on the flat int64 column, with nested payloads projected.

Emits one JSON line {"suite": "dsv2-nested", ...}.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX = os.environ.get("DRPT_NESTED_FIX", "/tmp/drpt_dsv2_nested_fix")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
ROWS = int(os.environ.get("DRPT_NESTED_ROWS", "2000000"))
LOG = os.path.join(FIX, "prune.log")


def get_session():
    from pyspark.sql import SparkSession
    jar = os.path.join(REPO, "jvm", "rpt-dsv2.jar")
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("drpt-dsv2-nested")
        .config("spark.jars", jar)
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )


def build_fixture(spark):
    from pyspark.sql import functions as F

    done = os.path.join(FIX, "_DONE_%d" % ROWS)
    if os.path.exists(done):
        return
    df = (
        spark.range(ROWS)
        .select(
            F.col("id").alias("k"),
            F.struct(
                (F.col("id") % 97).alias("a"),
                F.concat(F.lit("s"), (F.col("id") % 13)).alias("b"),
            ).alias("meta"),
            F.array((F.col("id") % 7), (F.col("id") % 11)).alias("tags"),
            F.create_map(
                F.lit("m"), (F.col("id") % 5).cast("double")
            ).alias("kv"),
            F.col("id").cast("decimal(18,2)").alias("amount"),
            F.date_add(F.lit("2020-01-01").cast("date"),
                       (F.col("id") % 365).cast("int")).alias("d"),
        )
        # range-cluster on k so the runtime IN-set can drop row groups
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
    )
    df.write.mode("overwrite").parquet(os.path.join(FIX, "fact"))
    open(done, "w").close()


def main():
    spark = get_session()
    from pyspark.sql import functions as F

    build_fixture(spark)
    fact_path = os.path.join(FIX, "fact")
    native = spark.read.parquet(fact_path)
    if os.path.exists(LOG):
        os.remove(LOG)
    rpt = (
        spark.read.format("rptparquet")
        .option("filterColumns", "k")
        .option("logFile", LOG)
        .load(fact_path)
    )

    schema_match = rpt.schema == native.schema

    # full read parity (sample the comparison columns incl. nested leaves)
    def digest(df):
        return (
            df.select(
                # bit_xor, not sum: 2M int64 hashes overflow a long sum
                # under ANSI mode (Spark 4 default); xor is order-free
                F.bit_xor(F.xxhash64("k", "meta.a", "meta.b", "amount",
                                     "d")).alias("h"),
                F.sum(F.element_at("tags", 1)).alias("t1"),
                F.sum(F.element_at("kv", "m")).alias("m1"),
                F.count("*").alias("n"),
            )
            .collect()[0]
        )

    d_rpt, d_nat = digest(rpt), digest(native)
    read_match = tuple(d_rpt) == tuple(d_nat)

    # runtime-filter pruning with nested payloads projected: a 2%-
    # selective dim joined on the flat key; DPP turns the dim keys into
    # an IN-set the scan's filter() prunes row groups with
    # the dim must carry a selective Filter NODE (not just be small):
    # Spark's dynamic-pruning rule only plans a runtime V2 filter when
    # the build side has a selective predicate
    lo, hi = int(ROWS * 0.49), int(ROWS * 0.51)
    dim = (spark.range(ROWS).select(F.col("id").alias("dk"))
           .filter((F.col("dk") >= lo) & (F.col("dk") < hi)))
    joined = (
        rpt.join(F.broadcast(dim), rpt["k"] == dim["dk"])
        .select(
            F.sum("meta.a").alias("sa"),
            F.sum(F.element_at("tags", 2)).alias("st"),
            F.count("*").alias("n"),
        )
    )
    row = joined.collect()[0]
    nat_row = (
        native.join(F.broadcast(dim), native["k"] == dim["dk"])
        .select(
            F.sum("meta.a").alias("sa"),
            F.sum(F.element_at("tags", 2)).alias("st"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    join_match = tuple(row) == tuple(nat_row)

    before = after = None
    filter_called = False
    if os.path.exists(LOG):
        for ln in open(LOG):
            ev = json.loads(ln)
            if ev.get("event") == "runtime_filter":
                filter_called = True
                before = ev["row_groups_before"]
                after = ev["row_groups_after"]

    out = {
        "suite": "dsv2-nested",
        "rows": ROWS,
        "schema_match": schema_match,
        "read_match": read_match,
        "join_match": join_match,
        "filter_called": filter_called,
        "row_groups_before": before,
        "row_groups_after": after,
    }
    print(json.dumps(out), flush=True)
    try:
        spark.stop()
    except Exception:
        pass
    sys.exit(0)


if __name__ == "__main__":
    main()
