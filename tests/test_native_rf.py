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
