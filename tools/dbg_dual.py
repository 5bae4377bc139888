"""Debug the red dual-arbitration test: why doesn't the uncovered leg flip?"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from duckdb_robust_predicate_transfer_spark.config import RPTConfig
from duckdb_robust_predicate_transfer_spark.engine import Engine
import duckdb_robust_predicate_transfer_spark.engine as eng_mod

sf = "/root/testdata/sf0.001"
chain_sql = """
    SELECT COUNT(*) AS n
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE o_orderpriority = '1-URGENT' AND c_mktsegment = 'BUILDING'
"""
_ENABLED = "spark.sql.optimizer.runtime.bloomFilter.enabled"
_APP = ("spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold")
_CREATE = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"

spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set(_ENABLED, "true")
spark.conf.set(_APP, "1")
spark.conf.set(_CREATE, "8GB")

base = dict(all_broadcast_bail_rows=0, skip_no_exchange_probe=False,
            skip_host_prefiltered_semi=False,
            require_selective_build=False)
unc = dict(base, bf_cheap_keys=100, bf_benefit_probe_ratio=100,
           host_broadcast_rows=0)

# instrument _uncovered_rf_evidence
orig = Engine._uncovered_rf_evidence
def patched(self, query, cfg):
    from duckdb_robust_predicate_transfer_spark.plans.catalyst_order import (
        native_bloom_edges)
    print("stash:", getattr(self.spark, "_drpt_rf_stash", None))
    key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    try:
        self.spark.conf.set(key, "true")
        table_paths = {t: self.catalog.path(t)
                       for t in self.catalog.known_tables()}
        blooms = native_bloom_edges(self.spark.sql(query), table_paths)
        print("blooms on rewritten plan:", blooms)
        covered = set()
        alias_t = getattr(self, "_last_alias_tables", {})
        print("alias_tables:", alias_t)
        if self.last_result is not None:
            for op in self.last_result.applied:
                pt = alias_t.get(op.probe, op.probe)
                bt = alias_t.get(op.build, op.build)
                for pc in op.probe_cols:
                    covered.add((pt, pc, bt))
        print("covered:", covered)
    finally:
        self.spark.conf.set(key, "false")
    return orig(self, query, cfg)

Engine._uncovered_rf_evidence = patched
eng_mod._DUAL_RF_CACHE.clear()
eng_mod._BAIL_CACHE.clear()

e2 = Engine(spark, sf, RPTConfig(min_probe_rows=0, **unc))
e2.sql(chain_sql)
print("rewritten:", e2.last_sql_rewritten)
print("applied ops:", [(o.build, o.probe, o.probe_cols, getattr(o, "phase", "?"))
                       for o in e2.last_result.applied])
print("drops:", e2.last_result.drops)
print("_dual_rf:", e2._dual_rf)
print("conf after:", spark.conf.get(_ENABLED))
