"""Shared helpers for declared queries.

Cross-engine determinism rules (SURVEY.md section 7 "What's hard" #5):

- money aggregates go through DECIMAL(18,4): the double expression is
  identical IEEE arithmetic on both engines; casting each term to
  decimal makes the *summation* exact and order-independent, and the
  final cast back to double is deterministic. This sidesteps
  float-summation-order divergence entirely.
- counts are BIGINT on both engines; year()/etc cast to INT.
- timestamps compare under a UTC session timezone.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession, functions as F

from ..engine import Engine, Rel  # noqa: F401  (re-exported for queries)
from ..config import RPTConfig


#: process-wide config override for declared queries (bench ablations:
#: time the same query surface with the rewrite on vs off, the
#: reference's test_job_queries.sh baseline/rpt protocol)
_CONFIG_OVERRIDE: RPTConfig | None = None


def set_default_config(config: RPTConfig | None) -> None:
    global _CONFIG_OVERRIDE
    _CONFIG_OVERRIDE = config


#: the Engine constructed by the most recent eng() call — certification
#: tooling reads its last_result (applied ops + tiers) after building a
#: declared query, e.g. tools/gate2e_ab.py's op inventories
last_engine: Engine | None = None


def eng(spark: SparkSession, sf_dir: str, config: RPTConfig | None = None) -> Engine:
    global last_engine
    # deterministic timestamp collection vs the DuckDB oracle
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    last_engine = Engine(spark, sf_dir,
                         config if config is not None else _CONFIG_OVERRIDE)
    return last_engine


def dsum(col: Column, alias: str) -> Column:
    """Order-independent double sum via exact decimal accumulation.

    The sum is ROUNDed to 2 decimals (HALF_UP in both engines, verified
    incl. negative halves) BEFORE the double cast: that keeps the
    decimal's unscaled value under 2^53 up to ~9e13 totals, so the
    decimal->double conversion is a single exact-input correctly-rounded
    step in both engines. Without it, sums past ~9e9 (hit at 10x the
    sf0.1 fixture) diverge in the 16th digit because each engine
    double-rounds a >2^53 unscaled value differently."""
    return F.round(F.sum(col.cast("decimal(18,4)")), 2).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """avg = rounded exact decimal sum cast to double, divided by count
    (both engines then do the same single IEEE division)."""
    return (F.round(F.sum(col.cast("decimal(18,4)")), 2).cast("double")
            / F.count(col)).alias(alias)


#: the same two helpers, SQL-side (DuckDB)
def sql_dsum(expr: str, alias: str) -> str:
    return (f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,4))), 2) AS DOUBLE)"
            f" AS {alias}")


def sql_davg(expr: str, alias: str) -> str:
    return (f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,4))), 2) AS DOUBLE)"
            f" / COUNT({expr}) AS {alias}")


#: Spark's native one-hop runtime bloom filter (InjectRuntimeFilter) —
#: the built-in yardstick our multi-hop transfer is benchmarked against.
#: Its *default* gates target cluster scale: the application side's scan
#: must exceed spark.sql.optimizer.runtime.bloomFilter
#: .applicationSideScanSizeThreshold = 10GB before a bloom is even
#: considered, so on local fixtures (<=4GB scans) the rule injects
#: NOTHING and a "native" leg silently times the plain off plan
#: (verified: optimizedPlan contains zero might_contain at defaults on
#: the x100 TPC-H and cascade fixtures). Benchmark legs therefore lower
#: the scan gate and widen the creation-side cap so the native tier
#: genuinely engages — emulating the >=10GB-per-scan regime the
#: defaults assume — and restore the defaults when switching off.
_RF_ENABLED = "spark.sql.optimizer.runtime.bloomFilter.enabled"
_RF_APP_GATE = ("spark.sql.optimizer.runtime.bloomFilter."
                "applicationSideScanSizeThreshold")
_RF_CREATE_GATE = ("spark.sql.optimizer.runtime.bloomFilter."
                   "creationSideThreshold")


def set_native_rf(spark: SparkSession, on: bool) -> None:
    """Toggle Spark's native runtime bloom filters for a benchmark leg,
    with thresholds that let them fire at local fixture sizes.

    Asserting the conf also clears the engine's suppression stash
    (Engine._sync_native_rf): the stash means "restore this value when
    the next query runs un-engaged", and a leg that just asserted the
    conf OWNS it — a stale stash left by an earlier leg's ENGAGED query
    would otherwise be restored mid-leg by the first un-engaged query,
    silently timing an rpt leg with native injection live (found r8:
    un-engaged JOB rpt legs drifting toward their native-leg times;
    regression: test_leg_assertion_clears_stale_suppression_stash)."""
    if on:
        spark.conf.set(_RF_ENABLED, "true")
        spark.conf.set(_RF_APP_GATE, "64MB")
        spark.conf.set(_RF_CREATE_GATE, "1GB")
    else:
        spark.conf.set(_RF_ENABLED, "false")
        spark.conf.unset(_RF_APP_GATE)
        spark.conf.unset(_RF_CREATE_GATE)
    spark._drpt_rf_stash = None


def count_native_blooms(df) -> int:
    """Number of native runtime bloom probes (might_contain) in the
    optimized logical plan — plan-shape evidence for bench artifacts."""
    return df._jdf.queryExecution().optimizedPlan().toString().count(
        "might_contain")


REVENUE = "l_extendedprice * (1 - l_discount)"


def revenue_col() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
