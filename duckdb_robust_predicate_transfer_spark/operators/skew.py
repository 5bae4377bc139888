"""Skew-aware join: key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
explicit fallback for the case AQE cannot fix: a *single* hot key
whose rows exceed one task's memory — at 100 TB a handful of hot join
keys (a null-ish default id, a mega-customer) can stall a stage for
hours.

Mechanism (standard, e.g. the Spark SQL performance literature):
replicate the build side R times with salt 0..R-1, scatter the probe
side's hot rows uniformly over the R salts, then join on
(key, salt) — the hot key's rows now spread over R tasks. Cold keys
keep salt 0 on both sides, so the replication cost is bounded by
R x |hot build rows|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(probe: DataFrame, build: DataFrame, probe_key: str,
                build_key: str, hot_keys: list | None = None,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the probe side's hot keys scattered over
    ``n_salts`` salts and the build side replicated only for those
    keys.

    ``hot_keys``: known-hot key values (from stats or a prior
    ``detect_hot_keys``). None => salt every key (uniform scatter,
    build replicated n_salts times — only for extreme cases).
    """
    if hot_keys is not None:
        hot = F.col(probe_key).isin(*hot_keys)
        probe_s = probe.withColumn(
            "__salt", F.when(hot, (F.rand(seed=42) * n_salts)
                             .cast("int")).otherwise(F.lit(0)))
        bhot = F.col(build_key).isin(*hot_keys)
        salts = F.when(
            bhot, F.sequence(F.lit(0), F.lit(n_salts - 1))
        ).otherwise(F.array(F.lit(0)))
    else:
        probe_s = probe.withColumn(
            "__salt", (F.rand(seed=42) * n_salts).cast("int"))
        salts = F.sequence(F.lit(0), F.lit(n_salts - 1))
    build_s = (build.withColumn("__salts", salts)
               .withColumn("__salt", F.explode("__salts"))
               .drop("__salts"))
    out = probe_s.join(
        build_s,
        (F.col(probe_key) == F.col(build_key))
        & (probe_s["__salt"] == build_s["__salt"]), how)
    return out.drop("__salt")


def detect_hot_keys(df: DataFrame, key: str, top_n: int = 20,
                    min_share: float = 0.01,
                    sample_fraction: float = 0.01, seed: int = 42) -> list:
    """Keys holding more than ``min_share`` of the rows, estimated from
    a ``sample_fraction`` sample of the single projected key column —
    never a full pass over the table. A key owning >=1% of 100 TB
    appears in a 1% sample tens of thousands of times, so the binomial
    error on its share is negligible; rare keys missed by the sample
    are by definition not hot. One small collect of at most ``top_n``
    values; the result feeds ``salted_join(hot_keys=...)``.

    The join result is identical whichever keys are (not) salted, so
    sampling noise can never change correctness — only partitioning.
    """
    s = df.select(key).sample(fraction=sample_fraction, seed=seed)
    total = s.count()
    if total == 0:
        return []
    rows = (s.groupBy(key).count()
            .filter(F.col("count") >= max(1.0, min_share * total))
            .orderBy(F.col("count").desc(), F.col(key)).limit(top_n)
            .collect())
    return [r[0] for r in rows]
