"""Bloom-filter sketch transfer tier — fully JVM-side.

Plays the role of the reference's PTBloomFilter (bloom_filter.cpp:
27-78 — a DataChunk wrapper over a blocked Bloom filter living in its
DuckDB fork): when a build side's key set is too large to ship as an
exact key DataFrame, transfer a fixed-size bitmap sketch instead.

Not a port: the reference uses an Arrow-Acero blocked filter with
cache-line blocks and a 1024-entry mask table (README.md:25-32). The
first Spark formulation here used per-partition numpy bitmaps +
``treeAggregate`` and a pandas-UDF probe — correct, but every probe
row crossed the JVM->Arrow->Python boundary, and at bench scale the
sketch leg ran ~2x SLOWER than no transfer at all. This version keeps
both sides inside whole-stage codegen:

- **Build**: ``xxhash64`` -> k=3 bit positions per key (classic
  Kirsch-Mitzenmatter double hashing, in SQL arithmetic) ->
  ``explode`` -> ``groupBy(word).agg(bit_or(bit))``. The map-side
  partial aggregate collapses each partition to at most m/64 words
  before the shuffle, so shuffle volume is bounded by
  partitions x m/64 regardless of build row count — the same bound a
  treeAggregate gives, with zero Python. The driver receives the
  SPARSE word list once (<= m/8 bytes total), never a bitmap per
  partition.
- **Probe**: the dense bitmap ships back as ONE broadcast row holding
  an ``array<long>``; the membership test is k ``element_at`` +
  bit-shift SQL expressions fused into the probe scan's codegen stage
  (PhysicalUseBF's LookupSel -> selection vector,
  physical_use_bf.cpp:128-190). No join, no UDF, no shuffle.

What we keep from the reference is the *sizing rule*: bits =
NextPowerOfTwo(max(512, est_rows * 12)), ~8+ bits/key after rounding
up, with a one-shot rebuild at the observed cardinality when the
estimate was too low (physical_create_bf.cpp:385-406).

Scale note: the bitmap transits the driver (m/8 bytes, ~4.5 MB for a
3M-key build) and is broadcast once. Beyond ~100M distinct keys
(~150 MB bitmap) broadcasting stops paying and the exact key-set
semi-join tier is the right tool — callers gate on
``sketch_threshold_rows`` for the lower bound and should prefer exact
transfer above ``broadcast_key_rows``-scale builds.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

# k=3 probes: at the 12-bits/key sizing below the false-positive rate is
# (1 - e^(-3/12))^3 ~ 1% — ample for a pre-filter whose survivors still
# pass through the exact join — and the probe predicate (the per-row cost
# on the BIG side) is 40% cheaper than the classic k=5.
N_HASHES = 3


def _size_bits(est_rows: float) -> int:
    bits = max(512, int(est_rows) * 12)
    return 1 << (bits - 1).bit_length()


def _pos_sql(h: str, i: int, m_bits: int) -> str:
    """SQL for bit position i of 64-bit hash column ``h`` via double
    hashing: pos_i = (h1 + i * h2) mod m with h1 = low 32 bits,
    h2 = high 32 bits | 1 (odd => full-period stepping). All terms stay
    below 5 * 2^32, no signed overflow."""
    h1 = f"({h} & 4294967295)"
    h2 = f"(shiftrightunsigned({h}, 32) | 1)"
    return f"pmod({h1} + {i} * {h2}, {m_bits})"


class BloomSketch:
    """Driver-side handle: dense bitmap as int64 words + sizing info.

    ``len(sketch)`` is the bitmap size in bytes (the reference exposes
    the same through its filter allocation, bloom_filter.hpp:22-57).
    ``ranges`` carries per-build-column (min, max) when the build pass
    was asked to fold them in (stat_cols) — the CreateBF min/max
    piggyback, physical_create_bf.cpp:331-345.
    """

    def __init__(self, words: list, m_bits: int, n_rows: int,
                 ranges: dict | None = None):
        self.words = words
        self.m_bits = m_bits
        self.n_rows = n_rows
        self.ranges = ranges or {}

    def __len__(self) -> int:
        return self.m_bits // 8


def _build_once(hashes: DataFrame, m_bits: int, stat_cols=()) -> tuple:
    """One distributed JVM build pass -> (dense int64 word list,
    observed build row count, {stat_col: (min, max)}). The per-word
    position count rides along in the same aggregation: its total is
    exactly n_rows * k, so the observed cardinality costs no extra job
    (the reference counts rows in its sink for the same purpose,
    physical_create_bf.cpp:201-242). min/max of ``stat_cols`` ride the
    same per-word partials and fold to global extrema on the driver —
    the explode's x3 row duplication cannot change a min or a max, and
    the per-word shuffle rows only grow by a few columns, so the whole
    min/max+count+bitmap bundle costs ONE scan of the build lineage.
    """
    pos_arr = ", ".join(_pos_sql("__h", i, m_bits) for i in range(N_HASHES))
    carry = [c for c in stat_cols]
    stat_aggs = [a for c in carry
                 for a in (F.min(c).alias(f"__min_{c}"),
                           F.max(c).alias(f"__max_{c}"))]
    # Arrow-batched driver transfer (toPandas): the word-partial result
    # is m/64 rows and the row-at-a-time py4j collect() was measured as
    # the dominant cost of the whole build job (~1 s at 131k words where
    # the distributed agg itself took ~0.5 s)
    pdf = (hashes
           .selectExpr(f"explode(array({pos_arr})) AS pos",
                       *[f"`{c}`" for c in carry])
           .selectExpr("shiftright(pos, 6) AS word",
                       "shiftleft(1L, cast(pos % 64 AS int)) AS bit",
                       *[f"`{c}`" for c in carry])
           .groupBy("word")
           .agg(F.bit_or("bit").alias("bits"),
                F.count(F.lit(1)).alias("cnt"), *stat_aggs)
           .toPandas())
    n_rows = int(pdf["cnt"].sum()) // N_HASHES
    ranges = {}
    for c in carry:
        col = pdf[f"__min_{c}"].dropna()
        if len(col):
            lo, hi = col.min(), pdf[f"__max_{c}"].dropna().max()
            # numpy scalars -> plain Python so F.lit() gets exact types
            lo = lo.item() if hasattr(lo, "item") else lo
            hi = hi.item() if hasattr(hi, "item") else hi
            ranges[c] = (lo, hi)
    dense = np.zeros(m_bits // 64, dtype=np.int64)
    if len(pdf):
        dense[pdf["word"].to_numpy(dtype=np.int64)] = \
            pdf["bits"].to_numpy(dtype=np.int64)
    # keep the ndarray: at sketch_max_keys the bitmap is ~12M words, and
    # materializing a Python int list on every build is pure waste when
    # only the non-Arrow probe handoff needs plain ints — that branch
    # converts at probe time (ADVICE r5; the r4 numpy-rejection
    # regression is still covered by test_bloom_probe_without_arrow)
    return dense, n_rows, ranges


def build_bloom(df: DataFrame, cols, est_rows: float,
                stat_cols=()) -> BloomSketch:
    """Distributed Bloom build with the reference's resize rule: if the
    observed build cardinality overflows the allocated bits (more than
    ~m/12 keys for our 12-bits/key sizing), rebuild once at the
    observed size — the analogue of PhysicalCreateBF rehashing into a
    bigger filter on underestimate (physical_create_bf.cpp:385-406).
    Estimates from parquet footers are upper bounds (builds only
    shrink), so the second pass fires only when the caller guessed.
    ``stat_cols`` (a subset of df's columns) fold min/max into the same
    build pass; results land on the returned sketch's ``ranges``."""
    hashes = df.select(F.xxhash64(*cols).alias("__h"), *stat_cols)
    est = est_rows
    for attempt in range(2):
        m_bits = _size_bits(est)
        words, n_rows, ranges = _build_once(hashes, m_bits, stat_cols)
        if n_rows * 12 <= m_bits or attempt == 1:
            break
        est = n_rows
    return BloomSketch(words, m_bits, n_rows, ranges)


def probe_bloom(df: DataFrame, cols, sketch: BloomSketch) -> DataFrame:
    """Filter df to rows whose key hash might be in the filter. The
    bitmap rides in as one broadcast row; the k bit tests are plain SQL
    expressions inside the probe scan's codegen stage — false positives
    pass (later exact joins drop them), true matches never fail."""
    spark = df.sparkSession
    # bitmap handoff, session-adaptive (r4 regression + its fix):
    # - Arrow ON: one-row pandas frame rides the Arrow path — the fast
    #   lane that closed the sketch tier to ~1.1x of exact keys (the
    #   py4j transfer dominated the build job before r4).
    # - Arrow OFF (the DRIVER's harness session): plain Python ints —
    #   the non-Arrow row verifier rejects numpy scalars
    #   (FIELD_DATA_TYPE_UNACCEPTABLE numpy.int64, the r4 red row).
    # Locked by test_bloom_probe_without_arrow.
    arrow_on = "true" == str(spark.conf.get(
        "spark.sql.execution.arrow.pyspark.enabled", "false")).lower()
    if arrow_on:
        import pandas as pd

        words = np.asarray(sketch.words, dtype=np.int64)
        arr_df = spark.createDataFrame(pd.DataFrame({"__bm": [words]}),
                                       schema="__bm array<bigint>")
    else:
        words = [int(w) for w in sketch.words]
        arr_df = spark.createDataFrame([(words,)],
                                       schema="__bm array<bigint>")
    out = (df.withColumn("__h", F.xxhash64(*cols))
           .crossJoin(F.broadcast(arr_df)))
    conds = []
    for i in range(N_HASHES):
        p = _pos_sql("__h", i, sketch.m_bits)
        conds.append(F.expr(
            f"(shiftright(element_at(__bm, cast(shiftright({p}, 6) AS int)"
            f" + 1), cast({p} % 64 AS int)) & 1) = 1"))
    pred = conds[0]
    for c in conds[1:]:
        pred = pred & c
    return out.filter(pred).drop("__bm", "__h")
