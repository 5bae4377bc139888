"""Bloom-filter sketch transfer tier.

Plays the role of the reference's PTBloomFilter (bloom_filter.cpp:
27-78 — a DataChunk wrapper over a blocked Bloom filter living in its
DuckDB fork): when a build side's key set is too large to ship as an
exact key DataFrame, transfer a fixed-size bitmap sketch instead.

Not a port: the reference uses an Arrow-Acero blocked filter with
cache-line blocks and a 1024-entry mask table (README.md:25-32); ours
is a numpy bitmap with classic double hashing (Kirsch-Mitzenmatter),
because the expensive part in Spark is the shuffle we avoid, not the
per-probe cache misses. What we keep from the reference is the
*sizing rule*: bits = NextPowerOfTwo(max(512, est_rows * 12)), ~8+
bits/key after rounding up (physical_create_bf.cpp:385-406).

Build: xxhash64 of the key columns (JVM) -> per-partition numpy
bitmaps (mapInPandas) -> OR at the driver (tiny: bitmap bytes, not
rows). Probe: broadcast bitmap + vectorized pandas UDF over the same
xxhash64 — Arrow-batched, no Python row loop.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType

N_HASHES = 5


def _size_bits(est_rows: float) -> int:
    bits = max(512, int(est_rows) * 12)
    return 1 << (bits - 1).bit_length()


def _positions(h: np.ndarray, m_bits: int) -> np.ndarray:
    """k bit positions per 64-bit hash via double hashing:
    pos_i = (h1 + i * h2) mod m. Returns shape (k, n)."""
    h = h.astype(np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    i = np.arange(N_HASHES, dtype=np.uint64).reshape(-1, 1)
    return ((h1 + i * h2) % np.uint64(m_bits)).astype(np.int64)


def _or_bitmaps(a: bytes, b) -> bytes:
    """OR-combine two serialized bitmaps (b may be a (bytes, count) seq
    element or another accumulator)."""
    bm = b[0] if isinstance(b, tuple) else b
    return (np.frombuffer(a, dtype=np.uint8)
            | np.frombuffer(bm, dtype=np.uint8)).tobytes()


def _build_once(hashes: DataFrame, m_bits: int) -> tuple:
    """One distributed build pass -> (bitmap bytes, observed row count).

    Per-partition numpy bitmaps (the analogue of PhysicalCreateBF's
    thread-local sinks, physical_create_bf.cpp:201-275) are OR-merged
    with ``treeAggregate`` so combining happens on EXECUTORS: with P
    partitions and an m/8-byte filter the driver receives ~sqrt(P)
    bitmaps at depth 2 (~P^(1/3) at depth 3), never P of them — at 10k
    partitions x 8 MB a driver-side collect would be 80 GB."""
    n_bytes = m_bits // 8

    def per_partition(it):
        import pandas as pd

        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        n = 0
        for pdf in it:
            if len(pdf):
                n += len(pdf)
                pos = _positions(pdf["h"].to_numpy(), m_bits).ravel()
                np.bitwise_or.at(bitmap, pos >> 3,
                                 np.uint8(1) << (pos & 7).astype(np.uint8))
        if n:
            yield pd.DataFrame({"bm": [bitmap.tobytes()], "n": [n]})

    parts = hashes.mapInPandas(per_partition, "bm binary, n long").rdd
    n_parts = parts.getNumPartitions()
    depth = 2 if n_parts <= 1024 else 3
    zero = (bytes(n_bytes), 0)
    bitmap, n_rows = parts.treeAggregate(
        zero,
        lambda acc, row: (_or_bitmaps(acc[0], row.bm), acc[1] + row.n),
        lambda a, b: (_or_bitmaps(a[0], b[0]), a[1] + b[1]),
        depth=depth)
    return bitmap, n_rows


def build_bloom(df: DataFrame, cols, est_rows: float) -> bytes:
    """Distributed Bloom build with the reference's resize rule: if the
    observed build cardinality overflows the allocated bits (more than
    ~m/12 keys for our 12-bits/key sizing), rebuild once at the
    observed size — the analogue of PhysicalCreateBF rehashing into a
    bigger filter on underestimate (physical_create_bf.cpp:385-406).
    Estimates from parquet footers are upper bounds (builds only
    shrink), so the second pass fires only when the caller guessed."""
    hashes = df.select(F.xxhash64(*cols).alias("h"))
    est = est_rows
    for attempt in range(2):
        m_bits = _size_bits(est)
        bitmap, n_rows = _build_once(hashes, m_bits)
        if n_rows * 12 <= m_bits or attempt == 1:
            return bitmap
        est = n_rows
    return bitmap


def probe_bloom(df: DataFrame, cols, bloom_bytes: bytes) -> DataFrame:
    """Filter df to rows whose key hash might be in the filter
    (PhysicalUseBF's LookupSel -> selection vector,
    physical_use_bf.cpp:128-190, as an Arrow-batched vectorized UDF)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom_bytes)
    m_bits = len(bloom_bytes) * 8

    @F.pandas_udf(BooleanType())
    def might_contain(h):
        import pandas as pd

        bitmap = np.frombuffer(bc.value, dtype=np.uint8)
        pos = _positions(h.to_numpy(), m_bits)
        hit = np.ones(len(h), dtype=bool)
        for i in range(N_HASHES):
            p = pos[i]
            hit &= (bitmap[p >> 3] >> (p & 7).astype(np.uint8)) & 1 == 1
        return pd.Series(hit)

    return df.filter(might_contain(F.xxhash64(*cols)))
