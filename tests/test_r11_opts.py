"""Contract tests for the r11 optimizations.

1. Bucketed-state-key streaming operators (streaming/ops.py
   ``n_buckets``): coarsening the applyInPandasWithState key from
   ``user_id`` to ``pmod(xxhash64(user_id), n)`` with per-user
   sub-state must emit EXACTLY the per-user operator's rows — the
   optimization removes per-group fixed cost, never changes output.
2. Double pointer-jump connected components (operators/cluster.py):
   two label-chain contractions per checkpointed round must reach the
   same fixpoint labels, in no more driver rounds than before.
"""

import os
from datetime import timedelta

import pyspark.sql.functions as F


def _event_drop_zone(spark, sf_dir, tmp_path, tag):
    """Three time-ordered micro-batch files + far-future sentinel —
    the same shape as the pipeline's stream fixtures."""
    from duckdb_robust_predicate_transfer_spark.catalog import get_catalog

    raw = get_catalog(spark, sf_dir).table("events")
    qs = (raw.select(F.unix_micros("ts").alias("us"))
          .approxQuantile("us", [0.33, 0.66], 0.01))
    us = F.unix_micros("ts")
    parts = [raw.filter(us <= qs[0]),
             raw.filter((us > qs[0]) & (us <= qs[1])),
             raw.filter(us > qs[1])]
    far_future = (raw.agg(F.max("ts")).collect()[0][0]
                  + timedelta(days=11))
    sentinel = spark.createDataFrame(
        [(-1, far_future, -1, "view", 0.0, "{}")], raw.schema)
    sdir = str(tmp_path / f"zone_{tag}")
    os.makedirs(sdir, exist_ok=True)
    for i, p in enumerate(parts + [sentinel]):
        tmp = str(tmp_path / f"tmp_{tag}_b{i}")
        p.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(sdir, f"b{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    return sdir


def test_bucketed_sessionize_equals_per_user(spark, sf_dir, tmp_path):
    from duckdb_robust_predicate_transfer_spark.streaming.ops import (
        read_event_stream, run_to_memory, sessionize_stream)

    sdir = _event_drop_zone(spark, sf_dir, tmp_path, "sess")
    cols = ["user_id", "session_start", "session_end", "n_events"]

    per_user = run_to_memory(
        sessionize_stream(read_event_stream(spark, sdir, glob="*.parquet")),
        "r11_sess_per_user")
    expect = sorted(tuple(r) for r in per_user.select(*cols).collect())
    assert expect, "fixture produced no sessions"

    for nb in (1, 7, 64):
        got = run_to_memory(
            sessionize_stream(
                read_event_stream(spark, sdir, glob="*.parquet"),
                n_buckets=nb),
            f"r11_sess_bucketed_{nb}")
        rows = sorted(tuple(r) for r in got.select(*cols).collect())
        assert rows == expect, f"n_buckets={nb} diverged"


def test_bucketed_asof_equals_per_user(spark, sf_dir, tmp_path):
    from duckdb_robust_predicate_transfer_spark.streaming.ops import (
        asof_stream, read_event_stream, run_to_memory)

    sdir = _event_drop_zone(spark, sf_dir, tmp_path, "asof")
    cols = ["event_id", "user_id", "ts", "purchase_ts", "purchase_value"]

    per_user = run_to_memory(
        asof_stream(read_event_stream(spark, sdir, glob="*.parquet")),
        "r11_asof_per_user")
    expect = sorted((tuple(r) for r in per_user.select(*cols).collect()),
                    key=str)
    assert expect, "fixture produced no asof matches"

    for nb in (1, 7, 64):
        got = run_to_memory(
            asof_stream(read_event_stream(spark, sdir, glob="*.parquet"),
                        n_buckets=nb),
            f"r11_asof_bucketed_{nb}")
        rows = sorted((tuple(r) for r in got.select(*cols).collect()),
                      key=str)
        assert rows == expect, f"n_buckets={nb} diverged"


def test_cc_double_jump_same_fixpoint_fewer_rounds(spark):
    from duckdb_robust_predicate_transfer_spark.operators.cluster import (
        connected_components)

    # 64-node chain: worst-case diameter for its size. One propagation
    # step + two in-round contractions must contract it within 4 label-
    # changing rounds (the single-contraction variant needed 6).
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long")
    capped = sorted(map(tuple, connected_components(
        pairs, max_iters=4).collect()))
    assert capped == [(i, 0) for i in range(64)]

    # star + triangle + singleton-pair mix: correctness of min labels
    mix = spark.createDataFrame(
        [(100, i) for i in (101, 102, 103)]
        + [(200, 201), (201, 202), (202, 200), (300, 301)],
        "id_a long, id_b long")
    got = dict(connected_components(mix).collect())
    assert {n: got[n] for n in (100, 101, 102, 103)} == {
        n: 100 for n in (100, 101, 102, 103)}
    assert {got[200], got[201], got[202]} == {200}
    assert got[300] == 300 and got[301] == 300


def test_footer_ts_range_matches_agg(spark, sf_dir):
    """3. Footer-stat stream prep (workload/pipeline._footer_ts_us):
    the metadata-only (min, max) of events.ts must equal the values the
    replaced scan-and-aggregate job produced, so the ts-range cuts and
    the far-future sentinel are byte-identical to the agg-job path."""
    from duckdb_robust_predicate_transfer_spark.catalog import get_catalog
    from duckdb_robust_predicate_transfer_spark.workload.pipeline import (
        _EPOCH, _footer_ts_us)

    cat = get_catalog(spark, sf_dir)
    rng = _footer_ts_us(cat.path("events"))
    assert rng is not None, "fixture footers should carry ts statistics"
    lo, hi, mx = cat.table("events").agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts")),
        F.max("ts")).collect()[0]
    assert rng == (lo, hi)
    from datetime import timedelta
    assert _EPOCH + timedelta(microseconds=rng[1]) == mx


def test_footer_ts_range_none_without_stats(tmp_path):
    """Statistics-free parquet must fall back (return None), keeping
    the original agg-job path alive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_robust_predicate_transfer_spark.workload.pipeline import (
        _footer_ts_us)

    t = pa.table({"ts": pa.array([1, 2, 3], type=pa.timestamp("us"))})
    p = str(tmp_path / "nostats.parquet")
    pq.write_table(t, p, write_statistics=False)
    assert _footer_ts_us(p) is None


def test_cc_pairs_canonical_same_labels(spark):
    """4. pairs_canonical skips the edge-dedup exchange; labels must be
    identical to the default path on canonical (distinct, a<b) input."""
    from duckdb_robust_predicate_transfer_spark.operators.cluster import (
        connected_components)

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (10, 12)],
        "id_a long, id_b long")
    base = sorted(map(tuple, connected_components(pairs).collect()))
    fast = sorted(map(tuple, connected_components(
        pairs, pairs_canonical=True).collect()))
    assert fast == base == [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5),
                            (10, 10), (11, 10), (12, 10)]
