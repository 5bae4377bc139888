"""Streaming == batch equivalence on the same events data (availableNow
trigger = the backfill path)."""

import pyspark.sql.functions as F

from duckdb_robust_predicate_transfer_spark.streaming.ops import (
    read_event_stream, run_complete_to_memory, windowed_event_counts)


def test_windowed_counts_stream_equals_batch(spark, sf_dir):
    stream = read_event_stream(spark, sf_dir)
    got = run_complete_to_memory(
        windowed_event_counts(stream), "win_counts_test")
    rows = {tuple(r) for r in
            got.select("window_start", "event_type", "n_events").collect()}

    from duckdb_robust_predicate_transfer_spark.catalog import get_catalog
    ev = get_catalog(spark, sf_dir).table("events")
    batch = (ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                        "event_type")
             .agg(F.count(F.lit(1)).alias("n_events")))
    expect = {tuple(r) for r in batch.collect()}
    assert rows == expect


def test_sessionize_stream_runs(spark, sf_dir):
    from duckdb_robust_predicate_transfer_spark.streaming.ops import (
        run_to_memory, sessionize_stream)

    stream = read_event_stream(spark, sf_dir)
    got = run_to_memory(sessionize_stream(stream), "sessions_test")
    # append mode emits only *closed* sessions; with a single file batch
    # the tail sessions stay open, so we only sanity-check shape/ordering
    rows = got.collect()
    for r in rows:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1


def test_sessionize_stream_equals_batch_including_final_session(
        spark, sf_dir, tmp_path):
    """Full stream == batch equivalence: the events are split into
    time-ordered micro-batch files plus a far-future sentinel event, so
    the advancing watermark's event-time TIMEOUT must flush every real
    user's final session — the case the gap-close alone can never emit."""
    import os

    from duckdb_robust_predicate_transfer_spark.streaming.ops import (
        run_to_memory, sessionize_stream)

    # normalized events split into 3 time-ordered files + sentinel
    from datetime import timedelta

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
    sdir = str(tmp_path / "ev_stream")
    os.makedirs(sdir, exist_ok=True)
    for i, p in enumerate(parts + [sentinel]):
        tmp = str(tmp_path / f"tmp_b{i}")
        p.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(sdir, f"b{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        # file-stream batch order follows modification time
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    stream = read_event_stream(spark, sdir, glob="*.parquet")
    got = run_to_memory(sessionize_stream(stream), "sessions_full_test")
    got_rows = sorted(
        tuple(r) for r in
        got.filter(F.col("user_id") >= 0)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect())

    # batch twin: per-event session ids -> per-session aggregates
    from duckdb_robust_predicate_transfer_spark.workload.pipeline import (
        q_events_sessionize)
    from duckdb_robust_predicate_transfer_spark.catalog import get_catalog

    ev = get_catalog(spark, sf_dir).table("events")
    sess = q_events_sessionize(spark, sf_dir)
    expect_rows = sorted(
        tuple(r) for r in
        ev.select("user_id", "event_id", "ts")
        .join(sess, ["user_id", "event_id"])
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "session_start", "session_end", "n_events")
        .collect())
    assert got_rows == expect_rows


def test_dedup_stream_removes_duplicates(spark, sf_dir):
    from duckdb_robust_predicate_transfer_spark.streaming.ops import (
        dedup_stream, run_to_memory)

    stream = read_event_stream(spark, sf_dir)
    got = run_to_memory(dedup_stream(stream), "dedup_test")
    n = got.count()

    from duckdb_robust_predicate_transfer_spark.catalog import get_catalog
    ev = get_catalog(spark, sf_dir).table("events")
    assert n == ev.dropDuplicates(["event_id"]).count()
    assert got.groupBy("event_id").count().filter("count > 1").count() == 0


def test_stream_stream_join_matches_batch(spark, sf_dir):
    from duckdb_robust_predicate_transfer_spark.catalog import get_catalog
    from duckdb_robust_predicate_transfer_spark.streaming.ops import (
        run_to_memory, stream_stream_conversions)

    stream = read_event_stream(spark, sf_dir)
    got = run_to_memory(stream_stream_conversions(stream, window_s=3600),
                        "ss_join_test")

    ev = get_catalog(spark, sf_dir).table("events")
    v = (ev.filter(F.col("event_type") == "view")
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("v_ts")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts")))
    expect = v.join(
        p, (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 3600 SECONDS")),
        "inner").select("view_id", "purchase_id")
    assert (sorted(map(tuple, got.select("view_id", "purchase_id").collect()))
            == sorted(map(tuple, expect.collect())))


def test_enriched_stream_matches_batch_join(spark, sf_dir):
    from duckdb_robust_predicate_transfer_spark.catalog import get_catalog
    from duckdb_robust_predicate_transfer_spark.streaming.ops import (
        enriched_stream, run_to_memory)

    cust = (get_catalog(spark, sf_dir).table("customer")
            .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    stream = read_event_stream(spark, sf_dir)
    got = run_to_memory(
        enriched_stream(stream, cust).select("event_id", "c_mktsegment"),
        "enrich_test")

    ev = get_catalog(spark, sf_dir).table("events")
    expect = (ev.join(cust, on="user_id", how="left")
              .select("event_id", "c_mktsegment"))
    assert (sorted(map(tuple, got.collect()))
            == sorted(map(tuple, expect.collect())))


def test_curated_doc_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming curation ingest == batch gates + dedup on the same
    documents: split the corpus into two micro-batch files with
    injected ingest timestamps; the gate survivors' distinct content
    hashes must match the batch pipeline exactly (dedup reps may
    differ between arrival order and batch hash order, so compare the
    deduplicated content-hash sets)."""
    import os
    from datetime import datetime

    from duckdb_robust_predicate_transfer_spark.catalog import get_catalog
    from duckdb_robust_predicate_transfer_spark.functions import text as T
    from duckdb_robust_predicate_transfer_spark.streaming.ops import (
        curated_doc_stream, run_to_memory)

    docs = get_catalog(spark, sf_dir).table("documents")
    half = docs.count() // 2
    parts = [docs.filter(F.col("doc_id") < half),
             docs.filter(F.col("doc_id") >= half)]
    sdir = str(tmp_path / "doc_stream")
    os.makedirs(sdir, exist_ok=True)
    for i, p in enumerate(parts):
        ts = datetime(2024, 1, 1, 10 + i)
        tmp = str(tmp_path / f"doc_tmp_b{i}")
        (p.withColumn("ingest_ts", F.lit(ts).cast("timestamp"))
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(sdir, f"b{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    schema = (spark.read.parquet(sdir).schema)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(sdir))
    got = run_to_memory(curated_doc_stream(stream), "curated_docs_test")
    got_hashes = sorted(r.content_h for r in
                        got.select("content_h").distinct().collect())

    batch = (docs.filter((T.lang_guess() == "en")
                         & (T.quality_passes() == 1))
             .select(F.md5("text").alias("content_h")).distinct())
    expect_hashes = sorted(r.content_h for r in batch.collect())
    assert got_hashes == expect_hashes
    # every emitted row is unique per content hash (dedup held)
    assert got.count() == got.select("content_h").distinct().count()


def test_asof_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming as-of == batch as-of on the same events: time-ordered
    micro-batch files + a far-future sentinel advance the watermark so
    every real probe flushes; matches must agree with the batch
    union+window operator exactly, including NULL (no prior ref)."""
    import os

    from duckdb_robust_predicate_transfer_spark.operators.asof import (
        asof_join)
    from duckdb_robust_predicate_transfer_spark.streaming.ops import (
        asof_stream, read_event_stream, run_to_memory)

    from datetime import timedelta

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
    sdir = str(tmp_path / "asof_stream")
    os.makedirs(sdir, exist_ok=True)
    for i, p in enumerate(parts + [sentinel]):
        tmp = str(tmp_path / f"asof_tmp_b{i}")
        p.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(sdir, f"b{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    stream = read_event_stream(spark, sdir, glob="*.parquet")
    got = run_to_memory(asof_stream(stream), "asof_stream_test")
    got_rows = sorted(
        tuple(r) for r in
        got.filter(F.col("user_id") >= 0)
        .select("event_id", "user_id", "purchase_ts", "purchase_value")
        .collect())

    from duckdb_robust_predicate_transfer_spark.catalog import get_catalog
    ev = get_catalog(spark, sf_dir).table("events")
    views = (ev.filter(F.col("event_type") == "view")
             .select("event_id", "user_id", "ts"))
    buys = (ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id", "ts")
            .agg(F.max("value").alias("purchase_value")))
    expect_rows = sorted(
        tuple(r) for r in
        asof_join(views, buys, on="user_id", payload=["purchase_value"],
                  matched_ts="purchase_ts")
        .select("event_id", "user_id", "purchase_ts", "purchase_value")
        .collect())
    assert got_rows == expect_rows
