"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY.md section 1: "Streams: None");
these are the north-star streaming extras, built the idiomatic way:
``readStream`` -> watermarked event-time windows -> sinks, plus a
custom stateful sessionizer via ``applyInPandasWithState`` (the
Spark-native form of a custom stateful operator).

Batch twins live in workload/pipeline.py (q_events_tumbling,
q_events_sessionize) — tests verify stream == batch on the same data
using the availableNow trigger, which is exactly how a 100 TB
backfill of the same pipeline would run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)

def read_event_stream(spark: SparkSession, sf_dir: str,
                      glob: str = "events.parquet") -> DataFrame:
    """File-based event stream (one-file-per-batch) with the same schema
    contract as ``Catalog._read_events``: ``ts`` is ``TimestampType``,
    whether the fixture stores TIMESTAMP(NANOS) or TIMESTAMP(MICROS)
    without UTC adjustment (which Spark surfaces as TIMESTAMP_NTZ).
    On a cluster this is the same code over a Kafka/file drop zone.
    ``glob`` selects the event files within ``sf_dir`` (file-stream
    sources need a directory, not a file)."""
    import glob as _glob
    import os

    from ..catalog import parquet_ts_unit
    from pyspark.sql.types import TimestampType

    sample = sorted(_glob.glob(os.path.join(sf_dir, glob)))
    units = {parquet_ts_unit(f) for f in sample}
    if len(units) > 1:
        # a drop-zone directory that accumulated files across a fixture
        # flavor change (NANOS vs MICROS-NTZ) cannot be read with one
        # static cast — converting by the first file's unit would
        # silently corrupt the other flavor's timestamps
        raise ValueError(
            f"mixed parquet timestamp units {sorted(units)} under "
            f"{sf_dir}/{glob}; normalize the directory to one flavor")
    unit = units.pop() if units else ""
    if unit == "ns":
        # Must stay set for the stream's lifetime — every micro-batch
        # re-reads parquet footers; only flipped for nanos fixtures.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = (spark.read.option("pathGlobFilter", glob)
                  .parquet(sf_dir).schema)
    stream = (spark.readStream.schema(raw_schema)
              .option("maxFilesPerTrigger", 1)
              .option("pathGlobFilter", glob)
              .parquet(sf_dir))
    if unit == "ns":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif not isinstance(stream.schema["ts"].dataType, TimestampType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type — late data
    beyond the watermark is dropped deterministically."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                 .cast("double").alias("total_value"))
            .select(F.col("win.start").alias("window_start"),
                    "event_type", "n_events", "total_value"))


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
])

#: bucketed-key variant: per-user sub-state as parallel arrays
_STATE_BUCKETED_SCHEMA = ("users array<long>, start_us array<long>, "
                          "last_us array<long>, n array<long>")


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "1 minute",
                      n_buckets: "int | None" = None) -> DataFrame:
    """Custom stateful operator: per-user session windows with a
    gap-based close, via applyInPandasWithState (the PySpark analogue
    of a custom streaming state machine).

    Sessions close two ways, so stream == batch including each user's
    LAST session:
    - in-batch: a new event more than ``gap_minutes`` after the
      previous one closes the running session immediately;
    - by event-time TIMEOUT: when the watermark passes
      ``last_event + gap``, the open session is flushed and its state
      removed — without this, the final session per user would sit in
      state forever (an append-mode sink would never see it).
    State is therefore bounded by the active-user set within one gap
    window, the only viable contract for an unbounded stream.

    ``n_buckets`` coarsens the STATE KEY from ``user_id`` to
    ``pmod(xxhash64(user_id), n_buckets)`` with per-user sub-state kept
    inside the group function (see ``asof_stream`` for the rationale —
    every applyInPandasWithState group pays a fixed per-micro-batch
    Python round trip + state-store commit; bucketing divides that
    fixed cost by users-per-bucket). The fold per user, the close
    conditions and the emitted rows are identical — only the shuffle
    key changes. ``None`` keeps the per-user key."""
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000

    def _emit(rows):
        import numpy as np
        import pandas as pd

        n = len(rows)
        return pd.DataFrame(
            {"user_id": np.fromiter((c[0] for c in rows),
                                    dtype="int64", count=n),
             "session_start": np.fromiter((c[1] for c in rows),
                                          dtype="int64",
                                          count=n).view("M8[us]"),
             "session_end": np.fromiter((c[2] for c in rows),
                                        dtype="int64",
                                        count=n).view("M8[us]"),
             "n_events": np.fromiter((c[3] for c in rows),
                                     dtype="int64", count=n)})

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            # watermark passed last_event + gap: flush the open session
            start_us, last_us, n = state.get
            state.remove()
            yield _emit([(key[0], start_us, last_us, n)])
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = -1
            n = 0
        closed = []
        for pdf in pdf_iter:
            import numpy as np

            for t in np.sort(pdf["ts"].to_numpy()
                             .astype("int64") // 1000).tolist():
                if start_us < 0:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((key[0], start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = t, n + 1
        state.update((int(start_us), int(last_us), int(n)))
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        if closed:
            yield _emit(closed)

    def fn_bucketed(key, pdf_iter, state: GroupState):
        import numpy as np

        # per-user sub-state: user -> [start_us, last_us, n]
        if state.exists:
            b_users, b_start, b_last, b_n = state.get
            st = {int(u): [int(s), int(l), int(c)]
                  for u, s, l, c in zip(b_users, b_start, b_last, b_n)}
        else:
            st = {}
        closed = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            uids = pdf["user_id"].to_numpy().astype("int64")
            ts = pdf["ts"].to_numpy().astype("int64") // 1000
            order = np.lexsort((ts, uids))
            uids, ts = uids[order], ts[order]
            cuts = np.nonzero(np.diff(uids))[0] + 1
            for u_arr, t_arr in zip(np.split(uids, cuts),
                                    np.split(ts, cuts)):
                u = int(u_arr[0])
                start_us, last_us, n = st.get(u, (-1, -1, 0))
                for t in t_arr.tolist():
                    if start_us < 0:
                        start_us, last_us, n = t, t, 1
                    elif t - last_us > gap_us:
                        closed.append((u, start_us, last_us, n))
                        start_us, last_us, n = t, t, 1
                    else:
                        last_us, n = t, n + 1
                st[u] = [start_us, last_us, n]
        # same close-by-watermark semantics as the per-user TIMEOUT:
        # the watermark passing last_event + gap flushes the session
        wm_us = state.getCurrentWatermarkMs() * 1000
        for u in sorted(u for u, (s, l, n) in st.items()
                        if l + gap_us < wm_us):
            s, l, n = st.pop(u)
            closed.append((u, s, l, n))
        if st:
            users = sorted(st)
            state.update(([int(u) for u in users],
                          [int(st[u][0]) for u in users],
                          [int(st[u][1]) for u in users],
                          [int(st[u][2]) for u in users]))
            # earliest pending close across the bucket's users; clamped
            # strictly past the watermark (Spark rejects ts <= wm — the
            # boundary case last+gap == wm stays pending, same as the
            # per-user timeout which only fires once wm passes it)
            state.setTimeoutTimestamp(
                max(min(st[u][1] for u in users) // 1000 + gap_ms,
                    wm_us // 1000 + 1))
        else:
            state.remove()
        if closed:
            yield _emit(closed)

    wm = events.withWatermark("ts", watermark)
    if n_buckets:
        # the bucket must be a concrete column (a grouping EXPRESSION
        # does not resolve under applyInPandasWithState)
        return (wm.withColumn("_ub", F.pmod(F.xxhash64("user_id"),
                                            F.lit(int(n_buckets))))
                .groupBy("_ub")
                .applyInPandasWithState(
                    fn_bucketed, SESSION_SCHEMA, _STATE_BUCKETED_SCHEMA,
                    "append", GroupStateTimeout.EventTimeTimeout))
    return (wm.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.EventTimeTimeout))


def adaptive_state_partitions(spark: SparkSession, src_dir: str,
                              glob: str = "*.parquet") -> int:
    """Stateful-shuffle partition count for a one-shot availableNow run,
    derived from the source's input BYTES — never from the core count.
    Every state partition pays, per micro-batch, a fixed state-store
    open/commit/snapshot plus (for pandas state ops) a Python-worker
    round trip; at a 2 MB drop zone those fixed costs dwarf the work, so
    partitions are capped so each holds >= ~256 KB of input (floor 4 —
    one partition serializes the pandas work and measures 2x worse).
    Any production-sized input clears the session's configured value
    unchanged, so nothing here is tuned to local mode."""
    import glob as _glob
    import os

    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        total = sum(os.path.getsize(f)
                    for f in _glob.glob(os.path.join(src_dir, glob)))
    except OSError:
        return conf
    if total <= 0:
        return conf
    need = max(4, -(-total // (256 << 10)))
    return min(conf, need)


def _ephemeral_checkpoint_dir() -> "str | None":
    """Checkpoint location for a ONE-SHOT availableNow run into a
    memory sink, on tmpfs when available. The HDFS-backed state store
    fsyncs a delta file per state partition per micro-batch into the
    checkpoint dir; measured (r11, sf0.1 asof stream): 0.8-3.5 s of
    commitTimeMs per micro-batch for 64 tiny state rows when the
    checkpoint sits on the disk-backed default temp dir. A memory-sink
    availableNow run has NO recovery contract — Spark itself deletes
    the temporary checkpoint on success — so these runs lose nothing by
    keeping it in memory. Durable streams (a real sink, a user-supplied
    checkpointLocation) are unaffected: only run_to_memory /
    run_complete_to_memory call this."""
    import os
    import uuid

    for base in ("/dev/shm", None):
        if base is None:
            return None  # let Spark pick its default temp checkpoint
        if os.path.isdir(base) and os.access(base, os.W_OK):
            path = os.path.join(base, f"drpt_ckpt_{uuid.uuid4().hex[:12]}")
            try:
                os.makedirs(path, exist_ok=True)
                return path
            except OSError:
                continue
    return None


def _run_availablenow(df: DataFrame, name: str, timeout_s: int,
                      state_partitions: "int | None", mode: str):
    """Shared one-shot runner: pins the stateful-shuffle width for the
    run (restored after — a stream pins its width at start) and puts
    the throwaway checkpoint on tmpfs (_ephemeral_checkpoint_dir).

    NOTE: the width override temporarily mutates the session-global
    ``spark.sql.shuffle.partitions`` — sound because the harness runs
    queries SEQUENTIALLY; a query planned concurrently in the same
    session during the stream run would silently pick up the reduced
    width. Scope the override via a session clone if concurrent use
    ever becomes possible."""
    import shutil

    spark = df.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt = _ephemeral_checkpoint_dir()
    try:
        if state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(int(state_partitions)))
        w = (df.writeStream.format("memory").queryName(name)
             .outputMode(mode).trigger(availableNow=True))
        if ckpt:
            w = w.option("checkpointLocation", ckpt)
        q = w.start()
        q.awaitTermination(timeout_s)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        if ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def run_to_memory(df: DataFrame, name: str, timeout_s: int = 120,
                  state_partitions: "int | None" = None):
    """Execute a streaming query with the availableNow trigger into an
    in-memory sink and return the result table (batch-equivalent run).
    ``state_partitions`` (see ``adaptive_state_partitions``) pins the
    run's stateful-shuffle width. See ``_run_availablenow`` for the
    shuffle-width and checkpoint-location notes."""
    return _run_availablenow(df, name, timeout_s, state_partitions,
                             "append")


def run_complete_to_memory(df: DataFrame, name: str, timeout_s: int = 120,
                           state_partitions: "int | None" = None):
    return _run_availablenow(df, name, timeout_s, state_partitions,
                             "complete")


def dedup_stream(events: DataFrame, keys: list | None = None,
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps a key's state only until the
    watermark passes it, so state size tracks the watermark window, not
    the stream's lifetime — the only viable contract for an unbounded
    100 TB/day stream. Batch twin: dropDuplicates on the same keys."""
    keys = keys or ["event_id"]
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys))


def curated_doc_stream(docs: DataFrame, ts_col: str = "ingest_ts",
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming corpus-curation ingest: the q_corpus_curation gates
    (language-ID + quality, functions/text.py — stateless JVM
    expressions that fuse into the scan) followed by exact content
    dedup with watermark-bounded state. The batch funnel backfills the
    corpus; this is the same pipeline for the live firehose — state is
    one md5 per distinct surviving document within the watermark
    window, the only viable contract for an unbounded ingest.
    ``docs`` must carry an event-time column ``ts_col``."""
    from ..functions import text as T

    return (docs
            .filter((T.lang_guess() == "en") & (T.quality_passes() == 1))
            .withColumn("content_h", F.md5("text"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_h"]))


def stream_stream_conversions(events: DataFrame, window_s: int = 3600,
                              watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each view event matched to the same
    user's purchases within ``window_s`` seconds after it — the
    streaming twin of the batch funnel's range join
    (workload/pipeline.py:q_events_funnel).

    BOTH sides carry watermarks and the join condition bounds the
    event-time distance, so Spark can expire join state once the
    watermark passes a row's match window — the only way a
    stream-stream join survives an unbounded stream. Without the time
    bound, state grows forever."""
    views = (events.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("v_ts"))
             .withWatermark("v_ts", watermark))
    buys = (events.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("p_user"),
                    F.col("event_id").alias("purchase_id"),
                    F.col("ts").alias("p_ts"))
            .withWatermark("p_ts", watermark))
    return (views.join(
        buys,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts")
           + F.expr(f"INTERVAL {window_s} SECONDS")),
        "inner")
        .select("view_id", "purchase_id",
                F.col("v_user").alias("user_id"), "v_ts", "p_ts"))


def enriched_stream(events: DataFrame, dim: DataFrame,
                    on: str = "user_id") -> DataFrame:
    """Stream-static join: enrich the event stream against a slowly
    changing dimension table. The static side is re-read per
    micro-batch (picking up dim updates); Spark broadcasts it when
    small — the streaming analogue of the engine's broadcast
    dimension joins."""
    return events.join(dim, on=on, how="left")


ASOF_OUT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("purchase_ts", TimestampType()),
    StructField("purchase_value", DoubleType()),
])
_ASOF_STATE_SCHEMA = ("carried_ts long, carried_val double, "
                      "ref_ts array<long>, ref_val array<double>, "
                      "probe_ts array<long>, probe_id array<long>")

#: bucketed-key variant: per-user sub-state flattened into parallel
#: arrays with a user-ownership column per buffer
_ASOF_BUCKETED_STATE_SCHEMA = (
    "c_u array<long>, c_ts array<long>, c_val array<double>, "
    "r_u array<long>, r_ts array<long>, r_val array<double>, "
    "p_u array<long>, p_ts array<long>, p_id array<long>")


def asof_stream(events: DataFrame, watermark: str = "1 minute",
                probe_type: str = "view",
                ref_type: str = "purchase",
                n_buckets: "int | None" = None) -> DataFrame:
    """Streaming as-of join: each ``probe_type`` event is matched to
    the same user's latest ``ref_type`` event at or before it — the
    streaming twin of operators/asof.py (batch query q_events_asof).

    Spark's stream-stream joins can't express "latest at or before"
    (it needs a per-key argmax over an unbounded past), so this is a
    custom stateful operator via applyInPandasWithState, watermark-
    correct by construction:

    - probe rows BUFFER in state until the event-time watermark passes
      their timestamp; only then is the match decided, because only
      then can no more on-time refs at or before it arrive. Flushes
      ride on event-time TIMEOUTs set to the earliest pending probe.
    - ref rows older than the watermark collapse into ONE carried
      (ts, value) per user — any still-pending probe is younger than
      the watermark, so only the newest collapsed ref can ever win.
      Refs tied on ts resolve to the max value, matching the batch
      twin's MAX(value) pre-aggregation.

    State per user is therefore O(watermark window) for the buffers
    plus O(1) for the carried ref — the bounded-state contract an
    unbounded stream requires. The carried ref persists indefinitely
    by design: an as-of match can reach arbitrarily far back, exactly
    like the batch operator over the full history.

    ``n_buckets`` coarsens the STATE KEY from ``user_id`` to
    ``pmod(xxhash64(user_id), n_buckets)``, keeping per-user sub-state
    inside the group function. Every applyInPandasWithState group pays
    a fixed per-micro-batch cost — a Python-worker round trip, per-
    group pandas construction, a state-store get/put — so at high key
    cardinality the operator is dominated by group COUNT, not rows
    (measured ~8 s for ~1,500 users x 4 batches at sf0.1). Bucketing
    divides the fixed cost by users-per-bucket while the per-user
    match logic, the decision watermark and the emitted rows stay
    IDENTICAL: a probe is decided when the global watermark passes its
    timestamp, whichever group invocation observes it. ``None`` keeps
    the per-user key."""
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    def fn(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            c_ts, c_val, ref_ts, ref_val, probe_ts, probe_id = state.get
            ref_ts, ref_val = list(ref_ts), list(ref_val)
            probe_ts, probe_id = list(probe_ts), list(probe_id)
        else:
            c_ts, c_val = -1, None
            ref_ts, ref_val, probe_ts, probe_id = [], [], [], []

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            # vectorized ref/probe split — this fn runs once per user
            # per micro-batch, so per-call constants dominate the op
            t_us = pdf["ts"].to_numpy().astype("int64") // 1000
            et = pdf["event_type"].to_numpy()
            rmask = et == ref_type
            pmask = et == probe_type
            ref_ts.extend(map(int, t_us[rmask]))
            ref_val.extend(map(float, pdf["value"].to_numpy()[rmask]))
            probe_ts.extend(map(int, t_us[pmask]))
            probe_id.extend(map(int, pdf["event_id"].to_numpy()[pmask]))

        wm_us = state.getCurrentWatermarkMs() * 1000
        out, keep_ts, keep_id = [], [], []
        for t, eid in zip(probe_ts, probe_id):
            if t >= wm_us:
                keep_ts.append(t)
                keep_id.append(eid)
                continue
            # match decided: latest ref <= t, ties -> max value
            best = (c_ts, c_val) if c_ts >= 0 else (None, None)
            for rt, rv in zip(ref_ts, ref_val):
                if rt <= t and (best[0] is None or (rt, rv) > best):
                    best = (rt, rv)
            out.append((eid, key[0], t, best[0], best[1]))
        # collapse watermark-passed refs into the carried (ts, value)
        keep_rts, keep_rvs = [], []
        for rt, rv in zip(ref_ts, ref_val):
            if rt >= wm_us:
                keep_rts.append(rt)
                keep_rvs.append(rv)
            elif c_ts < 0 or (rt, rv) > (c_ts, c_val):
                c_ts, c_val = rt, rv
        state.update((c_ts, c_val, keep_rts, keep_rvs, keep_ts, keep_id))
        if keep_ts:
            state.setTimeoutTimestamp(min(keep_ts) // 1000 + 1)
        elif keep_rts:
            # wake once more to collapse the remaining refs to O(1)
            state.setTimeoutTimestamp(max(keep_rts) // 1000 + 1)
        if out:
            n = len(out)
            nat = np.iinfo("int64").min  # int64-min view == NaT
            yield pd.DataFrame(
                {"event_id": np.fromiter((o[0] for o in out),
                                         dtype="int64", count=n),
                 "user_id": np.full(n, key[0], dtype="int64"),
                 "ts": np.fromiter((o[2] for o in out),
                                   dtype="int64", count=n).view("M8[us]"),
                 "purchase_ts": np.fromiter(
                     (nat if o[3] is None else o[3] for o in out),
                     dtype="int64", count=n).view("M8[us]"),
                 "purchase_value": np.array(
                     [np.nan if o[4] is None else o[4] for o in out],
                     dtype="float64")})

    def fn_bucketed(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        # per-user sub-state: u -> [c_ts, c_val, ref_ts, ref_val,
        #                           probe_ts, probe_id]
        st = {}
        if state.exists:
            c_u, c_t, c_v, r_u, r_t, r_v, p_u, p_t, p_i = state.get
            for u, t, v in zip(c_u, c_t, c_v):
                st[int(u)] = [int(t), v, [], [], [], []]
            for u, t, v in zip(r_u, r_t, r_v):
                s = st.setdefault(int(u), [-1, None, [], [], [], []])
                s[2].append(int(t))
                s[3].append(float(v))
            for u, t, i in zip(p_u, p_t, p_i):
                s = st.setdefault(int(u), [-1, None, [], [], [], []])
                s[4].append(int(t))
                s[5].append(int(i))
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            uid = pdf["user_id"].to_numpy().astype("int64")
            t_us = pdf["ts"].to_numpy().astype("int64") // 1000
            et = pdf["event_type"].to_numpy()
            rmask = et == ref_type
            pmask = et == probe_type
            val = pdf["value"].to_numpy()
            eid = pdf["event_id"].to_numpy()
            for u, t, v in zip(uid[rmask].tolist(),
                               t_us[rmask].tolist(),
                               val[rmask].tolist()):
                s = st.setdefault(u, [-1, None, [], [], [], []])
                s[2].append(t)
                s[3].append(float(v))
            for u, t, i in zip(uid[pmask].tolist(),
                               t_us[pmask].tolist(),
                               eid[pmask].tolist()):
                s = st.setdefault(u, [-1, None, [], [], [], []])
                s[4].append(t)
                s[5].append(int(i))

        wm_us = state.getCurrentWatermarkMs() * 1000
        out = []
        next_wakes = []
        for u, s in st.items():
            c_ts, c_val, ref_ts, ref_val, probe_ts, probe_id = s
            keep_ts, keep_id = [], []
            for t, pid in zip(probe_ts, probe_id):
                if t >= wm_us:
                    keep_ts.append(t)
                    keep_id.append(pid)
                    continue
                # match decided: latest ref <= t, ties -> max value
                best = (c_ts, c_val) if c_ts >= 0 else (None, None)
                for rt, rv in zip(ref_ts, ref_val):
                    if rt <= t and (best[0] is None or (rt, rv) > best):
                        best = (rt, rv)
                out.append((pid, u, t, best[0], best[1]))
            # collapse watermark-passed refs into the carried (ts, val)
            keep_rts, keep_rvs = [], []
            for rt, rv in zip(ref_ts, ref_val):
                if rt >= wm_us:
                    keep_rts.append(rt)
                    keep_rvs.append(rv)
                elif c_ts < 0 or (rt, rv) > (c_ts, c_val):
                    c_ts, c_val = rt, rv
            s[:] = [c_ts, c_val, keep_rts, keep_rvs, keep_ts, keep_id]
            if keep_ts:
                next_wakes.append(min(keep_ts))
            elif keep_rts:
                # wake once more to collapse the remaining refs to O(1)
                next_wakes.append(max(keep_rts))
        users = sorted(st)
        c_u = [u for u in users if st[u][0] >= 0 or st[u][1] is not None]
        state.update((
            c_u,
            [st[u][0] for u in c_u],
            [st[u][1] for u in c_u],
            [u for u in users for _ in st[u][2]],
            [t for u in users for t in st[u][2]],
            [v for u in users for v in st[u][3]],
            [u for u in users for _ in st[u][4]],
            [t for u in users for t in st[u][4]],
            [i for u in users for i in st[u][5]],
        ))
        if next_wakes:
            state.setTimeoutTimestamp(min(next_wakes) // 1000 + 1)
        if out:
            n = len(out)
            nat = np.iinfo("int64").min  # int64-min view == NaT
            yield pd.DataFrame(
                {"event_id": np.fromiter((o[0] for o in out),
                                         dtype="int64", count=n),
                 "user_id": np.fromiter((o[1] for o in out),
                                        dtype="int64", count=n),
                 "ts": np.fromiter((o[2] for o in out),
                                   dtype="int64", count=n).view("M8[us]"),
                 "purchase_ts": np.fromiter(
                     (nat if o[3] is None else o[3] for o in out),
                     dtype="int64", count=n).view("M8[us]"),
                 "purchase_value": np.array(
                     [np.nan if o[4] is None else o[4] for o in out],
                     dtype="float64")})

    wm = events.withWatermark("ts", watermark)
    if n_buckets:
        # concrete column, not a grouping expression (see sessionize)
        return (wm.withColumn("_ub", F.pmod(F.xxhash64("user_id"),
                                            F.lit(int(n_buckets))))
                .groupBy("_ub")
                .applyInPandasWithState(
                    fn_bucketed, ASOF_OUT_SCHEMA,
                    _ASOF_BUCKETED_STATE_SCHEMA, "append",
                    GroupStateTimeout.EventTimeTimeout))
    return (wm.groupBy("user_id").applyInPandasWithState(
        fn, ASOF_OUT_SCHEMA, _ASOF_STATE_SCHEMA, "append",
        GroupStateTimeout.EventTimeTimeout))
