"""Structured Streaming layer.

The reference (abdenlab/oxbow) has no event-time streaming — its "streams"
are pull-based batch iterators (SURVEY §1.3). This module exposes the
engine's long-scan operators through Spark Structured Streaming so the
same logical plans run incrementally: file-source ingestion, watermarked
windowed aggregation (the streaming form of the BBI-zoom binned agg), and
a custom stateful operator via ``applyInPandasWithState``.

Scale notes: the file source lists + splits new files per micro-batch, so
ingestion parallelism matches the batch reader. Watermarks bound state:
the zoom agg keeps only windows newer than (max event time − delay);
sessionization state is per-key and dropped on timeout. At 100 TB/day the
shuffle is the same single exchange per agg as the batch plan — the
streaming engine adds state-store I/O, tuned with
``spark.sql.shuffle.partitions`` (state partitions) as usual.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_S = 1800


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table (file source, explicit schema —
    streaming sources cannot infer). ts is TIMESTAMP(NANOS) parquet,
    normalized to the batch path's epoch-ns BIGINT contract (the
    normalization is a projection, so it composes with streaming)."""
    from oxbow_spark.session import normalize_event_ts

    import hashlib

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file stream source requires a directory; stage a symlink dir
    # (production tables are directories of parquet files already).
    # Keyed by a HASH OF THE FULL PATH, not the basename: two corpora
    # whose dirs share a basename (e.g. a regenerated "sf0.001" next
    # to the canonical one) must not share a stage — the round-13
    # second-corpus sweep caught the basename key silently streaming
    # the OTHER corpus' events through a stale symlink.
    key = hashlib.md5(
        os.path.abspath(os.path.normpath(sf_dir)).encode()).hexdigest()[:16]
    root = os.path.join("/tmp", "oxbow_spark_stream")
    _reap_dead_stages(root, keep=key)
    stage = os.path.join(root, key, "events")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if os.path.islink(link) and os.path.realpath(link) != \
            os.path.realpath(path):
        os.remove(link)  # stale/broken link from a prior layout
    if not os.path.exists(link):
        os.symlink(path, link)
    return normalize_event_ts(spark.readStream.schema(schema).parquet(stage))


def _reap_dead_stages(root: str, keep: str, grace: float = 300.0) -> None:
    """Remove stage dirs whose symlink targets no longer exist. The
    per-corpus path-hash key means every distinct corpus ever streamed
    leaves a stage dir behind for the life of /tmp; a long-lived service
    would accumulate them without bound. A stage whose links all dangle
    can never serve a replay (the source files are gone), so it is safe
    to reap; stages with ANY live target are kept (a checkpointed query
    may still replay them). Freshly-modified stages (mtime within
    ``grace`` seconds, including subdirs) are also kept: a concurrent
    session staging ANOTHER corpus sits momentarily between its
    makedirs and its symlink creation — a files-empty dir in that
    window is setup-in-progress, not dead, and rmtree-ing it would
    fail the other process' symlink (ADVICE r14, low)."""
    import shutil
    import time

    try:
        entries = os.listdir(root)
    except OSError:
        return
    now = time.time()
    for name in entries:
        if name == keep:
            continue
        d = os.path.join(root, name)
        if not os.path.isdir(d):
            continue
        live = False
        for dirpath, _dirs, files in os.walk(d):
            try:
                if now - os.stat(dirpath).st_mtime < grace:
                    live = True  # mid-setup by a concurrent session
                    break
            except OSError:
                live = True  # changed under us — same conclusion
                break
            for f in files:
                p = os.path.join(dirpath, f)
                if os.path.exists(p):  # follows symlinks
                    live = True
                    break
            if live:
                break
        if not live:
            shutil.rmtree(d, ignore_errors=True)


def _event_time(df: DataFrame) -> DataFrame:
    """ns long → µs-precision event-time timestamp column ``etime``."""
    return df.withColumn("etime", F.timestamp_micros(F.expr("ts div 1000")))


def stream_zoom(events: DataFrame, resolution: str = "1 hour",
                watermark: str = "10 minutes") -> DataFrame:
    """Streaming BBI-zoom equivalent: watermarked fixed-window aggregate
    per event_type carrying (bases_covered, min, max, sum, sum_squares).
    Mirrors operators.zoom.zoom_aggregate; the watermark lets the state
    store evict closed windows."""
    from oxbow_spark.operators.zoom import exact_sum

    e = _event_time(events).withWatermark("etime", watermark)
    return (
        e.groupBy(F.window("etime", resolution).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("bases_covered"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            # decimal-quantized sums: order-independent across micro-batch
            # and state-merge orders (oracle-comparable, SURVEY determinism)
            exact_sum(F.col("value"), "vsum"),
            exact_sum(F.col("value") * F.col("value"), "vsumsq"),
        )
        .select(
            F.col("event_type").alias("chrom"),
            F.col("win.start").alias("start"),
            F.col("win.end").alias("end"),
            "bases_covered", "vmin", "vmax", "vsum", "vsumsq",
        )
    )


def stream_depth(events: DataFrame, bin_size: int = 128,
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of `operators.coverage.depth_profile`: watermarked
    binned interval coverage. Each synthetic event interval
    (event_type, ts_s, ts_s + 300) explodes into the bins it touches
    (narrow, pre-aggregation), each bin carries its start as an
    event-time timestamp, and a windowed aggregate of width
    ``bin_size`` seconds produces exactly the batch operator's
    (chrom, bin) counters — the watermark lets the state store evict
    closed bins at 100 TB stream volumes."""
    iv = events.select(
        F.col("event_type").alias("chrom"),
        F.expr("ts div 1000000000").alias("_s"),
    ).withColumn("_e", F.col("_s") + 300)
    first = F.floor(F.col("_s") / bin_size).cast("long")
    last = F.floor((F.col("_e") - 1) / bin_size).cast("long")
    binned = iv.select(
        "chrom", "_s", "_e",
        F.explode(F.sequence(first, last)).alias("bin"),
    ).withColumn("_betime", F.timestamp_seconds(F.col("bin") * bin_size))
    bs = F.col("bin") * bin_size
    clipped = (F.least(F.col("_e"), bs + bin_size)
               - F.greatest(F.col("_s"), bs)).cast("long")
    return (
        binned.withColumn("_c", clipped)
        .withWatermark("_betime", watermark)
        .groupBy(F.window("_betime", f"{bin_size} seconds").alias("win"),
                 "chrom")
        .agg(F.count(F.lit(1)).alias("n_reads"),
             F.sum("_c").alias("covered_bp"))
        .select(
            "chrom",
            (F.unix_timestamp("win.start") / bin_size).cast("long")
            .alias("bin"),
            "n_reads", "covered_bp",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour",
                 keys: list[str] | None = None) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key, with
    state bounded by the event-time watermark
    (``dropDuplicatesWithinWatermark`` — duplicates arriving within the
    watermark window are dropped, state older than it is evicted). The
    streaming twin of ``operators.dedup.exact_dedup`` for ingestion-time
    dedup of training-data feeds."""
    e = _event_time(events).withWatermark("etime", watermark)
    return e.dropDuplicatesWithinWatermark(keys or ["event_id"])


_SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_us", LongType()),
    StructField("session_end_us", LongType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n", LongType()),
])


def _sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session assembly. State carries the open session; closed
    sessions are emitted as soon as a gap > SESSION_GAP_S µs is seen. A
    processing-time timeout flushes the open session when the key goes
    quiet (new event time beyond the gap ⇒ new session anyway, so the
    flush cannot split a real session)."""
    gap_us = SESSION_GAP_S * 1_000_000
    if state.hasTimedOut:
        (start, end, n) = state.get
        state.remove()
        yield pd.DataFrame([(key[0], start, end, n)],
                           columns=[f.name for f in _SESSION_SCHEMA.fields])
        return

    times: list[int] = []
    for pdf in pdfs:
        times.extend(int(t) for t in pdf["us"])
    times.sort()
    cur = list(state.get) if state.exists else None
    out = []
    for t in times:
        if cur is None:
            cur = [t, t, 0]
        elif t - cur[1] >= gap_us:
            out.append((key[0], cur[0], cur[1], cur[2]))
            cur = [t, t, 0]
        cur[1] = t
        cur[2] += 1
    if cur is not None:
        state.update(tuple(cur))
        state.setTimeoutDuration(SESSION_GAP_S * 1000)
    if out:
        yield pd.DataFrame(out, columns=[f.name for f in _SESSION_SCHEMA.fields])


def sessionize_state(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with a
    30-minute inactivity gap via ``applyInPandasWithState``. Equivalent
    batch semantics: ``session_window(etime, '1800 seconds')`` (see
    registry.sessionize_events)."""
    keyed = events.select(
        "user_id", F.expr("ts div 1000").alias("us")
    ).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _sessionize_fn,
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_available_now(
    sdf: DataFrame, name: str, output_mode: str = "complete",
    timeout_s: int = 120,
) -> DataFrame:
    """Drain the whole stream with an availableNow trigger into an
    in-memory table and return it as a (batch) DataFrame."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
    return sdf.sparkSession.table(name)


def stream_asof(
    stream: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    bucket: int = 3600,
) -> DataFrame:
    """Stream-STATIC as-of join: attach to each streaming row the
    latest ``right`` row with ``on`` ≤ the stream row's (backward
    semantics, ties included) — the "state at event time" attribution
    join (model-version timelines, price books, config histories)
    against a DIM-SIZED static right side.

    Streaming cannot run the batch `asof_join`'s window, so the static
    side precomputes (batch, window allowed) a per-(by, bucket)
    CANDIDATE ARRAY: the right rows inside the bucket plus ONE
    carry-in — the latest right row before the bucket starts. The
    stream side then needs only (1) a broadcast join against the tiny
    per-``by`` bucket-range frame to clamp its bucket, (2) a broadcast
    join on (by, bucket), and (3) an expression argmax over the ≤
    (bucket_rows + 1)-element array — all stream-compatible (no
    stream-side window or state), micro-batch or continuous alike.
    Memory: Σ rows + #buckets array entries, broadcast — the static
    contract. ``bucket`` trades array length against table width.
    Semantics equal `operators/asof.py:asof_join(direction='backward')`
    and are pinned batch≡stream in tests."""
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    w = int(bucket)
    if w <= 0:
        raise ValueError("bucket must be positive")

    from pyspark.sql import Window

    r = right.select(
        *by, F.col(on).cast("long").alias("_v"),
        F.struct(F.col(on).cast("long").alias("_o"),
                 *[F.col(c) for c in right_cols]).alias("_pay"))
    rk = r.withColumn("_k", F.floor(F.col("_v") / w))
    summ = rk.groupBy(*by, "_k").agg(
        F.max("_pay").alias("_best"),
        F.collect_list("_pay").alias("_rows"))
    rng = rk.groupBy(*by).agg(F.min("_k").alias("_kmin"),
                              F.max("_k").alias("_kmax"))
    # DENSIFY: one table row per bucket in [kmin, kmax] even when no
    # right row lands in it — interior empty buckets must still serve
    # their carry-in (a left row there matches an earlier right row)
    dense = rng.select(
        *by, F.explode(F.sequence("_kmin", "_kmax")).alias("_k")) \
        .join(F.broadcast(summ), [*by, "_k"], "left")
    ws = Window.partitionBy(*by).orderBy("_k") \
        .rowsBetween(Window.unboundedPreceding, -1)
    empty = F.array().cast(summ.schema["_rows"].dataType)
    # prepend the carry-in (F.array(null_struct) is [null], which the
    # filter strips — the first bucket simply has no carry-in)
    tbl = dense.select(
        *by, "_k",
        F.filter(
            F.concat(F.array(F.last("_best", ignorenulls=True).over(ws)),
                     F.coalesce(F.col("_rows"), empty)),
            lambda c: c.isNotNull()).alias("_cand"))

    sv = F.col(on).cast("long")
    s1 = stream.join(F.broadcast(rng), by, "left")
    clamped = F.greatest(F.least(F.floor(sv / w), F.col("_kmax")),
                         F.col("_kmin"))
    s2 = (s1.withColumn("_k", clamped)
          .join(F.broadcast(tbl), [*by, "_k"], "left"))
    hits = F.filter(F.col("_cand"), lambda c: c["_o"] <= sv)
    best = F.array_max(hits)
    out_cols = [c for c in stream.columns]
    return s2.select(
        *out_cols,
        *[best[c].alias(c) for c in right_cols],
    )
