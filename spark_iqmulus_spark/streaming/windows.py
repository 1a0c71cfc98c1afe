"""Structured Streaming operator surface (SURVEY.md §2B, streaming block).

The reference is batch-only (no streaming code anywhere in
``/root/reference/src`` — SURVEY §1.1); this module adds the streaming
surface a modern engine needs.  Batch ``window()`` / ``session_window()``
have *identical semantics* to their streaming counterparts (same expression,
same grouping), so every windowed aggregation here is hash-checkable against
a DuckDB oracle; ``q_stream_watermark`` additionally executes a *real*
``readStream`` with a watermark, replayed to completion via the memory sink.

Scale notes: streaming state for windowed aggs is bounded by watermarks;
the batch equivalents are plain hash aggregates (one shuffle on the window
bucket + key).  Session windows shuffle on user_id only.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import load_tables

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_ORACLE = "strftime({c}, '%Y-%m-%d %H:%M:%S.%f')"


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregate over the events stream (batch
    replay — semantics identical to streaming groupBy(window(...)))."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1 hour length, 15 minute slide — each event lands in
    exactly 4 windows."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "n",
            "sum_value",
        )
    )
    # NOTE: no avg() here on purpose — window populations are powers of two,
    # so avg of cent-precision values lands *exactly* on round-half
    # boundaries where engines' rounding modes disagree; sum is boundary-free.


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 30-minute gap.  A new session starts
    when the inter-event gap is STRICTLY GREATER than the gap duration:
    Spark merges sessions whose [ts, ts+gap) windows overlap OR touch, so an
    exact-30-minute gap still merges (verified empirically; the boundary
    only materializes at sf1 row counts).  Session end = last event + gap."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            F.date_format("w.end", _TS_FMT).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming execution: file-source readStream over the
    events parquet, 10-minute watermark, tumbling 1-hour counts, replayed to
    completion through the memory sink.

    In a single-batch replay nothing is late, so the complete-mode result
    equals the batch tumbling aggregate — which is exactly what makes this
    oracle-checkable while still exercising the streaming engine (state
    store, watermark tracking, sink commit).  Late-data *dropping* is
    exercised separately in tests/test_streaming.py with a two-batch replay.
    """
    import os

    from ..session import normalize_session, ts_micros_if_long

    normalize_session(spark)
    path = f"{sf_dir}/events.parquet"
    # ts is epoch-nanos long OR timestamp depending on testdata generation;
    # ts_micros_if_long handles both
    raw_schema = spark.read.parquet(path).schema

    # the file stream source requires a directory; expose the single parquet
    # file through a symlink dir (testdata itself is read-only)
    stream_dir = tempfile.mkdtemp(prefix="stream_events_")
    os.symlink(os.path.abspath(path), os.path.join(stream_dir, "events.parquet"))

    stream = (
        ts_micros_if_long(
            spark.readStream.schema(raw_schema).format("parquet").load(stream_dir)
        )
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n",
        )
    )
    name = "q_stream_watermark_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    query = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_wm_"))
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(name)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful stream dedup semantics, expressed deterministically: keep the
    first event per (user_id, event_type) in (ts, event_id) order — the
    batch-replay equivalent of ``dropDuplicatesWithinWatermark`` with an
    unbounded watermark.  (``dropDuplicates`` alone keeps an *arbitrary*
    row, which is not hash-checkable; the window formulation is the
    deterministic contract.)"""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", _TS_FMT).alias("ts_s"),
        )
    )


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream interval join: clicks joined to purchases by the
    same user within 30 minutes, both sides watermarked — the state-store
    retains only a bounded window of each side (watermark + interval bound),
    which is what makes stream-stream joins feasible on unbounded input.
    Replayed to completion (availableNow) so the append-mode result equals
    the batch interval self-join, making it oracle-checkable."""
    import math
    import os
    import uuid

    from ..session import normalize_session, ts_micros_if_long

    normalize_session(spark)
    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema
    stream_dir = tempfile.mkdtemp(prefix="stream_join_")
    os.symlink(os.path.abspath(path), os.path.join(stream_dir, "events.parquet"))

    # Round 14 (VERDICT r13 next #6): a stream-stream join provisions FOUR
    # state stores per shuffle partition per micro-batch (left/right rows +
    # keyToNumValues each side); at the session default (one partition per
    # core) a bounded availableNow replay of a small batch pays ~128 store
    # provisionings for kilobytes of state.  Derive the state partition
    # count from the INPUT SIZE instead — one partition per 128 MB of
    # source, capped at the session default, floor 1 — so a tiny batch
    # provisions one partition while any at-scale input keeps the session
    # default (no constant tuned to either regime).  Measured at sf0.1:
    # 5.9–12.1 s → 2.4 s, identical 183 output rows.  The count is pinned
    # at the query's FIRST start via spark.sql.shuffle.partitions (the
    # state layout is then checkpoint-persistent); the session value is
    # restored after the replay.
    default_np = int(spark.conf.get("spark.sql.shuffle.partitions"))
    derived_np = max(1, min(default_np, math.ceil(os.path.getsize(path) / (128 << 20))))

    def src():
        return ts_micros_if_long(
            spark.readStream.schema(raw_schema).format("parquet").load(stream_dir)
        )

    clicks = (
        src()
        .where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("cu"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", "1 hour")
    )
    buys = (
        src()
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("bu"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("bts"),
        )
        .withWatermark("bts", "1 hour")
    )
    joined = clicks.join(
        buys,
        (F.col("cu") == F.col("bu"))
        & (F.col("bts") >= F.col("cts"))
        & (F.col("bts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("cu").alias("user_id"),
        "click_id",
        "purchase_id",
        F.date_format("cts", _TS_FMT).alias("click_ts"),
        F.date_format("bts", _TS_FMT).alias("purchase_ts"),
    )
    name = f"q_stream_join_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.shuffle.partitions", str(derived_np))
    try:
        query = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_sj_"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(default_np))
    return spark.table(name)


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-static enrichment join: the events file stream joined to
    the static ``customer`` dimension on user_id with an explicit
    ``broadcast()`` — the canonical dimension-enrichment shape.  A
    stream-static broadcast join needs NO stream-side shuffle and no state
    store (the static side is rebroadcast per micro-batch), so it scales
    with stream throughput alone.  Windowed per-segment rollup, replayed
    to completion (availableNow) — batch-equivalent, full value-hash
    oracle."""
    import os
    import uuid

    from ..session import load_tables, normalize_session, ts_micros_if_long

    normalize_session(spark)
    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema
    stream_dir = tempfile.mkdtemp(prefix="stream_enrich_")
    os.symlink(os.path.abspath(path), os.path.join(stream_dir, "events.parquet"))

    dim = load_tables(spark, sf_dir)["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = (
        ts_micros_if_long(
            spark.readStream.schema(raw_schema).format("parquet").load(stream_dir)
        )
        .withWatermark("ts", "10 minutes")
        .join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # fixed-point cents BEFORE the sum: per-group double sums are
            # order-dependent across engines once magnitudes grow; summing
            # integer cents (floor(x*100+0.5), pure double + JVM floor) is
            # exact and hash-stable — the same convention as the relational
            # family (ADVICE r6).
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).alias("sum_cents"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "c_mktsegment",
            "n",
            "sum_cents",
        )
    )
    name = f"q_stream_enrich_{uuid.uuid4().hex[:8]}"
    query = (
        enriched.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_se_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def q_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL two-batch watermark late-data DROP, oracle-checkable.

    The events table is split deterministically into two micro-batches
    (``event_id % 2``), replayed through a file-source stream with a
    10-minute watermark and append-mode tumbling counts.  After batch 1 the
    watermark is ``max(batch1.ts) − 10 min``, so batch-2 rows belonging to
    hour windows that already closed are *dropped by the engine* — the
    exact semantics every late-data pipeline depends on, here pinned by a
    value-hash oracle (DuckDB reproduces the watermark arithmetic and the
    kept-row set).  A far-future sentinel row in a third batch advances the
    watermark past every real window so append mode emits them all; the
    sentinel's own window never closes and never appears.
    """
    import os
    import time as _time
    import uuid
    from datetime import timedelta

    from ..session import normalize_session

    normalize_session(spark)
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "ts", "event_type")
    b1 = ev.where(F.col("event_id") % 2 == 0)
    b2 = ev.where(F.col("event_id") % 2 == 1)

    # engine-side expected emission set (same arithmetic as the oracle):
    # batch-2 rows survive iff their window end is past the batch-1 watermark.
    # ONE aggregate job computes both maxima (global, and over the b1 half
    # via a conditional max — identical to max over the filtered frame);
    # the two separate agg jobs this replaces each re-scanned the table.
    mx = ev.agg(
        F.max("ts").alias("mx"),
        F.max(F.when(F.col("event_id") % 2 == 0, F.col("ts"))).alias("mx1"),
    ).collect()[0]
    max_ts = mx["mx"]
    wm1 = mx["mx1"] - timedelta(minutes=10)
    kept2 = b2.where(
        F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR") > F.lit(wm1)
    )
    expected_windows = (
        b1.unionByName(kept2)
        .select(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .distinct()
        .count()
    )
    # sentinel as a 1-partition JVM-literal frame: the previous
    # ``createDataFrame([row])`` parallelized one row into
    # defaultParallelism pickled slices, and the ``coalesce(1)`` before
    # the batch write then serialized all those Python-worker round-trips
    # into ONE task — measured 6.4 s to write one row (vs 0.1 s here);
    # same row values (F.lit timestamps use the same session-TZ
    # conversion as createDataFrame)
    sentinel = spark.range(0, 1, 1, 1).select(
        F.lit(-1).cast(ev.schema["event_id"].dataType).alias("event_id"),
        F.lit(max_ts + timedelta(days=366))
        .cast(ev.schema["ts"].dataType)
        .alias("ts"),
        F.lit("flush").alias("event_type"),
    )

    stream_dir = tempfile.mkdtemp(prefix="stream_late_")
    agg = (
        spark.readStream.schema(ev.schema)
        .parquet(stream_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n",
        )
    )
    name = f"q_stream_late_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_late_"))
        .start()
    )
    try:
        for batch in (b1, b2, sentinel):
            batch.coalesce(1).write.mode("append").parquet(stream_dir)
            query.processAllAvailable()
        # the no-data micro-batch that emits finalized windows can lag
        # processAllAvailable; poll until the expected window count lands
        for _ in range(120):
            if spark.table(name).count() >= expected_windows:
                break
            _time.sleep(0.25)
            query.processAllAvailable()
    finally:
        query.stop()
    out = spark.table(name).where(F.col("event_type") != "flush")
    # drop the stream dir reference count; data lives in the memory sink
    _ = os  # tmpdirs cleaned by OS; keep import local-style consistent
    return out


def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-and-island sessionization — the windowing formulation
    (lag + cumulative sum of gap>threshold) of what ``session_window``
    computes natively; both are in the surface because the island pattern
    generalizes to non-time gaps (sequence breaks, value changes).  One
    shuffle on user_id."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    with_flag = t["events"].withColumn(
        "new_session",
        F.when(gap.isNull() | (gap >= 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sessions = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
        F.round(
            (F.max(F.unix_micros(F.col("ts"))) - F.min(F.unix_micros(F.col("ts"))))
            / 60e6,
            4,
        ).alias("duration_min"),
    )


QUERIES = {
    "q_stream_enrich": q_stream_enrich,
    "q_stream_late": q_stream_late,
    "q_stream_join": q_stream_join,
    "q_sessionize_batch": q_sessionize_batch,
    "q_stream_tumbling": q_stream_tumbling,
    "q_stream_sliding": q_stream_sliding,
    "q_stream_session": q_stream_session,
    "q_stream_watermark": q_stream_watermark,
    "q_stream_dedup": q_stream_dedup,
}

ORACLES = {
    "q_stream_enrich": f"""
        SELECT {_TS_ORACLE.format(c="date_trunc('hour', e.ts)")} AS window_start,
               c.c_mktsegment,
               count(*) AS n,
               CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
    """,
    "q_stream_late": f"""
        WITH b1 AS (
            SELECT event_id, ts, event_type FROM events WHERE event_id % 2 = 0
        ), wm AS (
            SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM b1
        ), kept AS (
            SELECT event_id, ts, event_type FROM b1
            UNION ALL
            SELECT e.event_id, e.ts, e.event_type
            FROM events e, wm
            WHERE e.event_id % 2 = 1
              AND date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm.w
        )
        SELECT {_TS_ORACLE.format(c="date_trunc('hour', ts)")} AS window_start,
               event_type, count(*) AS n
        FROM kept GROUP BY 1, 2
    """,
    "q_sessionize_batch": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                >= 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq,
               count(*) AS n_events,
               {_TS_ORACLE.format(c="min(ts)")} AS session_start,
               round((epoch_us(max(ts)) - epoch_us(min(ts))) / 60000000.0, 4)
                   AS duration_min
        FROM sessions GROUP BY user_id, session_seq
    """,
    "q_stream_join": f"""
        SELECT a.user_id,
               a.event_id AS click_id,
               b.event_id AS purchase_id,
               {_TS_ORACLE.format(c="a.ts")} AS click_ts,
               {_TS_ORACLE.format(c="b.ts")} AS purchase_ts
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'click' AND b.event_type = 'purchase'
         AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
    "q_stream_tumbling": f"""
        SELECT {_TS_ORACLE.format(c="date_trunc('hour', ts)")} AS window_start,
               event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_stream_sliding": f"""
        WITH expanded AS (
            SELECT unnest(generate_series(
                       time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '45 minutes',
                       time_bucket(INTERVAL '15 minutes', ts),
                       INTERVAL '15 minutes')) AS ws,
                   value
            FROM events
        )
        SELECT {_TS_ORACLE.format(c='ws')} AS window_start,
               count(*) AS n, round(sum(value), 4) AS sum_value
        FROM expanded GROUP BY ws
    """,
    "q_stream_session": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            -- event_id tiebreak: tied ts values are common, and DuckDB's
            -- parallel window execution is unstable under a non-total
            -- ORDER BY (measured: threads=1 reproduces Spark exactly,
            -- threads=8/32 drift by a few rows run-to-run); the session
            -- count itself is tie-order-invariant, so any total order works
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT *, sum(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id,
               {_TS_ORACLE.format(c='min(ts)')} AS session_start,
               {_TS_ORACLE.format(c="max(ts) + INTERVAL '30 minutes'")} AS session_end,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM numbered GROUP BY user_id, sid
    """,
    "q_stream_watermark": f"""
        SELECT {_TS_ORACLE.format(c="date_trunc('hour', ts)")} AS window_start,
               event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "q_stream_dedup": f"""
        SELECT user_id, event_type, event_id,
               {_TS_ORACLE.format(c='ts')} AS ts_s
        FROM (
            SELECT user_id, event_type, event_id, ts,
                   row_number() OVER (
                     PARTITION BY user_id, event_type
                     ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """,
}


def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming upsert: the events stream replayed through the
    bucket-partitioned `upsert_batch_sink` (foreachBatch MERGE semantics
    on plain parquet — pruned bucket read, anti-join merge, atomic bucket
    swap), then the materialized state summarized.  Final state = last
    event per user by (ts, event_id) — deterministic, so the batch oracle
    recomputes it with one window."""
    import os
    import shutil

    from ..session import ts_micros_if_long
    from .sinks import stream_upsert

    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema
    src = tempfile.mkdtemp(prefix="upsert_src_")
    os.symlink(os.path.abspath(path), os.path.join(src, "events.parquet"))
    state = tempfile.mkdtemp(prefix="upsert_state_")
    shutil.rmtree(state)
    os.makedirs(state)
    stream = ts_micros_if_long(
        spark.readStream.schema(raw_schema).format("parquet").load(src)
    )
    q = stream_upsert(
        spark,
        stream,
        state,
        tempfile.mkdtemp(prefix="ckpt_upsert_"),
        "user_id",
        ["ts", "event_id"],
    )
    q.awaitTermination()
    final = spark.read.parquet(state)
    return final.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "sum_final_cents"
        ),
        F.sum("event_id").alias("sum_final_event_id"),
        F.date_format(F.max("ts"), _TS_FMT).alias("max_ts"),
    )


QUERIES["q_stream_upsert"] = q_stream_upsert

ORACLES["q_stream_upsert"] = """
    WITH last AS (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT count(*) AS n_users,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_final_cents,
           CAST(sum(event_id) AS BIGINT) AS sum_final_event_id,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts
    FROM last WHERE rn = 1
"""
