"""Streaming LAS certification at realistic size (VERDICT r11 next #6).

``q_las_stream`` and the streaming sources had sf0.01-only evidence (the
part-derived clouds top out around the sf0.1 part table because the
point-cloud fixtures derive from a DIMENSION table make_scale keeps
fixed).  This tool certifies the stateful path at 6M points: stage a
6-tile × 1M-point LAS set (tools/make_scale.py machinery, seeded), run
``spark.readStream.format("las")`` to completion (availableNow) with a
grouped aggregate, and require it to EQUAL the batch read's aggregate
over the same files — the batch scan is the oracle-certified contract
(q_las_roundtrip/q_las_filter at sf0.01), so stream == batch at 6M
certifies the streaming offset/partition machinery at size.

Prints sweep-parseable verdict lines (``PASS q_las_stream_sf1: ...``);
exit 0 iff everything passed.  Usage::

    python tools/check_stream_sf1.py [las_dir]   # default /tmp/sfscale/las6m
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

N_FILES = 6
PTS_PER_FILE = 1_000_000


def _stage(las_dir: str) -> None:
    from tools.make_scale import make_las_tiles

    existing = (
        sorted(f for f in os.listdir(las_dir) if f.endswith(".las"))
        if os.path.isdir(las_dir)
        else []
    )
    if len(existing) == N_FILES:
        return
    make_las_tiles(las_dir, N_FILES, PTS_PER_FILE)


def main() -> int:
    las_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/las6m"
    _stage(las_dir)

    from pyspark.sql import functions as F

    from spark_iqmulus_spark.session import get_spark
    from spark_iqmulus_spark.sources import register_sources

    spark = get_spark("check_stream_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    register_sources(spark)

    t0 = time.time()

    def agg(df):
        return df.groupBy("classification").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("intensity").alias("sum_intensity"),
            F.sum(F.col("x").cast("long")).alias("sum_x"),
            F.min("z").alias("min_z"),
            F.max("z").alias("max_z"),
        )

    name = f"stream_sf1_{uuid.uuid4().hex[:8]}"
    q = (
        agg(spark.readStream.format("las").load(las_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_sf1_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table(name).collect()))
    batch = sorted(map(tuple, agg(spark.read.format("las").load(las_dir)).collect()))

    total = sum(r[1] for r in batch)
    ok = bool(streamed) and streamed == batch and total == N_FILES * PTS_PER_FILE
    secs = time.time() - t0
    if ok:
        print(
            f"PASS q_las_stream_sf1: {len(streamed)} groups,"
            f" {total} points  [{secs:.1f}s]"
        )
    else:
        print(
            f"FAIL q_las_stream_sf1: stream != batch"
            f" ({len(streamed)} vs {len(batch)} groups, {total} points)"
        )
        for s, b in list(zip(streamed, batch))[:3]:
            if s != b:
                print(f"  stream {s}\n  batch  {b}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
