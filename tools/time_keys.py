"""Time declared registry keys with the noop sink (guide §1.4).

Usage: python tools/time_keys.py [--runs N] <key> [<key> ...]

Each sample builds a FRESH DataFrame (matching how the bench and driver
construct queries — plan/analysis cost included) and writes it to the
noop sink so the computation, not the collect, is timed.  Prints one JSON
line: {key: {"med": s, "min": s, "max": s, "runs": [..]}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    keys = args
    from spark_iqmulus_spark.registry import all_queries
    from spark_iqmulus_spark.session import get_spark
    from spark_iqmulus_spark.sources import register_sources

    qs = all_queries()
    spark = get_spark("time_keys")
    spark.sparkContext.setLogLevel("ERROR")
    register_sources(spark)
    out = {}
    # one warm-up of the first key so JVM/session warm-up is not billed
    qs[keys[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for key in keys:
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"time:{key}#{i}")
            t0 = time.time()
            qs[key](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[key] = {
            "med": round(statistics.median(samples), 3),
            "min": min(samples),
            "max": max(samples),
            "runs": samples,
        }
        print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
