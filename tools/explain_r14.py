"""Capture .explain('formatted') for declared registry keys into plans/r14/.

Usage: python tools/explain_r13.py <tag> <key> [<key> ...]
Writes plans/r14/<key>_<tag>.txt for each key (tag = before|after).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    from spark_iqmulus_spark.registry import all_queries
    from spark_iqmulus_spark.session import get_spark
    from spark_iqmulus_spark.sources import register_sources

    qs = all_queries()
    spark = get_spark("explain_r13")
    spark.sparkContext.setLogLevel("ERROR")
    register_sources(spark)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for key in keys:
        fn = qs[key]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {key} @ {SF_DIR} — {tag}\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
