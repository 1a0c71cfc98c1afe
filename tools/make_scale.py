"""Generate scaled-up testdata for scaling-curve measurements.

The driver testdata tops out at sf0.1 (600k-row lineitem); nothing above it
has ever been executed (VERDICT r4, top item).  This tool derives an
sfN-equivalent dataset from sf0.1 by replicating the FACT tables ``mult``
times with shifted keys (dimension tables stay fixed — fact-dim join
fan-out then scales like TPC-H's), plus an optional multi-file LAS tile set
for point-cloud scan curves.

Facts and their scaling transforms (DuckDB ``* REPLACE``):
  lineitem    l_orderkey shifted per replica (join keys to orders stay 1:1)
  orders      o_orderkey shifted identically
  events      event_id shifted; ts/user_id kept (10x density per window/user)
  documents   doc_id shifted; replica text gets a short suffix so replicas
              are NEAR-duplicates (Jaccard ~1) — a near-dup-rich corpus that
              exercises the dedup family's hot paths, not a degenerate
              all-identical one
  embeddings  vec_id shifted (10x ANN corpus)

Usage::

    python tools/make_scale.py /tmp/sfscale/sf1 --mult 10
    python tools/make_scale.py --las-dir /tmp/sfscale/las60m \
        --las-files 6 --las-points-per-file 10000000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_DEFAULT = "/root/testdata/sf0.1"
KEY_STRIDE = 10_000_000  # > any sf0.1 key; replica r shifts keys by r*stride

DIMS = ("region", "nation", "customer", "supplier", "part")

FACT_SQL = {
    "lineitem": (
        "SELECT * REPLACE (l_orderkey + r * {stride} AS l_orderkey) "
        "FROM read_parquet('{src}/lineitem.parquet'), range({mult}) AS t(r)"
    ),
    "orders": (
        "SELECT * REPLACE (o_orderkey + r * {stride} AS o_orderkey) "
        "FROM read_parquet('{src}/orders.parquet'), range({mult}) AS t(r)"
    ),
    "events": (
        "SELECT * REPLACE (event_id + r * {stride} AS event_id) "
        "FROM read_parquet('{src}/events.parquet'), range({mult}) AS t(r)"
    ),
    "documents": (
        "SELECT * REPLACE (doc_id + r * {stride} AS doc_id, "
        "CASE WHEN r = 0 THEN text ELSE text || ' v' || r END AS text) "
        "FROM read_parquet('{src}/documents.parquet'), range({mult}) AS t(r)"
    ),
    "embeddings": (
        "SELECT * REPLACE (vec_id + r * {stride} AS vec_id) "
        "FROM read_parquet('{src}/embeddings.parquet'), range({mult}) AS t(r)"
    ),
}


def make_parquet(out_dir: str, src: str, mult: int) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for name, tpl in FACT_SQL.items():
        sql = tpl.format(src=src, mult=mult, stride=KEY_STRIDE)
        dest = os.path.join(out_dir, f"{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{name}: {n} rows -> {dest}")
    for name in DIMS:
        srcp = os.path.join(src, f"{name}.parquet")
        dest = os.path.join(out_dir, f"{name}.parquet")
        if os.path.lexists(dest):
            os.remove(dest)
        os.symlink(srcp, dest)
        print(f"{name}: dim symlink -> {dest}")


def make_las_tiles(las_dir: str, n_files: int, pts_per_file: int) -> None:
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    )
    from tests.fixtures import make_las

    os.makedirs(las_dir, exist_ok=True)
    for i in range(n_files):
        path = os.path.join(las_dir, f"tile_{i:02d}.las")
        make_las(path, n=pts_per_file, fmt=1, seed=100 + i)
        print(f"{path}: {pts_per_file} points")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", help="output dir for scaled parquet")
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--las-dir")
    ap.add_argument("--las-files", type=int, default=6)
    ap.add_argument("--las-points-per-file", type=int, default=10_000_000)
    args = ap.parse_args()
    if args.out_dir:
        make_parquet(args.out_dir, args.src, args.mult)
    if args.las_dir:
        make_las_tiles(args.las_dir, args.las_files, args.las_points_per_file)
    if not args.out_dir and not args.las_dir:
        ap.error("nothing to do: pass out_dir and/or --las-dir")


if __name__ == "__main__":
    main()
