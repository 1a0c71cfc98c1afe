"""Staged-oracle harness for q_dedup_embed_lsh at large scale factors.

VERDICT r9 item 7: the sf5 embed-LSH verification took ~2,520 s, almost
all of it DuckDB re-deriving the banded candidate self-join + cosine
re-check.  The graph family already solved this class (round 8,
check_graph_staged.py): stage DuckDB's OWN edge derivation once with the
memory-bounded streaming SQL, then verify against an oracle that reads
the staged parquet.  This runner applies the same pattern to
``q_dedup_embed_lsh``:

- stage ``(a, b)`` = the cosine-passed distinct candidate pairs via
  ``check_graph_staged._staging_sql()`` (DuckDB's derivation — Spark
  output never feeds the oracle side), or reuse one with ``--edges``;
- the staged oracle joins the pairs back to the embeddings view and
  recomputes the rounded cosine column, reproducing q_dedup_embed_lsh's
  exact output (the staged pairs already passed the threshold, and
  cosine is deterministic per pair);
- compare row count / columns / order-insensitive value hash exactly as
  tools/check.py does, or pass ``--agg-hash`` for the engine-side digest
  (no driver materialization on either side).

Usage::

    python tools/check_dedup_staged.py [sf_dir] [--edges PATH] [--agg-hash]
"""

from __future__ import annotations

import sys
import tempfile
import time
import traceback

import duckdb

import os as _os

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, _os.path.join(_ROOT, "tools"))

from check import agg_compare, table_hash, type_class_problems  # noqa: E402
from check_graph_staged import _staging_sql  # noqa: E402

from spark_iqmulus_spark.session import TABLES, get_spark  # noqa: E402


def staged_embed_lsh_oracle(edges_pq: str) -> str:
    """q_dedup_embed_lsh's output from the staged pair parquet: join the
    vectors back by id and recompute the rounded cosine (the staged pairs
    are exactly the threshold survivors)."""
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        )
        SELECT s.a AS vec_a, s.b AS vec_b,
               round(list_dot_product(ea.v, eb.v)
                     / (sqrt(list_dot_product(ea.v, ea.v))
                        * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos
        FROM '{edges_pq}' s
        JOIN e ea ON ea.vec_id = s.a
        JOIN e eb ON eb.vec_id = s.b
    """


def main() -> int:
    argv = list(sys.argv[1:])
    agg_hash = "--agg-hash" in argv
    if agg_hash:
        argv.remove("--agg-hash")
    edges_pq = None
    if "--edges" in argv:
        i = argv.index("--edges")
        edges_pq = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    if edges_pq is None:
        workdir = tempfile.mkdtemp(prefix="dedup_staged_")
        edges_pq = f"{workdir}/edges.parquet"
        t0 = time.time()
        con.execute(f"COPY ({_staging_sql()}) TO '{edges_pq}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{edges_pq}'").fetchone()[0]
        print(f"staged {n} pairs in {time.time()-t0:.1f}s -> {edges_pq}")

    oracle = staged_embed_lsh_oracle(edges_pq)
    spark = get_spark("check-dedup-staged")
    from spark_iqmulus_spark.operators.dedup import q_dedup_embed_lsh

    name = "q_dedup_embed_lsh"
    t0 = time.time()
    n_fail = 0
    try:
        sdf = q_dedup_embed_lsh(spark, sf_dir)
        if agg_hash:
            # the cos column is float → agg-hash's exact-rendering guard
            # would refuse; digest the id pairs and compare cos via its
            # sum under an absolute tolerance (exact round-to-4dp equality
            # would flip on Spark's partition-order-dependent float64
            # accumulation over millions of pairs).
            # localCheckpoint: the digest and the cos sum are two actions —
            # without it the whole banded derivation would run twice.
            sdf = sdf.localCheckpoint()
            ok, line = agg_compare(
                sdf.select("vec_a", "vec_b"),
                con,
                f"SELECT vec_a, vec_b FROM ({oracle}) t",
                name,
                t0,
            )
            scos = sdf.groupBy().sum("cos").collect()[0][0] or 0.0
            ocos = con.sql(f"SELECT sum(cos) FROM ({oracle}) t").fetchone()[0] or 0.0
            if abs(scos - ocos) > 1e-2:
                ok = False
                line += f"; cos-sum drift spark={scos} oracle={ocos}"
            if not ok:
                print(line if line.startswith("FAIL") else f"FAIL {name}: {line}")
                n_fail = 1
            else:
                print(line)
        else:
            srows = sdf.collect()
            scols = sdf.columns
            orel = con.sql(oracle)
            ocols = list(orel.columns)
            otypes = list(orel.types)
            orows = orel.fetchall()
            problems = type_class_problems(sdf.schema, ocols, otypes)
            if len(srows) != len(orows):
                problems.append(
                    f"rowcount spark={len(srows)} oracle={len(orows)}"
                )
            if sorted(scols) != sorted(ocols):
                problems.append(
                    f"cols spark={sorted(scols)} oracle={sorted(ocols)}"
                )
            if not problems:
                sh, sl = table_hash(scols, [tuple(r) for r in srows], strict=True)
                oh, ol = table_hash(ocols, orows, strict=True)
                if sh != oh:
                    problems.append("value-hash mismatch")
                    for a, b in [(a, b) for a, b in zip(sl, ol) if a != b][:3]:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  oracle: {b[:200]}")
            if problems:
                print(f"FAIL {name}: " + "; ".join(problems[:1]))
                for p in problems[1:]:
                    print("   " + p)
                n_fail = 1
            else:
                print(f"PASS {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
    except Exception:
        print(f"FAIL {name}: error")
        traceback.print_exc()
        n_fail = 1

    print(f"\n{1 - n_fail} pass, {n_fail} fail (staged pair oracle)")
    spark.stop()
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
