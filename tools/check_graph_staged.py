"""Staged-oracle harness for the graph family at large scale factors.

All eight graph oracles share one edge definition (``graph._EDGE_CTE``:
banded-LSH candidate equi-join + exact-cosine recheck).  DuckDB CTE
materialization is per-query, so a plain ``tools/check.py`` run re-derives
that join for EVERY key — at sf5 that multiplies the most expensive oracle
stage by eight and exhausts a single process (VERDICT r6 commit d2d510e
identified the blocker; VERDICT r7 item 2 prescribes this staging).

This runner stages the edge list ONCE::

    COPY (<edge CTE> SELECT a, b FROM edges) TO <tmp>/edges.parquet

then rewrites each oracle to read the staged parquet instead of re-deriving
the CTE.  Oracle independence is preserved: the staged edges come from
DuckDB's own CTE — Spark output never feeds the oracle side.

The Spark side runs all keys in ONE session, sharing the persisted edge
frame exactly as ``graph.sim_edges`` is designed to (the production shape:
derive the similarity graph once, run every graph analysis on it).

Usage::

    python tools/check_graph_staged.py [sf_dir]
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

from spark_iqmulus_spark.operators import graph  # noqa: E402
from spark_iqmulus_spark.session import TABLES, get_spark  # noqa: E402

GRAPH_KEYS = tuple(sorted(graph.ORACLES))


def _staging_sql() -> str:
    """Memory-bounded restatement of ``graph._EDGE_CTE`` for the one-time
    staging COPY.  The production CTE's ``MATERIALIZED`` candidate set is
    what a per-query oracle wants (eight queries share it), but at sf5 the
    banded self-join yields ~10⁹ candidate id pairs — materializing (or
    even DISTINCT-ing) them needs tens of GB of hash state.  For staging we
    instead STREAM the duplicated candidate pairs straight into the exact
    cosine re-check (build sides are just the 100k-vector table) and
    DISTINCT only the surviving edges (~10⁶).  Identical edge set: cosine
    is deterministic per pair, so dedup-after-filter == filter-after-dedup;
    peak memory is the two small build tables regardless of corpus skew."""
    from spark_iqmulus_spark.operators.dedup import COSINE_T
    from spark_iqmulus_spark.operators.similarity import _lsh_banded_cte

    return (
        _lsh_banded_cte()
        + f"""
        , cand AS (
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM (SELECT vec_id, band, val FROM banded) a
            JOIN (SELECT vec_id, band, val FROM banded) b
              ON a.band = b.band AND a.val = b.val
            WHERE a.vec_id < b.vec_id
        )
        SELECT DISTINCT c.a, c.b
        FROM cand c
        JOIN e ea ON ea.vec_id = c.a
        JOIN e eb ON eb.vec_id = c.b
        WHERE round(list_dot_product(ea.v, eb.v)
              / (sqrt(list_dot_product(ea.v, ea.v))
                 * sqrt(list_dot_product(eb.v, eb.v))), 6) >= {COSINE_T}
    """
    )


def rewritten_oracles(edges_pq: str) -> dict[str, str]:
    """Per-key oracles with the shared edge CTE replaced by a read of the
    staged edge parquet."""
    plain = graph._EDGE_CTE
    rec = graph._EDGE_CTE.replace("WITH e AS", "WITH RECURSIVE e AS", 1)
    base = (
        "edges AS (SELECT a, b FROM read_parquet('{pq}')), "
        "und AS (SELECT a, b FROM edges"
        " UNION ALL SELECT b AS a, a AS b FROM edges)"
    ).format(pq=edges_pq)
    out = {}
    for key, q in graph.ORACLES.items():
        if q.startswith(rec) and rec != plain:
            out[key] = "WITH RECURSIVE " + base + q[len(rec):]
        elif q.startswith(plain):
            out[key] = "WITH " + base + q[len(plain):]
        else:
            raise ValueError(f"{key}: oracle does not start with _EDGE_CTE")
    return out


def staged_oracles(con, workdir: str) -> dict[str, str]:
    """Stage the edge list once; return per-key oracles over the staging."""
    edges_pq = f"{workdir}/edges.parquet"
    t0 = time.time()
    con.execute(
        f"COPY ({_staging_sql()}) TO '{edges_pq}' (FORMAT PARQUET)"
    )
    n = con.sql(f"SELECT count(*) FROM '{edges_pq}'").fetchone()[0]
    print(f"staged {n} edges in {time.time()-t0:.1f}s -> {edges_pq}")
    return rewritten_oracles(edges_pq)


def main() -> int:
    """CLI: ``check_graph_staged.py [sf_dir] [--edges PATH] [key ...]``.

    ``--edges`` reuses an already-staged edge parquet (staging at sf5
    takes minutes — one staging serves all eight keys across runs); a key
    list restricts the run, enabling PER-KEY Spark sessions from an outer
    loop — at sf5 the whole family in one session accumulates shuffle
    spill past this box's disk (SCALE.md round-8 carry), while one key
    per process frees spill at session exit."""
    argv = list(sys.argv[1:])
    edges_pq = None
    agg_hash = "--agg-hash" in argv
    if agg_hash:
        argv.remove("--agg-hash")
    if "--edges" in argv:
        i = argv.index("--edges")
        edges_pq = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    if edges_pq is None:
        workdir = tempfile.mkdtemp(prefix="graph_staged_")
        oracles = staged_oracles(con, workdir)
    else:
        oracles = rewritten_oracles(edges_pq)

    spark = get_spark("check-graph-staged")
    n_pass = n_fail = 0
    for name in GRAPH_KEYS:
        if only and name not in only:
            continue
        t0 = time.time()
        if agg_hash:
            # engine-side digest compare: neither engine materializes rows
            # to its driver, so sf5 triangles' ~98M rows verify strictly
            # (VERDICT r9 item 3)
            try:
                ok, line = agg_compare(
                    graph.QUERIES[name](spark, sf_dir), con, oracles[name], name, t0
                )
            except Exception:
                print(f"FAIL {name}: agg-hash error")
                traceback.print_exc()
                n_fail += 1
                continue
            print(line)
            n_pass, n_fail = n_pass + ok, n_fail + (not ok)
            continue
        try:
            sdf = graph.QUERIES[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = list(orel.columns)
            otypes = list(orel.types)
            orows = orel.fetchall()
        except Exception:
            print(f"FAIL {name}: oracle error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = type_class_problems(sdf.schema, ocols, otypes)
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
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
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail (staged edge oracle)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
