"""Per-key driver for the graph family at large scale factors.

The round-8 carry (SCALE.md): at sf5 the whole graph family in ONE Spark
session accumulates the banded self-join's shuffle spill past a single
box's disk.  This driver realizes the prescription — per-key sessions —
plus the production materialize-once shape:

1. stage the DuckDB edge oracle parquet ONCE (``check_graph_staged``'s
   streaming stager — oracle independence preserved: DuckDB derives its
   own edges);
2. materialize the SPARK-side edge list once in its own session
   (``sim_edges`` → parquet; the derivation pipeline is hash-verified
   separately as ``q_dedup_embed_lsh``), spill freed at session exit;
3. run each graph key in its own subprocess session with
   ``SPARK_GRAFT_EDGES_PARQUET`` pointing at the materialized edges and
   ``--edges`` pointing at the staged oracle parquet.

Usage::

    python tools/run_graph_per_key.py /tmp/sfscale/sf5 [--timeout 3600]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))

import duckdb  # noqa: E402

from check_graph_staged import GRAPH_KEYS, _staging_sql  # noqa: E402

from spark_iqmulus_spark.session import TABLES  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    timeout = 3600
    if "--timeout" in argv:
        i = argv.index("--timeout")
        timeout = int(argv[i + 1])
        del argv[i : i + 2]
    # --agg-hash: engine-side digest compare for keys whose output is too
    # big to collect (sf5 triangles, VERDICT r9 item 3); forwarded to each
    # per-key check_graph_staged invocation
    agg_hash = "--agg-hash" in argv
    if agg_hash:
        argv.remove("--agg-hash")
    # --agg-hash-keys a,b: digest compare for just those keys (integer
    # outputs only — the digest refuses float columns), normal value-hash
    # for the rest; lets one staging serve a mixed-mode family run
    agg_keys: set = set()
    if "--agg-hash-keys" in argv:
        i = argv.index("--agg-hash-keys")
        agg_keys = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    # --keys a,b,c restricts the per-key loop (e.g. just q_graph_triangles)
    only = None
    if "--keys" in argv:
        i = argv.index("--keys")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    work = tempfile.mkdtemp(prefix="graph_perkey_")

    # 1. oracle-side staged edges (DuckDB's own derivation)
    duck_pq = f"{work}/edges_oracle.parquet"
    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    t0 = time.time()
    con.execute(f"COPY ({_staging_sql()}) TO '{duck_pq}' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{duck_pq}'").fetchone()[0]
    con.close()
    print(f"oracle edges: {n} rows in {time.time()-t0:.1f}s -> {duck_pq}", flush=True)

    # 2. engine-side materialized edges, own session (spill freed on exit)
    spark_pq = f"{work}/edges_spark.parquet"
    code = (
        "import sys; sys.path.insert(0, {root!r})\n"
        "from spark_iqmulus_spark.session import get_spark\n"
        "from spark_iqmulus_spark.operators import graph\n"
        "s = get_spark('edges-materialize')\n"
        "s.sparkContext.setLogLevel('ERROR')\n"
        "graph.stage_edges(s, {sf!r}, {pq!r})\n"
        "print('spark edges written')\n"
        "s.stop()\n"
    ).format(root=_ROOT, sf=sf_dir, pq=spark_pq)
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "24g")
    t0 = time.time()
    p = subprocess.run([sys.executable, "-c", code], env=env, timeout=timeout)
    if p.returncode != 0:
        print("FATAL: spark edge materialization failed")
        return 1
    print(f"spark edges materialized in {time.time()-t0:.1f}s", flush=True)

    # 3. one subprocess session per key
    env_key = dict(env)
    env_key["SPARK_GRAFT_EDGES_PARQUET"] = spark_pq
    n_pass = n_fail = 0
    for key in GRAPH_KEYS:
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            p = subprocess.run(
                [
                    sys.executable,
                    os.path.join(_ROOT, "tools", "check_graph_staged.py"),
                    sf_dir,
                    "--edges",
                    duck_pq,
                    key,
                ]
                + (["--agg-hash"] if agg_hash or key in agg_keys else []),
                env=env_key,
                timeout=timeout,
                capture_output=True,
                text=True,
            )
            out = p.stdout + p.stderr
        except subprocess.TimeoutExpired:
            print(f"FAIL {key}: timeout {timeout}s", flush=True)
            n_fail += 1
            continue
        ok = f"PASS {key}" in out
        line = next(
            (ln for ln in out.splitlines() if ln.startswith(("PASS", "FAIL"))),
            f"FAIL {key}: no verdict line (rc={p.returncode})",
        )
        print(f"{line}  [{time.time()-t0:.1f}s total]", flush=True)
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            tail = "\n".join(out.splitlines()[-12:])
            print(tail, flush=True)
    print(f"\n{n_pass} pass, {n_fail} fail (per-key sessions, staged edges)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
