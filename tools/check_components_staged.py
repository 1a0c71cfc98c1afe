"""Staged-oracle harness for the connected-components dedup keys at large
scale factors.

``q_dedup_clusters`` / ``q_dedup_keep_best``'s DuckDB oracles embed a
recursive transitive closure (``reach``): at sf5 the J >= 0.05 near-dup
graph of the dup-rich synthetic corpus forms giant components, so the
closure materializes ~|component|^2 rows and dies of spill disk (round-8
sweep: oracle error after 972 s / 642 s, run solo with 40 GB memory_limit
and 79 GB free disk).  The VERDICT r7 graph-family prescription applies
unchanged: stage the bounded intermediate, replace only the blow-up stage.

Staging here:

- DuckDB derives the PAIR set with the *verbatim* ``pairs`` CTE prefix of
  the production oracle (string-sliced from ``ORACLES['q_dedup_clusters']``
  so it cannot drift) — 9,458 pairs at sf5, ~30 s;
- DuckDB derives per-doc quality with the verbatim ``q_text_quality``
  oracle (linear, no closure);
- a textbook union-find over the staged pairs replaces the recursive CTE —
  exact, O(E alpha(N)), microseconds at any realistic pair count;
- expected rows for both keys are assembled in plain Python and compared
  against the Spark output under the driver's strict canonicalization
  (``check.table_hash``).

Oracle independence is preserved: Spark output never feeds the expected
side — only DuckDB rows and the union-find do.

Usage::

    python tools/check_components_staged.py [sf_dir]
"""

from __future__ import annotations

import os as _os
import sys
import time

import duckdb

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, _os.path.join(_ROOT, "tools"))

from check import table_hash  # noqa: E402

from spark_iqmulus_spark.registry import all_oracles, all_queries  # noqa: E402
from spark_iqmulus_spark.session import TABLES, get_spark  # noqa: E402

KEYS = ("q_dedup_clusters", "q_dedup_keep_best")


def _pairs_sql() -> str:
    """The production oracle's pair derivation, verbatim: slice the
    clusters oracle at the closure boundary and select the pair columns.
    If the oracle's CTE layout changes, the split fails loudly."""
    oracle = all_oracles()["q_dedup_clusters"]
    prefix, sep, _ = oracle.partition("), edges AS")
    if not sep:
        raise RuntimeError("clusters oracle no longer has an edges CTE")
    return prefix + ") SELECT doc_a, doc_b FROM pairs"


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    t0 = time.time()
    pairs = con.sql(_pairs_sql()).fetchall()
    quality = dict(
        (r[0], r[1])
        for r in con.sql(
            "SELECT doc_id, quality FROM (" + all_oracles()["q_text_quality"] + ")"
        ).fetchall()
    )
    print(f"staged {len(pairs)} pairs + {len(quality)} quality rows "
          f"[{time.time()-t0:.1f}s]")

    uf = _UnionFind()
    for a, b in pairs:
        uf.union(int(a), int(b))
    comps: dict[int, list[int]] = {}
    for node in uf.parent:
        comps.setdefault(uf.find(node), []).append(node)

    expected = {
        "q_dedup_clusters": (
            ["cluster_id", "size", "members"],
            [
                (root, len(nodes), ",".join(str(n) for n in sorted(nodes)))
                for root, nodes in comps.items()
            ],
        ),
        "q_dedup_keep_best": (
            ["cluster_id", "size", "keeper_doc_id", "keeper_quality"],
            [
                (root, len(nodes), keeper, quality[keeper])
                for root, nodes in comps.items()
                for keeper in [min(nodes, key=lambda n: (-quality[n], n))]
            ],
        ),
    }

    spark = get_spark("check-components-staged")
    qs = all_queries()
    n_fail = 0
    for key in KEYS:
        t0 = time.time()
        try:
            sdf = qs[key](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:  # pragma: no cover - diagnosing runner
            print(f"FAIL {key}: spark error {exc!r:.200}")
            n_fail += 1
            continue
        ecols, erows = expected[key]
        sh, slines = table_hash(scols, srows, strict=True)
        eh, elines = table_hash(ecols, erows, strict=True)
        ok = (
            len(srows) == len(erows)
            and sorted(scols) == sorted(ecols)
            and sh == eh
        )
        if ok:
            print(f"PASS {key}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            print(f"FAIL {key}: rows {len(srows)} vs {len(erows)}, "
                  f"hash {sh} vs {eh}")
            for s, e in list(zip(slines, elines))[:3]:
                if s != e:
                    print(f"     spark : {s[:160]}")
                    print(f"     staged: {e[:160]}")
    print(f"{len(KEYS)-n_fail} pass, {n_fail} fail (staged components oracle)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
