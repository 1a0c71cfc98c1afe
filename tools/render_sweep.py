"""Render a tools/sweep.py JSONL log as a per-key markdown status table.

Usage::

    python tools/render_sweep.py /tmp/sweep_sf5_r8.jsonl [--family]

Keys are grouped by family prefix (q_tpch_*, q_dedup_*, ...) with pass /
fail / timeout counts per family and an exceptions list, so the SCALE.md
section stays readable at 200+ keys.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict

FAMILIES = (
    ("q_tpch_", "TPC-H"),
    ("q_agg_", "aggregation"),
    ("q_join_", "joins"),
    ("q_window_", "window"),
    ("q_stream_", "streaming"),
    ("q_dedup_", "dedup"),
    ("q_sim_", "similarity/ANN"),
    ("q_text_", "text"),
    ("q_graph_", "graph"),
    ("q_pc_", "point-cloud ops"),
    ("q_las", "LAS I/O"),
    ("q_ply", "PLY I/O"),
    ("q_pcd", "PCD I/O"),
    ("q_xyz", "XYZ I/O"),
    ("q_multimodal", "multimodal"),
    ("q_events_", "events"),
    ("q_pipeline_", "composed pipelines"),
    ("q_sketch_", "sketches"),
    ("q_sample_", "sampling"),
    ("q_embed_", "embeddings"),
)


def family(key: str) -> str:
    for prefix, name in FAMILIES:
        if key.startswith(prefix):
            return name
    return "relational/other"


def main() -> int:
    log = sys.argv[1]
    rows = {}
    for ln in open(log):
        r = json.loads(ln)
        rows[r["key"]] = r  # last record wins (resume reruns)

    by_fam: dict[str, list] = defaultdict(list)
    for key in sorted(rows):
        by_fam[family(key)].append(rows[key])

    n_pass = sum(1 for r in rows.values() if r["status"] == "PASS")
    n_other = len(rows) - n_pass
    print(f"### Sweep: {len(rows)} keys — {n_pass} strict pass, {n_other} exceptions\n")
    print("| family | keys | strict pass | exceptions |")
    print("|---|---|---|---|")
    for fam in sorted(by_fam):
        rs = by_fam[fam]
        passed = [r for r in rs if r["status"] == "PASS"]
        exc = [r for r in rs if r["status"] != "PASS"]
        exc_s = (
            "; ".join(f"`{r['key']}` {r['status']}" for r in exc) if exc else "—"
        )
        print(f"| {fam} | {len(rs)} | {len(passed)} | {exc_s} |")
    bad = [r for r in rows.values() if r["status"] != "PASS"]
    if bad:
        print("\nExceptions detail:\n")
        for r in sorted(bad, key=lambda r: r["key"]):
            print(f"- `{r['key']}` — {r['status']}: {r['detail'][:200]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
