"""Standing sf5 sweep: the staged-oracle family runs, one command,
one round-stamped JSONL (VERDICT r10 item 7).

Rounds 8-10 ran the sf5 verifications by hand — the graph family through
``run_graph_per_key.py`` (stage DuckDB's own edge oracle once, materialize
the Spark edges once, per-key subprocess sessions so the banded self-join's
shuffle spill frees between keys), the embed-LSH pairs through
``check_dedup_staged.py`` (staged pair oracle: 252 s staging once, seconds
per re-run), and the connected-components keys through
``check_components_staged.py`` (union-find replaces the recursive-CTE
blow-up).  This driver folds those into ONE command that emits a
round-stamped JSONL like the sf0.01 sweep's, so every round's close can
carry a fresh sf5 artifact:

    python tools/sweep_sf5.py /tmp/sfscale/sf5 --round 11
    # -> sweeps/sweep_r11_sf5.jsonl

Per-key records: ``{"key", "status" (pass|fail|timeout), "mode"
(strict|agg-hash|staged-strict), "secs", "ts", "sf_dir"}``.  Digest mode
(``agg-hash``) is used for keys whose sf5 output is too large to collect
(triangles: 97.6M rows; embed-LSH pairs: 3.6M) — the engine-side
length-prefixed digest compare, same as the r10 certifications.

The sf5 dataset comes from ``tools/make_scale.py /tmp/sfscale/sf5 --mult
50`` (facts replicated with shifted keys off sf0.1).

Round 12 widened the sweep beyond the staged graph/dedup family (VERDICT
r11 next #4 and #6): a strict shared-session stage over the TPC-H /
relational / text headliners (``SF5_RELATIONAL_KEYS``), and a streaming
LAS certification at 6M points (``tools/check_stream_sf1.py`` — stream
aggregate must equal the oracle-certified batch aggregate).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: keys the engine-side digest compares (outputs too large to collect)
AGG_HASH_GRAPH_KEYS = "q_graph_triangles"

#: TPC-H + §2B headliners + text/curation flagships, strict-checked at sf5
#: in one shared session (VERDICT r11 next #4 — these previously had only
#: ad-hoc sf5 evidence from round 6).  Outputs are aggregates / limited
#: frames, so plain strict collect-compare holds at 50×.
SF5_RELATIONAL_KEYS = [
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q6", "q_tpch_q9", "q_tpch_q18",
    "q_scan_project", "q_filter_pred", "q_count_star", "q_minmax",
    "q_agg_group", "q_agg_rollup", "q_approx_distinct",
    "q_join_hash", "q_join_broadcast", "q_join_outer", "q_join_semi",
    "q_join_asof",
    "q_window_rank", "q_window_frame", "q_sort_limit",
    "q_set_union", "q_set_intersect", "q_set_except",
    "q_subquery_in", "q_udaf",
    "q_text_stats", "q_text_tokens", "q_text_langid", "q_dedup_exact",
    # round 12: the new fused-write / manifest-aggregate keys at 50×
    # (the point-cloud fixtures derive from the sf5 part table — ~4M
    # points per tile set — so these certify the byte paths at size)
    "q_las_regrid", "q_pc_recenter", "q_ply_affine", "q_pc_fastminmax",
    "q_las_reclassify",
]

VERDICT = re.compile(r"^(PASS|FAIL) (q_[a-z0-9_]+)")


def _run(cmd: list[str], timeout: int) -> tuple[int, str]:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "24g")
    try:
        p = subprocess.run(
            cmd, env=env, timeout=timeout, capture_output=True, text=True,
            cwd=_ROOT,
        )
        return p.returncode, p.stdout + p.stderr
    except subprocess.TimeoutExpired as e:
        def _s(x):
            if isinstance(x, bytes):
                return x.decode(errors="replace")
            return x or ""

        return -1, _s(e.stdout) + _s(e.stderr)


def _parse(out: str, mode_by_key) -> list[dict]:
    """First verdict per key, in print order — the sub-tools echo a failing
    child's output tail, which repeats the FAIL line; taking the first
    occurrence keeps the artifact free of duplicate keys (r11 review)."""
    recs, seen = [], set()
    for ln in out.splitlines():
        m = VERDICT.match(ln.strip())
        if m:
            status, key = m.group(1).lower(), m.group(2)
            if key in seen:
                continue
            seen.add(key)
            recs.append({"key": key, "status": status, "mode": mode_by_key(key)})
    return recs


def _stage_record_needed(rc: int, recs: list[dict]) -> bool:
    """True when the stage itself must be recorded as failed: it exited
    non-zero with only PASS verdicts (crashed/timed out before reaching
    remaining keys), or it produced NO verdicts at all (format drift or an
    empty key loop would otherwise read as a clean sweep) — the shipped
    rule main() applies, exported so the test exercises the real code."""
    if not recs:
        return True
    return rc != 0 and all(r["status"] == "pass" for r in recs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/tmp/sfscale/sf5")
    ap.add_argument("--round", type=int, required=True, help="round number for the artifact stamp")
    ap.add_argument("--timeout", type=int, default=3600, help="per-stage timeout (s)")
    ap.add_argument("--log", default=None, help="override the JSONL path")
    ap.add_argument(
        "--stages", default=None,
        help="comma-separated substrings: run only stages whose title"
        " matches one (e.g. --stages relational,streaming) — lets a"
        " resumed sweep append new keys without re-running the staged"
        " graph/dedup families",
    )
    args = ap.parse_args()
    log = args.log or os.path.join(
        _ROOT, "sweeps", f"sweep_r{args.round}_sf5.jsonl"
    )
    os.makedirs(os.path.dirname(log), exist_ok=True)
    done = set()
    if os.path.exists(log):  # resumable like tools/sweep.py
        with open(log) as f:
            # only a PASS is final: a rerun must re-attempt (and re-record)
            # failed/timed-out keys, or the artifact keeps a stale verdict
            # while the sweep exits green (round-11 self-review)
            done = {
                r["key"]
                for r in (json.loads(ln) for ln in f if ln.strip())
                if r.get("status") == "pass"
            }

    stages = [
        (
            "graph family (per-key staged sessions)",
            [sys.executable, "tools/run_graph_per_key.py", args.sf_dir,
             "--agg-hash-keys", AGG_HASH_GRAPH_KEYS,
             "--timeout", str(args.timeout)],
            lambda k: "agg-hash" if k in AGG_HASH_GRAPH_KEYS.split(",") else "staged-strict",
        ),
        (
            "embed-LSH pairs (staged oracle, digest)",
            [sys.executable, "tools/check_dedup_staged.py", args.sf_dir,
             "--agg-hash"],
            lambda k: "agg-hash",
        ),
        (
            "connected-components keys (union-find oracle)",
            [sys.executable, "tools/check_components_staged.py", args.sf_dir],
            lambda k: "staged-strict",
        ),
        (
            "relational/TPC-H/text keys (strict, shared session)",
            [sys.executable, "tools/check.py", args.sf_dir, "--strict"]
            + SF5_RELATIONAL_KEYS,
            lambda k: "strict",
        ),
        (
            "streaming LAS at 6M points (stream == batch digest)",
            [sys.executable, "tools/check_stream_sf1.py"],
            lambda k: "staged-strict",
        ),
    ]

    if args.stages:
        wanted = [s.strip().lower() for s in args.stages.split(",") if s.strip()]
        stages = [
            st for st in stages if any(w in st[0].lower() for w in wanted)
        ]
        if not stages:
            print(f"no stage title matches {wanted}", file=sys.stderr)
            return 2

    n_pass = n_fail = 0
    with open(log, "a") as f:
        for title, cmd, mode_by_key in stages:
            print(f"== {title}", flush=True)
            t0 = time.time()
            rc, out = _run(cmd, args.timeout * 4)
            secs = round(time.time() - t0, 1)
            recs = _parse(out, mode_by_key)
            if _stage_record_needed(rc, recs):
                # a stage that crashed / timed out after printing only PASS
                # lines (or none at all) must NOT read as a clean sweep:
                # keys it never reached are missing, so record the stage
                # itself as failed (a stage whose nonzero exit reflects an
                # already-parsed per-key FAIL needs no extra record)
                recs.append({
                    "key": f"stage:{cmd[1].rsplit('/', 1)[-1]}",
                    "status": "timeout" if rc == -1 else "fail",
                    "mode": "stage",
                })
            for r in recs:
                # skip only keys that passed before AND pass again — a key
                # that passed in a prior run but FAILS now must be recorded
                # (r11 review: silence here hides an observed failure)
                if r["key"] in done and r["status"] == "pass":
                    continue
                r.update({"secs": secs if len(recs) == 1 else None,
                          "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                          "sf_dir": args.sf_dir})
                f.write(json.dumps(r) + "\n")
                f.flush()
                print(f"  {r['status'].upper()} {r['key']} ({r['mode']})", flush=True)
                if r["status"] == "pass":
                    n_pass += 1
                else:
                    n_fail += 1
            if rc != 0:
                print(f"  (stage rc={rc}; output tail)\n{out[-1500:]}", flush=True)

    print(f"\nsf5 sweep: {n_pass} pass, {n_fail} fail -> {log}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
