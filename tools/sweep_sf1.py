"""Full-registry sf1 certification sweep (round 13, VERDICT r12 next #2).

The last FULL-registry at-scale run was round 6's 200/201 at sf1; the ~30
keys added since (transcode family, fused-write keys, streaming sinks, the
round-12/13 computed-write and manifest keys) had only sf0.01 + sampled
sf5 evidence.  This driver certifies the ENTIRE registry at sf1 (10× the
bench scale) in one round-stamped JSONL:

    python tools/make_scale.py /tmp/sfscale/sf1 --mult 10   # once
    python tools/sweep_sf1.py /tmp/sfscale/sf1 --round 13
    # -> sweeps/sweep_r13_sf1.jsonl

Protocol = the sf5 sweep's staged-oracle stages (graph family in per-key
sessions, embed-LSH pairs and connected-components against staged
oracles — their production DuckDB oracles are the sf0.01-shaped CTEs that
blow up at scale) + a CHUNKED strict sweep (tools/sweep.py) over every
remaining registry key.  At sf1 the staged families run STRICT (full
value-hash; the sf5 sweep's agg-hash digests are only needed at 50×).

Documented exclusions (recorded as ``"mode": "excluded"`` rows so the
artifact is self-describing):

- ``q_dedup_embed`` — the by-design O(N²) exact-cosine baseline
  (SCALE.md round 6); its scale path ``q_dedup_embed_lsh`` IS swept, via
  the staged pair oracle.
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

EXCLUDED = {
    "q_dedup_embed": "O(N^2) exact baseline; scale path q_dedup_embed_lsh swept",
}

VERDICT = re.compile(r"^(PASS|FAIL) (q_[a-z0-9_]+)")


def _staged_keys() -> dict[str, str]:
    """key → mode for every key the staged stages certify."""
    sys.path.insert(0, _ROOT)
    sys.path.insert(0, os.path.join(_ROOT, "tools"))
    from check_graph_staged import GRAPH_KEYS  # noqa: E402
    from check_components_staged import KEYS as COMPONENT_KEYS  # noqa: E402

    out = {k: "staged-strict" for k in GRAPH_KEYS}
    out["q_dedup_embed_lsh"] = "staged-strict"
    out.update({k: "staged-strict" for k in COMPONENT_KEYS})
    return out


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
            return x.decode(errors="replace") if isinstance(x, bytes) else (x or "")

        return -1, _s(e.stdout) + _s(e.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/tmp/sfscale/sf1")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--timeout", type=int, default=2400, help="per-stage / per-chunk timeout (s)")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--log", default=None)
    ap.add_argument(
        "--skip-staged", action="store_true",
        help="only run the chunked remainder (resume helper)",
    )
    args = ap.parse_args()
    log = args.log or os.path.join(
        _ROOT, "sweeps", f"sweep_r{args.round}_sf1.jsonl"
    )
    os.makedirs(os.path.dirname(log), exist_ok=True)

    staged = _staged_keys()
    import __spark_entry__ as entrymod  # after _staged_keys set sys.path

    all_keys = sorted(entrymod.queries())
    remainder = [
        k for k in all_keys if k not in staged and k not in EXCLUDED
    ]

    done = set()
    if os.path.exists(log):
        for ln in open(log):
            try:
                r = json.loads(ln)
            except Exception:
                continue
            if str(r.get("status", "")).lower() == "pass":
                done.add(r["key"])

    n_fail = 0
    with open(log, "a") as f:
        def rec(key, status, mode, secs=None):
            nonlocal n_fail
            f.write(json.dumps({
                "key": key, "status": status, "mode": mode, "secs": secs,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "sf_dir": args.sf_dir,
            }) + "\n")
            f.flush()
            print(f"  {status.upper()} {key} ({mode})", flush=True)
            if status not in ("pass", "excluded"):
                n_fail += 1

        for key, why in EXCLUDED.items():
            if key not in done:
                rec(key, "excluded", f"excluded: {why}")

        if not args.skip_staged:
            stages = [
                ("graph family (per-key staged sessions, strict)",
                 [sys.executable, "tools/run_graph_per_key.py", args.sf_dir,
                  "--timeout", str(args.timeout)]),
                ("embed-LSH pairs (staged oracle, strict)",
                 [sys.executable, "tools/check_dedup_staged.py", args.sf_dir]),
                ("connected components (union-find oracle)",
                 [sys.executable, "tools/check_components_staged.py", args.sf_dir]),
            ]
            for title, cmd in stages:
                print(f"== {title}", flush=True)
                t0 = time.time()
                rc, out = _run(cmd, args.timeout * 4)
                secs = round(time.time() - t0, 1)
                seen = set()
                any_rec = False
                for ln in out.splitlines():
                    m = VERDICT.match(ln.strip())
                    if m and m.group(2) not in seen:
                        seen.add(m.group(2))
                        any_rec = True
                        if m.group(2) in done and m.group(1) == "PASS":
                            continue
                        rec(m.group(2), m.group(1).lower(), "staged-strict")
                if not any_rec or (rc != 0 and not any(
                    VERDICT.match(x.strip()) and "FAIL" in x for x in out.splitlines()
                )):
                    if not any_rec or rc != 0:
                        rec(f"stage:{cmd[1].rsplit('/', 1)[-1]}",
                            "timeout" if rc == -1 else ("fail" if rc else "pass"),
                            "stage", secs)
                if rc != 0:
                    print(f"  (stage rc={rc}; tail)\n{out[-1200:]}", flush=True)

    # chunked strict remainder — delegate to tools/sweep.py (appends to the
    # same log; its records carry detail strings and uppercase statuses)
    todo = [k for k in remainder if k not in done]
    if todo:
        keys_file = os.path.join("/tmp", f"sf1_keys_r{args.round}.txt")
        with open(keys_file, "w") as kf:
            kf.write("\n".join(todo) + "\n")
        print(f"== chunked strict remainder ({len(todo)} keys)", flush=True)
        rc = subprocess.call(
            [sys.executable, "tools/sweep.py", args.sf_dir, "--log", log,
             "--keys", keys_file, "--chunk", str(args.chunk),
             "--timeout", str(args.timeout)],
            cwd=_ROOT,
        )
        if rc != 0:
            n_fail += 1

    # summarize the artifact
    statuses = {}
    for ln in open(log):
        try:
            r = json.loads(ln)
        except Exception:
            continue
        statuses[r["key"]] = str(r.get("status", "")).lower()
    n_pass = sum(1 for s in statuses.values() if s == "pass")
    bad = sorted(k for k, s in statuses.items() if s not in ("pass", "excluded"))
    print(
        f"\nsf1 sweep: {n_pass} pass / {len(statuses)} recorded;"
        f" excluded: {sorted(EXCLUDED)}; bad: {bad} -> {log}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
