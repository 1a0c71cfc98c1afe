"""Chunked full-registry sweep driver for large scale factors.

``tools/check.py`` runs every key in one process; at sf5 a single stuck
key (or a DuckDB oracle that exhausts memory) stalls the whole sweep and
loses the results of every key after it.  This driver runs check.py in
small chunks under a per-chunk timeout, appending per-key outcomes to a
JSONL log so a sweep can be resumed and a per-key status table rendered.

Usage::

    python tools/sweep.py /tmp/sfscale/sf5 --log /tmp/sweep_sf5.jsonl \
        --keys /tmp/sf5_keys.txt --chunk 8 --timeout 1200

Keys already present in the log (pass or fail) are skipped, so re-running
resumes where the previous sweep stopped.  A chunk that times out is
retried key-by-key with the same timeout to isolate the slow key; a key
that times out alone is recorded as ``timeout``.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

LINE = re.compile(r"^(PASS|FAIL|rows-only) (q_[a-z0-9_]+)[:]? ?(.*)$")


def run_chunk(sf_dir: str, keys: list[str], timeout: int, strict: bool):
    cmd = [sys.executable, "tools/check.py", sf_dir]
    if strict:
        cmd.append("--strict")
    cmd.extend(keys)
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "24g")
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        out = p.stdout + p.stderr
        timed_out = False
    except subprocess.TimeoutExpired as exc:
        # TimeoutExpired carries bytes even with text=True
        def _s(v):
            if v is None:
                return ""
            return v.decode(errors="replace") if isinstance(v, bytes) else v

        out = _s(exc.stdout) + _s(exc.stderr)
        timed_out = True
    results = {}
    for ln in out.splitlines():
        m = LINE.match(ln.strip())
        if m:
            status, key, detail = m.groups()
            results[key] = {"status": status, "detail": detail[:300]}
    return results, timed_out, time.time() - t0, out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--log", required=True)
    ap.add_argument("--keys", help="file with one key per line (default: all)")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=1200)
    ap.add_argument("--no-strict", action="store_true")
    args = ap.parse_args()

    if args.keys:
        keys = [
            k.strip() for k in open(args.keys) if k.strip()
        ]
    else:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __spark_entry__ as entrymod

        keys = sorted(entrymod.queries())

    done = set()
    if os.path.exists(args.log):
        for ln in open(args.log):
            try:
                done.add(json.loads(ln)["key"])
            except Exception:
                pass
    todo = [k for k in keys if k not in done]
    print(f"{len(todo)} keys to sweep ({len(done)} already logged)")

    logf = open(args.log, "a")

    def record(key, status, detail, secs):
        logf.write(
            json.dumps(
                {"key": key, "status": status, "detail": detail,
                 "secs": round(secs, 1), "sf_dir": args.sf_dir,
                 "ts": time.time()}
            ) + "\n"
        )
        logf.flush()
        print(f"{status:9s} {key}  [{secs:.0f}s chunk]", flush=True)

    i = 0
    while i < len(todo):
        chunk = todo[i: i + args.chunk]
        i += args.chunk
        results, timed_out, secs, raw = run_chunk(
            args.sf_dir, chunk, args.timeout, not args.no_strict
        )
        missing = [k for k in chunk if k not in results]
        for k in chunk:
            if k in results:
                record(k, results[k]["status"], results[k]["detail"], secs)
        if missing and len(chunk) > 1:
            # isolate: re-run missing keys one at a time
            for k in missing:
                r1, t1, s1, raw1 = run_chunk(
                    args.sf_dir, [k], args.timeout, not args.no_strict
                )
                if k in r1:
                    record(k, r1[k]["status"], r1[k]["detail"], s1)
                else:
                    record(
                        k, "timeout" if t1 else "crash",
                        raw1.strip().splitlines()[-1][:300] if raw1.strip() else "",
                        s1,
                    )
        elif missing:
            k = missing[0]
            record(
                k, "timeout" if timed_out else "crash",
                raw.strip().splitlines()[-1][:300] if raw.strip() else "",
                secs,
            )
    logf.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
