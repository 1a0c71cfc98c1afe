"""Local correctness harness mimicking the driver's oracle comparison.

For every key in ``queries()``: run the Spark DataFrame and the DuckDB oracle
on the same sf dir, then compare row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized).  Usage::

    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from spark_iqmulus_spark.session import TABLES, get_spark  # noqa: E402


def canon(v) -> str:
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, lines


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception:
            print(f"FAIL {name}: oracle error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sh, sl = table_hash(scols, [tuple(r) for r in srows])
            oh, ol = table_hash(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                diffs = [
                    (a, b) for a, b in zip(sl, ol) if a != b
                ][:3]
                for a, b in diffs:
                    problems.append(f"  spark : {a[:200]}")
                    problems.append(f"  oracle: {b[:200]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]) + f"  [{time.time()-t0:.1f}s]")
            for p in problems[1:]:
                print("   " + p)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
