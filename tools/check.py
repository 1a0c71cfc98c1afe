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

import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from spark_iqmulus_spark.session import TABLES, get_spark  # noqa: E402


class CanonHazard(Exception):
    """Value shape that would crash or mis-hash the external driver's
    pandas-based canonicalizer (lists/maps are unhashable in its sort;
    int-vs-float type drift hashes differently)."""


def canon(v, strict: bool = False) -> str:
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if not strict and v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # strict: 123.0 stays "123.0", distinct from int "123" — mirrors
        # the driver, which hash-mismatches int vs float (e.g. DuckDB
        # HUGEINT canonicalized via float repr vs Spark BIGINT).
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, dict, set)):
        if strict:
            raise CanonHazard(
                f"driver-unsafe output value of type {type(v).__name__}: "
                f"{str(v)[:80]}"
            )
        if isinstance(v, dict):
            return (
                "{"
                + ",".join(
                    f"{canon(k)}:{canon(x)}" for k, x in sorted(v.items())
                )
                + "}"
            )
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (datetime.date, datetime.datetime, datetime.time, int, str)):
        return str(v)
    if strict:
        # Row/struct objects and anything else exotic would also diverge
        # between the two engines' python renderings.
        raise CanonHazard(f"driver-unsafe output type {type(v).__name__}")
    return str(v)


#: DuckDB fetchall() returns exact Python ints even for HUGEINT, so the
#: value-level hash can't see the drift the driver sees (it canonicalizes
#: through pandas, where HUGEINT becomes float64 and renders "123.0" against
#: Spark's int "123").  Strict mode therefore compares TYPE CLASSES between
#: the Spark schema and the DuckDB relation types: any int-vs-float /
#: date-vs-timestamp class mismatch, and any HUGEINT or DECIMAL output at
#: all, is a guaranteed or likely driver hash-mismatch.
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "REAL"}


def _duck_class(t: str) -> str:
    t = str(t).upper()
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLOAT:
        return "float"
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return "other"


def _spark_class(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        return "decimal"
    if s == "date":
        return "date"
    if s.startswith("timestamp"):
        return "timestamp"
    return "other"


def type_class_problems(spark_schema, ocols: list[str], otypes: list) -> list[str]:
    sclasses = {f.name: _spark_class(f.dataType) for f in spark_schema.fields}
    out = []
    for c, t in zip(ocols, otypes):
        oc = _duck_class(t)
        sc = sclasses.get(c)
        if oc == "hugeint":
            out.append(
                f"col {c!r}: oracle HUGEINT (driver renders as float vs "
                f"spark {sc}) — CAST the aggregate AS BIGINT"
            )
        elif oc == "decimal" or sc == "decimal":
            out.append(
                f"col {c!r}: decimal output (spark={sc} oracle={oc}) — "
                f"driver canonicalization of Decimal diverges; cast to "
                f"DOUBLE/BIGINT on both sides"
            )
        elif sc is not None and sc != oc and {sc, oc} <= {"int", "float"}:
            out.append(
                f"col {c!r}: int/float class mismatch spark={sc} "
                f"oracle={oc} — driver renders 123 vs 123.0"
            )
        elif sc is not None and sc != oc and {sc, oc} <= {"date", "timestamp"}:
            out.append(
                f"col {c!r}: date/timestamp class mismatch spark={sc} "
                f"oracle={oc}"
            )
    return out


def table_hash(
    cols: list[str], rows: list[tuple], strict: bool = False
) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon(r[i], strict) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, lines


#: Spark-side column types the aggregated digest canonicalizes identically
#: to DuckDB's ``CAST(x AS VARCHAR)`` (exact value rendering — floats and
#: decimals are NOT here; their reprs can drift between engines).
_AGG_SAFE_TYPES = {"tinyint", "smallint", "int", "bigint", "string", "boolean", "date"}


def agg_digest_spark(sdf) -> tuple[int, int]:
    """Order-insensitive engine-side digest ``(count, Σ md5_lower64)`` of a
    Spark DataFrame — two numbers cross the driver, never the rows, so a
    98M-row output verifies without materialization (VERDICT r9 item 3).

    Per row: columns sorted by name, each rendered length-prefixed
    (``len:value`` from ``CAST(c AS STRING)``, NULL → the unambiguous
    marker ``N``), joined by '|' — the length prefix makes field
    boundaries unambiguous (a bare join would hash ('a|b','c') and
    ('a','b|c') identically, and NULL would collide with the string
    'NULL'); md5 of that line; the LOWER 64 bits of the digest
    (little-endian — DuckDB ``md5_number_lower`` semantics, rebuilt here
    by byte-reversing hex chars 17..32) summed exactly.  Raises
    ValueError for column types whose string rendering can drift between
    engines (float/double/decimal/arrays)."""
    from pyspark.sql import functions as F

    bad = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.simpleString() not in _AGG_SAFE_TYPES
    ]
    if bad:
        raise ValueError(
            f"agg-hash unsafe column types {bad}; only {_AGG_SAFE_TYPES} "
            "render identically in both engines"
        )
    cols = sorted(sdf.columns)

    def fld(c):
        s = F.col(c).cast("string")
        return F.when(F.col(c).isNull(), F.lit("N")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )

    line = F.concat_ws("|", *[fld(c) for c in cols])
    h = F.md5(line)
    lower_le = F.concat(*[F.substring(h, 31 - 2 * i, 2) for i in range(8)])
    val = F.conv(lower_le, 16, 10).cast("decimal(38,0)")
    r = sdf.select(
        F.count(F.lit(1)).alias("n"), F.sum(val).alias("h")
    ).collect()[0]
    return int(r["n"]), int(r["h"]) if r["h"] is not None else 0


def agg_digest_duck(con, sql: str, cols: list[str]) -> tuple[int, int]:
    """DuckDB twin of ``agg_digest_spark`` over an oracle SQL string."""
    parts = ", ".join(
        f"CASE WHEN t.\"{c}\" IS NULL THEN 'N' ELSE"
        f" concat(length(CAST(t.\"{c}\" AS VARCHAR)), ':',"
        f" CAST(t.\"{c}\" AS VARCHAR)) END"
        for c in sorted(cols)
    )
    q = (
        f"SELECT count(*) AS n, sum(md5_number_lower(concat_ws('|', {parts}))) AS h "
        f"FROM ({sql}) t"
    )
    n, h = con.sql(q).fetchone()
    return int(n), int(h) if h is not None else 0


def agg_compare(sdf, con, oracle_sql: str, name: str, t0: float):
    """The shared agg-hash comparison protocol (column names, then
    (count, digest) per engine).  Returns ``(ok, line)`` — one place to
    evolve digest semantics for check.py and both staged runners."""
    ocols = list(con.sql(f"SELECT * FROM ({oracle_sql}) t LIMIT 0").columns)
    if sorted(sdf.columns) != sorted(ocols):
        return False, (
            f"FAIL {name}: cols spark={sorted(sdf.columns)} oracle={sorted(ocols)}"
        )
    sn, sh = agg_digest_spark(sdf)
    on_, oh = agg_digest_duck(con, oracle_sql, ocols)
    if (sn, sh) != (on_, oh):
        return False, (
            f"FAIL {name}: agg-hash mismatch spark=({sn},{sh})"
            f" oracle=({on_},{oh})  [{time.time()-t0:.1f}s]"
        )
    return True, f"PASS {name}: {sn} rows (agg-hash)  [{time.time()-t0:.1f}s]"


def main() -> int:
    argv = [a for a in sys.argv[1:] if a not in ("--strict", "--agg-hash")]
    strict = "--strict" in sys.argv[1:]
    agg_hash = "--agg-hash" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("check")
    con = duckdb.connect()
    # cap the oracle engine: large-SF joins must spill, not OOM the box
    # (the sf5 graph/dedup oracles reached 96 GB RSS unbounded)
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        if agg_hash and name in oracles:
            # engine-side digests: rows never cross the driver on either
            # engine, so 10⁸-row outputs verify (VERDICT r9 item 3)
            try:
                ok, line = agg_compare(fn(spark, sf_dir), con, oracles[name], name, t0)
            except Exception:
                print(f"FAIL {name}: agg-hash error")
                traceback.print_exc()
                n_fail += 1
                continue
            print(line)
            n_pass, n_fail = n_pass + ok, n_fail + (not ok)
            continue
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
            if strict:
                # rows-only keys still get a driver-side canonicalization
                # of the Spark output — list/map columns would crash it.
                try:
                    table_hash(scols, [tuple(r) for r in srows], strict=True)
                except CanonHazard as exc:
                    print(f"FAIL {name}: {exc}")
                    n_fail += 1
                    continue
            print(f"rows-only {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
            n_rows_only += 1
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
        problems = []
        if strict:
            problems.extend(type_class_problems(sdf.schema, ocols, otypes))
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            try:
                sh, sl = table_hash(scols, [tuple(r) for r in srows], strict)
                oh, ol = table_hash(ocols, orows, strict)
            except CanonHazard as exc:
                problems.append(str(exc))
                sh = oh = None
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
