"""Aggregated-hash oracle mode (tools/check.py --agg-hash).

The digest — (count, Σ lower-64-bits of per-row md5 over name-sorted,
'|'-joined, NULL-canonicalized columns) — must be bit-identical between
the Spark and DuckDB implementations, order-insensitive, and sensitive to
any value change, so 10⁸-row outputs verify without driver
materialization."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")


def _digesters():
    from check import agg_digest_duck, agg_digest_spark

    return agg_digest_spark, agg_digest_duck


def test_agg_digest_parity_and_sensitivity(spark, tmp_path):
    agg_spark, agg_duck = _digesters()
    sdf = spark.createDataFrame(
        [(1, "a", None), (2, "b|c", "x"), (None, None, "NULL"), (3, "d", "y")],
        "k int, s string, t string",
    )
    pq = str(tmp_path / "digest.parquet")
    sdf.write.parquet(pq)

    con = duckdb.connect()
    sql = f"SELECT * FROM '{pq}/*.parquet'"
    got_s = agg_spark(spark.read.parquet(pq))
    got_d = agg_duck(con, sql, ["k", "s", "t"])
    assert got_s == got_d
    assert got_s[0] == 4 and got_s[1] > 0

    # order-insensitive: a reversed oracle hashes identically
    assert agg_duck(con, sql + " ORDER BY k DESC NULLS FIRST", ["k", "s", "t"]) == got_d
    # value-sensitive: one changed cell changes the digest
    changed = agg_duck(
        con, sql.replace("SELECT *", "SELECT k+0 AS k, s, t"), ["k", "s", "t"]
    )
    assert changed == got_d  # same values, different SQL → same digest
    perturbed = agg_duck(
        con,
        f"SELECT CASE WHEN k = 2 THEN 99 ELSE k END AS k, s, t FROM '{pq}/*.parquet'",
        ["k", "s", "t"],
    )
    assert perturbed != got_d


def test_agg_digest_no_separator_or_null_collisions(spark):
    """Fields are length-prefixed: ('a|b','c') vs ('a','b|c') must digest
    differently, and SQL NULL must not collide with the string 'NULL'."""
    import duckdb

    agg_spark, agg_duck = _digesters()
    con = duckdb.connect()
    shifted_a = agg_duck(con, "SELECT 'a|b' AS x, 'c' AS y", ["x", "y"])
    shifted_b = agg_duck(con, "SELECT 'a' AS x, 'b|c' AS y", ["x", "y"])
    assert shifted_a != shifted_b
    null_v = agg_duck(con, "SELECT CAST(NULL AS VARCHAR) AS x", ["x"])
    null_s = agg_duck(con, "SELECT 'NULL' AS x", ["x"])
    assert null_v != null_s
    # and Spark agrees with DuckDB on both renderings
    assert agg_spark(spark.createDataFrame([("a|b", "c")], "x string, y string")) == shifted_a
    assert agg_spark(spark.createDataFrame([(None,)], "x string")) == null_v
    assert agg_spark(spark.createDataFrame([("NULL",)], "x string")) == null_s


def test_agg_digest_rejects_drifty_types(spark):
    agg_spark, _ = _digesters()
    df = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError, match="agg-hash unsafe"):
        agg_spark(df)


def test_sweep_sf5_parse_and_stage_honesty():
    """sweep_sf5's verdict parser and the stage-honesty rule (round-11
    self-review): a stage that exits non-zero after printing only PASS
    lines must surface a stage-level failure record, while a stage whose
    nonzero exit reflects a parsed per-key FAIL must not double-record."""
    import sweep_sf5

    out = "noise\nPASS q_graph_degree: 60 rows\nFAIL q_graph_cc: mismatch\n"
    recs = sweep_sf5._parse(out, lambda k: "staged-strict")
    assert [(r["key"], r["status"]) for r in recs] == [
        ("q_graph_degree", "pass"),
        ("q_graph_cc", "fail"),
    ]
    # the SHIPPED stage-record rule (sweep_sf5._stage_record_needed):
    # all-pass + rc!=0, or zero parsed verdicts (format drift / empty key
    # loop), warrants a synthetic stage failure; a parsed per-key FAIL
    # already accounts for the nonzero exit
    rule = sweep_sf5._stage_record_needed
    assert rule(1, sweep_sf5._parse("PASS q_a: ok", lambda k: "m"))
    assert not rule(0, sweep_sf5._parse("PASS q_a: ok", lambda k: "m"))
    assert not rule(1, recs)  # FAIL already recorded
    assert rule(-1, [])  # timeout before any verdict
    assert rule(0, [])  # rc==0 with NO verdicts must not read as clean
    # duplicate verdict lines (a failing child's echoed tail) dedupe to
    # the first occurrence per key
    dup = sweep_sf5._parse(
        "FAIL q_x: mismatch\nsome tail\nFAIL q_x: mismatch", lambda k: "m"
    )
    assert [(r["key"], r["status"]) for r in dup] == [("q_x", "fail")]


def test_sweep_sf5_resume_only_skips_passes(tmp_path):
    """A rerun must re-attempt failed/timed-out keys: only 'pass' records
    mark a key done in the resume set."""
    import json

    log = tmp_path / "sweep.jsonl"
    log.write_text(
        json.dumps({"key": "q_a", "status": "pass"}) + "\n"
        + json.dumps({"key": "q_b", "status": "fail"}) + "\n"
        + json.dumps({"key": "q_c", "status": "timeout"}) + "\n"
    )
    with open(log) as f:
        done = {
            r["key"]
            for r in (json.loads(ln) for ln in f if ln.strip())
            if r.get("status") == "pass"
        }
    assert done == {"q_a"}
