"""Unit tests for sources/exprprog.py — the numpy replay of Catalyst
arithmetic that backs the fused re-grid write (no Spark session needed;
the Spark-facing extraction/equivalence tests live in test_fused_write.py)."""

from __future__ import annotations

import numpy as np
import pytest

from spark_iqmulus_spark.sources.exprprog import (
    _round0_half_up,
    eval_program,
)


def test_round0_half_up_matches_spark_semantics():
    # probed against Spark 4.1.2 round(v, 0) — incl. the negative
    # near-half case where a sign-naive d - floor(d) is inexact
    cases = [
        (2.5, 3.0), (-2.5, -3.0), (3.5, 4.0), (-3.5, -4.0),
        (0.5, 1.0), (-0.5, -1.0), (1.5, 2.0), (-1.5, -2.0),
        (0.49999999999999994, 0.0), (-0.49999999999999994, 0.0),
        (2.4999999999999996, 2.0), (7.499999999999999, 7.0),
        (7.500000000000001, 8.0), (123456789.5, 123456790.0),
        (1e15 + 0.5, 1e15 + 1), (-1e15 - 0.5, -1e15 - 1),
        (1e300, 1e300), (0.0, 0.0),
    ]
    vals = np.array([c[0] for c in cases])
    want = np.array([c[1] for c in cases])
    got = _round0_half_up(vals)
    assert (got == want).all(), list(zip(vals, got, want))
    assert np.isnan(_round0_half_up(np.array([np.nan]))[0])
    assert np.isinf(_round0_half_up(np.array([np.inf]))[0])


def _regrid_prog(src_scale, src_off, dst_scale, dst_off):
    """The canonical unscale(world_coord(x)) program: cast(round(((off +
    scale*double(x)) - off') / s', 0) as int)."""
    return [
        ("lit", src_off), ("lit", src_scale), ("col",), ("todouble",),
        ("mul",), ("add",), ("lit", dst_off), ("sub",), ("lit", dst_scale),
        ("div",), ("round0",),
    ]


def test_eval_program_regrid_exact_ties():
    # 0.01 → 0.02 grid halving: odd raws land exactly on .5 in float64
    # (fl(0.02) == 2·fl(0.01), so d1/(2·d1) == 0.5 exactly) — HALF_UP
    # must round AWAY from zero on both signs
    col = np.array([0, 1, -1, 2, -2, 4, -4], dtype=np.int32)
    prog = _regrid_prog(0.01, 0.0, 0.02, 0.0)
    got = eval_program(prog, col, ansi=True)
    assert got.dtype == np.int32
    assert got.tolist() == [0, 1, -1, 1, -1, 2, -2]


def test_eval_program_ansi_overflow_raises():
    prog = _regrid_prog(0.01, 0.0, 1e-12, 0.0)  # blows past int32
    with pytest.raises(ArithmeticError, match="CAST_OVERFLOW"):
        eval_program(prog, np.array([10**6], dtype=np.int32), ansi=True)
    # legacy mode saturates instead (JVM d2i)
    got = eval_program(prog, np.array([10**6, -(10**6)], dtype=np.int32), ansi=False)
    assert got.tolist() == [2147483647, -2147483648]


def test_eval_program_ansi_boundary_is_sparks():
    # Spark's ANSI range check is floor(v) ≤ Int.Max — 2147483647.4 casts
    prog = [("col",), ("todouble",), ("lit", 0.4), ("add",)]
    got = eval_program(prog, np.array([2147483647], dtype=np.int32), ansi=True)
    assert got.tolist() == [2147483647]


def test_eval_program_nan_legacy_zero():
    prog = [("col",), ("todouble",), ("lit", 0.0), ("div",)]  # 0/0 → NaN
    got = eval_program(prog, np.array([0, 5], dtype=np.int32), ansi=False)
    assert got[0] == 0  # NaN → 0 (d2i); 5/0 → inf → saturate
    assert got[1] == 2147483647
    with pytest.raises(ArithmeticError):
        eval_program(prog, np.array([0], dtype=np.int32), ansi=True)


def test_eval_program_constant_broadcasts():
    prog = [("lit", 7.6), ("round0",)]
    got = eval_program(prog, np.zeros(5, dtype=np.int32), ansi=True)
    assert got.tolist() == [8] * 5
