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
    # BigDecimal has no signed zero: Spark answers +0.0 (probed) — the
    # replay must not stamp the input's sign bit on a zero result
    assert not np.signbit(_round0_half_up(np.array([-0.3, -0.0, -0.49]))).any()


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


def test_eval_conditional_nan_total_order():
    """cmp_* ops replay Spark's total order exactly (NaN largest,
    NaN = NaN true — probed against Spark 4.1.2), and sel nests
    first-match-wins."""
    from spark_iqmulus_spark.sources.exprprog import eval_program_typed

    nan = float("nan")
    col = np.array([1.0, nan, 100.0, -5.0], dtype=np.float64)
    # when(x > 50) -> 50 else x  ==  [1, 50(nan>50 true!), 50, -5]
    prog = [
        ("col", "x"),                       # else: x
        ("col", "x"), ("lit", 50.0, "f8"), ("cmp_gt",),
        ("lit", 50.0, "f8"),
        ("sel",),
    ]
    got = eval_program_typed(prog, {"x": col}, "f8")
    assert got.tolist() == [1.0, 50.0, 50.0, -5.0]

    # NaN == NaN is TRUE in Spark's semantics
    prog_eq = [
        ("lit", -1.0, "f8"),
        ("col", "x"), ("col", "x"), ("cmp_eq",),
        ("lit", 7.0, "f8"),
        ("sel",),
    ]
    got = eval_program_typed(prog_eq, {"x": col}, "f8")
    assert got.tolist() == [7.0, 7.0, 7.0, 7.0]

    # 5 < NaN is TRUE (NaN sorts above +inf); NaN < 5 is FALSE
    prog_lt = [
        ("lit", 0.0, "f8"),
        ("col", "x"), ("lit", 5.0, "f8"), ("cmp_lt",),
        ("lit", 1.0, "f8"),
        ("sel",),
    ]
    got = eval_program_typed(prog_lt, {"x": np.array([nan, np.inf, 4.0])}, "f8")
    assert got.tolist() == [0.0, 0.0, 1.0]
    prog_ltn = [
        ("lit", 0.0, "f8"),
        ("lit", 5.0, "f8"), ("col", "x"), ("cmp_lt",),
        ("lit", 1.0, "f8"),
        ("sel",),
    ]
    got = eval_program_typed(prog_ltn, {"x": np.array([nan, np.inf, 4.0])}, "f8")
    assert got.tolist() == [1.0, 1.0, 0.0]


def test_eval_f4_typed_program_stays_single_precision():
    """An all-f4 program computes in float32 (a typed literal must not
    promote): 16777216f + 1f == 16777216f in single precision, while
    double arithmetic would answer 16777217."""
    from spark_iqmulus_spark.sources.exprprog import eval_program_typed

    col = np.array([16777216.0], dtype=np.float32)
    prog = [("col", "x"), ("lit", 1.0, "f4"), ("add",)]
    got = eval_program_typed(prog, {"x": col}, "f4")
    assert got.dtype == np.float32 and got[0] == np.float32(16777216.0)


def test_floor_program_long_cast_semantics():
    """Round 13: a floor-rooted program ends in ("d2l",) — the replay
    carries an EXACT int64 and the finisher applies JVM long-cast
    semantics: legacy l2i is LOW-BITS truncation (probed: Spark answers
    −1296 for floor(2147483000·2.0) cast int — d2i saturation would
    answer 2147483647), ANSI raises."""
    from spark_iqmulus_spark.sources.exprprog import eval_program_typed

    prog = [
        ("col", "x"), ("cast", "f8"), ("lit", 2.0, "f8"), ("mul",),
        ("floor",), ("d2l",),
    ]
    x = np.array([2147483000, -2147483000, 5, -7], dtype=np.int32)
    got = eval_program_typed(prog, {"x": x}, "i4", ansi=False)
    assert got.dtype == np.int32
    assert list(got) == [-1296, 1296, 10, -14]
    with pytest.raises(ArithmeticError):
        eval_program_typed(prog, {"x": x}, "i4", ansi=True)
    # narrower widths truncate low bits directly (l2s/l2b)
    got2 = eval_program_typed(prog, {"x": x}, "i2", ansi=False)
    assert got2.dtype == np.int16
    assert list(got2) == [
        np.int16(-1296), np.int16(1296), np.int16(10), np.int16(-14)
    ]


def test_ceil_program_and_d2l_saturation():
    """ceil replays np.ceil; d2l saturates at the Long bounds (JVM d2l)
    and maps NaN to 0 before the narrowing."""
    from spark_iqmulus_spark.sources.exprprog import eval_program_typed

    prog = [("col", "x"), ("ceil",), ("d2l",)]
    x = np.array([1.5, -1.5, 1e300, -1e300, np.nan], dtype=np.float64)
    got = eval_program_typed(prog, {"x": x}, "i4", ansi=False)
    # 1e300 → Long.MAX → low 32 bits = -1;  NaN → 0
    assert list(got) == [2, -1, -1, 0, 0]
