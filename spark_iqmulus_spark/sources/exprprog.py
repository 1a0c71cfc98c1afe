"""Exact numpy replay of Catalyst arithmetic for the fused byte path.

The one write shape still paying the JVM→Python Arrow hop after round 11
is a Project with COMPUTED columns — most commonly re-gridding x/y/z onto
a new scale/offset (las2las: ``x' = round((world − off′)/s′)``), which is
plain float64 arithmetic the byte path can run in numpy (VERDICT r11 next
round #1).  "Provably equivalent" here cannot mean symbolic algebra: the
general sink evaluates the expression in JVM float64 with a specific
operation order, and a re-associated or refactored evaluation can differ
by 1 ulp — which, after ``round()``, moves points across grid boundaries.
So instead of recognizing one blessed affine pattern, this module

- EXTRACTS the optimized Catalyst expression tree into a tiny postfix
  program (``extract_program``) gated to a closed node set whose float64
  semantics numpy reproduces bit-for-bit: ``Literal`` (double),
  ``AttributeReference`` (the source column itself), widening ``Cast``
  int→double, ``Add/Subtract/Multiply/Divide/UnaryMinus`` (IEEE-754
  double ops — identical in JVM and numpy), ``Sqrt``/``Abs`` (sqrt is
  correctly rounded in both ``Math.sqrt`` and hardware ``sqrtsd``),
  ``Round(e, 0)`` (Spark HALF_UP, see ``_round0_half_up``), under a root
  ``Cast(double → int)``;
- REPLAYS it vectorized over the raw records (``eval_program``) in the
  exact tree order, so every intermediate equals the JVM's bit-for-bit
  and the emitted int32 matches the general sink on every input,
  including values landing exactly on ``.5`` grid boundaries.

Anything outside the node set (a narrowing cast, a non-zero round scale,
try_cast, a non-arithmetic function, …) fails extraction and the write
falls back to the general sink.  Round 12: leaves carry their column
name, so a program may reference several columns of one record — the
affine-transform shape ``x' = a·x + b·y + c`` replays for PLY/PCD; the
LAS re-grid keeps the single-column restriction (a cross-axis reference
would break its per-axis grid gate).  Division is only syntactically
reachable with literal divisors in practice, but the replay is exact for
any double divide, so no structural restriction is needed.

Reference parity note: the reference has no fused write at all (its
direct save actions copy relation bytes, ``las/package.scala:45-98``);
this extends the round-9 transparent fused write (sources/fused_write.py)
to the computed-column shape.
"""

from __future__ import annotations

import numpy as np

_BINOPS = {
    "Add": "add",
    "Subtract": "sub",
    "Multiply": "mul",
    "Divide": "div",
}

#: int32 bounds, exactly representable in float64
_I32_MIN, _I32_MAX = -2147483648.0, 2147483647.0


def _simple(jobj) -> str:
    return jobj.getClass().getSimpleName()


def extract_program(jexpr, col_name: str):
    """Catalyst expression (py4j) → ``(program, ansi)`` or ``None``.

    The int32-rooted shape (``Cast(double-expr AS int)``) — the LAS
    re-grid callers' contract.  Kept as a thin wrapper over
    ``extract_program_any``; see it for the node-set rules.  ``ansi`` is
    the root cast's evalMode (ANSI → overflow raises, LEGACY → JVM d2i
    saturate/NaN→0); ``None`` when the mode is unreadable, letting the
    caller fall back to the session conf."""
    got = extract_program_any(jexpr, col_name)
    if got is None or got[1] != "i4":
        return None
    prog, _, ansi = got
    return prog, ansi


#: source-column Spark types whose widening cast to double numpy replays
#: bit-exactly: int family (l2d and astype both IEEE round-to-nearest;
#: int/short/byte/float are exact)
_WIDENS_TO_DOUBLE = {"tinyint", "smallint", "int", "bigint", "float"}


def extract_program_any(jexpr, col_name: str | None = None):
    """Catalyst expression (py4j) → ``(program, out_char, ansi)`` or
    ``None`` — the generalized extractor behind the fused computed-column
    write shapes (round 12 extends the LAS re-grid to PLY/PCD).

    ``out_char`` names the output storage the program produces:

    - ``'i4'`` — root ``Cast(double-expr AS int)``: the LAS re-grid /
      integer-property shape; ``ansi`` is the root cast's evalMode
      (``None`` = unreadable → caller uses the session conf); TRY mode
      (overflow → NULL) has no byte-path equivalent and fails extraction.
    - ``'f4'`` — root ``Cast(double-expr AS float)``: d2f is IEEE
      round-to-nearest in both the JVM and numpy ``astype`` and cannot
      fail in any eval mode (overflow → ±Infinity), so ``ansi`` is
      ``None`` and irrelevant.
    - ``'f8'`` — a bare double expression (no root cast): the natural
      shape over a double source property.

    The arithmetic body must run entirely in double over source-column
    leaves (Catalyst inserts the widening cast right above each
    attribute; see ``_WIDENS_TO_DOUBLE`` for the leaf types whose
    widening numpy replays bit-exactly).  Leaves emit ``("col", name)``
    ops, so a program may reference SEVERAL columns of the same record —
    the affine-transform write shape (``x' = a·x + b·y + c``); restrict
    with ``col_name`` to require every leaf to be that one column (the
    LAS re-grid contract, where a cross-axis reference would break the
    per-axis grid gate).  ``program_refs`` lists a program's columns."""
    ansi = None
    if _simple(jexpr) == "Cast":
        dt = str(jexpr.dataType().simpleString())
        child = jexpr.children().apply(0)
        if str(child.dataType().simpleString()) != "double":
            return None
        if dt == "int":
            out_char = "i4"
            try:
                mode = str(jexpr.evalMode())
                if mode == "TRY":
                    return None
                ansi = mode == "ANSI"
            except Exception:
                pass  # evalMode unreadable — caller uses session conf
        elif dt == "float":
            out_char = "f4"  # cannot fail in any eval mode
        else:
            return None
        root = child
    else:
        if str(jexpr.dataType().simpleString()) != "double":
            return None
        out_char = "f8"
        root = jexpr

    prog: list[tuple] = []

    def walk(n) -> bool:
        cls = _simple(n)
        dt = str(n.dataType().simpleString())
        if cls == "AttributeReference":
            # a bare attribute leaf is only type-correct in the double
            # arithmetic body when the column itself is double (the f8
            # source-property shape); narrower columns arrive under the
            # widening Cast below
            nm = str(n.name())
            if (col_name is not None and nm != col_name) or dt != "double":
                return False
            prog.append(("col", nm))
            return True
        if cls == "Literal":
            if dt != "double":
                return False
            v = n.value()
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                return False
            prog.append(("lit", float(v)))
            return True
        if cls == "Cast":
            # only the exact-replay widening of the source column itself
            # (int family / float → double); any other cast (narrowing,
            # double→double no-op from a weird plan, a cast over a
            # sub-expression) fails extraction
            if dt != "double":
                return False
            c = n.children().apply(0)
            if (
                _simple(c) != "AttributeReference"
                or (col_name is not None and str(c.name()) != col_name)
                or str(c.dataType().simpleString()) not in _WIDENS_TO_DOUBLE
            ):
                return False
            try:
                if str(n.evalMode()) == "TRY":
                    return False
            except Exception:
                pass  # widening to double cannot overflow; mode irrelevant
            prog.append(("col", str(c.name())))
            prog.append(("todouble",))
            return True
        if cls in _BINOPS:
            if dt != "double":
                return False
            kids = n.children()
            if not walk(kids.apply(0)) or not walk(kids.apply(1)):
                return False
            prog.append((_BINOPS[cls],))
            return True
        if cls in ("UnaryMinus", "Sqrt", "Abs"):
            # sqrt is IEEE-754 correctly rounded in BOTH Math.sqrt (JLS
            # guarantee) and numpy (hardware sqrtsd), so the replay is
            # bit-exact; abs/negate just flip the sign bit
            if dt != "double":
                return False
            if not walk(n.children().apply(0)):
                return False
            prog.append(
                {"UnaryMinus": ("neg",), "Sqrt": ("sqrt",), "Abs": ("abs",)}[cls]
            )
            return True
        if cls == "Round":
            if dt != "double":
                return False
            kids = n.children()
            scale = kids.apply(1)
            if _simple(scale) != "Literal" or scale.value() != 0:
                return False
            if not walk(kids.apply(0)):
                return False
            prog.append(("round0",))
            return True
        return False

    if not walk(root):
        return None
    return prog, out_char, ansi


def _round0_half_up(d: np.ndarray) -> np.ndarray:
    """Spark ``round(double, 0)``: BigDecimal HALF_UP — round half AWAY
    from zero, decided on the exact double value.

    (BigDecimal.valueOf renders the shortest round-tripping decimal, but
    at scale 0 that can never sit on the other side of a ``.5`` boundary
    from the exact binary value: ``k.5`` is itself exactly representable
    for every reachable k, and any decimal ≤ k.5 rounds to a double
    ≤ k.5 by monotonicity — so deciding on the exact double matches.)

    The fraction is computed in MAGNITUDE space: ``|d| − floor(|d|)`` is
    exact in float64 for ``|d| ≥ 0`` (the difference is < 1 and a
    multiple of ulp(|d|), hence representable), whereas ``d − floor(d)``
    is INEXACT for d ∈ (−1, 0) — e.g. −0.49999999999999994 − (−1.0)
    rounds to exactly 0.5, which a sign-naive formula would round away
    from zero where Spark answers 0 (probed against Spark 4.1.2)."""
    with np.errstate(invalid="ignore"):  # inf − inf below, masked after
        a = np.abs(d)
        f = np.floor(a)
        r = np.where(a - f >= 0.5, f + 1.0, f)
        r = np.copysign(r, d)
        return np.where(np.isfinite(d), r, d)


def program_refs(prog) -> set:
    """Source column names a program references (empty for legacy bare
    ``("col",)`` ops, which bind to the single passed array)."""
    return {op[1] for op in prog if op[0] == "col" and len(op) > 1}


def _replay_f64(prog, cols) -> np.ndarray:
    """Shared postfix replay: program over the source record → float64
    result broadcast to the record count (a pure-literal program yields a
    scalar otherwise).  ``cols`` is the structured source-record array —
    ``("col", name)`` ops index it by field — or, for a legacy bare
    ``("col",)`` program, the single column array itself."""
    stack: list[np.ndarray] = []
    with np.errstate(all="ignore"):
        for op in prog:
            k = op[0]
            if k == "col":
                stack.append(cols[op[1]] if len(op) > 1 else cols)
            elif k == "lit":
                stack.append(np.float64(op[1]))
            elif k == "todouble":
                stack.append(np.asarray(stack.pop(), dtype=np.float64))
            elif k == "neg":
                stack.append(-stack.pop())
            elif k == "sqrt":
                stack.append(np.sqrt(np.asarray(stack.pop(), dtype=np.float64)))
            elif k == "abs":
                stack.append(np.abs(stack.pop()))
            elif k == "round0":
                stack.append(_round0_half_up(np.asarray(stack.pop(), dtype=np.float64)))
            else:
                b = stack.pop()
                a = stack.pop()
                if k == "add":
                    stack.append(a + b)
                elif k == "sub":
                    stack.append(a - b)
                elif k == "mul":
                    stack.append(a * b)
                elif k == "div":
                    stack.append(a / b)
                else:  # pragma: no cover - extraction emits a closed op set
                    raise ValueError(f"unknown op {k!r}")
    v = np.asarray(stack.pop(), dtype=np.float64)
    n = len(cols)
    if v.shape != (n,):
        v = np.broadcast_to(v, (n,)).copy()
    return v


def eval_program(prog, cols, ansi: bool) -> np.ndarray:
    """Replay an extracted int-rooted program over the source records
    (``cols`` as in ``_replay_f64``); returns the int32 values the general
    sink would write for the same records.

    ``ansi=True`` mirrors Spark's ANSI cast: a NaN or out-of-int32-range
    result raises (the general sink's job fails on the same rows — the
    fused job failing with the same meaning is the equivalent outcome);
    ``ansi=False`` mirrors the JVM ``d2i`` legacy cast: NaN → 0,
    truncate toward zero, saturate at the int32 bounds."""
    v = _replay_f64(prog, cols)
    if ansi:
        # Spark's ANSI range check: floor(v) ≤ Int.Max && ceil(v) ≥ Int.Min
        # (so 2147483647.4 still casts — truncation lands in range)
        bad = ~np.isfinite(v) | (np.floor(v) > _I32_MAX) | (np.ceil(v) < _I32_MIN)
        if bad.any():
            raise ArithmeticError(
                "[CAST_OVERFLOW] computed coordinate value"
                f" {v[bad][0]!r} cannot be cast to int32 (ANSI mode) —"
                " same rows fail the general sink"
            )
        return np.trunc(v).astype(np.int64).astype(np.int32)
    v = np.where(np.isnan(v), 0.0, v)
    v = np.clip(np.trunc(v), _I32_MIN, _I32_MAX)
    return v.astype(np.int64).astype(np.int32)


def eval_program_typed(
    prog, cols, out_char: str, ansi: bool = False
) -> np.ndarray:
    """Replay by output storage (``extract_program_any``'s out_char):
    ``'i4'`` delegates to ``eval_program`` (ANSI/legacy d2i), ``'f4'``
    casts the double result with numpy ``astype`` (IEEE round-to-nearest
    — identical to the JVM's d2f, including overflow → ±Infinity and NaN
    passthrough), ``'f8'`` is the raw double result."""
    if out_char == "i4":
        return eval_program(prog, cols, ansi)
    v = _replay_f64(prog, cols)
    if out_char == "f4":
        return v.astype("<f4")
    if out_char != "f8":  # pragma: no cover - extraction emits a closed set
        raise ValueError(f"unknown out_char {out_char!r}")
    return v.astype("<f8")
