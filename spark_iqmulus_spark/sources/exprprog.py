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
  program (``extract_program_any``) gated to a closed node set whose float64
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

Anything outside the node set (a narrowing int cast, a non-zero round
scale, try_cast, a non-correctly-rounded function like log/pow, a NULL
branch, …) fails extraction and the write falls back to the general
sink.  Round 13 adds ``Floor``/``Ceil`` (correctly rounded in both
``Math.floor/ceil`` and ``np.floor/ceil``) directly under the root int
cast — the voxelize/decimate ``floor(x/s)`` las2las shape; Spark types
them BIGINT, so the replay carries an exact int64 through the ``"d2l"``
op and the root cast finishes with JVM l2i/l2s/l2b LOW-BITS semantics
(``_long_finish``), not the double path's d2i saturation.  Round 12 extensions: leaves carry their column name, so a program
may reference several columns of one record (the affine-transform shape
``x' = a·x + b·y + c``); the walk is TYPE-PARAMETRIC over
float32/float64 — every node replays in its own Catalyst dtype, because
the optimizer freely retypes trees (``when(...).cast('float')`` becomes
an all-float CaseWhen); and conditionals (``If``/``CaseWhen`` with
comparison predicates under And/Or/Not) replay Spark's NaN-largest total
order with explicit masks — the clamp/threshold/reclassify shapes.
Division is only syntactically reachable with literal divisors in
practice, but the replay is exact for any double divide, so no
structural restriction is needed.

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


#: source-column Spark types whose widening cast to double numpy replays
#: bit-exactly: int family (l2d and astype both IEEE round-to-nearest;
#: int/short/byte/float are exact)
_WIDENS_TO_DOUBLE = {"tinyint", "smallint", "int", "bigint", "float"}

#: Catalyst float dtypes → numpy chars (the type-parametric walk)
_FLOAT_DT = {"float": "f4", "double": "f8"}
_INT_DTS = {"tinyint", "smallint", "int", "bigint"}
#: int ROOT widths (Cast target or bare int tree → output storage)
_INT_ROOT = {"int": "i4", "smallint": "i2", "tinyint": "i1"}
#: int dtypes whose NON-ARITHMETIC nodes (attr/literal/widening-cast/
#: select) embed exactly in float64 — every value ≤ 2^31 is exact, and
#: the walk admits no int arithmetic (whose JVM wrap f8 cannot mimic).
#: bigint is excluded: beyond 2^53 the embedding rounds.
_INT_EMBED = {"int": "i4", "smallint": "i2", "tinyint": "i1"}
_PRED_OPS = {
    "LessThan": "cmp_lt",
    "LessThanOrEqual": "cmp_le",
    "GreaterThan": "cmp_gt",
    "GreaterThanOrEqual": "cmp_ge",
    "EqualTo": "cmp_eq",
}


def extract_program_any(jexpr, col_name: str | None = None):
    """Catalyst expression (py4j) → ``(program, out_char, ansi)`` or
    ``None`` — the generalized extractor behind the fused computed-column
    write shapes (round 12 extends the LAS re-grid to PLY/PCD).

    ``out_char`` names the output storage the program produces:

    - ``'i4'`` — root ``Cast(float/double-expr AS int)``: the LAS re-grid
      / integer-property shape; ``ansi`` is the root cast's evalMode
      (``None`` = unreadable → caller uses the session conf); TRY mode
      (overflow → NULL) has no byte-path equivalent and fails extraction.
    - ``'f4'`` — a float-typed expression tree; ``'f8'`` — a double one.

    The walk is TYPE-PARAMETRIC over float32/float64 (Catalyst freely
    retypes trees — e.g. ``SimplifyCasts``/``PushFoldableIntoBranches``
    turn ``when(...)...cast('float')`` into an all-float CaseWhen): every
    node replays in its OWN Catalyst dtype, and numpy's f4/f8 IEEE ops
    match the JVM's bit-for-bit (arithmetic, casts between numeric
    widths, sqrt via correctly-rounded hardware, Spark's NaN-largest
    comparisons via explicit masks).  Leaves emit ``("col", name)`` ops,
    so a program may reference SEVERAL columns of the same record — the
    affine-transform shape; restrict with ``col_name`` to require every
    leaf to be that one column (the LAS re-grid contract).
    ``program_refs`` lists a program's columns."""
    ansi = None
    post_ops: list[tuple] = []
    root_dt = str(jexpr.dataType().simpleString())
    if _simple(jexpr) == "Cast" and root_dt in _INT_ROOT:
        # int-rooted shape: the re-grid (int) and, round 12, the
        # reclassify widths (smallint/tinyint — JVM d2s/d2b is d2i then
        # low-bits truncation, replayed by the width-parametric finisher)
        child = jexpr.children().apply(0)
        cdt = str(child.dataType().simpleString())
        out_char = _INT_ROOT[root_dt]
        try:
            mode = str(jexpr.evalMode())
            if mode == "TRY":
                return None
            ansi = mode == "ANSI"
        except Exception:
            pass  # evalMode unreadable — caller uses session conf
        if cdt == "bigint" and _simple(child) in ("Floor", "Ceil"):
            # round 13 (VERDICT r12 next #3): floor/ceil are IEEE
            # correctly-rounded in both Math.floor/ceil and np.floor/ceil
            # — the same bit-exactness argument as Sqrt — and
            # ``floor(x/s).cast('int')`` is the voxelize/decimate las2las
            # shape.  Spark types floor/ceil(double) as BIGINT, so the
            # root cast is long→int: JVM l2i/l2s/l2b LOW-BITS truncation
            # (not d2i saturation) — replayed by the "d2l" op (exact
            # int64 carrier) + the long finisher in eval_program_typed.
            # Admissible ONLY here, directly under the root int cast:
            # anywhere else the bigint output feeds long arithmetic or
            # comparisons the f8 embedding cannot replay, and those
            # positions already decline on the bigint dtype.
            g = child.children().apply(0)
            if str(g.dataType().simpleString()) != "double":
                return None
            post_ops = [
                ("floor",) if _simple(child) == "Floor" else ("ceil",),
                ("d2l",),
            ]
            root = g
        elif cdt not in _FLOAT_DT and cdt not in _INT_EMBED:
            return None
        else:
            root = child
    elif root_dt in _INT_EMBED:
        # a bare int-typed tree (e.g. when(c = 7, 0).otherwise(c) writing
        # back the int column) — the non-arithmetic int subset embeds
        # exactly in f8, finished by the width wrap with no range risk
        out_char = _INT_EMBED[root_dt]
        root = jexpr
    else:
        ch0 = _FLOAT_DT.get(root_dt)
        if ch0 is None:
            return None
        out_char = ch0
        root = jexpr

    prog: list[tuple] = []

    def walk(n) -> bool:
        cls = _simple(n)
        dt = str(n.dataType().simpleString())
        ch = _FLOAT_DT.get(dt)
        emb = ch is None and dt in _INT_EMBED  # int node, f8-embedded
        if cls == "AttributeReference":
            if ch is None and not emb:
                return False
            nm = str(n.name())
            if col_name is not None and nm != col_name:
                return False
            # int attrs push raw (signed view in eval) — selects and
            # comparisons over them are exact in the f8 embedding
            prog.append(("col", nm))
            return True
        if cls == "Literal":
            if ch is None:
                if not emb:
                    return False
                ch = "f8"  # int literal, exact in the embedding
            v = n.value()
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                return False
            prog.append(("lit", float(v), ch))
            return True
        if cls == "Cast":
            # numeric conversions numpy replays bit-exactly: int-family →
            # f4/f8 (round-to-nearest on both sides; int/short/byte/float
            # exact into double) and f4 ↔ f8 (widening exact, narrowing
            # IEEE round-to-nearest).  An int-typed CHILD must be a bare
            # attribute — integer arithmetic nodes are outside the set, so
            # anything else has no replay.  An interior int→int WIDENING
            # over an attribute (Catalyst equalizing comparison operand
            # types) embeds as the attribute itself
            if ch is None:
                if not emb:
                    return False
                # a chain of int-family casts over an int attribute is
                # value-preserving iff every cast target in the chain is
                # at least as wide as the attribute (Catalyst widens for
                # a comparison then narrows back for the output type —
                # e.g. Cast(tinyint ← Cast(int ← tinyint attr)));
                # narrowing BELOW the attr width would wrap and declines
                width = {"tinyint": 1, "smallint": 2, "int": 4}
                min_target = width[dt]
                c = n
                while _simple(c) == "Cast":
                    tdt = str(c.dataType().simpleString())
                    if tdt not in width:
                        return False
                    min_target = min(min_target, width[tdt])
                    try:
                        if str(c.evalMode()) == "TRY":
                            return False
                    except Exception:
                        pass
                    c = c.children().apply(0)
                cdt = str(c.dataType().simpleString())
                if (
                    _simple(c) != "AttributeReference"
                    or cdt not in width
                    or width[cdt] > min_target
                    or (col_name is not None and str(c.name()) != col_name)
                ):
                    return False
                prog.append(("col", str(c.name())))
                return True
            try:
                if str(n.evalMode()) == "TRY":
                    return False
            except Exception:
                pass  # numeric-to-float casts cannot fail; mode irrelevant
            c = n.children().apply(0)
            cdt = str(c.dataType().simpleString())
            if cdt in _INT_DTS:
                if (
                    _simple(c) != "AttributeReference"
                    or (col_name is not None and str(c.name()) != col_name)
                ):
                    return False
                prog.append(("col", str(c.name())))
                prog.append(("cast", ch))
                return True
            if cdt in _FLOAT_DT:
                if not walk(c):
                    return False
                prog.append(("cast", ch))
                return True
            return False
        if cls in _BINOPS:
            if ch is None:
                return False
            kids = n.children()
            if not walk(kids.apply(0)) or not walk(kids.apply(1)):
                return False
            prog.append((_BINOPS[cls],))
            return True
        if cls in ("UnaryMinus", "Abs"):
            if ch is None:
                return False
            if not walk(n.children().apply(0)):
                return False
            prog.append(("neg",) if cls == "UnaryMinus" else ("abs",))
            return True
        if cls == "Sqrt":
            # Math.sqrt is correctly rounded (JLS) and so is hardware
            # sqrtsd — bit-exact; Spark types SQRT double-only
            if ch != "f8":
                return False
            if not walk(n.children().apply(0)):
                return False
            prog.append(("sqrt",))
            return True
        if cls == "Round":
            if ch != "f8":
                return False
            kids = n.children()
            scale = kids.apply(1)
            if _simple(scale) != "Literal" or scale.value() != 0:
                return False
            if not walk(kids.apply(0)):
                return False
            prog.append(("round0",))
            return True
        if cls == "If":
            # if(pred, a, b) — the clamp/threshold shape; predicate NaN
            # semantics replayed exactly (Spark orders NaN largest and
            # NaN = NaN is true — probed against Spark 4.1.2).  Same
            # operand order as the CaseWhen emission: else-value,
            # predicate, true-value, one ("sel",)
            if ch is None and not emb:
                return False
            kids = n.children()
            if not walk(kids.apply(2)):
                return False
            if not walk_pred(kids.apply(0)):
                return False
            if not walk(kids.apply(1)):
                return False
            prog.append(("sel",))
            return True
        if cls == "CaseWhen":
            # when(...).otherwise(...): first-match-wins — replayed as
            # nested selects, innermost = else (a missing else is a NULL
            # literal, which fails the Literal rule → decline)
            if ch is None and not emb:
                return False
            try:
                branches = n.branches()
                nb = branches.size()
                else_opt = n.elseValue()
                if not else_opt.isDefined():
                    return False
                pairs = [
                    (branches.apply(i)._1(), branches.apply(i)._2())
                    for i in range(nb)
                ]
            except Exception:
                return False
            if not walk(else_opt.get()):
                return False
            for cond, val in reversed(pairs):
                if not walk_pred(cond) or not walk(val):
                    return False
                prog.append(("sel",))
            return True
        return False

    def walk_pred(n) -> bool:
        """Boolean sub-tree: comparisons over float/double operands
        (Spark's NaN-largest total order, replayed with explicit masks)
        composed with And/Or/Not."""
        cls = _simple(n)
        if cls in _PRED_OPS:
            kids = n.children()
            odt = str(kids.apply(0).dataType().simpleString())
            if odt not in _FLOAT_DT and odt not in _INT_EMBED:
                return False
            if not walk(kids.apply(0)) or not walk(kids.apply(1)):
                return False
            prog.append((_PRED_OPS[cls],))
            return True
        if cls in ("And", "Or"):
            kids = n.children()
            if not walk_pred(kids.apply(0)) or not walk_pred(kids.apply(1)):
                return False
            prog.append(("b_and" if cls == "And" else "b_or",))
            return True
        if cls == "Not":
            if not walk_pred(n.children().apply(0)):
                return False
            prog.append(("b_not",))
            return True
        return False

    if not walk(root):
        return None
    prog.extend(post_ops)
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
        # BigDecimal has no signed zero: Spark answers +0.0 for every
        # input rounding to zero (probed: round(-0.3) and round(-0.0)
        # are both 0x0), while copysign stamps the sign bit — adding
        # +0.0 normalizes −0.0 to +0.0 and leaves every other finite
        # value bit-identical (IEEE round-to-nearest: x + 0 == x)
        r = r + 0.0
        return np.where(np.isfinite(d), r, d)


def program_refs(prog) -> set:
    """Source column names a program references (empty for legacy bare
    ``("col",)`` ops, which bind to the single passed array)."""
    return {op[1] for op in prog if op[0] == "col" and len(op) > 1}


def _replay_raw(prog, cols) -> np.ndarray:
    """Shared postfix replay: program over the source record → result
    broadcast to the record count (a pure-literal program yields a scalar
    otherwise).  ``cols`` is the structured source-record array —
    ``("col", name)`` ops index it by field — or, for a legacy bare
    ``("col",)`` program, the single column array itself.  The result
    dtype follows the program root: float for arithmetic trees, INT64
    for a long-typed root (the floor/ceil voxel shape, whose exact long
    value float64 cannot carry — the "d2l" op converts with JVM d2l
    semantics and the long finisher narrows with l2i/l2s/l2b)."""
    stack: list[np.ndarray] = []
    with np.errstate(all="ignore"):
        for op in prog:
            k = op[0]
            if k == "col":
                c = cols[op[1]] if len(op) > 1 else cols
                if getattr(c, "dtype", None) is not None and c.dtype.kind == "u":
                    # the readers expose unsigned storage as the SAME-WIDTH
                    # SIGNED view (bit-preserving rule, binary_section.py) —
                    # the schema value Catalyst computed with is that view,
                    # so the replay must take it too (raw u2 65535 is
                    # schema smallint −1)
                    c = c.view(c.dtype.str.replace("u", "i"))
                stack.append(c)
            elif k == "lit":
                # typed literal: np scalar in the node's own dtype so the
                # following binop stays in that width (NEP-50: an np.f64
                # scalar would silently promote an f4 array)
                stack.append(
                    np.float32(op[1])
                    if len(op) > 2 and op[2] == "f4"
                    else np.float64(op[1])
                )
            elif k == "todouble":
                stack.append(np.asarray(stack.pop(), dtype=np.float64))
            elif k == "cast":
                stack.append(
                    np.asarray(
                        stack.pop(),
                        dtype=np.float32 if op[1] == "f4" else np.float64,
                    )
                )
            elif k == "neg":
                stack.append(-stack.pop())
            elif k == "sqrt":
                stack.append(np.sqrt(np.asarray(stack.pop(), dtype=np.float64)))
            elif k == "abs":
                stack.append(np.abs(stack.pop()))
            elif k in ("cmp_lt", "cmp_le", "cmp_gt", "cmp_ge", "cmp_eq"):
                # operands share the node dtype (f4 or f8) — compare in it
                b = np.asarray(stack.pop())
                a = np.asarray(stack.pop())
                if k in ("cmp_gt", "cmp_ge"):  # a > b  ≡  b < a
                    a, b = b, a
                    k = {"cmp_gt": "cmp_lt", "cmp_ge": "cmp_le"}[k]
                # Spark's total order: NaN is LARGER than everything and
                # NaN = NaN is TRUE (probed against Spark 4.1.2); numpy's
                # IEEE comparisons answer False on any NaN, so the masks
                # re-add the Spark cases explicitly
                na, nb = np.isnan(a), np.isnan(b)
                eq = (na & nb) | (a == b)
                if k == "cmp_eq":
                    stack.append(eq)
                else:
                    lt = (~na & nb) | (a < b)
                    stack.append(lt | eq if k == "cmp_le" else lt)
            elif k == "b_and":
                b2 = stack.pop()
                stack.append(stack.pop() & b2)
            elif k == "b_or":
                b2 = stack.pop()
                stack.append(stack.pop() | b2)
            elif k == "b_not":
                stack.append(~stack.pop())
            elif k == "sel":
                v = stack.pop()
                c = stack.pop()
                e = stack.pop()
                stack.append(np.where(c, v, e))
            elif k == "round0":
                stack.append(_round0_half_up(np.asarray(stack.pop(), dtype=np.float64)))
            elif k == "floor":
                stack.append(np.floor(np.asarray(stack.pop(), dtype=np.float64)))
            elif k == "ceil":
                stack.append(np.ceil(np.asarray(stack.pop(), dtype=np.float64)))
            elif k == "d2l":
                # JVM d2l: NaN → 0, truncate toward zero, saturate at the
                # Long bounds.  The result is an EXACT int64 array: below
                # 2^53 the double was exact; between 2^53 and 2^63 a
                # double is always integral and exactly representable, so
                # astype(int64) is exact there too
                v = np.atleast_1d(
                    np.trunc(np.asarray(stack.pop(), dtype=np.float64))
                )
                v = np.where(np.isnan(v), 0.0, v)
                out = np.zeros(v.shape, dtype=np.int64)
                big = v >= 9.223372036854775808e18  # 2^63
                small = v <= -9.223372036854775808e18
                mid = ~(big | small)
                out[mid] = v[mid].astype(np.int64)
                out[big] = np.iinfo(np.int64).max
                out[small] = np.iinfo(np.int64).min
                stack.append(out)
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
    v = np.asarray(stack.pop())
    if isinstance(cols, dict):  # test convenience: {name: array}
        n = len(next(iter(cols.values()))) if cols else 1
    else:
        n = len(cols)
    if v.shape != (n,):
        v = np.broadcast_to(v, (n,)).copy()
    return v


def _replay_f64(prog, cols) -> np.ndarray:
    """Float64 view of the replay — every program without a "d2l" root
    ends in a float stack top, so this is lossless there."""
    return np.asarray(_replay_raw(prog, cols), dtype=np.float64)


#: int root widths: (ANSI lo, ANSI hi, numpy dtype)
_INT_FINISH = {
    "i4": (_I32_MIN, _I32_MAX, np.int32),
    "i2": (-32768.0, 32767.0, np.int16),
    "i1": (-128.0, 127.0, np.int8),
}


def _int_finish(v: np.ndarray, ansi: bool, out_char: str) -> np.ndarray:
    """Width-parametric integer cast finisher over the exact f8 result.

    ``ansi=True`` mirrors Spark's ANSI cast: a NaN or out-of-range result
    raises (the general sink's job fails on the same rows — the fused job
    failing with the same meaning is the equivalent outcome);
    ``ansi=False`` mirrors the JVM legacy semantics: d2i first (NaN → 0,
    truncate toward zero, saturate at the INT32 bounds — JLS d2i), then
    the narrowing low-bits truncation i2s/i2b for the short/byte widths
    (so legacy ``(byte) 300.7`` is 44, and ``(byte) 3e9`` is the low byte
    of the saturated Int.MaxValue)."""
    lo, hi, np_t = _INT_FINISH[out_char]
    if ansi:
        # Spark's ANSI range check: floor(v) ≤ hi && ceil(v) ≥ lo
        # (so 127.4 still casts to tinyint — truncation lands in range)
        bad = ~np.isfinite(v) | (np.floor(v) > hi) | (np.ceil(v) < lo)
        if bad.any():
            raise ArithmeticError(
                "[CAST_OVERFLOW] computed value"
                f" {v[bad][0]!r} cannot be cast to {np_t.__name__}"
                " (ANSI mode) — same rows fail the general sink"
            )
        return np.trunc(v).astype(np.int64).astype(np_t)
    v = np.where(np.isnan(v), 0.0, v)
    v = np.clip(np.trunc(v), _I32_MIN, _I32_MAX)
    return v.astype(np.int64).astype(np.int32).astype(np_t)


def _long_finish(l: np.ndarray, ansi: bool, out_char: str) -> np.ndarray:
    """Integer cast finisher for a LONG-typed root (the floor/ceil voxel
    shape): the root cast is bigint→int/smallint/tinyint, whose JVM
    semantics differ from the double path — ANSI range-checks the exact
    long value; legacy is l2i/l2s/l2b LOW-BITS truncation (numpy's
    int64→intN astype), NOT the d2i saturation ``_int_finish`` replays."""
    lo, hi, np_t = _INT_FINISH[out_char]
    if ansi:
        bad = (l > int(hi)) | (l < int(lo))
        if bad.any():
            raise ArithmeticError(
                "[CAST_OVERFLOW] computed value"
                f" {int(l[bad][0])} cannot be cast to {np_t.__name__}"
                " (ANSI mode) — same rows fail the general sink"
            )
    return l.astype(np_t)


def eval_program(prog, cols, ansi: bool) -> np.ndarray:
    """Replay an extracted int32-rooted program over the source records
    (``cols`` as in ``_replay_f64``); returns the int32 values the general
    sink would write for the same records (see ``_int_finish``)."""
    return _int_finish(_replay_f64(prog, cols), ansi, "i4")


def eval_program_typed(
    prog, cols, out_char: str, ansi: bool = False
) -> np.ndarray:
    """Replay by output storage (``extract_program_any``'s out_char):
    ``'i4'`` delegates to ``eval_program`` (ANSI/legacy d2i), ``'f4'``
    casts the double result with numpy ``astype`` (IEEE round-to-nearest
    — identical to the JVM's d2f, including overflow → ±Infinity and NaN
    passthrough), ``'f8'`` is the raw double result.  A long-typed root
    (the floor/ceil "d2l" shape) finishes with the LONG cast semantics
    (``_long_finish``)."""
    if out_char in _INT_FINISH:
        v = _replay_raw(prog, cols)
        if v.dtype == np.int64:
            return _long_finish(v, ansi, out_char)
        return _int_finish(np.asarray(v, dtype=np.float64), ansi, out_char)
    v = _replay_f64(prog, cols)
    if out_char == "f4":
        return v.astype("<f4")
    if out_char != "f8":  # pragma: no cover - extraction emits a closed set
        raise ValueError(f"unknown out_char {out_char!r}")
    return v.astype("<f8")
