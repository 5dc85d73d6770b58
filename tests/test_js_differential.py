"""Differential fuzz harness for the JavaScript engine (functions/js.py).

Same method as test_jq_differential.py, over JS's pinned coercion
algebra: seeded random expressions are generated PAIRED with a
driver-side Python reference evaluator implementing the module's
documented semantics — Number() coercion (null → 0, '' handled at the
builtin level), JS truthiness (false, 0, '' and null falsy), VALUE
semantics for ``&&``/``||`` (they yield an operand, not a boolean),
``??`` as coalesce, strict ``===`` as null-safe equality, relational
operators via the numeric-coercion path (or lexicographic when both
sides are statically strings, null → false), ``%`` as TRUNCATED
remainder (sign follows the dividend), ``+`` string concatenation with
String() coercion (null → 'null', integral doubles without '.0').

The compiled Columns must match the reference on every row. Scope
notes: operands of ``&&``/``||``/``===`` stay within one static type
category (mixed categories are compile errors by design), method calls
on nullable bases are excluded (TypeError guards are pinned in
test_script_engines.py), divisors are non-zero literals. Fixed seeds —
deterministic, no flake surface.
"""

from __future__ import annotations

import math
import random

import pytest

from replicator_spark.functions.js import compile_predicate, js_transform

N_ROWS = 48
N_EXPRS = 36
DEPTH = 3


@pytest.fixture(scope="module")
def frame(spark):
    rng = random.Random(20260819)
    rows = []
    for i in range(N_ROWS):
        rows.append(
            (
                i,
                rng.choice([None, None, None] + list(range(-5, 6))),  # a: long?
                rng.randrange(-5, 6),  # b: long
                rng.choice([None] * 5 + [0, 1, 2, 3]),  # c: long?
                rng.randrange(-16, 17) * 0.25,  # d: double (exact grid)
                rng.choice([None, None] + [x * 0.5 for x in range(-6, 7)]),  # e?
                rng.choice([None, "", "ab", "ba", "zz", "a", "b"]),  # s: string?
                rng.choice(["", "a", "ab", "b", "ca"]),  # t: string
                rng.choice([None, True, False]),  # f: boolean?
                rng.choice([True, False]),  # g: boolean
            )
        )
    return spark.createDataFrame(
        rows,
        "id long, a long, b long, c long, d double, e double, "
        "s string, t string, f boolean, g boolean",
    ).cache()


# -- reference semantics (mirrors the module's pinned coercions) --------------


def _truthy(v):
    # JS: false, 0, '' and null/undefined are falsy
    if v is None or v is False:
        return False
    if v is True:
        return True
    if isinstance(v, (int, float)):
        return v != 0
    if isinstance(v, str):
        return v != ""
    return True


def _num(v):
    # Number(): null -> 0 (booleans/strings kept out of numeric ops here)
    return 0 if v is None else v


def _jsstr(v):
    # String(): null -> 'null'; integral doubles render without '.0'
    if v is None:
        return "null"
    if isinstance(v, float):
        return str(int(v)) if v.is_integer() else repr(v)
    if isinstance(v, int):
        return str(v)
    return v


def _strict_eq(l, r):
    # === within one static type category: null-safe equality
    return (l is None and r is None) or (
        l is not None and r is not None and l == r
    )


def _trunc_mod(l, r):
    # JS % — truncated remainder, sign follows the dividend
    m = math.fmod(float(l), float(r))
    return m


# -- paired generator ---------------------------------------------------------


class Gen:
    def __init__(self, rng: random.Random):
        self.rng = rng

    def num(self, depth: int):
        r = self.rng
        if depth <= 0 or r.random() < 0.35:
            pick = r.randrange(9)
            if pick == 0:
                return "row.a", lambda row: row["a"]
            if pick == 1:
                return "row.b", lambda row: row["b"]
            if pick == 2:
                return "row.c", lambda row: row["c"]
            if pick == 3:
                return "row.d", lambda row: row["d"]
            if pick == 4:
                return "row.e", lambda row: row["e"]
            if pick == 5:
                k = r.randrange(0, 7)
                return str(k), lambda row, k=k: k
            if pick == 6:
                # .length on a non-null base; int, never null
                return "row.t.length", lambda row: len(row["t"])
            if pick == 7:
                # ?. propagates null exactly like JS
                return (
                    "row.s?.length",
                    lambda row: None if row["s"] is None else len(row["s"]),
                )
            q = r.randrange(0, 17) * 0.25
            return repr(q), lambda row, q=q: q
        roll = r.random()
        if roll < 0.1:
            cs, cf = self.boolean(depth - 1)
            ts, tf = self.num(depth - 1)
            es, ef = self.num(depth - 1)
            return (
                f"({cs} ? {ts} : {es})",
                lambda row, cf=cf, tf=tf, ef=ef: tf(row)
                if _truthy(cf(row))
                else ef(row),
            )
        if roll < 0.2:
            ls, lf = self.num(depth - 1)
            k = r.randrange(0, 7)
            return (
                f"({ls} ?? {k})",
                lambda row, lf=lf, k=k: lf(row) if lf(row) is not None else k,
            )
        if roll < 0.34:
            # VALUE semantics of &&/|| over numbers (0 is falsy in JS)
            op = r.choice(["&&", "||"])
            ls, lf = self.num(depth - 1)
            rs, rf = self.num(depth - 1)

            def fn(row, lf=lf, rf=rf, op=op):
                lv = lf(row)
                if op == "&&":
                    return rf(row) if _truthy(lv) else lv
                return lv if _truthy(lv) else rf(row)

            return f"({ls} {op} {rs})", fn
        if roll < 0.46:
            # % and / with a non-zero literal divisor
            ls, lf = self.num(depth - 1)
            k = r.randrange(2, 8)
            if r.random() < 0.5:
                return (
                    f"({ls} % {k})",
                    lambda row, lf=lf, k=k: _trunc_mod(_num(lf(row)), k),
                )
            return (
                f"({ls} / {k})",
                lambda row, lf=lf, k=k: float(_num(lf(row))) / k,
            )
        op = r.choice(["+", "-", "*"])
        ls, lf = self.num(depth - 1)
        rs, rf = self.num(depth - 1)

        def fn(row, lf=lf, rf=rf, op=op):
            lv, rv = _num(lf(row)), _num(rf(row))
            if op == "+":
                return lv + rv
            if op == "-":
                return lv - rv
            return lv * rv

        return f"({ls} {op} {rs})", fn

    def string(self, depth: int):
        r = self.rng
        if depth <= 0 or r.random() < 0.4:
            pick = r.randrange(8)
            if pick == 0:
                return "row.s", lambda row: row["s"]
            if pick == 1:
                return "row.t", lambda row: row["t"]
            if pick == 2:
                return "row.t.toUpperCase()", lambda row: row["t"].upper()
            if pick == 3:
                # slice: 0-based end-exclusive, clamped — Python's rules
                return "row.t.slice(0, 2)", lambda row: row["t"][0:2]
            if pick == 4:
                # charAt past the end is '' in JS — the [i:i+1] form
                return "row.t.charAt(0)", lambda row: row["t"][0:1]
            if pick == 5 and depth > 0:
                # template literal: String() coercion on the splice
                ks, kf = self.num(depth - 1)
                return (
                    f"`x${{{ks}}}y`",
                    lambda row, kf=kf: "x" + _jsstr(kf(row)) + "y",
                )
            lit = r.choice(["", "a", "ab", "b", "q"])
            return f"'{lit}'", lambda row, lit=lit: lit
        roll = r.random()
        if roll < 0.22:
            cs, cf = self.boolean(depth - 1)
            ts, tf = self.string(depth - 1)
            es, ef = self.string(depth - 1)
            return (
                f"({cs} ? {ts} : {es})",
                lambda row, cf=cf, tf=tf, ef=ef: tf(row)
                if _truthy(cf(row))
                else ef(row),
            )
        if roll < 0.42:
            ls, lf = self.string(depth - 1)
            lit = r.choice(["z", "q", ""])
            return (
                f"({ls} ?? '{lit}')",
                lambda row, lf=lf, lit=lit: lf(row)
                if lf(row) is not None
                else lit,
            )
        if roll < 0.6:
            # VALUE semantics of || over strings ('' is falsy)
            ls, lf = self.string(depth - 1)
            rs, rf = self.string(depth - 1)
            return (
                f"({ls} || {rs})",
                lambda row, lf=lf, rf=rf: lf(row)
                if _truthy(lf(row))
                else rf(row),
            )
        # + concat: either side string -> String() coercion of the other
        # (numbers allowed; booleans excluded — String(true) is pinned
        # elsewhere and Python's str(True) differs)
        ls, lf = self.string(depth - 1)
        if r.random() < 0.4:
            rs, rf = self.num(depth - 1)
        else:
            rs, rf = self.string(depth - 1)
        return (
            f"({ls} + {rs})",
            lambda row, lf=lf, rf=rf: _jsstr(lf(row)) + _jsstr(rf(row)),
        )

    def boolean(self, depth: int):
        r = self.rng
        if depth <= 0 or r.random() < 0.25:
            pick = r.randrange(6)
            if pick == 0:
                return "row.f", lambda row: row["f"]
            if pick == 1:
                return "row.g", lambda row: row["g"]
            if pick == 2:
                return (
                    "row.t.startsWith('a')",
                    lambda row: row["t"].startswith("a"),
                )
            if pick == 3:
                return "row.t.includes('b')", lambda row: "b" in row["t"]
            b = r.choice([True, False])
            return ("true" if b else "false"), lambda row, b=b: b
        roll = r.random()
        if roll < 0.18:
            # ! applies JS truthiness to any kind
            ks, kf = self.any_expr(depth - 1)
            return f"(!{ks})", lambda row, kf=kf: not _truthy(kf(row))
        if roll < 0.38:
            # VALUE semantics of &&/|| over (possibly null) booleans
            op = r.choice(["&&", "||"])
            ls, lf = self.boolean(depth - 1)
            rs, rf = self.boolean(depth - 1)

            def fn(row, lf=lf, rf=rf, op=op):
                lv = lf(row)
                if op == "&&":
                    return rf(row) if _truthy(lv) else lv
                return lv if _truthy(lv) else rf(row)

            return f"({ls} {op} {rs})", fn
        if roll < 0.58:
            op = r.choice(["===", "!=="])
            kind = r.randrange(3)
            if kind == 0:
                ls, lf = self.num(depth - 1)
                rs, rf = self.num(depth - 1)
            elif kind == 1:
                ls, lf = self.string(depth - 1)
                rs, rf = self.string(depth - 1)
            else:
                ls, lf = self.boolean(depth - 1)
                rs, rf = self.boolean(depth - 1)

            def fn(row, lf=lf, rf=rf, op=op):
                eq = _strict_eq(lf(row), rf(row))
                return eq if op == "===" else not eq

            return f"({ls} {op} {rs})", fn
        op = r.choice(["<", "<=", ">", ">="])
        import operator as _pyop

        pyop = {"<": _pyop.lt, "<=": _pyop.le, ">": _pyop.gt, ">=": _pyop.ge}[op]
        if r.random() < 0.6:
            ls, lf = self.num(depth - 1)
            rs, rf = self.num(depth - 1)

            def fn(row, lf=lf, rf=rf, pyop=pyop):
                return pyop(float(_num(lf(row))), float(_num(rf(row))))

            return f"({ls} {op} {rs})", fn
        ls, lf = self.string(depth - 1)
        rs, rf = self.string(depth - 1)

        def fn(row, lf=lf, rf=rf, pyop=pyop):
            lv, rv = lf(row), rf(row)
            if lv is None or rv is None:
                return False  # JS: Number(null-vs-string) path -> NaN -> false
            return pyop(lv, rv)

        return f"({ls} {op} {rs})", fn

    def any_expr(self, depth: int):
        kind = self.rng.randrange(3)
        if kind == 0:
            return self.num(depth)
        if kind == 1:
            return self.string(depth)
        return self.boolean(depth)


def _match(expect, got):
    if expect is None or got is None:
        return expect is None and got is None
    if isinstance(expect, bool) or isinstance(got, bool):
        return expect == got
    if isinstance(expect, (int, float)) and isinstance(got, (int, float)):
        return float(expect) == float(got)
    return expect == got


@pytest.mark.parametrize("seed", [111, 222, 333, 444, 555])
def test_projection_differential(frame, seed):
    gen = Gen(random.Random(seed))
    exprs = [gen.any_expr(DEPTH) for _ in range(N_EXPRS)]
    program = (
        "return { id: row.id, "
        + ", ".join(f"v{i}: {src}" for i, (src, _) in enumerate(exprs))
        + " }"
    )
    out = js_transform(frame, program).orderBy("id").collect()
    data = [r.asDict() for r in frame.orderBy("id").collect()]
    assert len(out) == len(data)
    for row, got in zip(data, out):
        for i, (src, fn) in enumerate(exprs):
            expect = fn(row)
            actual = got[f"v{i}"]
            assert _match(expect, actual), (
                f"seed={seed} expr v{i} {src!r} on row id={row['id']}: "
                f"reference={expect!r} compiled={actual!r}"
            )


@pytest.mark.parametrize("seed", [13, 26, 39, 52, 65, 78])
def test_predicate_differential(frame, seed):
    gen = Gen(random.Random(seed))
    src, fn = gen.boolean(DEPTH)
    got = sorted(
        r["id"]
        for r in frame.where(compile_predicate(src, frame.schema)).collect()
    )
    data = [r.asDict() for r in frame.orderBy("id").collect()]
    # predicate entry point applies JS truthiness to the result value
    expect = sorted(row["id"] for row in data if _truthy(fn(row)))
    assert got == expect, f"seed={seed} predicate {src!r}"
