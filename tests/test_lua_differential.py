"""Differential fuzz harness for the Lua engine (functions/lua.py).

Same method as test_jq_differential.py / test_js_differential.py, over
Lua 5.4's pinned semantics: seeded random expressions are generated
PAIRED with a driver-side Python reference evaluator — VALUE semantics
for ``and``/``or`` with only nil/false falsy (0 and '' are TRUTHY,
unlike JS), nil-safe ``==``/``~=`` within one type category, FLOORED
``%`` and ``//`` (sign follows the divisor; Python's own %// match
Lua here), float ``/`` and ``^``, ``..`` concatenation with tostring
coercion of numbers (floats keep their '.0').

Nil arithmetic/order/concat are Lua RUNTIME errors compiled to
raise_error guards (pinned in test_script_engines.py), so this
generator feeds those operators only statically non-null operands;
nullable columns flow through ``==``/``~=``, ``and``/``or`` and
ternary-style ``cond and x or y`` shapes, where nil is a value. Fixed
seeds — deterministic, no flake surface.
"""

from __future__ import annotations

import math
import random

import pytest

from replicator_spark.functions.lua import lua_transform

N_ROWS = 48
N_EXPRS = 36
DEPTH = 3


@pytest.fixture(scope="module")
def frame(spark):
    rng = random.Random(20260820)
    rows = []
    for i in range(N_ROWS):
        rows.append(
            (
                i,
                rng.choice([None, None, None] + list(range(-5, 6))),  # a: long?
                rng.randrange(-5, 6),  # b: long
                rng.randrange(-16, 17) * 0.25,  # d: double (exact grid)
                rng.choice([None, "", "ab", "ba", "zz", "a", "b"]),  # s: string?
                rng.choice(["", "a", "ab", "b", "ca"]),  # t: string
                rng.choice([None, True, False]),  # f: boolean?
                rng.choice([True, False]),  # g: boolean
            )
        )
    return spark.createDataFrame(
        rows,
        "id long, a long, b long, d double, s string, t string, "
        "f boolean, g boolean",
    ).cache()


# -- reference semantics (mirrors the module's pinned rules) -------------------


def _truthy(v):
    # Lua: only nil and false are falsy (0 and '' are truthy)
    return v is not None and v is not False


def _eq(l, r):
    # nil-safe equality within one type category
    return (l is None and r is None) or (
        l is not None and r is not None and l == r
    )


def _luastr(v):
    # tostring coercion in ``..``: floats keep '.0' (Lua %.14g), ints bare
    if isinstance(v, float):
        return repr(v) if not v.is_integer() else f"{int(v)}.0"
    if isinstance(v, int):
        return str(v)
    return v


# -- paired generator: non-null numeric/string lanes feed the guarded
#    operators; nullable atoms only flow through ==/and/or ------------------


class Gen:
    def __init__(self, rng: random.Random):
        self.rng = rng

    # statically non-null numeric expressions (safe for arithmetic/order).
    # Returns (src, fn, isfloat): fn yields a Python value whose TYPE
    # mirrors the engine's static column type (long -> int, double ->
    # float) — the typed-column unification is observable through
    # tostring/.. rendering, so the reference must model it.
    def num_t(self, depth: int):
        r = self.rng
        if depth <= 0 or r.random() < 0.4:
            pick = r.randrange(4)
            if pick == 0:
                return "row.b", lambda row: row["b"], False
            if pick == 1:
                return "row.d", lambda row: row["d"], True
            if pick == 2:
                k = r.randrange(0, 7)
                return str(k), (lambda row, k=k: k), False
            q = r.randrange(0, 17) * 0.25
            return repr(q), (lambda row, q=q: q), True
        roll = r.random()
        if roll < 0.15:
            # cond and x or y — the Lua ternary idiom; the engine accepts
            # it only when x is STATICALLY never falsy (a literal — plain
            # columns are schema-nullable so they don't qualify). The
            # CASE result takes the unified column type: an int literal
            # widens to double when the else-branch is double.
            cs, cf = self.boolean(depth - 1)
            k = r.randrange(1, 7)
            es, ef, eisf = self.num_t(depth - 1)

            def fn(row, cf=cf, k=k, ef=ef, eisf=eisf):
                v = k if _truthy(cf(row)) else ef(row)
                return float(v) if eisf else v

            return f"({cs} and {k} or {es})", fn, eisf
        if roll < 0.35:
            # floored % and // , float / and ^ — non-zero literal divisor
            ls, lf, isf = self.num_t(depth - 1)
            k = r.randrange(2, 8)
            w = r.random()
            if w < 0.3:
                # Python % is floored like Lua's; int%int stays long
                return (
                    f"({ls} % {k})",
                    (lambda row, lf=lf, k=k: lf(row) % k),
                    isf,
                )
            if w < 0.55:
                # Lua // floors; long for int operands, double otherwise
                return (
                    f"({ls} // {k})",
                    (lambda row, lf=lf, k=k: lf(row) // k),
                    isf,
                )
            if w < 0.8:
                return (
                    f"({ls} / {k})",
                    (lambda row, lf=lf, k=k: float(lf(row)) / k),
                    True,
                )
            e = r.choice([2, 3])
            return (
                f"({ls} ^ {e})",
                (lambda row, lf=lf, e=e: float(lf(row)) ** e),
                True,
            )
        op = r.choice(["+", "-", "*"])
        ls, lf, lisf = self.num_t(depth - 1)
        rs, rf, risf = self.num_t(depth - 1)

        def fn(row, lf=lf, rf=rf, op=op):
            lv, rv = lf(row), rf(row)
            if op == "+":
                return lv + rv
            if op == "-":
                return lv - rv
            return lv * rv

        return f"({ls} {op} {rs})", fn, lisf or risf

    def num_nn(self, depth: int):
        src, fn, _ = self.num_t(depth)
        return src, fn

    # statically non-null strings (safe for .. and order comparisons)
    def str_nn(self, depth: int):
        r = self.rng
        if depth <= 0 or r.random() < 0.5:
            if r.randrange(2) == 0:
                return "row.t", lambda row: row["t"]
            lit = r.choice(["", "a", "ab", "b", "q"])
            return f"'{lit}'", lambda row, lit=lit: lit
        if r.random() < 0.4:
            # idiom with a literal then-branch (engine's never-falsy rule)
            cs, cf = self.boolean(depth - 1)
            lit = r.choice(["x", "yz", "q"])
            es, ef = self.str_nn(depth - 1)
            return (
                f"({cs} and '{lit}' or {es})",
                lambda row, cf=cf, lit=lit, ef=ef: lit
                if _truthy(cf(row))
                else ef(row),
            )
        # .. with tostring coercion of a numeric side
        ls, lf = self.str_nn(depth - 1)
        if r.random() < 0.4:
            rs, rf = self.num_nn(depth - 1)
            return (
                f"({ls} .. {rs})",
                lambda row, lf=lf, rf=rf: lf(row) + _luastr(rf(row)),
            )
        rs, rf = self.str_nn(depth - 1)
        return f"({ls} .. {rs})", lambda row, lf=lf, rf=rf: lf(row) + rf(row)

    # nullable atoms — legal operands for == / and / or only
    def nullable(self):
        r = self.rng
        return r.choice(
            [
                ("row.a", lambda row: row["a"], "num"),
                ("row.s", lambda row: row["s"], "str"),
                ("row.f", lambda row: row["f"], "bool"),
            ]
        )

    def boolean(self, depth: int):
        r = self.rng
        if depth <= 0 or r.random() < 0.25:
            pick = r.randrange(4)
            if pick == 0:
                return "row.g", lambda row: row["g"]
            if pick == 1:
                # not nil -> true: nullable is fine under `not`
                ns, nf, _ = self.nullable()
                return f"(not {ns})", lambda row, nf=nf: not _truthy(nf(row))
            b = r.choice([True, False])
            return ("true" if b else "false"), lambda row, b=b: b
        roll = r.random()
        if roll < 0.3:
            # == / ~= : nil-safe within one category; nullable atoms
            # compare against literals or themselves
            op = r.choice(["==", "~="])
            kind = r.randrange(3)
            if kind == 0:
                ns, nf, cat = self.nullable()
                lit = {
                    "num": ("2", lambda row: 2),
                    "str": ("'ab'", lambda row: "ab"),
                    "bool": ("true", lambda row: True),
                }[cat]
                ls, lf, (rs, rf) = ns, nf, lit
            elif kind == 1:
                ns, nf, _ = self.nullable()
                ls, lf, rs, rf = ns, nf, "nil", lambda row: None
            else:
                ls, lf = self.num_nn(depth - 1)
                rs, rf = self.num_nn(depth - 1)

            def fn(row, lf=lf, rf=rf, op=op):
                eq = _eq(lf(row), rf(row))
                return eq if op == "==" else not eq

            return f"({ls} {op} {rs})", fn
        if roll < 0.55:
            # and/or value semantics over booleans (nil-bearing .f only
            # behind `not` / `==` — a raw nil result is a value, fine,
            # but keep the boolean lane non-null for simplicity)
            op = r.choice(["and", "or"])
            ls, lf = self.boolean(depth - 1)
            rs, rf = self.boolean(depth - 1)

            def fn(row, lf=lf, rf=rf, op=op):
                lv = lf(row)
                if op == "and":
                    return rf(row) if _truthy(lv) else lv
                return lv if _truthy(lv) else rf(row)

            return f"({ls} {op} {rs})", fn
        op = r.choice(["<", "<=", ">", ">="])
        import operator as _pyop

        pyop = {"<": _pyop.lt, "<=": _pyop.le, ">": _pyop.gt, ">=": _pyop.ge}[op]
        if r.random() < 0.6:
            ls, lf = self.num_nn(depth - 1)
            rs, rf = self.num_nn(depth - 1)
        else:
            ls, lf = self.str_nn(depth - 1)
            rs, rf = self.str_nn(depth - 1)
        return (
            f"({ls} {op} {rs})",
            lambda row, lf=lf, rf=rf, pyop=pyop: pyop(lf(row), rf(row)),
        )

    def any_expr(self, depth: int):
        kind = self.rng.randrange(3)
        if kind == 0:
            return self.num_nn(depth)
        if kind == 1:
            return self.str_nn(depth)
        return self.boolean(depth)


def _match(expect, got):
    if expect is None or got is None:
        return expect is None and got is None
    if isinstance(expect, bool) or isinstance(got, bool):
        return expect == got
    if isinstance(expect, (int, float)) and isinstance(got, (int, float)):
        return float(expect) == float(got)
    return expect == got


@pytest.mark.parametrize("seed", [1001, 2002, 3003, 4004, 5005])
def test_projection_differential(frame, seed):
    gen = Gen(random.Random(seed))
    exprs = [gen.any_expr(DEPTH) for _ in range(N_EXPRS)]
    program = (
        "return { id = row.id, "
        + ", ".join(f"v{i} = {src}" for i, (src, _) in enumerate(exprs))
        + " }"
    )
    out = lua_transform(frame, program).orderBy("id").collect()
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
