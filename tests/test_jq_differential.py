"""Differential fuzz harness for the jq engine (functions/jq.py).

Seeded random programs from the crisp core of the supported subset —
paths over nullable/non-null columns, integer/double arithmetic,
comparisons under jq's TOTAL null order, jq truthiness for
``and``/``or``/``//``/``if``/``select`` — are generated PAIRED with a
driver-side Python reference evaluator (each generator node emits the
jq source and the row->value closure together), and the compiled
Column results must match the reference on every row of a randomized
frame. This exercises deep *compositions* the hand-pinned cases in
test_jq.py cannot enumerate: null propagation through arithmetic into
the isNull/isNotNull comparison algebra, truthiness of non-boolean
operands, CASE-chain branches feeding further operators.

Scope is deliberately the semantics the module PINS (docstring +
test_jq.py): arithmetic keeps Spark null propagation (real jq's
null-identity ``+`` / error ``-`` are out of subset), every binary
expression is fully parenthesized (operator precedence stays
hand-pinned in test_jq.py), division/modulo are excluded (ANSI
division-by-zero is not part of the pinned surface). Fixed seeds —
fully deterministic, no flake surface.
"""

from __future__ import annotations

import random

import pytest

from replicator_spark.functions.jq import jq_transform

N_ROWS = 48
N_EXPRS = 40
DEPTH = 3


@pytest.fixture(scope="module")
def frame(spark):
    rng = random.Random(20260818)
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
                None
                if rng.random() < 0.2
                else [rng.randrange(-5, 6) for _ in range(rng.randrange(5))],
            )
        )
    return spark.createDataFrame(
        rows,
        "id long, a long, b long, c long, d double, e double, "
        "s string, t string, f boolean, g boolean, xs array<long>",
    ).cache()


# -- reference semantics (mirrors the module's pinned algebra) ---------------


def _truthy(v):
    # jq truthiness: null and false are falsy, everything else truthy
    return v is not None and v is not False


def _cmp(op, l, r):
    # jq's TOTAL order: null == null, null sorts below every value
    if op in ("==", "!="):
        eq = (l is None and r is None) or (
            l is not None and r is not None and l == r
        )
        return eq if op == "==" else not eq
    if op == "<":
        return (l is None and r is not None) or (
            l is not None and r is not None and l < r
        )
    if op == "<=":
        return l is None or (r is not None and l <= r)
    if op == ">":
        return (r is None and l is not None) or (
            l is not None and r is not None and l > r
        )
    # ">="
    return r is None or (l is not None and l >= r)


def _arith(op, l, r):
    # Spark null propagation (the module's documented divergence from jq)
    if l is None or r is None:
        return None
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    return l * r


# -- paired generator: every node returns (jq_src, row -> value) -------------


class Gen:
    def __init__(self, rng: random.Random):
        self.rng = rng

    # numeric expressions (int/double, possibly null)
    def num(self, depth: int):
        r = self.rng
        if depth <= 0 or r.random() < 0.35:
            pick = r.randrange(7)
            if pick == 0:
                return ".a", lambda row: row["a"]
            if pick == 1:
                return ".b", lambda row: row["b"]
            if pick == 2:
                return ".c", lambda row: row["c"]
            if pick == 3:
                return ".d", lambda row: row["d"]
            if pick == 4:
                return ".e", lambda row: row["e"]
            if pick == 5:
                k = r.randrange(0, 7)
                return str(k), lambda row, k=k: k
            q = r.randrange(0, 17) * 0.25
            return repr(q), lambda row, q=q: q
        roll = r.random()
        if roll < 0.12:
            cs, cf = self.boolean(depth - 1)
            ts, tf = self.num(depth - 1)
            es, ef = self.num(depth - 1)
            return (
                f"(if {cs} then {ts} else {es} end)",
                lambda row, cf=cf, tf=tf, ef=ef: tf(row)
                if _truthy(cf(row))
                else ef(row),
            )
        if roll < 0.24:
            # alternative with a same-kind fallback; numeric truthiness
            # is isNotNull (0 is truthy in jq)
            ls, lf = self.num(depth - 1)
            k = r.randrange(0, 7)
            return (
                f"({ls} // {k})",
                lambda row, lf=lf, k=k: lf(row) if _truthy(lf(row)) else k,
            )
        op = r.choice(["+", "-", "*"])
        ls, lf = self.num(depth - 1)
        rs, rf = self.num(depth - 1)
        return (
            f"({ls} {op} {rs})",
            lambda row, lf=lf, rf=rf, op=op: _arith(op, lf(row), rf(row)),
        )

    # string expressions (possibly null)
    def string(self, depth: int):
        r = self.rng
        if depth <= 0 or r.random() < 0.4:
            pick = r.randrange(4)
            if pick == 0:
                return ".s", lambda row: row["s"]
            if pick == 1:
                return ".t", lambda row: row["t"]
            lit = r.choice(["", "a", "ab", "b", "q"])
            return f'"{lit}"', lambda row, lit=lit: lit
        roll = r.random()
        if roll < 0.3:
            cs, cf = self.boolean(depth - 1)
            ts, tf = self.string(depth - 1)
            es, ef = self.string(depth - 1)
            return (
                f"(if {cs} then {ts} else {es} end)",
                lambda row, cf=cf, tf=tf, ef=ef: tf(row)
                if _truthy(cf(row))
                else ef(row),
            )
        if roll < 0.6:
            lit = r.choice(["z", "q", ""])
            return (
                f'(.s // "{lit}")',
                lambda row, lit=lit: row["s"] if _truthy(row["s"]) else lit,
            )
        # concat only over non-null operands (null-concat is unpinned)
        lit = r.choice(["x", "y", ""])
        return (
            f'(.t + "{lit}")',
            lambda row, lit=lit: row["t"] + lit,
        )

    # boolean expressions (raw bool atoms may be null; composed forms
    # through the comparison/truthiness algebra are never null)
    def boolean(self, depth: int):
        r = self.rng
        if depth <= 0 or r.random() < 0.25:
            pick = r.randrange(4)
            if pick == 0:
                return ".f", lambda row: row["f"]
            if pick == 1:
                return ".g", lambda row: row["g"]
            b = r.choice([True, False])
            return ("true" if b else "false"), lambda row, b=b: b
        roll = r.random()
        if roll < 0.22:
            op = r.choice(["and", "or"])
            ls, lf = self._truthy_operand(depth - 1)
            rs, rf = self._truthy_operand(depth - 1)

            def fn(row, lf=lf, rf=rf, op=op):
                lv, rv = _truthy(lf(row)), _truthy(rf(row))
                return (lv and rv) if op == "and" else (lv or rv)

            return f"({ls} {op} {rs})", fn
        if roll < 0.32:
            # null-literal comparand compiles to Is[Not]Null
            ps, pf = r.choice(
                [
                    (".a", lambda row: row["a"]),
                    (".s", lambda row: row["s"]),
                    (".f", lambda row: row["f"]),
                    (".e", lambda row: row["e"]),
                ]
            )
            op = r.choice(["==", "!="])
            return (
                f"({ps} {op} null)",
                lambda row, pf=pf, op=op: _cmp(op, pf(row), None),
            )
        if roll < 0.45:
            op = r.choice(["==", "!="])
            ls, lf = self.boolean(depth - 1)
            rs, rf = self.boolean(depth - 1)
            return (
                f"({ls} {op} {rs})",
                lambda row, lf=lf, rf=rf, op=op: _cmp(op, lf(row), rf(row)),
            )
        op = r.choice(["==", "!=", "<", "<=", ">", ">="])
        if r.random() < 0.5:
            ls, lf = self.num(depth - 1)
            rs, rf = self.num(depth - 1)
        else:
            ls, lf = self.string(depth - 1)
            rs, rf = self.string(depth - 1)
        return (
            f"({ls} {op} {rs})",
            lambda row, lf=lf, rf=rf, op=op: _cmp(op, lf(row), rf(row)),
        )

    def _truthy_operand(self, depth: int):
        # and/or accept ANY value in jq; mix raw paths with booleans
        r = self.rng
        if r.random() < 0.3:
            return r.choice(
                [
                    (".a", lambda row: row["a"]),
                    (".c", lambda row: row["c"]),
                    (".s", lambda row: row["s"]),
                    (".f", lambda row: row["f"]),
                ]
            )
        return self.boolean(depth)

    # element-level numeric expression for map()/any(f)/all(f) bodies:
    # '.' is the (non-null long) array element
    def elem_num(self, depth: int):
        r = self.rng
        if depth <= 0 or r.random() < 0.5:
            if r.randrange(2) == 0:
                return ".", lambda x: x
            k = r.randrange(0, 5)
            return str(k), lambda x, k=k: k
        op = r.choice(["+", "-", "*"])
        ls, lf = self.elem_num(depth - 1)
        rs, rf = self.elem_num(depth - 1)

        def fn(x, lf=lf, rf=rf, op=op):
            lv, rv = lf(x), rf(x)
            return lv + rv if op == "+" else (lv - rv if op == "-" else lv * rv)

        return f"({ls} {op} {rs})", fn

    def elem_pred(self):
        r = self.rng
        op = r.choice(["==", "!=", "<", "<=", ">", ">="])
        ls, lf = self.elem_num(1)
        rs, rf = self.elem_num(1)
        return (
            f"({ls} {op} {rs})",
            lambda x, lf=lf, rf=rf, op=op: _cmp(op, lf(x), rf(x)),
        )

    # array-valued expressions over the (nullable) xs column; Spark's
    # HOFs null-propagate a null array, which the reference mirrors
    def arr(self, depth: int):
        r = self.rng
        roll = r.random()
        if depth <= 0 or roll < 0.3:
            return ".xs", lambda row: row["xs"]
        if roll < 0.55:
            bs, bf = self.elem_num(depth - 1)
            ss, sf = self.arr(depth - 1)
            return (
                f"({ss} | map({bs}))",
                lambda row, sf=sf, bf=bf: None
                if sf(row) is None
                else [bf(x) for x in sf(row)],
            )
        name, pyfn = r.choice(
            [
                ("sort", sorted),
                ("reverse", lambda v: list(reversed(v))),
                ("unique", lambda v: sorted(set(v))),
            ]
        )
        ss, sf = self.arr(depth - 1)
        return (
            f"({ss} | {name})",
            lambda row, sf=sf, pyfn=pyfn: None
            if sf(row) is None
            else pyfn(sf(row)),
        )

    def arr_num(self, depth: int):
        # numeric/array-reducing builtins applied to an array expression
        r = self.rng
        ss, sf = self.arr(depth)
        pick = r.randrange(5)
        if pick == 0:
            # add: aggregate from 0.0 ([] sums to 0.0 — documented)
            def fn(row, sf=sf):
                v = sf(row)
                if v is None:
                    return None
                acc = 0.0
                for x in v:
                    acc += float(x)
                return acc

            return f"({ss} | add)", fn
        if pick == 1:
            return (
                f"({ss} | min)",
                lambda row, sf=sf: min(sf(row)) if sf(row) else None,
            )
        if pick == 2:
            return (
                f"({ss} | max)",
                lambda row, sf=sf: max(sf(row)) if sf(row) else None,
            )
        if pick == 3:
            return (
                f"({ss} | length)",
                lambda row, sf=sf: None if sf(row) is None else len(sf(row)),
            )
        which = r.choice(["first", "last"])
        idx = 0 if which == "first" else -1
        return (
            f"({ss} | {which})",
            lambda row, sf=sf, idx=idx: sf(row)[idx] if sf(row) else None,
        )

    def arr_bool(self, depth: int):
        # any(f) / all(f): jq truthiness per element; Spark exists/forall
        # null-propagate a null array (truthiness downstream treats it
        # as falsy, same as the reference's None)
        r = self.rng
        ss, sf = self.arr(depth)
        ps, pf = self.elem_pred()
        name = r.choice(["any", "all"])
        agg = any if name == "any" else all
        return (
            f"({ss} | {name}({ps}))",
            lambda row, sf=sf, pf=pf, agg=agg: None
            if sf(row) is None
            else agg(pf(x) for x in sf(row)),
        )

    def any_expr(self, depth: int):
        kind = self.rng.randrange(6)
        if kind == 0:
            return self.num(depth)
        if kind == 1:
            return self.string(depth)
        if kind == 2:
            return self.arr(min(depth, 2))
        if kind == 3:
            return self.arr_num(min(depth, 2))
        if kind == 4:
            return self.arr_bool(min(depth, 2))
        return self.boolean(depth)


def _match(expect, got):
    if expect is None or got is None:
        return expect is None and got is None
    if isinstance(expect, list) or isinstance(got, list):
        return (
            isinstance(expect, list)
            and isinstance(got, list)
            and len(expect) == len(got)
            and all(_match(e, g) for e, g in zip(expect, got))
        )
    if isinstance(expect, bool) or isinstance(got, bool):
        return expect == got
    if isinstance(expect, (int, float)) and isinstance(got, (int, float)):
        # exact: all doubles live on a 2^-k grid, sums/products stay exact
        return float(expect) == float(got)
    return expect == got


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505])
def test_projection_differential(frame, seed):
    gen = Gen(random.Random(seed))
    exprs = [gen.any_expr(DEPTH) for _ in range(N_EXPRS)]
    program = (
        "{id: .id, "
        + ", ".join(f"v{i}: {src}" for i, (src, _) in enumerate(exprs))
        + "}"
    )
    out = jq_transform(frame, program).orderBy("id").collect()
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


@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55, 66, 77, 88])
def test_select_differential(frame, seed):
    gen = Gen(random.Random(seed))
    src, fn = gen.boolean(DEPTH)
    program = f"select({src}) | {{id: .id}}"
    got = sorted(r["id"] for r in jq_transform(frame, program).collect())
    data = [r.asDict() for r in frame.orderBy("id").collect()]
    expect = sorted(row["id"] for row in data if _truthy(fn(row)))
    assert got == expect, f"seed={seed} predicate {src!r}"


def test_select_raw_truthiness(frame):
    # non-boolean select arg stays RAW-truthy: null excluded, 0 kept
    data = [r.asDict() for r in frame.orderBy("id").collect()]
    got = sorted(
        r["id"] for r in jq_transform(frame, "select(.a) | {id: .id}").collect()
    )
    assert got == sorted(row["id"] for row in data if row["a"] is not None)
    # boolean select arg: null flips to false (coalesce), only true kept
    got_f = sorted(
        r["id"] for r in jq_transform(frame, "select(.f) | {id: .id}").collect()
    )
    assert got_f == sorted(row["id"] for row in data if row["f"] is True)
