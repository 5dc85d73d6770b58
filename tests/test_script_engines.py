"""Lua and JavaScript transform engines (functions/lua.py, functions/js.py):
the reference's declared-only engine types (pkg/transform/models.go:30,59)
compiled to Column expressions — semantics pinned per language, fail-loud
on nil/null where the real interpreters raise, compile errors on the
descoped surface."""

import pytest
from pyspark.sql import functions as F

from replicator_spark.functions.js import (
    JsError,
    compile_predicate,
    js_transform,
)
from replicator_spark.functions.js import parse as js_parse
from replicator_spark.functions.lua import LuaError, lua_transform
from replicator_spark.functions.lua import parse as lua_parse


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "alpha", 10.5, 3, True, None),
        (2, "Beta", -7.0, -2, False, "x"),
        (3, None, 0.0, 0, None, "y"),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, score double, n long, flag boolean, tag string"
    )


def _one(df, **filters):
    rows = df.collect()
    if filters:
        rows = [r for r in rows if all(r[k] == v for k, v in filters.items())]
    assert len(rows) >= 1
    return rows[0]


# -- Lua ---------------------------------------------------------------------


class TestLua:
    def test_projection_and_arith(self, df):
        out = lua_transform(df, """return {
            id = row.id,
            double_n = row.n * 2,
            ratio = row.score / 2,
            floordiv = row.n // 2,
            luamod = row.n % 3,
        }""")
        r = _one(out, id=2)
        assert r["double_n"] == -4 and isinstance(r["double_n"], int)
        assert r["ratio"] == -3.5
        # Lua floor division and FLOORED modulo (sign follows divisor)
        assert r["floordiv"] == -1  # -2 // 2
        assert r["luamod"] == 1     # -2 % 3 == 1 in Lua (SQL gives -2)

    def test_concat_coerces_numbers(self, df):
        # row 3 has a nil name — concat there is a Lua error by design,
        # so the program only runs over non-nil rows (pinned separately
        # in test_arith_on_nil_raises_at_runtime)
        out = lua_transform(
            df.where(F.col("name").isNotNull()),
            "return { id = row.id, s = row.name .. '#' .. row.id }",
        )
        assert _one(out, id=1)["s"] == "alpha#1"

    def test_value_semantics_and_or_idiom(self, df):
        out = lua_transform(df, """return {
            id = row.id,
            tier = row.score > 0 and 'pos' or 'nonpos',
            fallback = row.tag or 'none',
        }""")
        assert _one(out, id=1)["tier"] == "pos"
        assert _one(out, id=2)["tier"] == "nonpos"
        assert _one(out, id=1)["fallback"] == "none"  # nil tag -> fallback
        assert _one(out, id=2)["fallback"] == "x"

    def test_zero_and_empty_are_truthy(self, df):
        # Lua: only nil and false are falsy
        out = lua_transform(
            df, "return { id = row.id, t = row.n and 'truthy' or 'falsy' }"
        )
        assert _one(out, id=3)["t"] == "truthy"  # n == 0 is truthy in Lua

    def test_nil_safe_equality(self, df):
        out = lua_transform(df, """return {
            id = row.id,
            is_nil = row.tag == nil,
            ne = row.tag ~= 'x',
            cross_type = row.id == 'x',
        }""")
        r1, r2 = _one(out, id=1), _one(out, id=2)
        assert r1["is_nil"] is True and r2["is_nil"] is False
        assert r1["ne"] is True  # nil ~= 'x' is TRUE in Lua, not null
        assert r1["cross_type"] is False  # == never coerces across types

    def test_comparison_on_nil_raises_at_runtime(self, spark, df):
        out = lua_transform(df, "return { b = row.tag < 'z' }")
        with pytest.raises(Exception, match="lua: attempt to perform"):
            out.collect()

    def test_arith_on_nil_raises_at_runtime(self, df):
        out = lua_transform(df.where(F.col("tag").isNull()),
                            "return { s = row.tag .. '!' }")
        with pytest.raises(Exception, match="lua: attempt to perform"):
            out.collect()

    def test_statically_nil_is_compile_error(self, df):
        with pytest.raises(LuaError, match="nil value"):
            lua_transform(df, "return { x = row.missing + 1 }")

    def test_absent_field_reads_as_nil(self, df):
        out = lua_transform(df, "return { id = row.id, gone = row.missing }")
        assert _one(out, id=1)["gone"] is None

    def test_string_builtins(self, df):
        out = lua_transform(df.where(F.col("name").isNotNull()), """return {
            id = row.id,
            up = string.upper(row.name),
            n = string.len(row.name),
            sub = string.sub(row.name, 2, 3),
            last2 = string.sub(row.name, -2),
            rep = string.rep('ab', 2),
            rev = string.reverse(row.name),
            hash = #row.name,
        }""")
        r = _one(out, id=1)
        assert r["up"] == "ALPHA" and r["n"] == 5 and r["hash"] == 5
        assert r["sub"] == "lp" and r["last2"] == "ha"
        assert r["rep"] == "abab" and r["rev"] == "ahpla"

    def test_math_and_tostring_tonumber(self, df):
        out = lua_transform(df, """return {
            id = row.id,
            fl = math.floor(row.score),
            ce = math.ceil(row.score),
            ab = math.abs(row.n),
            mx = math.max(row.n, 0, row.id),
            ts = tostring(row.flag),
            tn = tonumber(row.name),
            tsn = tostring(row.tag),
            pw = row.id ^ 2,
        }""")
        r = _one(out, id=1)
        assert r["fl"] == 10 and r["ce"] == 11 and r["ab"] == 3
        assert r["mx"] == 3
        assert r["ts"] == "true"
        assert r["tn"] is None  # tonumber('alpha') -> nil, like Lua
        assert r["tsn"] == "nil"  # tostring(nil) -> 'nil'
        assert r["pw"] == 1.0 and isinstance(r["pw"], float)  # ^ is float

    def test_nested_table_and_array(self, df):
        out = lua_transform(df, """return {
            id = row.id,
            meta = { nm = row.name, sq = row.n * row.n },
            arr = { row.id, row.n },
        }""")
        r = _one(out, id=1)
        assert r["meta"]["nm"] == "alpha" and r["meta"]["sq"] == 9
        assert list(r["arr"]) == [1, 3]

    def test_descoped_constructs_raise(self, df):
        with pytest.raises(LuaError, match="patterns are not regex"):
            lua_transform(df, "return { s = string.gsub(row.name, 'a', 'b') }")
        with pytest.raises(LuaError, match="return"):
            lua_parse("local x = 1")
        with pytest.raises(LuaError, match="unknown variable"):
            lua_transform(df, "return { x = nothere }")
        with pytest.raises(LuaError, match="table constructor"):
            lua_transform(df, "return row.id")
        with pytest.raises(LuaError, match="cannot compare"):
            lua_transform(df, "return { b = row.id < row.name }")


# -- JavaScript ----------------------------------------------------------------


class TestJs:
    def test_projection_template_and_ternary(self, df):
        out = js_transform(df, """return {
            id: row.id,
            label: `${row.name}/${row.n}`,
            sign: row.score > 0 ? 'pos' : 'nonpos',
        };""")
        r = _one(out, id=1)
        assert r["label"] == "alpha/3"
        assert r["sign"] == "pos"
        assert _one(out, id=3)["sign"] == "nonpos"

    def test_js_string_renders_integral_doubles_bare(self, df):
        # String(10.5) === '10.5' but String(-7.0) === '-7' in JS
        out = js_transform(df, "({ id: row.id, s: String(row.score) })")
        assert _one(out, id=1)["s"] == "10.5"
        assert _one(out, id=2)["s"] == "-7"

    def test_null_coercion_in_arith_and_rel(self, df):
        out = js_transform(df, """return {
            id: row.id,
            plus: row.tag + '!',
            nullnum: row.flag === null ? row.n + 1 : 0,
            lt: row.tag < 'z',
        };""")
        r1 = _one(out, id=1)  # tag null, flag true
        r3 = _one(out, id=3)  # tag 'y', flag null
        assert r1["plus"] == "null!"      # String(null) + '!' — JS
        assert r3["nullnum"] == 1.0       # null treated as 0? no: n+1 with n=0
        assert r1["lt"] is False          # null < 'z' -> false (NaN path)
        assert r3["lt"] is True

    def test_rel_null_number_vs_literal(self, spark):
        """JS Number(null)=0 in comparisons — preserved bit-for-bit by
        the pushdown isNull/isNotNull algebra (a nullable numeric column
        vs a literal): null < 5 is true, null >= 30 is false."""
        d = spark.createDataFrame(
            [(1, None), (2, 40.0), (3, 10.0)], "id long, v double"
        )
        out = js_transform(
            d, "({ id: row.id, lo: row.v < 5, hi: row.v >= 30, neg: row.v > -1 })"
        )
        r1 = _one(out, id=1)
        assert r1["lo"] is True    # Number(null) = 0 < 5
        assert r1["hi"] is False   # 0 >= 30
        assert r1["neg"] is True   # 0 > -1 (unary-minus literal path)
        kept = d.where(compile_predicate("row.v >= 30", d.schema)).collect()
        assert [r["id"] for r in kept] == [2]
        both = d.where(
            compile_predicate("row.v < 5 || row.v >= 30", d.schema)
        ).collect()
        assert sorted(r["id"] for r in both) == [1, 2]

    def test_numeric_null_is_zero(self, df):
        out = js_transform(
            df, "({ id: row.id, v: row.flag === null ? 1 : 0, z: null + 5 })"
        )
        assert _one(out, id=3)["v"] == 1
        assert _one(out, id=1)["z"] == 5.0  # JS: null + 5 === 5

    def test_strict_equality_and_loose_rejected(self, df):
        out = js_transform(df, """({
            id: row.id,
            same: row.tag === 'x',
            cross: row.id === 'x',
            nn: row.tag !== null,
        })""")
        r2 = _one(out, id=2)
        assert r2["same"] is True and r2["cross"] is False and r2["nn"] is True
        r1 = _one(out, id=1)
        assert r1["same"] is False and r1["nn"] is False
        with pytest.raises(JsError, match="loose"):
            js_parse("row.a == 1")

    def test_value_semantics_and_nullish(self, df):
        out = js_transform(df, """({
            id: row.id,
            orv: row.tag || 'none',
            andv: row.name && row.tag,
            nsh: row.tag ?? 'dflt',
        })""")
        r1, r2 = _one(out, id=1), _one(out, id=2)
        assert r1["orv"] == "none" and r2["orv"] == "x"
        assert r2["andv"] == "x"
        assert r1["nsh"] == "dflt" and r2["nsh"] == "x"

    def test_empty_string_and_zero_falsy(self, df):
        out = js_transform(
            df, "({ id: row.id, t: row.n ? 'truthy' : 'falsy' })"
        )
        # JS: 0 is falsy (Lua disagrees — pinned in TestLua)
        assert _one(out, id=3)["t"] == "falsy"
        assert _one(out, id=1)["t"] == "truthy"

    def test_string_methods_and_slice(self, df):
        out = js_transform(df.where(F.col("name").isNotNull()), """({
            id: row.id,
            up: row.name.toUpperCase(),
            sw: row.name.startsWith('al'),
            inc: row.name.includes('ph'),
            sl: row.name.slice(1, 3),
            neg: row.name.slice(-2),
            len: row.name.length,
            parts: row.name.split('a'),
        })""")
        r = _one(out, id=1)
        assert r["up"] == "ALPHA" and r["sw"] is True and r["inc"] is True
        assert r["sl"] == "lp" and r["neg"] == "ha" and r["len"] == 5
        assert list(r["parts"]) == ["", "lph", ""]

    def test_method_on_null_raises_unless_optional_chained(self, df):
        nulls = js_transform(df, "({ id: row.id, u: row.tag.toUpperCase() })")
        with pytest.raises(Exception, match="TypeError"):
            nulls.collect()
        safe = js_transform(df, "({ id: row.id, u: row.tag?.toUpperCase() })")
        assert _one(safe, id=1)["u"] is None
        assert _one(safe, id=2)["u"] == "X"

    def test_math_globals(self, df):
        out = js_transform(df, """({
            id: row.id,
            fl: Math.floor(row.score),
            rd: Math.round(-2.5),
            mx: Math.max(row.n, 0),
            pw: Math.pow(row.id, 2),
            pi: parseInt('12px'),
            pf: parseFloat('3.5rem'),
            bad: parseInt('px'),
        })""")
        r = _one(out, id=1)
        assert r["fl"] == 10
        assert r["rd"] == -2  # JS half-toward-+inf, NOT SQL HALF_UP's -3
        assert r["mx"] == 3.0
        assert r["pw"] == 1.0
        assert r["pi"] == 12 and r["pf"] == 3.5 and r["bad"] is None

    def test_number_coercions(self, df):
        out = js_transform(
            df, "({ id: row.id, e: Number(''), t: Number(true), n: Number(null) })"
        )
        r = _one(out, id=1)
        assert r["e"] == 0.0 and r["t"] == 1.0 and r["n"] == 0.0

    def test_predicate_compile(self, df):
        pred = compile_predicate("row.score > 0 && row.name.includes('a')",
                                 df.schema)
        got = sorted(r["id"] for r in df.where(pred).collect())
        assert got == [1]
        # truthiness predicate: non-boolean expression
        pred2 = compile_predicate("row.tag", df.schema)
        assert sorted(r["id"] for r in df.where(pred2).collect()) == [2, 3]

    def test_descoped_constructs_raise(self, df):
        with pytest.raises(JsError, match="shorthand"):
            js_parse("({ id })")
        with pytest.raises(JsError, match="replaceAll"):
            js_transform(df, "({ s: row.name.replace('a', 'b') })")
        with pytest.raises(JsError, match="object literal"):
            js_transform(df, "row.id + 1")
        with pytest.raises(JsError, match="unknown identifier"):
            js_transform(df, "({ x: window.location })")
        with pytest.raises(JsError, match="statically null"):
            js_transform(df, "({ x: row.missing.deep })")
