"""jq transform engine — a jq-language subset compiled to Spark Column
expressions (zero Python in the data path).

The reference declares ``"jq"`` as a first-class transform-engine type —
``pkg/transform/models.go:30,59`` and ``pkg/config/validation.go:246``
accept ``engine: "jq"`` in rule configs — but never links an
interpreter: no gojq import exists anywhere in the tree, so a config
that selects the jq engine validates and then silently falls through.
Here the declared surface is made real for the subset of jq that maps
onto relational row transforms: each program compiles ONCE (driver-side
parse + type-propagation against the DataFrame schema) into native
Column expressions, so execution is whole-stage-codegen JVM work — a
per-event jq interpreter (what gojq would have been) is exactly the
row-at-a-time slow path this engine bans.

Supported subset (everything else raises ``JqError`` at compile time —
fail-loud, never silently wrong):

- paths ``.a``, ``.a.b`` (struct traversal), optional ``.a?`` (missing
  field -> null instead of compile error), array index ``.[0]``
- pipes ``f | g``, parentheses
- object construction ``{a, b: expr}`` (shorthand ``{a}`` == ``{a: .a}``),
  array construction ``[e1, e2]``
- literals: numbers, strings (with ``"\\(expr)"`` interpolation), true /
  false / null
- operators: ``+`` (numeric add / string concat / array concat by
  compile-time type), ``- * %``; ``/`` is float division like jq (both
  sides cast to double); comparisons ``== != < <= > >=`` with jq's
  TOTAL order on null (null == null → true, null sorts below every
  value: ``==`` compiles to null-safe equality, orders to isNull/
  isNotNull algebra — never SQL 3-valued null); ``and`` / ``or`` (jq
  truthiness: false and null are falsy, everything else truthy);
  alternative ``l // r`` (l if truthy else r)
- ``if c then a elif c2 then b else z end`` (``else`` required)
- ``select(f)`` as a ROW-context pipe stage (top-level, or inside a
  parenthesized group in top-level stage position) — compiles to a
  WHERE predicate; select in VALUE context (object values, ``//``
  operands, ``map`` bodies, interpolations) raises, since jq's
  empty-propagation there is not expressible as one Column
- builtins: ``length`` (string chars / array size), ``not``,
  ``tostring``, ``tonumber``, ``floor``, ``ceil``, ``round``, ``fabs``,
  ``sqrt``, ``ascii_downcase``, ``ascii_upcase``, ``ltrimstr(s)``,
  ``rtrimstr(s)``, ``startswith(s)``, ``endswith(s)``, ``test(re)``,
  ``gsub(re; repl)``, ``split(s)``, ``join(s)``, ``has(k)`` — argument
  separators are ``;`` as in jq, and string-typed builtin args must be
  literals (they parameterize the compiled expression)
- array builtins via Spark higher-order functions (per-element lambdas
  compile once and run JVM-side): ``map(f)``, ``any`` / ``any(f)``,
  ``all`` / ``all(f)``, ``add`` (numeric sum; [] sums to 0.0, where jq
  yields null), ``min``, ``max``, ``sort``, ``unique``, ``reverse``,
  ``first``, ``last``

Deliberately out of scope (all raise): stream iteration ``.[]`` and
``,`` streams (they change cardinality — that is ``explode``, not a
projection), ``reduce`` / ``foreach``, ``as`` bindings, function
definitions, ``sub`` (jq's first-match-only; use ``gsub``). The ``lua``
/ ``javascript`` engine types the reference also only declares are
executed the same way by ``functions/lua.py`` / ``functions/js.py``.

jq-vs-Spark numeric note: jq has one number type (float); this subset
keeps Spark's integer arithmetic for ``+ - * %`` (so long columns stay
long) and matches jq only for ``/`` (always float) and ``floor`` /
``ceil`` / ``round`` (always integer-typed, as jq produces integral
values there). ``tonumber`` yields double.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class JqError(ValueError):
    """Parse or compile error in a jq program (always compile-time)."""


# -- tokenizer ---------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<op>\.\.|//|==|!=|<=|>=|\||\.|\(|\)|\{|\}|\[|\]|:|;|,|\?|\+|-|\*|/|%|<|>)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "if", "then", "elif", "else", "end", "true", "false", "null"}


@dataclass
class _Tok:
    kind: str  # num | str | op | ident | kw | eof
    val: object
    pos: int


def _lex_string(src: str, i: int) -> tuple[list, int]:
    """Lex a double-quoted string starting at src[i] == '"'.

    Returns (parts, next_index) where parts alternate ("lit", str) and
    ("expr", substring) for ``\\(...)`` interpolations.
    """
    assert src[i] == '"'
    i += 1
    parts: list = []
    buf: list[str] = []
    while i < len(src):
        c = src[i]
        if c == '"':
            if buf:
                parts.append(("lit", "".join(buf)))
            return parts, i + 1
        if c == "\\":
            if i + 1 >= len(src):
                break
            n = src[i + 1]
            if n == "(":  # interpolation — find the balanced close paren
                depth, j = 1, i + 2
                while j < len(src) and depth:
                    if src[j] == '"':  # skip nested string
                        _, j = _lex_string(src, j)
                        continue
                    if src[j] == "(":
                        depth += 1
                    elif src[j] == ")":
                        depth -= 1
                    j += 1
                if depth:
                    raise JqError(f"unterminated interpolation at {i}")
                if buf:
                    parts.append(("lit", "".join(buf)))
                    buf = []
                parts.append(("expr", src[i + 2 : j - 1]))
                i = j
                continue
            esc = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "/": "/"}
            if n not in esc:
                raise JqError(f"unsupported string escape \\{n}")
            buf.append(esc[n])
            i += 2
            continue
        buf.append(c)
        i += 1
    raise JqError("unterminated string literal")


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(src):
        if src[i] == '"':
            parts, j = _lex_string(src, i)
            toks.append(_Tok("str", parts, i))
            i = j
            continue
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise JqError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        if m.lastgroup == "num":
            txt = m.group("num")
            toks.append(_Tok("num", float(txt) if "." in txt else int(txt), m.start()))
        elif m.lastgroup == "ident":
            w = m.group("ident")
            toks.append(_Tok("kw" if w in _KEYWORDS else "ident", w, m.start()))
        else:
            toks.append(_Tok("op", m.group("op"), m.start()))
    toks.append(_Tok("eof", None, len(src)))
    return toks


# -- parser (recursive descent; AST = nested tuples) -------------------------


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: object = None) -> _Tok:
        t = self.next()
        if t.kind != kind or (val is not None and t.val != val):
            raise JqError(f"expected {val or kind}, got {t.val!r} at {t.pos}")
        return t

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.val in ops

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.val in kws

    # pipe := alt ('|' alt)*
    def parse_pipe(self):
        stages = [self.parse_alt()]
        while self.at_op("|"):
            self.next()
            stages.append(self.parse_alt())
        return stages[0] if len(stages) == 1 else ("pipe", stages)

    # alt := or ('//' or)*   (right-assoc like jq)
    def parse_alt(self):
        left = self.parse_or()
        if self.at_op("//"):
            self.next()
            return ("alt", left, self.parse_alt())
        return left

    def parse_or(self):
        left = self.parse_and()
        while self.at_kw("or"):
            self.next()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self.at_kw("and"):
            self.next()
            left = ("and", left, self.parse_cmp())
        return left

    def parse_cmp(self):
        left = self.parse_add()
        if self.at_op("==", "!=", "<", "<=", ">", ">="):
            op = self.next().val
            return ("cmp", op, left, self.parse_add())
        return left

    def parse_add(self):
        left = self.parse_mul()
        while self.at_op("+", "-"):
            op = self.next().val
            left = ("arith", op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_unary()
        while self.at_op("*", "/", "%"):
            op = self.next().val
            left = ("arith", op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.at_op("-"):
            self.next()
            return ("neg", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        node = self.parse_primary()
        while True:
            if self.at_op("."):
                # lookahead: '.' IDENT  (path continuation on a value)
                nxt = self.toks[self.i + 1]
                if nxt.kind != "ident":
                    break
                self.next()
                name = self.next().val
                opt = False
                if self.at_op("?"):
                    self.next()
                    opt = True
                node = ("field", node, name, opt)
            elif self.at_op("["):
                self.next()
                node = ("index", node, self._index_literal())
            else:
                break
        return node

    def parse_primary(self):
        t = self.peek()
        if t.kind == "op" and t.val == ".":
            self.next()
            nxt = self.peek()
            if nxt.kind == "ident":  # .a(.b)* path from the input
                name = self.next().val
                opt = False
                if self.at_op("?"):
                    self.next()
                    opt = True
                node = ("field", ("identity",), name, opt)
                return node
            if self.at_op("["):  # .[0]
                self.next()
                if self.at_op("]"):
                    raise JqError(".[] stream iteration is not expressible as a "
                                  "column transform (use explode outside jq)")
                return ("index", ("identity",), self._index_literal())
            return ("identity",)
        if t.kind == "num":
            self.next()
            return ("lit", t.val)
        if t.kind == "str":
            self.next()
            return ("str", t.val)
        if t.kind == "kw" and t.val in ("true", "false", "null"):
            self.next()
            return ("lit", {"true": True, "false": False, "null": None}[t.val])
        if t.kind == "kw" and t.val == "if":
            return self.parse_if()
        if t.kind == "op" and t.val == "(":
            self.next()
            node = self.parse_pipe()
            self.expect("op", ")")
            return node
        if t.kind == "op" and t.val == "{":
            return self.parse_object()
        if t.kind == "op" and t.val == "[":
            return self.parse_array()
        if t.kind == "ident":
            name = self.next().val
            args = []
            if self.at_op("("):
                self.next()
                args.append(self.parse_pipe())
                while self.at_op(";"):
                    self.next()
                    args.append(self.parse_pipe())
                self.expect("op", ")")
            return ("call", name, args)
        raise JqError(f"unexpected token {t.val!r} at {t.pos}")

    def _index_literal(self) -> int:
        """Parse the inside of '[n]' after '[' was consumed (n may be
        negative — jq counts from the end, as does element_at)."""
        neg = False
        if self.at_op("-"):
            self.next()
            neg = True
        idx = self.expect("num").val
        self.expect("op", "]")
        if not isinstance(idx, int):
            raise JqError("array index must be an integer literal")
        return -idx if neg else idx

    def parse_if(self):
        self.expect("kw", "if")
        branches = []
        cond = self.parse_pipe()
        self.expect("kw", "then")
        branches.append((cond, self.parse_pipe()))
        while self.at_kw("elif"):
            self.next()
            c = self.parse_pipe()
            self.expect("kw", "then")
            branches.append((c, self.parse_pipe()))
        if not self.at_kw("else"):
            raise JqError("if requires an explicit else branch in this subset")
        self.next()
        els = self.parse_pipe()
        self.expect("kw", "end")
        return ("if", branches, els)

    def parse_object(self):
        self.expect("op", "{")
        entries = []
        while True:
            t = self.next()
            if t.kind == "ident":
                key = t.val
            elif t.kind == "str":
                if len(t.val) != 1 or t.val[0][0] != "lit":
                    raise JqError("object keys must be plain strings")
                key = t.val[0][1]
            else:
                raise JqError(f"bad object key at {t.pos}")
            if self.at_op(":"):
                self.next()
                # value expr: anything up to ',' or '}' — parse_alt keeps
                # '|' available via parens, matching jq's {k: f} grammar
                entries.append((key, self.parse_alt()))
            else:
                entries.append((key, ("field", ("identity",), key, False)))
            if self.at_op(","):
                self.next()
                continue
            self.expect("op", "}")
            return ("obj", entries)

    def parse_array(self):
        self.expect("op", "[")
        items = []
        if not self.at_op("]"):
            items.append(self.parse_alt())
            while self.at_op(","):
                self.next()
                items.append(self.parse_alt())
        self.expect("op", "]")
        return ("arr", items)


def parse(program: str):
    """Parse a jq program; returns the AST (raises JqError on syntax errors)."""
    p = _Parser(_tokenize(program))
    ast = p.parse_pipe()
    if p.peek().kind != "eof":
        t = p.peek()
        raise JqError(f"trailing input at {t.pos}: {t.val!r}")
    return ast


# -- compiler ----------------------------------------------------------------
#
# Values carry (Column, DataType|None); the program input is either an
# object (dict of named values — the row) or a single value. Type info
# drives the polymorphic bits (+, length, truthiness) and is best-effort:
# None means "unknown, assume numeric scalar".


@dataclass
class _Val:
    col: Column | None = None
    dtype: T.DataType | None = None
    obj: dict | None = None  # name -> _Val when this is an object

    @property
    def is_obj(self) -> bool:
        return self.obj is not None


def _truthy(v: _Val) -> Column:
    if v.is_obj:
        return F.lit(True)  # an object is always truthy in jq
    if isinstance(v.dtype, T.BooleanType):
        return F.coalesce(v.col, F.lit(False))
    return v.col.isNotNull()


def _scalar(v: _Val, what: str) -> _Val:
    if v.is_obj:
        raise JqError(f"{what}: expected a value, got an object")
    return v


def _lit_str_arg(args: list, i: int, fn: str) -> str:
    if i >= len(args):
        raise JqError(f"{fn}: missing argument {i + 1}")
    a = args[i]
    if a[0] == "str" and len(a[1]) == 1 and a[1][0][0] == "lit":
        return a[1][0][1]
    if a[0] == "str" and not a[1]:
        return ""
    raise JqError(f"{fn}: argument must be a string literal")


_STR = T.StringType()
_BOOL = T.BooleanType()
_LONG = T.LongType()
_DOUBLE = T.DoubleType()


class _Compiler:
    def compile(self, node, inp: _Val) -> _Val:
        kind = node[0]
        m = getattr(self, f"_c_{kind}", None)
        if m is None:
            raise JqError(f"unsupported jq construct: {kind}")
        return m(node, inp)

    # select() is legal only in ROW context — a top-level pipe stage, or
    # a pipe stage of a parenthesized group that is itself a top-level
    # stage — where it compiles to a WHERE predicate ANDed into
    # self.where. In VALUE context (object values, // operands, map
    # bodies, interpolations) jq's empty-propagation has no one-Column
    # equivalent: bubbling the predicate up to the global WHERE would
    # silently drop whole rows (e.g. `{a: ((.x | select(.y)) // "d")}`
    # keeps the row with a="d" in jq), and inside a higher-order lambda
    # the predicate references the lambda variable, unresolvable in a
    # row filter — so it raises instead.
    def run(self, ast, inp: _Val) -> _Val:
        self.where: Column | None = None
        return self._pipe_stages(ast, inp, top=True)

    def _pipe_stages(self, node, inp: _Val, top: bool = False) -> _Val:
        stages = node[1] if node[0] == "pipe" else [node]
        cur = inp
        for s in stages:
            if s[0] == "call" and s[1] == "select":
                if not top:
                    raise JqError(
                        "select() inside a value expression is not "
                        "expressible as one Column (the row-level WHERE "
                        "it compiles to cannot apply there); move it to "
                        "a top-level pipe stage"
                    )
                if len(s[2]) != 1:
                    raise JqError("select takes exactly one argument")
                pred = self._compile_pred(s[2][0], cur)
                self.where = pred if self.where is None else (self.where & pred)
                continue
            if s[0] == "pipe":
                # parenthesized pipe group in stage position keeps row
                # context: `(select(.a) | {id})` ≡ `select(.a) | {id}`
                cur = self._pipe_stages(s, cur, top=top)
                continue
            cur = self.compile(s, cur)
        return cur

    def _compile_pred(self, node, inp: _Val) -> Column:
        """Compile a select() argument in WHERE context. Comparisons are
        already total (never-null — see _c_cmp), so they pass through
        pushable as-is; and/or trees compile operand-wise. Non-boolean
        values use jq truthiness (null→falsy), which a SQL WHERE's
        null-exclusion matches RAW (a `coalesce(p, false)` wrapper would
        block PushedFilters). `not` routes through the value path, whose
        coalesce gives jq's null flip (jq: null|not → true)."""
        if node[0] == "and":
            return self._compile_pred(node[1], inp) & self._compile_pred(node[2], inp)
        if node[0] == "or":
            return self._compile_pred(node[1], inp) | self._compile_pred(node[2], inp)
        v = self.compile(node, inp)
        if v.is_obj:
            return F.lit(True)
        if isinstance(v.dtype, T.BooleanType):
            return v.col  # null excluded by WHERE ≡ jq falsy-null
        return v.col.isNotNull()

    def _c_pipe(self, node, inp):
        return self._pipe_stages(node, inp)

    def _c_identity(self, node, inp):
        return inp

    def _c_lit(self, node, inp):
        v = node[1]
        dt = (
            _BOOL if isinstance(v, bool)
            else _LONG if isinstance(v, int)
            else _DOUBLE if isinstance(v, float)
            else None
        )
        return _Val(F.lit(v), dt)

    def _c_str(self, node, inp):
        parts = node[1]
        if not parts:
            return _Val(F.lit(""), _STR)
        if len(parts) == 1 and parts[0][0] == "lit":
            return _Val(F.lit(parts[0][1]), _STR)
        cols = []
        for kind, payload in parts:
            if kind == "lit":
                cols.append(F.lit(payload))
            else:  # interpolation: compile against the same input, tostring
                sub = self._pipe_stages(parse(payload), inp)
                cols.append(self._tostring(_scalar(sub, "interpolation")))
        return _Val(F.concat(*cols), _STR)

    def _c_field(self, node, inp):
        _, base, name, opt = node
        b = self.compile(base, inp)
        if b.is_obj:
            if name in b.obj:
                return b.obj[name]
            if opt:
                return _Val(F.lit(None), None)
            raise JqError(
                f".{name}: no such field (have: {sorted(b.obj)[:8]}...); "
                f"use .{name}? for optional access"
            )
        if isinstance(b.dtype, T.StructType):
            if name in b.dtype.fieldNames():
                return _Val(b.col.getField(name), b.dtype[name].dataType)
            if opt:
                return _Val(F.lit(None), None)
            raise JqError(f".{name}: struct has no field {name!r}")
        if b.dtype is None or opt:
            # unknown type (e.g. came through //) — late-bound getField
            return _Val(b.col.getField(name) if b.col is not None else F.lit(None), None)
        raise JqError(f".{name}: cannot index a {b.dtype.simpleString()} value")

    def _c_index(self, node, inp):
        _, base, idx = node
        b = _scalar(self.compile(base, inp), "[...]")
        el = b.dtype.elementType if isinstance(b.dtype, T.ArrayType) else None
        if b.dtype is not None and not isinstance(b.dtype, T.ArrayType):
            raise JqError(f".[{idx}]: cannot index a {b.dtype.simpleString()}")
        # jq is 0-based and yields null out of range; element_at is 1-based
        # (negative jq indexes count from the end, like element_at's)
        pos = idx + 1 if idx >= 0 else idx
        return _Val(F.try_element_at(b.col, F.lit(pos)), el)

    def _c_neg(self, node, inp):
        v = _scalar(self.compile(node[1], inp), "unary -")
        return _Val(-v.col, v.dtype)

    def _c_arith(self, node, inp):
        _, op, ln, rn = node
        l = _scalar(self.compile(ln, inp), op)
        r = _scalar(self.compile(rn, inp), op)
        if op == "+":
            if isinstance(l.dtype, T.StringType) or isinstance(r.dtype, T.StringType):
                if not (
                    (l.dtype is None or isinstance(l.dtype, T.StringType))
                    and (r.dtype is None or isinstance(r.dtype, T.StringType))
                ):
                    raise JqError("+: cannot add string and non-string (jq errors too; "
                                  "pipe through tostring)")
                return _Val(F.concat(l.col, r.col), _STR)
            if isinstance(l.dtype, T.ArrayType) or isinstance(r.dtype, T.ArrayType):
                return _Val(F.concat(l.col, r.col), l.dtype or r.dtype)
            return _Val(l.col + r.col, self._num_out(l, r))
        for d in (l, r):
            if d.dtype is not None and not isinstance(d.dtype, T.NumericType):
                raise JqError(f"{op}: requires numbers, got {d.dtype.simpleString()}")
        if op == "-":
            return _Val(l.col - r.col, self._num_out(l, r))
        if op == "*":
            return _Val(l.col * r.col, self._num_out(l, r))
        if op == "%":
            return _Val(l.col % r.col, self._num_out(l, r))
        # '/' — jq division is always float
        return _Val(l.col.cast("double") / r.col.cast("double"), _DOUBLE)

    @staticmethod
    def _num_out(l: _Val, r: _Val) -> T.DataType | None:
        if isinstance(l.dtype, T.FractionalType) or isinstance(r.dtype, T.FractionalType):
            return _DOUBLE
        if l.dtype is None or r.dtype is None:
            return None
        return _LONG

    def _c_cmp(self, node, inp):
        _, op, ln, rn = node
        l = _scalar(self.compile(ln, inp), op).col
        r = _scalar(self.compile(rn, inp), op).col
        # jq comparisons are TOTAL: null is an ordinary value that sorts
        # below everything else (null == null → true, null < 5 → true,
        # .a != "x" with null .a → true). Raw SQL operators are 3-valued
        # and silently diverge on null operands — dropping rows a jq
        # select() keeps and emitting null where jq emits true/false. So
        # == compiles to null-safe equality (<=>, pushable as
        # EqualNullSafe) and the order comparisons to boolean algebra
        # over isNull/isNotNull (And/Or of pushable leaves — a CASE WHEN
        # form would block parquet pushdown). Every branch is never-null.
        if op in ("==", "!="):
            lit_null = ("lit", None)
            if ln == lit_null and rn == lit_null:
                expr = F.lit(op == "==")
            elif rn == lit_null or ln == lit_null:
                # literal-null comparand → the pushdown-native Is[Not]Null
                tgt = l if rn == lit_null else r
                expr = tgt.isNull() if op == "==" else tgt.isNotNull()
            elif op == "==":
                expr = l.eqNullSafe(r)
            else:
                expr = ~l.eqNullSafe(r)
        elif op == "<":
            expr = (l.isNull() & r.isNotNull()) | (r.isNotNull() & (l < r))
        elif op == "<=":
            expr = l.isNull() | (r.isNotNull() & (l <= r))
        elif op == ">":
            expr = (r.isNull() & l.isNotNull()) | (l.isNotNull() & (l > r))
        else:  # ">="
            expr = r.isNull() | (l.isNotNull() & (l >= r))
        return _Val(expr, _BOOL)

    def _c_and(self, node, inp):
        l = _truthy(self.compile(node[1], inp))
        r = _truthy(self.compile(node[2], inp))
        return _Val(l & r, _BOOL)

    def _c_or(self, node, inp):
        l = _truthy(self.compile(node[1], inp))
        r = _truthy(self.compile(node[2], inp))
        return _Val(l | r, _BOOL)

    def _c_alt(self, node, inp):
        l = self.compile(node[1], inp)
        r = self.compile(node[2], inp)
        l = _scalar(l, "//")
        r = _scalar(r, "//")
        return _Val(
            F.when(_truthy(l), l.col).otherwise(r.col), l.dtype or r.dtype
        )

    def _c_if(self, node, inp):
        _, branches, els = node
        out: Column | None = None
        dt: T.DataType | None = None
        for cond, then in branches:
            c = _truthy(self.compile(cond, inp))
            t = _scalar(self.compile(then, inp), "if-branch")
            out = F.when(c, t.col) if out is None else out.when(c, t.col)
            dt = dt or t.dtype
        e = _scalar(self.compile(els, inp), "else-branch")
        return _Val(out.otherwise(e.col), dt or e.dtype)

    def _c_obj(self, node, inp):
        out = {}
        for k, e in node[1]:
            v = self.compile(e, inp)
            if v.is_obj:  # nested construction -> struct column
                v = _Val(
                    F.struct(*[c.col.alias(n) for n, c in v.obj.items()]),
                    T.StructType([
                        T.StructField(n, c.dtype or T.NullType())
                        for n, c in v.obj.items()
                    ]),
                )
            out[k] = v
        return _Val(obj=out)

    def _c_arr(self, node, inp):
        items = [_scalar(self.compile(e, inp), "array") for e in node[1]]
        el = next((i.dtype for i in items if i.dtype is not None), None)
        return _Val(
            F.array(*[i.col for i in items]) if items else F.array(),
            T.ArrayType(el) if el is not None else None,
        )

    # -- builtins ------------------------------------------------------------

    def _tostring(self, v: _Val) -> Column:
        if isinstance(v.dtype, T.StringType):
            return v.col
        return v.col.cast("string")

    def _c_call(self, node, inp):
        _, name, args = node
        if name == "select":
            raise JqError("select is only supported as a pipe stage "
                          "(… | select(f) | …)")
        fn = getattr(self, f"_fn_{name}", None)
        if fn is None:
            raise JqError(f"unsupported jq function: {name}")
        return fn(args, inp)

    def _no_args(self, args, name):
        if args:
            raise JqError(f"{name} takes no arguments")

    def _fn_length(self, args, inp):
        self._no_args(args, "length")
        v = _scalar(inp, "length")
        if isinstance(v.dtype, T.ArrayType):
            return _Val(F.size(v.col), T.IntegerType())
        if v.dtype is None or isinstance(v.dtype, T.StringType):
            return _Val(F.length(v.col), T.IntegerType())
        raise JqError(f"length: unsupported on {v.dtype.simpleString()}")

    def _fn_not(self, args, inp):
        self._no_args(args, "not")
        return _Val(~_truthy(inp), _BOOL)

    def _fn_tostring(self, args, inp):
        self._no_args(args, "tostring")
        return _Val(self._tostring(_scalar(inp, "tostring")), _STR)

    def _fn_tonumber(self, args, inp):
        self._no_args(args, "tonumber")
        return _Val(_scalar(inp, "tonumber").col.cast("double"), _DOUBLE)

    def _fn_floor(self, args, inp):
        self._no_args(args, "floor")
        return _Val(F.floor(_scalar(inp, "floor").col.cast("double")), _LONG)

    def _fn_ceil(self, args, inp):
        self._no_args(args, "ceil")
        return _Val(F.ceil(_scalar(inp, "ceil").col.cast("double")), _LONG)

    def _fn_round(self, args, inp):
        self._no_args(args, "round")
        return _Val(
            F.round(_scalar(inp, "round").col.cast("double")).cast("long"), _LONG
        )

    def _fn_fabs(self, args, inp):
        self._no_args(args, "fabs")
        v = _scalar(inp, "fabs")
        return _Val(F.abs(v.col), v.dtype)

    def _fn_sqrt(self, args, inp):
        self._no_args(args, "sqrt")
        return _Val(F.sqrt(_scalar(inp, "sqrt").col.cast("double")), _DOUBLE)

    def _fn_ascii_downcase(self, args, inp):
        self._no_args(args, "ascii_downcase")
        return _Val(F.lower(_scalar(inp, "ascii_downcase").col), _STR)

    def _fn_ascii_upcase(self, args, inp):
        self._no_args(args, "ascii_upcase")
        return _Val(F.upper(_scalar(inp, "ascii_upcase").col), _STR)

    def _fn_ltrimstr(self, args, inp):
        s = _lit_str_arg(args, 0, "ltrimstr")
        c = _scalar(inp, "ltrimstr").col
        return _Val(
            F.when(c.startswith(s), c.substr(F.lit(len(s) + 1), F.length(c)))
            .otherwise(c),
            _STR,
        )

    def _fn_rtrimstr(self, args, inp):
        s = _lit_str_arg(args, 0, "rtrimstr")
        c = _scalar(inp, "rtrimstr").col
        return _Val(
            F.when(c.endswith(s), c.substr(F.lit(1), F.length(c) - len(s)))
            .otherwise(c),
            _STR,
        )

    def _fn_startswith(self, args, inp):
        s = _lit_str_arg(args, 0, "startswith")
        return _Val(_scalar(inp, "startswith").col.startswith(s), _BOOL)

    def _fn_endswith(self, args, inp):
        s = _lit_str_arg(args, 0, "endswith")
        return _Val(_scalar(inp, "endswith").col.endswith(s), _BOOL)

    def _fn_test(self, args, inp):
        pat = _lit_str_arg(args, 0, "test")
        return _Val(_scalar(inp, "test").col.rlike(pat), _BOOL)

    def _fn_gsub(self, args, inp):
        pat = _lit_str_arg(args, 0, "gsub")
        repl = _lit_str_arg(args, 1, "gsub")
        return _Val(F.regexp_replace(_scalar(inp, "gsub").col, pat, repl), _STR)

    def _fn_split(self, args, inp):
        sep = _lit_str_arg(args, 0, "split")
        if not sep:
            raise JqError("split: separator must be non-empty")
        # jq splits on a LITERAL separator; F.split takes a regex
        return _Val(
            F.split(_scalar(inp, "split").col, re.escape(sep)),
            T.ArrayType(_STR),
        )

    def _fn_join(self, args, inp):
        sep = _lit_str_arg(args, 0, "join")
        v = _scalar(inp, "join")
        if v.dtype is not None and not isinstance(v.dtype, T.ArrayType):
            raise JqError("join: input must be an array")
        return _Val(F.array_join(v.col, sep), _STR)

    # -- array builtins (Spark higher-order functions — still JVM-side) ------

    def _array_in(self, inp: _Val, what: str) -> _Val:
        v = _scalar(inp, what)
        if v.dtype is not None and not isinstance(v.dtype, T.ArrayType):
            raise JqError(f"{what}: input must be an array, got "
                          f"{v.dtype.simpleString()}")
        return v

    def _fn_map(self, args, inp):
        """jq ``map(f)`` → ``F.transform``: f runs per element, compiled
        once against the element type — no iteration leaves the JVM."""
        if len(args) != 1:
            raise JqError("map takes exactly one argument")
        v = self._array_in(inp, "map")
        el = v.dtype.elementType if isinstance(v.dtype, T.ArrayType) else None
        body = args[0]
        out_dtype: list = [None]

        def _f(x: Column) -> Column:
            r = _scalar(self.compile(body, _Val(x, el)), "map body")
            out_dtype[0] = r.dtype
            return r.col

        col = F.transform(v.col, _f)
        return _Val(col, T.ArrayType(out_dtype[0]) if out_dtype[0] else None)

    def _fn_add(self, args, inp):
        """jq ``add`` on a numeric array (sum; null for empty-as-jq? jq
        yields null on []; aggregate yields the 0 start — documented)."""
        self._no_args(args, "add")
        v = self._array_in(inp, "add")
        return _Val(
            F.aggregate(
                v.col, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            _DOUBLE,
        )

    def _fn_min(self, args, inp):
        self._no_args(args, "min")
        v = self._array_in(inp, "min")
        el = v.dtype.elementType if isinstance(v.dtype, T.ArrayType) else None
        return _Val(F.array_min(v.col), el)

    def _fn_max(self, args, inp):
        self._no_args(args, "max")
        v = self._array_in(inp, "max")
        el = v.dtype.elementType if isinstance(v.dtype, T.ArrayType) else None
        return _Val(F.array_max(v.col), el)

    def _fn_sort(self, args, inp):
        self._no_args(args, "sort")
        v = self._array_in(inp, "sort")
        return _Val(F.sort_array(v.col), v.dtype)

    def _fn_reverse(self, args, inp):
        self._no_args(args, "reverse")
        v = self._array_in(inp, "reverse")
        return _Val(F.reverse(v.col), v.dtype)

    def _fn_unique(self, args, inp):
        """jq unique = distinct + sorted."""
        self._no_args(args, "unique")
        v = self._array_in(inp, "unique")
        return _Val(F.sort_array(F.array_distinct(v.col)), v.dtype)

    def _fn_first(self, args, inp):
        self._no_args(args, "first")
        v = self._array_in(inp, "first")
        el = v.dtype.elementType if isinstance(v.dtype, T.ArrayType) else None
        return _Val(F.try_element_at(v.col, F.lit(1)), el)

    def _fn_last(self, args, inp):
        self._no_args(args, "last")
        v = self._array_in(inp, "last")
        el = v.dtype.elementType if isinstance(v.dtype, T.ArrayType) else None
        return _Val(F.try_element_at(v.col, F.lit(-1)), el)

    def _fn_any(self, args, inp):
        """``any`` / ``any(f)`` → F.exists (jq truthiness per element)."""
        v = self._array_in(inp, "any")
        el = v.dtype.elementType if isinstance(v.dtype, T.ArrayType) else None
        if len(args) > 1:
            raise JqError("any takes at most one argument")
        body = args[0] if args else ("identity",)
        return _Val(
            F.exists(v.col, lambda x: _truthy(self.compile(body, _Val(x, el)))),
            _BOOL,
        )

    def _fn_all(self, args, inp):
        v = self._array_in(inp, "all")
        el = v.dtype.elementType if isinstance(v.dtype, T.ArrayType) else None
        if len(args) > 1:
            raise JqError("all takes at most one argument")
        body = args[0] if args else ("identity",)
        return _Val(
            F.forall(v.col, lambda x: _truthy(self.compile(body, _Val(x, el)))),
            _BOOL,
        )

    def _fn_has(self, args, inp):
        key = _lit_str_arg(args, 0, "has")
        if inp.is_obj:
            return _Val(F.lit(key in inp.obj), _BOOL)
        if isinstance(inp.dtype, T.StructType):
            return _Val(F.lit(key in inp.dtype.fieldNames()), _BOOL)
        raise JqError("has: input must be an object")


# -- public API --------------------------------------------------------------


@dataclass
class CompiledJq:
    """A compiled program: output projection + optional filter predicate.

    ``columns`` is None when the program is pure filtering (its pipeline
    value is the unchanged input object) — callers keep their own
    projection then.
    """

    columns: dict[str, Column] | None
    where: Column | None


def _root_from_schema(
    schema: T.StructType, cols: dict[str, Column] | None = None
) -> _Val:
    return _Val(obj={
        f.name: _Val(cols[f.name] if cols else F.col(f.name), f.dataType)
        for f in schema.fields
    })


def compile_program(
    program: str,
    schema: T.StructType,
    cols: dict[str, Column] | None = None,
) -> CompiledJq:
    """Compile ``program`` against a row ``schema``.

    The input object ``.`` is the row; ``.col`` is a column reference.
    The program must end in an object construction (a projection), or in
    the identity (filter-only programs like ``select(.a > 1)``).
    ``cols`` optionally maps field names to the Column expressions that
    back them (the transform engine's payload dict mid-chain); defaults
    to ``F.col(name)``.
    """
    ast = parse(program)
    comp = _Compiler()
    root = _root_from_schema(schema, cols)
    out = comp.run(ast, root)
    if out.is_obj:
        if out.obj is root.obj:  # filter-only program: '.' passed through
            return CompiledJq(columns=None, where=comp.where)
        return CompiledJq(columns={k: v.col for k, v in out.obj.items()},
                          where=comp.where)
    raise JqError(
        "program must produce an object ({...}) or be filter-only; "
        "a bare scalar result has no column name"
    )


def jq_transform(df: DataFrame, program: str) -> DataFrame:
    """Apply a jq program to a DataFrame: selects become WHERE, the
    final object becomes the projection. One driver-side compile; the
    executed plan is pure Column expressions (no Python in the path)."""
    c = compile_program(program, df.schema)
    out = df
    if c.where is not None:
        out = out.where(c.where)
    if c.columns is not None:
        out = out.select(*[v.alias(k) for k, v in c.columns.items()])
    return out
