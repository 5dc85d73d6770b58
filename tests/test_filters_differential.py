"""Differential fuzz harness for filters.EventFilter.

Seeded random filter CONFIGS (include/exclude lists, typed FieldFilter
rows over canonical columns / struct paths / doc-JSON paths, jq and JS
custom_filter expressions) are generated PAIRED with a driver-side
Python row evaluator encoding the module's pinned semantics:

* every clause ANDs into one predicate;
* include lists: plain isin; exclude lists: ``~coalesce(isin, false)``
  — a NULL column value survives an exclude list;
* FieldFilter matches are SQL 3-valued: a null/absent field never
  *matches*, so ``include=True`` drops it and ``include=False`` KEEPS
  it (absence is not a match — the CLAUDE.md invariant);
* doc paths read through get_json_object (JSON scalars arrive as
  strings) and numeric config values force a typed double comparison.

The compiled predicate's kept-row set must equal the reference's on a
randomized raw feed (nulls in db, deletes with doc=null, absent JSON
fields). Fixed seeds — deterministic, no flake surface.
"""

from __future__ import annotations

import json
import random
import re

import pytest
from pyspark.sql import types as T

from replicator_spark.filters import EventFilter, FieldFilter
from replicator_spark.model import CHANGE_SCHEMA

N_ROWS = 60

FEED_SCHEMA = T.StructType(list(CHANGE_SCHEMA.fields))


@pytest.fixture(scope="module")
def feed(spark):
    rng = random.Random(20260821)
    rows = []
    for i in range(N_ROWS):
        op = rng.choice(["insert", "update", "update", "delete"])
        if op == "delete":
            doc = None
        else:
            d = {}
            if rng.random() < 0.8:
                d["price"] = rng.randrange(0, 10)
            if rng.random() < 0.8:
                d["name"] = rng.choice(["", "x", "xy", "abc", "zq"])
            doc = json.dumps(d)
        rows.append(
            {
                "event_id": f"e{i}",
                "seq": i,
                "op": op,
                "ts": None,
                "db": rng.choice(["d1", "d2", None]),
                "tbl": rng.choice(["t1", "t2"]),
                "key": {
                    "repo": rng.choice(["r1", "r2"]),
                    "path": "p",
                    "commit": "c",
                },
                "doc": doc,
                "old": None,
                "meta": None,
            }
        )
    return rows, spark.createDataFrame(rows, FEED_SCHEMA).cache()


# -- reference evaluation ------------------------------------------------------


def _doc_get(row, path):
    # get_json_object: absent/None doc -> None; scalars arrive as strings
    if row["doc"] is None:
        return None
    v = json.loads(row["doc"]).get(path)
    if v is None:
        return None
    return v if isinstance(v, str) else str(v)


def _resolve(row, field):
    if field == "key.repo":
        return row["key"]["repo"]
    if field in ("op", "db", "tbl", "event_id"):
        return row[field]
    if field == "seq":
        return row["seq"]
    return _doc_get(row, field)


def _tri_match(ff: FieldFilter, row) -> bool | None:
    """SQL 3-valued match: None when the field is null."""
    f = _resolve(row, ff.field)
    v = ff.value
    is_doc = ff.field not in ("op", "db", "tbl", "seq", "event_id", "key.repo")
    if is_doc and f is not None:
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            f, v = float(f), float(v)
        elif (
            isinstance(v, (list, tuple))
            and v
            and all(
                isinstance(x, (int, float)) and not isinstance(x, bool)
                for x in v
            )
        ):
            f, v = float(f), [float(x) for x in v]
    if f is None:
        return None
    op = ff.operator
    if op == "eq":
        return f == v
    if op == "ne":
        return f != v
    if op == "gt":
        return f > v
    if op == "lt":
        return f < v
    if op == "gte":
        return f >= v
    if op == "lte":
        return f <= v
    if op == "contains":
        return v in f
    if op == "in":
        return f in list(v)
    if op == "nin":
        return f not in list(v)
    if op == "regex":
        return re.search(v, f) is not None
    raise AssertionError(op)


def _keeps(cfg: EventFilter, row, custom_fn) -> bool:
    for vals, col in (
        (cfg.include_operations, "op"),
        (cfg.include_databases, "db"),
        (cfg.include_collections, "tbl"),
    ):
        if vals and row[col] not in vals:
            return False
    for vals, col in (
        (cfg.exclude_operations, "op"),
        (cfg.exclude_databases, "db"),
        (cfg.exclude_collections, "tbl"),
    ):
        # ~coalesce(isin, false): a NULL column survives the exclude
        if vals and row[col] is not None and row[col] in vals:
            return False
    for ff in cfg.field_filters:
        m = _tri_match(ff, row)
        if ff.include:
            if m is not True:
                return False
        else:
            if m is True:
                return False
    if custom_fn is not None and not custom_fn(row):
        return False
    return True


# -- config generator ----------------------------------------------------------

CUSTOM = [
    # (jq source, js source, reference fn) — truthiness-safe booleans
    (".seq > 30", "row.seq > 30", lambda row: row["seq"] > 30),
    (
        '.op == "update"',
        "row.op === 'update'",
        lambda row: row["op"] == "update",
    ),
    (
        '(.key.repo == "r1") and (.seq <= 45)',
        "row.key.repo === 'r1' && row.seq <= 45",
        lambda row: row["key"]["repo"] == "r1" and row["seq"] <= 45,
    ),
]


def _gen_field_filter(rng: random.Random) -> FieldFilter:
    kind = rng.randrange(4)
    include = rng.random() < 0.7
    if kind == 0:  # numeric doc path (typed compare through the cast)
        op = rng.choice(["eq", "ne", "gt", "lt", "gte", "lte", "in", "nin"])
        if op in ("in", "nin"):
            v = rng.sample(range(0, 10), rng.randrange(1, 4))
        else:
            v = rng.randrange(0, 10)
        return FieldFilter("price", op, v, include)
    if kind == 1:  # string doc path
        op = rng.choice(["eq", "ne", "contains", "regex", "in"])
        if op == "in":
            v = rng.sample(["", "x", "xy", "abc", "zq"], rng.randrange(1, 3))
        elif op == "regex":
            v = rng.choice(["^x", "c$", "b", "^$"])
        elif op == "contains":
            v = rng.choice(["x", "b", "q"])
        else:
            v = rng.choice(["", "x", "xy", "abc", "zq"])
        return FieldFilter("name", op, v, include)
    if kind == 2:  # canonical numeric column
        op = rng.choice(["gt", "lt", "gte", "lte", "eq", "ne"])
        return FieldFilter("seq", op, rng.randrange(0, N_ROWS), include)
    # canonical string / struct path
    fld = rng.choice(["op", "tbl", "key.repo", "db"])
    dom = {
        "op": ["insert", "update", "delete"],
        "tbl": ["t1", "t2"],
        "key.repo": ["r1", "r2"],
        "db": ["d1", "d2"],
    }[fld]
    op = rng.choice(["eq", "ne", "in", "nin"])
    if op in ("in", "nin"):
        v = rng.sample(dom, rng.randrange(1, len(dom) + 1))
    else:
        v = rng.choice(dom)
    return FieldFilter(fld, op, v, include)


def _gen_config(rng: random.Random):
    kw = {}
    if rng.random() < 0.35:
        kw["include_operations"] = rng.sample(
            ["insert", "update", "delete"], rng.randrange(1, 3)
        )
    if rng.random() < 0.3:
        kw["exclude_operations"] = [rng.choice(["insert", "delete"])]
    if rng.random() < 0.3:
        kw["include_databases"] = [rng.choice(["d1", "d2"])]
    if rng.random() < 0.3:
        kw["exclude_databases"] = [rng.choice(["d1", "d2"])]
    if rng.random() < 0.25:
        kw["include_collections"] = [rng.choice(["t1", "t2"])]
    if rng.random() < 0.25:
        kw["exclude_collections"] = [rng.choice(["t1", "t2"])]
    ffs = [_gen_field_filter(rng) for _ in range(rng.randrange(0, 4))]
    custom_fn = None
    if rng.random() < 0.4:
        jq_src, js_src, custom_fn = rng.choice(CUSTOM)
        if rng.random() < 0.5:
            kw["custom_filter"] = jq_src
        else:
            kw["custom_filter"] = js_src
            kw["custom_filter_lang"] = "javascript"
    return EventFilter(field_filters=ffs, **kw), custom_fn


@pytest.mark.parametrize("seed", [7, 14, 21, 28, 35])
def test_event_filter_differential(feed, seed):
    rows, df = feed
    rng = random.Random(seed)
    for _ in range(6):
        cfg, custom_fn = _gen_config(rng)
        assert cfg.validate() == []
        got = sorted(r["event_id"] for r in cfg.apply(df).collect())
        expect = sorted(
            row["event_id"] for row in rows if _keeps(cfg, row, custom_fn)
        )
        assert got == expect, (
            f"seed={seed} cfg={cfg!r} kept {len(got)} vs reference "
            f"{len(expect)}"
        )
