"""MongoDB Extended JSON scalar decode — the reference decodes
``$oid / $numberInt / $numberLong / $numberDouble / $date`` recursively
on the sink side (``pkg/estuary/mongo.go:140-220``). Here it is one
vectorized pandas UDF over the raw doc JSON: Arrow batches in, plain
JSON out, so downstream ``from_json`` sees ordinary scalars.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_WRAPPERS = ("$oid", "$numberInt", "$numberLong", "$numberDouble", "$date")


def _unwrap(v):
    if isinstance(v, dict):
        if len(v) == 1:
            ((k, inner),) = v.items()
            if k == "$oid":
                return str(inner)
            if k == "$numberInt":
                return int(inner)
            if k == "$numberLong":
                return int(inner)
            if k == "$numberDouble":
                return float(inner)
            if k == "$date":
                return str(inner)  # RFC3339 string; from_json parses to ts
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_unwrap(x) for x in v]
    return v


def _decode_one(s: str | None) -> str | None:
    if s is None:
        return None
    if not any(w in s for w in _WRAPPERS):  # fast path: nothing to do
        return s
    try:
        return json.dumps(_unwrap(json.loads(s)), separators=(",", ":"))
    except (json.JSONDecodeError, ValueError):
        return s


def _decode_batch(s: pd.Series) -> pd.Series:
    return s.map(_decode_one)


_udf_cache: dict = {}


def decode_extended_json(col: Column | str) -> Column:
    # pandas_udf needs an active SparkSession; build once, lazily
    if "decode" not in _udf_cache:
        _udf_cache["decode"] = pandas_udf("string")(_decode_batch)
    return _udf_cache["decode"](F.col(col) if isinstance(col, str) else col)
