"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2,
expressed Spark-first (DataFrame API, Catalyst-optimized), with a
DuckDB-equivalent oracle in ``oracle_sql()``.

The CDC operators run over a change feed synthesized *identically* in
Spark and in the oracle SQL from the driver's ``events`` table:
seq = event_id (the LSN total order), key = (repo, path, commit) derived
from (user_id, event_type), op mapped from event_type, payload = props
JSON. This keeps the driver's value-hash comparison meaningful for CDC
semantics (LWW, dedup, merge final state) without external state.

The actual stateful engine (lake-table MERGE, streaming, exactly-once)
lives in replicator_spark/ and is exercised by tests/ — `entry` runs the
flagship LWW-final-state query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Synthesized CDC feed (shared semantics with the SQL CTE below)
# ---------------------------------------------------------------------------


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism (guide §2.5).

    The corpus parquets are single files a few MB each — ONE scan split
    at the default 128 MB maxPartitionBytes — so every pre-shuffle
    stage (scan, shingling, Arrow kernels, feed derivation) of a query
    rooted there runs on one core of 32 (measured: the sf1.0 minhash
    shingle+hash stage alone was 20+ s single-task). Scale-adaptive:
    inputs that already carry >= parallelism splits pass through
    untouched, so this is a no-op on real multi-file tables; the
    round-robin shuffle it adds here moves a few MB. Call it AFTER any
    filter that must push down to the scan."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def _feed(spark: SparkSession, sf_dir: str, spread: bool = False) -> DataFrame:
    """events → canonical change feed (SURVEY §1.1 T14 normalization).

    ``spread=True`` repartitions the RAW events scan before the
    derivation (md5/concat per row): the exchange then moves the 15 MB
    source columns once and the derivation runs at full parallelism —
    spreading the derived frame instead would shuffle ~200 MB of
    derived strings AND leave the derivation single-task. Off for
    queries whose filters must reach the parquet scan (pushdown)."""
    ev = _load(spark, sf_dir, "events")
    if spread:
        ev = _spread(ev)
    return ev.select(
        F.col("event_id").alias("seq"),
        F.col("user_id"),
        F.concat(F.lit("repo-"), (F.col("user_id") % 10).cast("string")).alias("repo"),
        F.concat(
            F.lit("f"),
            F.floor(F.col("user_id") / 10).cast("long").cast("string"),
            F.lit("/"),
            F.col("event_type"),
        ).alias("path"),
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type"))),
            1,
            8,
        ).alias("commit"),
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.col("ts"),
        F.col("value"),
        F.col("props"),
    )


_FEED_CTE = """
feed AS (
  SELECT event_id AS seq,
         user_id,
         'repo-' || CAST(user_id % 10 AS VARCHAR) AS repo,
         'f' || CAST(user_id // 10 AS VARCHAR) || '/' || event_type AS path,
         substr(md5(CAST(user_id AS VARCHAR) || ':' || event_type), 1, 8) AS "commit",
         CASE WHEN event_type = 'signup' THEN 'insert'
              WHEN event_type = 'error' THEN 'delete'
              ELSE 'update' END AS op,
         ts, value, props
  FROM events
)
"""


def _lww(feed: DataFrame) -> DataFrame:
    w = Window.partitionBy("repo", "path", "commit").orderBy(F.col("seq").desc())
    return feed.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")


_LWW_CTE = """
latest AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path, "commit" ORDER BY seq DESC) AS rn
  FROM feed
)
"""

# ---------------------------------------------------------------------------
# CDC / engine queries  (SURVEY §2.2, §2.4)
# ---------------------------------------------------------------------------


def q_cdc_final_state(spark, sf_dir):
    """MERGE final state after full replay: per-key LWW, deletes removed,
    sha256(content) per row (K7 + O1; BASELINE.json invariant)."""
    out = _lww(_feed(spark, sf_dir, spread=True)).where(F.col("op") != "delete")
    return out.select(
        "repo",
        "path",
        "commit",
        F.col("seq").alias("last_seq"),
        F.sha2(F.col("props"), 256).alias("content_sha"),
    )


SQL_cdc_final_state = f"""
WITH {_FEED_CTE}, {_LWW_CTE}
SELECT repo, path, "commit", seq AS last_seq, sha256(props) AS content_sha
FROM latest WHERE rn = 1 AND op <> 'delete'
"""


def q_cdc_lww_latest(spark, sf_dir):
    """Per-key last-writer-wins winner incl. delete tombstones (O1)."""
    # NO spread here: the window exchange already parallelizes the heavy
    # stage, and a pre-derivation repartition would haul the full raw
    # rows (props included — ~200 MB uncompressed) through an extra
    # exchange for nothing (measured 3.1 → 12.3 s at sf1.0 with it)
    return _lww(_feed(spark, sf_dir)).select(
        "repo", "path", "commit", "op", F.col("seq").alias("last_seq")
    )


SQL_cdc_lww_latest = f"""
WITH {_FEED_CTE}, {_LWW_CTE}
SELECT repo, path, "commit", op, seq AS last_seq FROM latest WHERE rn = 1
"""


def q_cdc_dedup_redelivery(spark, sf_dir):
    """Exact dedup under at-least-once redelivery (O2): re-deliver every
    7th event, dedup on event id, count per op."""
    feed = _feed(spark, sf_dir).select("seq", "op")
    redelivered = feed.unionAll(feed.where(F.col("seq") % 7 == 0))
    return (
        redelivered.distinct()
        .groupBy("op")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


SQL_cdc_dedup_redelivery = f"""
WITH {_FEED_CTE},
redelivered AS (
  SELECT seq, op FROM feed
  UNION ALL SELECT seq, op FROM feed WHERE seq % 7 = 0
)
SELECT op, COUNT(*) AS n_events FROM (SELECT DISTINCT seq, op FROM redelivered) GROUP BY op
"""


def q_cdc_op_stats(spark, sf_dir):
    """EventStatistics rollup: tumbling 1-day window × op (O4)."""
    return (
        _feed(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


SQL_cdc_op_stats = f"""
WITH {_FEED_CTE}
SELECT date_trunc('day', ts) AS day, op, COUNT(*) AS n, round(SUM(value), 2) AS sum_value
FROM feed GROUP BY 1, 2
"""


def q_cdc_source_filter(spark, sf_dir):
    """Source-side include/exclude pushdown filters (S9/S10):
    op include-list, repo exclude, typed value threshold."""
    return (
        _feed(spark, sf_dir)
        .where(
            F.col("op").isin("insert", "update")
            & (F.col("repo") != "repo-3")
            & (F.col("value") > 100.0)
        )
        .select("seq", "repo", "op", "value")
    )


SQL_cdc_source_filter = f"""
WITH {_FEED_CTE}
SELECT seq, repo, op, value FROM feed
WHERE op IN ('insert', 'update') AND repo <> 'repo-3' AND value > 100.0
"""


def q_cdc_field_filter_typed(spark, sf_dir):
    """EventFilter field predicates with *typed* comparison (T2 — the
    reference string-compares; typed is our documented divergence) plus
    `contains` on the raw payload."""
    f = _feed(spark, sf_dir).withColumn(
        "k_num", F.get_json_object(F.col("props"), "$.k").cast("long")
    )
    return (
        f.where((F.col("k_num") > 50) & F.col("props").contains("8"))
        .select("seq", "repo", "k_num")
    )


SQL_cdc_field_filter_typed = f"""
WITH {_FEED_CTE}
SELECT seq, repo, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
FROM feed
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 AND props LIKE '%8%'
"""


def q_transform_shift_rename(spark, sf_dir):
    """kazaam `shift` (T3): rename/move fields — seq→id, props.k→k."""
    return (
        _feed(spark, sf_dir)
        .where(F.col("op") == "insert")
        .select(
            F.col("seq").alias("id"),
            F.get_json_object(F.col("props"), "$.k").alias("k"),
        )
    )


SQL_transform_shift_rename = f"""
WITH {_FEED_CTE}
SELECT seq AS id, json_extract_string(props, '$.k') AS k FROM feed WHERE op = 'insert'
"""


def q_transform_default_concat(spark, sf_dir):
    """kazaam `default` (T4) + `concat` (T5)."""
    return _feed(spark, sf_dir).select(
        "seq",
        F.coalesce(
            F.get_json_object(F.col("props"), "$.missing"), F.lit("default_v")
        ).alias("with_default"),
        F.concat_ws(" ", F.col("repo"), F.col("path")).alias("concat_field"),
    )


SQL_transform_default_concat = f"""
WITH {_FEED_CTE}
SELECT seq,
       COALESCE(json_extract_string(props, '$.missing'), 'default_v') AS with_default,
       repo || ' ' || path AS concat_field
FROM feed
"""


def q_transform_timestamp_ops(spark, sf_dir):
    """kazaam `timestamp` + computed-field enrichment year()/month()
    (T8/T10)."""
    return _feed(spark, sf_dir).select(
        "seq",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
    )


SQL_transform_timestamp_ops = f"""
WITH {_FEED_CTE}
SELECT seq, year(ts) AS y, month(ts) AS m, strftime(ts, '%Y-%m-%d') AS day_str FROM feed
"""


def q_transform_tiering(spark, sf_dir):
    """Chained when/otherwise enrichment — the if/elif/else amount
    tiering of multi-source-aggregation.yaml:97-106."""
    return _feed(spark, sf_dir).select(
        "seq",
        F.when(F.col("value") >= 400, F.lit("high"))
        .when(F.col("value") >= 150, F.lit("mid"))
        .otherwise(F.lit("low"))
        .alias("tier"),
    )


SQL_transform_tiering = f"""
WITH {_FEED_CTE}
SELECT seq, CASE WHEN value >= 400 THEN 'high' WHEN value >= 150 THEN 'mid'
                 ELSE 'low' END AS tier
FROM feed
"""


def q_lookup_join_enrich(spark, sf_dir):
    """Lookup join (O6 — the Mongo fallback re-fetch as a broadcast
    join): enrich the change feed with a dimension, then roll up."""
    feed = _feed(spark, sf_dir)
    cust = _load(spark, sf_dir, "customer")
    return (
        feed.join(
            F.broadcast(cust), feed["user_id"] == cust["c_custkey"], "inner"
        )
        .groupBy("repo", F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_lookup_join_enrich = f"""
WITH {_FEED_CTE}
SELECT repo, c_mktsegment AS segment, COUNT(*) AS n
FROM feed JOIN customer ON feed.user_id = customer.c_custkey
GROUP BY 1, 2
"""


def q_metrics_rollup(spark, sf_dir):
    """Per-batch applied-counter rollup (O3): batch = seq % 8."""
    return (
        _feed(spark, sf_dir)
        .groupBy((F.col("seq") % 8).alias("batch_id"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("repo").alias("n_repos"),
        )
    )


SQL_metrics_rollup = f"""
WITH {_FEED_CTE}
SELECT seq % 8 AS batch_id, op, COUNT(*) AS n, COUNT(DISTINCT repo) AS n_repos
FROM feed GROUP BY 1, 2
"""

def q_decimal_generated_column(spark, sf_dir):
    """Decimal arithmetic parity (§2.5; the reference fixture uses
    DECIMAL(10,2) columns and a generated ``quantity*unit_price`` column
    — ``examples/init-scripts/mysql-source-init.sql:13,27,61``): cast to
    decimal, compute the generated column, roll up per group."""
    li = _load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    one = F.lit("1.00").cast("decimal(12,2)")
    return (
        li.where(F.col("l_shipdate") < "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(price).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(price * (one - disc)).cast("double"), 2).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


SQL_decimal_generated_column = """
SELECT l_returnflag, l_linestatus,
       round(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST('1.00' AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2) AS sum_disc_price,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_transform_engine_chain(spark, sf_dir):
    """The real rule engine end-to-end (T1–T9): a 4-rule priority chain
    — kazaam extract+delete, a conditional set (typed gte), a default
    backfill, and a deterministic uuid — compiled to Column projections
    (``pkg/transform/engine.go:69-167``)."""
    from replicator_spark.transform import Action, Condition, Rule, TransformEngine

    feed = _feed(spark, sf_dir, spread=True).withColumn(
        "doc", F.from_json("props", "k long")
    )
    rules = [
        Rule(
            "hoist",
            priority=1,
            actions=[
                Action("extract", {"field": "doc", "subfields": ["k"]}),
                Action("delete", {"fields": ["props", "user_id"]}),
            ],
        ),
        Rule(
            "tier-high",
            priority=2,
            conditions=[Condition("k", "gte", 50)],
            actions=[Action("set", {"tier": "high"})],
        ),
        Rule("tier-default", priority=3, actions=[Action("default", {"tier": "low"})]),
        Rule(
            "row-id",
            priority=4,
            actions=[
                Action(
                    "uuid",
                    {
                        "field": "row_id",
                        "from": ["repo", "path", "commit"],
                        "deterministic": True,
                    },
                )
            ],
        ),
    ]
    out, _ = TransformEngine(rules, protected=("seq", "op")).apply(feed)
    return out.select("seq", "repo", "k", "tier", "row_id")


SQL_transform_engine_chain = f"""
WITH {_FEED_CTE}
SELECT seq, repo,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
            THEN 'high' ELSE 'low' END AS tier,
       sha256(repo || '|' || path || '|' || "commit") AS row_id
FROM feed
"""


def q_transform_jq_engine(spark, sf_dir):
    """The jq transform engine (T-engines): ``pkg/transform/models.go:30,59``
    and ``pkg/config/validation.go:246`` declare ``engine: "jq"`` but the
    reference never links an interpreter. ``functions/jq.py`` compiles a
    jq-subset program ONCE, driver-side, into native Column expressions —
    select() becomes a WHERE, the final object the projection; execution
    is whole-stage-codegen JVM work (plan pinned Python-free). This
    program exercises pipes, select, if/elif/else, float division +
    floor, split/index (incl. negative), tonumber, interpolation,
    ascii_downcase, gsub, startswith, and/or."""
    from replicator_spark.functions.jq import jq_transform

    orders = _load(spark, sf_dir, "orders")
    program = r"""
    select(.o_totalprice > 100000)
    | {o_orderkey,
       cust: .o_custkey,
       status: (if .o_orderstatus == "F" then "final"
                elif .o_orderstatus == "O" then "open"
                else "other" end),
       bucket: ((.o_totalprice / 500) | floor),
       prio_code: (.o_orderpriority | split("-") | .[0] | tonumber),
       prio_name: (.o_orderpriority | split("-") | .[-1]
                   | ascii_downcase | gsub(" "; "_")),
       tag: "ord-\(.o_orderkey)",
       urgent: ((.o_orderpriority | startswith("1"))
                or (.o_orderpriority | startswith("2")))}
    """
    return jq_transform(orders, program)


SQL_transform_jq_engine = """
SELECT o_orderkey,
       o_custkey AS cust,
       CASE WHEN o_orderstatus = 'F' THEN 'final'
            WHEN o_orderstatus = 'O' THEN 'open'
            ELSE 'other' END AS status,
       CAST(FLOOR(o_totalprice / 500) AS BIGINT) AS bucket,
       CAST(string_split(o_orderpriority, '-')[1] AS DOUBLE) AS prio_code,
       replace(lower(string_split(o_orderpriority, '-')[-1]), ' ', '_') AS prio_name,
       'ord-' || CAST(o_orderkey AS VARCHAR) AS tag,
       (starts_with(o_orderpriority, '1') OR starts_with(o_orderpriority, '2')) AS urgent
FROM orders
WHERE o_totalprice > 100000
"""


def q_transform_lua_engine(spark, sf_dir):
    """The Lua transform engine (T-engines): ``pkg/transform/models.go:30,59``
    accepts ``engine: "lua"`` but the reference never links an interpreter
    (no gopher-lua in the tree). ``functions/lua.py`` compiles the Lua-5.4
    expression subset ONCE, driver-side, into native Column expressions.
    This program exercises ``..`` concat with tostring, ``//`` floor
    division, Lua's FLOORED ``%`` on negative dividends (sign follows the
    divisor — not SQL's truncated remainder), the ``cond and x or y``
    idiom (value semantics), ``string.sub`` with negative indexes,
    ``string.lower``, ``#`` length, ``math.floor``, and ``~=``."""
    from replicator_spark.functions.lua import lua_transform

    cust = _load(spark, sf_dir, "customer")
    program = """
    return {
      c_custkey = row.c_custkey,
      tag = "cust-" .. row.c_custkey,
      seg = string.lower(row.c_mktsegment),
      name_tail = string.sub(row.c_name, -3),
      name_len = #row.c_name,
      cohort = row.c_custkey // 100,
      shard = (row.c_nationkey - 12) % 5,
      standing = row.c_acctbal >= 0 and "solvent" or "debt",
      bal_floor = math.floor(row.c_acctbal),
      foreign = row.c_nationkey ~= 0,
    }
    """
    return lua_transform(cust, program)


SQL_transform_lua_engine = """
SELECT c_custkey,
       'cust-' || CAST(c_custkey AS VARCHAR) AS tag,
       lower(c_mktsegment) AS seg,
       substr(c_name, length(c_name) - 2) AS name_tail,
       CAST(length(c_name) AS INTEGER) AS name_len,
       CAST(FLOOR(c_custkey / 100.0) AS BIGINT) AS cohort,
       CAST((c_nationkey - 12) - 5 * FLOOR((c_nationkey - 12) / 5.0) AS INTEGER)
         AS shard,
       CASE WHEN c_acctbal >= 0 THEN 'solvent' ELSE 'debt' END AS standing,
       CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
       c_nationkey <> 0 AS foreign
FROM customer
"""


def q_transform_js_engine(spark, sf_dir):
    """The JavaScript transform engine + CustomFilter predicate
    (T-engines / ``pkg/models/types.go:226``): the reference declares
    ``engine: "javascript"`` and a JS-expression CustomFilter but never
    links an interpreter (no goja/otto). ``functions/js.py`` compiles
    both ONCE, driver-side, to native Column expressions — the
    CustomFilter becomes one WHERE (pushed to the scan), the returned
    object the projection. Exercises template literals, strict
    ``===``/``!==``, ternary, ``Math.round`` (half-toward-+∞),
    ``Math.min``/``floor``, truncated ``%``, ``.toLowerCase``,
    ``.slice``, and ``&&`` in the predicate."""
    from replicator_spark.functions.js import compile_predicate, js_transform

    li = _load(spark, sf_dir, "lineitem")
    pred = compile_predicate(
        "row.l_quantity >= 30 && row.l_extendedprice < 60000", li.schema
    )
    program = """
    return {
      key: `${row.l_orderkey}-${row.l_linenumber}`,
      kept: row.l_returnflag !== "R",
      status: row.l_linestatus === "O" ? "open" : "final",
      disc_pct: Math.round(row.l_discount * 100),
      qty7: row.l_orderkey % 7,
      value_band: Math.min(Math.floor(row.l_extendedprice / 10000), 5),
      flag: row.l_returnflag.toLowerCase(),
      head: (row.l_returnflag + row.l_linestatus).slice(-1),
    }
    """
    return js_transform(li.where(pred), program)


SQL_transform_js_engine = """
SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS key,
       l_returnflag <> 'R' AS kept,
       CASE WHEN l_linestatus = 'O' THEN 'open' ELSE 'final' END AS status,
       CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
       CAST(l_orderkey % 7 AS DOUBLE) AS qty7,
       LEAST(FLOOR(l_extendedprice / 10000), 5.0) AS value_band,
       lower(l_returnflag) AS flag,
       substr(l_returnflag || l_linestatus, 2, 1) AS head
FROM lineitem
WHERE l_quantity >= 30 AND l_extendedprice < 60000
"""


def q_extjson_decode(spark, sf_dir):
    """Mongo Extended-JSON scalar decode (S4, ``mongo.go:140-220``):
    wrap feed values as $oid/$numberLong/$numberDouble, decode through
    the vectorized Arrow UDF, extract typed scalars back."""
    from replicator_spark.functions.extjson import decode_extended_json

    ext = F.concat(
        F.lit('{"_id":{"$oid":"'), F.col("commit"),
        F.lit('"},"n":{"$numberLong":"'), F.col("seq").cast("string"),
        F.lit('"},"v":{"$numberDouble":"'), F.col("value").cast("string"),
        F.lit('"}}'),
    )
    dec = decode_extended_json(ext)
    return (
        _feed(spark, sf_dir, spread=True)
        .where(F.col("op") == "insert")
        .select(
            "seq",
            F.get_json_object(dec, "$._id").alias("oid"),
            F.get_json_object(dec, "$.n").cast("long").alias("n"),
            F.get_json_object(dec, "$.v").cast("double").alias("v"),
        )
    )


SQL_extjson_decode = f"""
WITH {_FEED_CTE}
SELECT seq, "commit" AS oid, seq AS n, value AS v FROM feed WHERE op = 'insert'
"""


def q_filter_regex_in(spark, sf_dir):
    """EventFilter in/nin/regex predicates (S10,
    ``pkg/models/types.go:218-235``) as native Column ops — pushed into
    the parquet scan by Catalyst."""
    return (
        _feed(spark, sf_dir)
        .where(
            F.col("path").rlike(r"^f[0-4]/(click|view)$")
            & F.col("repo").isin("repo-1", "repo-5", "repo-7")
            & ~F.col("op").isin("delete")
        )
        .select("seq", "repo", "path", "op")
    )


SQL_filter_regex_in = f"""
WITH {_FEED_CTE}
SELECT seq, repo, path, op FROM feed
WHERE regexp_matches(path, '^f[0-4]/(click|view)$')
  AND repo IN ('repo-1', 'repo-5', 'repo-7')
  AND op NOT IN ('delete')
"""


def q_transform_dead_letter(spark, sf_dir):
    """Error-policy dead_letter (T12, ``pkg/transform/models.go:46-55``):
    rows failing a rule's post-transform validation are diverted to a
    dead-letter DataFrame; this query returns the surviving rows (the
    oracle reproduces the validation predicate)."""
    from replicator_spark.transform import Action, Condition, Rule, TransformEngine

    feed = _feed(spark, sf_dir, spread=True).withColumn(
        "doc", F.from_json("props", "k long")
    )
    rules = [
        Rule(
            "hoist-validate",
            priority=1,
            actions=[Action("extract", {"field": "doc", "subfields": ["k"]})],
            validate=Condition("k", "lt", 90),
            error_policy="dead_letter",
        ),
    ]
    out, dead = TransformEngine(rules, protected=("seq", "op")).apply(feed)
    assert dead is not None  # the diverted stream exists
    return out.select("seq", "repo", "k")


SQL_transform_dead_letter = f"""
WITH {_FEED_CTE}
SELECT seq, repo, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM feed
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 90
"""


def _scratch(name: str) -> str:
    import os
    import shutil

    tmp = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scratch", name)
    shutil.rmtree(tmp, ignore_errors=True)
    return tmp


def _events_change_feed(
    spark, sf_dir, with_branch_after: int | None = None, spread: bool = False
):
    """events → canonical CHANGE_SCHEMA-shaped records (the same
    derivation as ``_feed``/``_FEED_CTE``, so DuckDB can replicate it):
    doc = {lang, content[, branch]} JSON, key = (repo, path, commit).
    ``with_branch_after``: rows with seq above it additionally carry a
    ``branch`` field (the additive-evolution fixture)."""
    f = _feed(spark, sf_dir, spread=spread)
    fields = [
        F.substring(F.col("commit"), 1, 2).alias("lang"),
        F.col("props").alias("content"),
    ]
    if with_branch_after is not None:
        fields.append(
            F.when(
                F.col("seq") > with_branch_after,
                F.concat(F.lit("b"), (F.col("seq") % 5).cast("string")),
            ).alias("branch")
        )
    doc = F.when(F.col("op") == "delete", F.lit("{}")).otherwise(
        F.to_json(F.struct(*fields))
    )
    return f.select(
        F.concat(F.lit("e"), F.col("seq").cast("string")).alias("event_id"),
        "seq",
        "op",
        F.struct("repo", "path", "commit").alias("key"),
        doc.alias("doc"),
    )


def q_schema_evolution_roundtrip(spark, sf_dir):
    """Additive schema evolution end-to-end (K8 — declared-only in the
    reference, ``pkg/estuary/interface.go:239-280``): events after the
    cut-over seq carry a new ``branch`` field. Batches are seq-ranged so
    early batches genuinely lack the field; the replay runs with an
    INFERRED schema (SchemaTracker) — the tracker's pre-commit detection
    must widen mid-stream with no values lost. Oracle: LWW final state
    with the branch derivation inlined."""
    from pyspark.sql import types as T

    from replicator_spark.laketable import LakeTable
    from replicator_spark.pipeline import replay_feed

    tmp = _scratch("evo_roundtrip")
    feed_dir, root = f"{tmp}/feed", f"{tmp}/table"
    # seq IS event_id (the _feed derivation), so take the max from the
    # raw parquet — column stats answer it without running the feed's
    # md5/to_json projection over every row (r6; the branch-less
    # _events_change_feed call that only fed this agg is gone too)
    max_seq = _load(spark, sf_dir, "events").agg(F.max("event_id")).first()[0]
    cutover = max_seq // 2
    ev = _events_change_feed(
        spark, sf_dir, with_branch_after=cutover, spread=True
    )
    width = max_seq // 4 + 1
    ev.withColumn(
        "batch_id", (F.col("seq") / width).cast("int")
    ).write.partitionBy("batch_id").parquet(feed_dir)

    table = LakeTable(spark, root)
    table.create(
        T.StructType(
            [
                T.StructField("repo", T.StringType()),
                T.StructField("path", T.StringType()),
                T.StructField("commit", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("content", T.StringType()),
            ]
        ),
        num_buckets=8,
    )
    # payload_schema=None → SchemaTracker path: infer once, widen on the
    # pre-commit evolution signal
    replay_feed(spark, feed_dir, table, mode="mor", write_metrics=False)
    out = table.read()
    assert "branch" in out.columns  # schema actually widened
    return out.select(
        "repo", "path", "commit", "lang", "branch",
        F.sha2("content", 256).alias("content_sha"),
    )


SQL_schema_evolution_roundtrip = f"""
WITH {_FEED_CTE}, {_LWW_CTE}
SELECT repo, path, "commit",
       substr("commit", 1, 2) AS lang,
       CASE WHEN seq > (SELECT MAX(event_id) // 2 FROM events)
            THEN 'b' || CAST(seq % 5 AS VARCHAR) END AS branch,
       sha256(props) AS content_sha
FROM latest WHERE rn = 1 AND op <> 'delete'
"""


def q_schema_type_conflict_roundtrip(spark, sf_dir):
    """TYPE-conflict schema evolution end-to-end (VERDICT r02 missing
    #1): the ``stars`` payload field is an int for the first half of
    the feed and a string after the cut-over. The tracker infers
    LongType from the head sample; the mid-stream strings trip the
    typed-vs-string-shadow parse-delta detection, the field widens to
    string via the same pre-commit abort-and-retry as additive
    evolution, and the already-written long-typed files are resolved
    through per-file schema ids (grouped scan + cast) — NOTHING is
    silently nulled. The reference never hits this because payloads
    stay opaque bytes (``pkg/events/events.go:27``); we parse, so we
    own it. Oracle: LWW final state with stars rendered as text on
    both sides of the cut."""
    from pyspark.sql import types as T

    from replicator_spark.laketable import LakeTable
    from replicator_spark.pipeline import replay_feed

    tmp = _scratch("type_conflict")
    feed_dir, root = f"{tmp}/feed", f"{tmp}/table"
    f = _feed(spark, sf_dir, spread=True)
    # seq = event_id → parquet column stats answer the max directly (r6)
    max_seq = _load(spark, sf_dir, "events").agg(F.max("event_id")).first()[0]
    cut = max_seq // 2
    base_fields = [
        F.substring(F.col("commit"), 1, 2).alias("lang"),
        F.col("props").alias("content"),
    ]
    doc = (
        F.when(F.col("op") == "delete", F.lit("{}"))
        .when(
            F.col("seq") <= cut,
            F.to_json(F.struct(*base_fields, (F.col("seq") % 100).alias("stars"))),
        )
        .otherwise(
            F.to_json(
                F.struct(
                    *base_fields,
                    F.concat(F.lit("s"), (F.col("seq") % 100).cast("string")).alias(
                        "stars"
                    ),
                )
            )
        )
    )
    ev = f.select(
        F.concat(F.lit("e"), F.col("seq").cast("string")).alias("event_id"),
        "seq",
        "op",
        F.struct("repo", "path", "commit").alias("key"),
        doc.alias("doc"),
    )
    width = max_seq // 4 + 1
    ev.withColumn(
        "batch_id", (F.col("seq") / width).cast("int")
    ).write.partitionBy("batch_id").parquet(feed_dir)

    table = LakeTable(spark, root)
    table.create(
        T.StructType(
            [
                T.StructField("repo", T.StringType()),
                T.StructField("path", T.StringType()),
                T.StructField("commit", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("content", T.StringType()),
            ]
        ),
        num_buckets=8,
    )
    replay_feed(spark, feed_dir, table, mode="mor", write_metrics=False)
    out = table.read()
    stars_t = {fl.name: fl.dataType for fl in out.schema.fields}["stars"]
    assert stars_t == T.StringType(), stars_t  # type actually widened
    return out.select(
        "repo", "path", "commit", "lang", "stars",
        F.sha2("content", 256).alias("content_sha"),
    )


SQL_schema_type_conflict_roundtrip = f"""
WITH {_FEED_CTE}, {_LWW_CTE}
SELECT repo, path, "commit",
       substr("commit", 1, 2) AS lang,
       CASE WHEN seq > (SELECT MAX(event_id) // 2 FROM events)
            THEN 's' || CAST(seq % 100 AS VARCHAR)
            ELSE CAST(seq % 100 AS VARCHAR) END AS stars,
       sha256(props) AS content_sha
FROM latest WHERE rn = 1 AND op <> 'delete'
"""


def q_cdc_incremental_read(spark, sf_dir):
    """The lake table as a CDC *source* (LakeTable.read_changes): after
    replaying the first half of the feed, capture that version; after
    the rest, read the changes since it — upserts + tombstones whose
    ``_last_seq`` exceeds the base version's max applied seq. Oracle:
    LWW winners of the full feed restricted to seq above the first
    half's max."""
    from pyspark.sql import types as T

    from replicator_spark.laketable import LakeTable
    from replicator_spark.pipeline import replay_feed

    tmp = _scratch("incr_read")
    feed_dir, root = f"{tmp}/feed", f"{tmp}/table"
    ev = _events_change_feed(spark, sf_dir, spread=True)
    # seq = event_id → parquet column stats answer the max directly (r6)
    max_seq = _load(spark, sf_dir, "events").agg(F.max("event_id")).first()[0]
    width = max_seq // 4 + 1
    ev.withColumn(
        "batch_id", (F.col("seq") / width).cast("int")
    ).write.partitionBy("batch_id").parquet(feed_dir)
    table = LakeTable(spark, root)
    table.create(
        T.StructType(
            [
                T.StructField("repo", T.StringType()),
                T.StructField("path", T.StringType()),
                T.StructField("commit", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("content", T.StringType()),
            ]
        ),
        num_buckets=8,
    )
    schema = T.StructType(
        [T.StructField("lang", T.StringType()), T.StructField("content", T.StringType())]
    )
    replay_feed(spark, feed_dir, table, payload_schema=schema, mode="mor",
                batches=[0, 1], write_metrics=False)
    v_mid = table._snap().version
    replay_feed(spark, feed_dir, table, payload_schema=schema, mode="mor",
                batches=[2, 3], write_metrics=False)
    ch = table.read_changes(v_mid)
    return ch.select(
        "repo", "path", "commit", "lang",
        F.sha2("content", 256).alias("content_sha"),
        F.col("_last_seq").alias("last_seq"),
        F.col("_deleted").alias("deleted"),
    )


SQL_cdc_incremental_read = f"""
WITH {_FEED_CTE}, {_LWW_CTE},
cut AS (
  SELECT MAX(seq) AS floor_seq FROM feed
  WHERE seq < 2 * ((SELECT MAX(event_id) FROM events) // 4 + 1)
)
SELECT repo, path, "commit",
       CASE WHEN op <> 'delete' THEN substr("commit", 1, 2) END AS lang,
       CASE WHEN op <> 'delete' THEN sha256(props) END AS content_sha,
       seq AS last_seq,
       (op = 'delete') AS deleted
FROM latest, cut
WHERE rn = 1 AND seq > cut.floor_seq
"""


def q_cdc_event_filter(spark, sf_dir):
    """The reference EventFilter struct (``pkg/models/types.go:218-236``
    — declared, never evaluated upstream) executed end-to-end: operation
    include list + a FieldFilter regex on a doc-JSON path + a
    custom_filter jq boolean (documented divergence: jq, not JS), all
    ANDed into one pushdown-friendly predicate on the RAW canonical
    feed (filters.EventFilter)."""
    from replicator_spark.filters import EventFilter, FieldFilter

    # spread=True is a no-op on real multi-split scans, so the
    # EventFilter pushdown contract holds at scale; on the 15 MB
    # single-split bench scan (where pushdown saves nothing) it frees
    # the other 31 cores for the doc-JSON construction the filter reads
    ev = _events_change_feed(spark, sf_dir, spread=True)
    ef = EventFilter(
        include_operations=["insert", "update"],
        field_filters=[FieldFilter("lang", "regex", "^[0-9]")],
        custom_filter="(.seq % 3) != 2",
    )
    return ef.apply(ev).select(
        "seq", "op",
        F.col("key.repo").alias("repo"),
        F.col("key.path").alias("path"),
        F.col("key.commit").alias("commit"),
        F.get_json_object("doc", "$.lang").alias("lang"),
    )


SQL_cdc_event_filter = f"""
WITH {_FEED_CTE}
SELECT seq, op, repo, path, "commit", substr("commit", 1, 2) AS lang
FROM feed
WHERE op IN ('insert', 'update')
  AND regexp_matches(substr("commit", 1, 2), '^[0-9]')
  AND seq % 3 <> 2
"""


def q_cdc_point_lookup(spark, sf_dir):
    """Point read by primary key (LakeTable.lookup): the reference
    applies per-key upserts against PK-indexed stores (MySQL/Mongo point
    ops); the lake-table analogue of indexed access is hash-bucket
    routing — ``bucket_of`` recomputes ``pmod(xxhash64(repo), n)``
    driver-side in pure Python (pinned bit-equal to ``F.xxhash64``), so
    the scan touches exactly ONE bucket's files (base + unresolved mor
    deltas) before the LWW resolve. Replays the feed mor with
    compaction disabled, then looks up three repos landing in distinct
    buckets. Oracle: full-feed LWW winners for those repos."""
    from pyspark.sql import types as T

    from replicator_spark.laketable import LakeTable
    from replicator_spark.pipeline import replay_feed

    tmp = _scratch("point_lookup")
    feed_dir, root = f"{tmp}/feed", f"{tmp}/table"
    ev = _events_change_feed(spark, sf_dir, spread=True)
    # seq = event_id → parquet column stats answer the max directly (r6)
    max_seq = _load(spark, sf_dir, "events").agg(F.max("event_id")).first()[0]
    width = max_seq // 4 + 1
    ev.withColumn(
        "batch_id", (F.col("seq") / width).cast("int")
    ).write.partitionBy("batch_id").parquet(feed_dir)
    table = LakeTable(spark, root)
    table.create(
        T.StructType(
            [
                T.StructField("repo", T.StringType()),
                T.StructField("path", T.StringType()),
                T.StructField("commit", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("content", T.StringType()),
            ]
        ),
        num_buckets=8,
    )
    schema = T.StructType(
        [T.StructField("lang", T.StringType()), T.StructField("content", T.StringType())]
    )
    replay_feed(spark, feed_dir, table, payload_schema=schema, mode="mor",
                compact_after_deltas=100, write_metrics=False)
    out = None
    for repo in ("repo-1", "repo-4", "repo-7"):
        d = table.lookup(repo)
        out = d if out is None else out.unionByName(d)
    return out.select(
        "repo", "path", "commit", "lang",
        F.sha2("content", 256).alias("content_sha"),
    )


SQL_cdc_point_lookup = f"""
WITH {_FEED_CTE}, {_LWW_CTE}
SELECT repo, path, "commit", substr("commit", 1, 2) AS lang,
       sha256(props) AS content_sha
FROM latest
WHERE rn = 1 AND op <> 'delete'
  AND repo IN ('repo-1', 'repo-4', 'repo-7')
"""


def q_cdc_op_stats_streaming(spark, sf_dir):
    """O4's Structured Streaming form: tumbling 1-hour event-time
    windows × op with a 10-minute watermark, run as a real streaming
    query (readStream → withWatermark → window agg → append sink). In
    append mode a window is emitted only once the watermark passes its
    end, so the trailing windows (within the watermark of max event
    time) stay open — the oracle reproduces that emission rule."""
    from replicator_spark.streaming import run_stats_stream

    tmp = _scratch("op_stats_stream")
    feed_dir, out_dir, ckpt = f"{tmp}/feed", f"{tmp}/out", f"{tmp}/ckpt"
    f = _feed(spark, sf_dir, spread=True)
    ev = f.select(
        F.concat(F.lit("e"), F.col("seq").cast("string")).alias("event_id"),
        "seq",
        "op",
        "ts",
        F.lit(None).cast("string").alias("db"),
        F.lit(None).cast("string").alias("tbl"),
        F.struct("repo", "path", "commit").alias("key"),
        F.lit("{}").alias("doc"),
        F.lit(None).cast("string").alias("old"),
        F.lit(None).cast("map<string,string>").alias("meta"),
        F.lit(0).alias("batch_id"),
    )
    ev.write.parquet(feed_dir)
    q = run_stats_stream(
        spark, feed_dir, out_dir, ckpt,
        window="1 hour", watermark="10 minutes", max_files_per_trigger=100000,
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).select("window_start", "op", "n_events")


SQL_cdc_op_stats_streaming = f"""
WITH {_FEED_CTE},
w AS (
  SELECT date_trunc('hour', ts) AS window_start, op, COUNT(*) AS n_events
  FROM feed GROUP BY 1, 2
),
m AS (SELECT MAX(ts) AS mx FROM feed)
SELECT w.window_start, w.op, w.n_events
FROM w, m
WHERE w.window_start + INTERVAL 1 HOUR <= m.mx - INTERVAL 10 MINUTE
"""


def q_source_mysql_normalize(spark, sf_dir):
    """MySQL row-event decode (S2/S6): positional JSON-array rows (the
    reference loses column names — ``mysql_stream.go:401-415``) →
    named payload doc via the declared schema."""
    from replicator_spark.sources.normalize import from_mysql_rows

    raw = _feed(spark, sf_dir, spread=True).select(
        "seq",
        "op",
        F.to_json(
            F.array(
                F.col("user_id").cast("string"),
                F.col("path"),
                F.col("value").cast("string"),
            )
        ).alias("row_json"),
    )
    out = from_mysql_rows(raw, ["uid", "fpath", "val"])
    # ONE from_json instead of three get_json_object calls — and the
    # parsed struct lands as an attribute first (3 field references
    # block CollapseProject), otherwise Catalyst splits it back into
    # three per-field parses (r6; values identical: string fields +
    # the same casts)
    parsed = out.select(
        "seq",
        "op",
        F.from_json("doc", "uid string, fpath string, val string").alias("_d"),
    )
    return parsed.select(
        "seq",
        "op",
        F.col("_d.uid").cast("long").alias("uid"),
        F.col("_d.fpath").alias("fpath"),
        F.col("_d.val").cast("double").alias("val"),
    )


SQL_source_mysql_normalize = f"""
WITH {_FEED_CTE}
SELECT seq, op, user_id AS uid, path AS fpath, value AS val FROM feed
"""


def q_source_pg_normalize(spark, sf_dir):
    """PG tuple decode (S6): synthetic ``col_N`` text tuples →
    real-named doc (``postgresql_stream.go:506-522``)."""
    from replicator_spark.sources.normalize import from_pg_tuples

    raw = _feed(spark, sf_dir, spread=True).select(
        "seq",
        F.create_map(
            F.lit("col_0"), F.col("user_id").cast("string"),
            F.lit("col_1"), F.col("repo"),
        ).alias("tuple"),
    )
    out = from_pg_tuples(raw, rename={"col_0": "uid", "col_1": "repo_name"})
    parsed = out.select(
        "seq", F.from_json("doc", "uid string, repo_name string").alias("_d")
    )
    return parsed.select(
        "seq",
        F.col("_d.uid").cast("long").alias("uid"),
        F.col("_d.repo_name").alias("repo_name"),
    )


SQL_source_pg_normalize = f"""
WITH {_FEED_CTE}
SELECT seq, user_id AS uid, repo AS repo_name FROM feed
"""


def q_source_kafka_normalize(spark, sf_dir):
    """Kafka message normalize (S7): JSON value with optional action/
    schema/collection keys; reference defaults — action→insert,
    schema→config db, collection→topic (``kafka_stream.go:382-414``)."""
    from replicator_spark.sources.normalize import from_kafka_messages

    # half the messages carry explicit routing keys; half rely on defaults
    value = F.when(
        F.col("user_id") % 2 == 0,
        F.concat(
            F.lit('{"action":"'), F.col("op"),
            F.lit('","schema":"appdb","collection":"'), F.col("repo"),
            F.lit('","data":"payload"}'),
        ),
    ).otherwise(F.lit('{"k":1}'))
    raw = _feed(spark, sf_dir, spread=True).select(
        "seq", F.concat(F.lit("topic-"), F.col("repo")).alias("topic"), value.alias("value")
    )
    out = from_kafka_messages(raw, default_db="srcdb")
    return out.select("seq", "op", "db", "tbl")


SQL_source_kafka_normalize = f"""
WITH {_FEED_CTE}
SELECT seq,
       CASE WHEN user_id % 2 = 0 THEN op ELSE 'insert' END AS op,
       CASE WHEN user_id % 2 = 0 THEN 'appdb' ELSE 'srcdb' END AS db,
       CASE WHEN user_id % 2 = 0 THEN repo ELSE 'topic-' || repo END AS tbl
FROM feed
"""


def q_source_cosmos_normalize(spark, sf_dir):
    """Cosmos change-feed normalize (S8): continuation-token high-water
    scan over ``_ts`` + recency-based op-type inference + op filters
    (``cosmosdb.go:276-324,373-421``). Documents wrap the feed's commit/
    value with a ``_ts`` metadata field; the newest half of the window
    infers as insert, the oldest quarter falls below the token."""
    from replicator_spark.sources.normalize import from_cosmos_documents

    feed = _feed(spark, sf_dir, spread=True)
    docs = feed.select(
        "seq",
        F.to_json(
            F.struct(
                F.col("commit").alias("id"),
                F.unix_timestamp("ts").alias("_ts"),
                F.col("value").alias("v"),
            )
        ).alias("doc"),
    )
    mn, mx = feed.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    out = from_cosmos_documents(
        docs,
        db="appdb",
        container="docs",
        now_ts=mx,
        high_water_ts=mn + (mx - mn) // 4,
        recency_window_s=(mx - mn) // 2,
    )
    parsed = out.select(
        "seq",
        "op",
        "db",
        "tbl",
        F.col("_ts"),
        F.from_json("doc", "id string, v string").alias("_d"),
    )
    return parsed.select(
        "seq",
        "op",
        "db",
        "tbl",
        F.col("_d.id").alias("id"),
        F.col("_ts").alias("ts_epoch"),
        F.round(F.col("_d.v").cast("double"), 2).alias("v"),
    )


SQL_source_cosmos_normalize = f"""
WITH {_FEED_CTE},
e AS (SELECT seq, "commit", value,
             -- floor, not cast: Spark's unix_timestamp truncates
             -- sub-second parts while a BIGINT cast would round
             CAST(floor(epoch(ts)) AS BIGINT) AS ets FROM feed),
b AS (SELECT MAX(ets) AS mx, MIN(ets) AS mn FROM e)
SELECT seq,
       CASE WHEN b.mx - e.ets < (b.mx - b.mn) // 2 THEN 'insert'
            ELSE 'update' END AS op,
       'appdb' AS db, 'docs' AS tbl,
       e."commit" AS id, e.ets AS ts_epoch, round(e.value, 2) AS v
FROM e, b
WHERE e.ets > b.mn + (b.mx - b.mn) // 4
"""


def q_source_mongo_normalize(spark, sf_dir):
    """Mongo change-event normalize (S4): operationType mapping
    (replace→update), delete ⇒ empty doc, missing fullDocument ⇒
    tier-3 empty doc (``mongodb_stream.go:402-581``)."""
    from replicator_spark.sources.normalize import from_mongo_events

    feed = _feed(spark, sf_dir)
    raw = feed.select(
        "seq",
        F.struct("repo", "path", "commit").alias("documentKey"),
        F.when((F.col("op") == "update") & (F.col("user_id") % 2 == 0), "replace")
        .otherwise(F.col("op"))
        .alias("operationType"),
        # every 7th event arrives without its full image (fallback tier)
        F.when(F.col("user_id") % 7 == 0, F.lit(None)).otherwise(F.col("props")).alias(
            "fullDocument"
        ),
        F.lit("c1").alias("ns_coll"),
    )
    out = from_mongo_events(raw)
    return out.select("seq", "op", "tbl", "doc")


SQL_source_mongo_normalize = f"""
WITH {_FEED_CTE}
SELECT seq, op, 'c1' AS tbl,
       CASE WHEN op = 'delete' THEN '{{}}'
            WHEN user_id % 7 = 0 THEN '{{}}'
            ELSE props END AS doc
FROM feed
"""


# ---------------------------------------------------------------------------
# Training-data pipeline ops (documents / embeddings)
# ---------------------------------------------------------------------------


def q_dedup_exact_documents(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy)."""
    docs = _load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


SQL_dedup_exact_documents = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_text_token_count(spark, sf_dir):
    """Token counting: whitespace tokens, char length, and a BPE-ish
    GPT-2-pretokenizer regex count (ops.text.BPE_PRETOKEN_RE)."""
    from replicator_spark.ops.text import BPE_PRETOKEN_RE

    docs = _spread(_load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.length("text").alias("len_chars"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PRETOKEN_RE), 0)).alias(
            "bpe_pretokens"
        ),
    )


SQL_text_token_count = r"""
SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       length(text) AS len_chars,
       len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+')) AS bpe_pretokens
FROM documents
"""


def q_text_quality(spark, sf_dir):
    """Quality scoring: stopword ('the') frequency + mean token length."""
    docs = _spread(_load(spark, sf_dir, "documents"))
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_the = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("the"), F.lit(""))))
        / 3
    ).cast("long")
    mean_tok = F.round(
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / F.greatest(n_tokens, F.lit(1)),
        4,
    )
    return docs.select(
        "doc_id",
        n_the.alias("n_stopword"),
        mean_tok.alias("mean_token_len"),
    )


SQL_text_quality = r"""
SELECT doc_id,
       CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT) AS n_stopword,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / greatest(len(string_split_regex(trim(text), '\s+')), 1), 4) AS mean_token_len
FROM documents
"""


def q_lang_distribution(spark, sf_dir):
    """Language distribution rollup (lang-ID downstream aggregate)."""
    docs = _load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


SQL_lang_distribution = """
SELECT lang, COUNT(*) AS n_docs, round(AVG(n_chars), 2) AS avg_chars
FROM documents GROUP BY 1
"""


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: sha256 prefix fingerprint + length."""
    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2(F.substring(F.col("text"), 1, 64), 256).alias("prefix_fp"),
        F.length("text").alias("n"),
    )


SQL_doc_fingerprint = """
SELECT doc_id, sha256(substr(text, 1, 64)) AS prefix_fp, length(text) AS n
FROM documents
"""


def q_boilerplate_lines(spark, sf_dir):
    """Corpus-boilerplate detection (CCNet/RefinedWeb line filter): a
    line in >= 3 distinct docs is boilerplate; per-doc line counts."""
    from replicator_spark.ops.text import boilerplate_line_stats

    docs = _spread(_load(spark, sf_dir, "documents"))
    # the synthetic docs are single-line; plant deterministic line
    # breaks so the line-level operator has real lines to work on
    docs = docs.select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" table "), F.lit("\ntable ")).alias("text"),
    )
    return boilerplate_line_stats(docs, min_docs=3).select(
        "doc_id", "n_lines", F.col("n_boilerplate_lines").cast("long").alias("n_boilerplate_lines")
    )


SQL_boilerplate_lines = """
WITH lines AS (
  SELECT doc_id,
         unnest(string_split(replace(text, ' table ', chr(10) || 'table '),
                             chr(10))) AS line
  FROM documents
),
bp AS (
  SELECT line FROM (
    SELECT line, COUNT(DISTINCT doc_id) AS n FROM lines GROUP BY 1
  ) WHERE n >= 3
)
SELECT l.doc_id, COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boilerplate_lines
FROM lines l LEFT JOIN bp b ON l.line = b.line
GROUP BY 1
"""


def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test assignment by salted content hash —
    stable across runs/cluster sizes, no RNG (held-out split primitive)."""
    from replicator_spark.ops.text import hash_split

    docs = _load(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id").select("doc_id", "split")


SQL_dataset_split = """
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split-v1'), 1, 8) < 'e6666666' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split-v1'), 1, 8) < 'f3333333' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_pii_redaction(spark, sf_dir):
    """Regex PII scrubbing (emails/URLs/number runs). The corpus is
    synthetic, so deterministic PII is planted per doc, then redacted;
    the oracle replicates both steps."""
    from replicator_spark.ops.text import redact_pii

    docs = _spread(_load(spark, sf_dir, "documents"))
    planted = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 80),
            F.lit(" contact: user"), F.col("doc_id").cast("string"),
            F.lit("@example.com via https://ex.com/u/"), F.col("doc_id").cast("string"),
            F.lit(" tel 12345-678-"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    out = redact_pii(planted)
    return out.select("doc_id", F.sha2("redacted", 256).alias("redacted_sha"))


SQL_pii_redaction = """
WITH planted AS (
  SELECT doc_id,
         substr(text, 1, 80) || ' contact: user' || CAST(doc_id AS VARCHAR)
         || '@example.com via https://ex.com/u/' || CAST(doc_id AS VARCHAR)
         || ' tel 12345-678-' || CAST(doc_id AS VARCHAR) AS text
  FROM documents
)
SELECT doc_id,
       sha256(
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
             'https?://[^\\s]+', '<URL>', 'g'),
           '[0-9][0-9 \\-]{6,}[0-9]', '<NUM>', 'g')
       ) AS redacted_sha
FROM planted
"""


def q_dedup_clusters(spark, sf_dir):
    """End-stage dedup: connected components over verified near-dup
    pairs (5-gram jaccard >= 0.5 on a bounded id range) — every doc
    labeled with its cluster's canonical (minimum) id via distributed
    min-label propagation; oracle = recursive-CTE transitive closure."""
    from replicator_spark.ops.dedup_text import connected_components, ngram_jaccard_pairs

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    cands = (
        docs.select(F.col("doc_id").alias("id_a"))
        .crossJoin(docs.select(F.col("doc_id").alias("id_b")))
        .where(F.col("id_a") < F.col("id_b"))
    )
    pairs = ngram_jaccard_pairs(docs, cands, threshold=0.5)
    return connected_components(pairs, docs, "doc_id")


SQL_dedup_clusters = """
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 5)
                        for i in range(1, greatest(length(text) - 3, 2))]) AS s
  FROM documents WHERE doc_id < 60
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.5
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, root) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id < 60
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, MIN(root) AS cluster FROM reach GROUP BY 1
"""


def q_dedup_pipeline_end2end(spark, sf_dir):
    """The full dedup chain as ONE pipeline (VERDICT r02 missing #2):
    MinHash signatures → r=8 LSH banding → exact n-gram Jaccard verify
    (j ≥ 0.8) → connected components → keep_canonical. Oracle: the
    recursive-CTE transitive closure over EXACT jaccard ≥ 0.8 pairs
    from the full cross product — hash-equality therefore asserts LSH
    candidate recall 1.0 at this threshold on this corpus (per-pair
    band-collision prob at s=0.8 is 1-(1-0.8^8)^16 ≈ 0.95; the template
    corpus's near-dups sit well above 0.8, where recall ≈ 1). Corpus
    bounded to 400 docs so the DuckDB closure stays tractable; the
    Spark side is the unbounded-scale path."""
    from replicator_spark.ops.dedup_text import (
        connected_components,
        keep_canonical,
        minhash_lsh_candidates,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    cands = minhash_lsh_candidates(
        minhash_signatures(docs, num_hashes=128), bands=16
    ).select("id_a", "id_b").distinct()
    pairs = ngram_jaccard_pairs(docs, cands, threshold=0.8)
    clusters = connected_components(pairs, docs, "doc_id")
    kept = keep_canonical(docs, clusters, "doc_id")
    return kept.select("doc_id", F.sha2("text", 256).alias("text_sha"))


SQL_dedup_pipeline_end2end = """
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 5)
                        for i in range(1, greatest(length(text) - 3, 2))]) AS s
  FROM documents WHERE doc_id < 400
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.8
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, root) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id < 400
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
),
clusters AS (
  SELECT id AS doc_id, MIN(root) AS cluster FROM reach GROUP BY 1
)
SELECT d.doc_id, sha256(d.text) AS text_sha
FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
WHERE d.doc_id = c.cluster
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix C / Llama eval-dedup):
    training docs flagged by 13-word-gram collision with a benchmark
    corpus (here: docs with doc_id % 17 == 3 play the eval set). Spark
    side joins on xxhash64'd grams (8-byte shuffle rows, benchmark side
    broadcast); oracle joins the gram strings — counts agree unless
    xxhash64 collides (~2^-40 at this corpus)."""
    from replicator_spark.ops.text import benchmark_ngram_collisions

    docs = _spread(_load(spark, sf_dir, "documents"))
    bench = docs.where(F.col("doc_id") % 17 == 3)
    train = docs.where(F.col("doc_id") % 17 != 3)
    return benchmark_ngram_collisions(train, bench, n=13)


SQL_decontaminate = """
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+12], ' ')
                        for i in range(1, greatest(len(t) - 11, 1))]) AS gs
  FROM tok
),
bg AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 17 = 3
),
dg AS (
  SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 17 <> 3
),
hits AS (
  SELECT dg.doc_id, COUNT(*) AS n_collisions
  FROM dg JOIN bg USING (g) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(h.n_collisions, 0) AS n_collisions,
       COALESCE(h.n_collisions, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 17 <> 3
"""


def q_repetition_filter(spark, sf_dir):
    """Within-document repetition metrics + keep flag (the Gopher
    quality-filter family, Rae et al. 2021 A1: duplicate-line fraction
    and duplicate-line character fraction)."""
    from replicator_spark.ops.text import repetition_stats

    return repetition_stats(_spread(_load(spark, sf_dir, "documents")))


SQL_repetition_filter = """
WITH lines AS (
  SELECT doc_id, l AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents)
  WHERE length(trim(l)) > 0
),
per_line AS (
  SELECT doc_id, line, COUNT(*) AS n, length(line) AS len
  FROM lines GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(n) AS BIGINT) AS total_lines,
         CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_lines,
         CAST(SUM(n * len) AS BIGINT) AS total_chars,
         CAST(SUM(CASE WHEN n > 1 THEN n * len ELSE 0 END) AS BIGINT) AS dup_chars
  FROM per_line GROUP BY 1
)
SELECT doc_id, total_lines,
       round(CAST(dup_lines AS DOUBLE) / total_lines, 4) AS dup_line_frac,
       round(CAST(dup_chars AS DOUBLE) / total_chars, 4) AS dup_char_frac,
       (round(CAST(dup_lines AS DOUBLE) / total_lines, 4) <= 0.30
        AND round(CAST(dup_chars AS DOUBLE) / total_chars, 4) <= 0.20) AS keep
FROM per_doc
"""


def _binlog_fixture():
    """Deterministic two-segment MySQL binlog (real v4 wire bytes via
    sources.binlog.BinlogWriter) + the expected decoded rows. The
    writer is fixture machinery (like feedgen); the DECODER is what the
    oracle verifies — expected rows are derived from the event list and
    the writer's recorded log positions, never from the decoder."""
    import json as _json

    from replicator_spark.sources.binlog import BinlogWriter, TableSchema

    schema = TableSchema(
        db="appdb", table="files",
        columns=[("id", "long"), ("rev", "longlong"), ("name", "varchar")],
    )
    expected = []

    def emit(w, seg, op, img):
        seq = (seg << 32) | len(w.buf)  # rows-event end offset = log_pos
        doc = _json.dumps(
            {
                k: str(v)
                for (k, _t), v in zip(schema.columns, img)
                if v is not None
            },
            separators=(",", ":"),
        )
        expected.append((seq, op, "appdb", "files", doc))

    w1 = BinlogWriter(schema)
    for i in range(1, 41):
        name = None if i % 7 == 0 else f"f{i}.txt"
        w1.write_rows([(i, i * 10, name)])
        emit(w1, 1, "insert", (i, i * 10, name))
    # one multi-row event: both rows share the event's log_pos
    w1.write_rows([(41, 410, "f41.txt"), (42, 420, "f42.txt")])
    emit(w1, 1, "insert", (41, 410, "f41.txt"))
    emit(w1, 1, "insert", (42, 420, "f42.txt"))
    w1.xid(1)

    w2 = BinlogWriter(schema)
    for i in range(1, 21):
        before = (i, i * 10, None if i % 7 == 0 else f"f{i}.txt")
        if i % 3 == 0:
            w2.delete_rows([before])
            emit(w2, 2, "delete", before)
        else:
            after = (i, i * 10 + 1, f"g{i}.txt")
            w2.update_rows([(before, after)])
            emit(w2, 2, "update", after)
    w2.xid(2)
    return schema, [w1, w2], expected


def q_source_mysql_binlog_decode(spark, sf_dir):
    """S1/S2 at the WIRE level (r4): decode real MySQL binlog v4 bytes
    (FDE / TABLE_MAP / WRITE/UPDATE/DELETE_ROWS v2, null bitmaps,
    varchar length prefixes, two rotated segments) into the canonical
    positional-row form and normalize via from_mysql_rows. The oracle
    is the literal event list the fixture wrote — hash-equality proves
    the byte-level parse, the segment<<32|log_pos sequencing, and the
    null-column handling. Only the replication transport remains a
    sandbox stand-in."""
    from replicator_spark.sources.binlog import read_binlog_feed
    from replicator_spark.sources.normalize import from_mysql_rows

    schema, writers, _expected = _binlog_fixture()
    d = _scratch("binlog_decode")
    for i, w in enumerate(writers, start=1):
        w.save(f"{d}/binlog.{i:06d}")
    feed = read_binlog_feed(spark, d)
    return from_mysql_rows(feed, [n for n, _t in schema.columns]).select(
        "seq", "op", "db", "tbl", "doc"
    )


def _sql_source_mysql_binlog_decode() -> str:
    _schema, _writers, expected = _binlog_fixture()
    values = ",\n  ".join(
        f"({seq}, '{op}', '{db}', '{tbl}', '{doc}')"
        for seq, op, db, tbl, doc in expected
    )
    return (
        "SELECT CAST(seq AS BIGINT) AS seq, op, db, tbl, doc FROM (VALUES\n  "
        + values
        + "\n) AS t(seq, op, db, tbl, doc)"
    )


SQL_source_mysql_binlog_decode = _sql_source_mysql_binlog_decode()


def _pgoutput_fixture():
    """Deterministic recorded pgoutput stream + expected decoded rows
    (same pattern as the binlog fixture: the writer is fixture
    machinery; the decoder is what the oracle verifies)."""
    import json as _json

    from replicator_spark.sources.pgoutput import UNCHANGED, PgOutputWriter

    cols = ["id", "rev", "name"]
    w = PgOutputWriter(columns=cols)
    expected = []

    def emit(op, img, partial=False):
        doc = _json.dumps(
            {
                k: v
                for k, v in zip(cols, img)
                if v is not None and v is not UNCHANGED
            },
            separators=(",", ":"),
        )
        expected.append((w.lsn, op, "public", "files", doc, partial))

    w.begin(xid=1)
    for i in range(1, 31):
        row = (str(i), str(i * 10), None if i % 5 == 0 else f"f{i}.txt")
        w.insert(row)
        emit("insert", row)
    w.commit()
    w.begin(xid=2)
    for i in range(1, 16):
        old = (str(i), str(i * 10), None if i % 5 == 0 else f"f{i}.txt")
        if i % 3 == 0:
            w.delete(old)
            emit("delete", old)
        elif i % 4 == 1:
            # update not touching the (TOASTed) name column: the
            # walsender sends 'u' → column absent + partial=True
            new = (str(i), str(i * 10 + 1), UNCHANGED)
            w.update(new, old=old)
            emit("update", new, partial=True)
        else:
            new = (str(i), str(i * 10 + 1), f"g{i}.txt")
            w.update(new, old=old)
            emit("update", new)
    w.commit()
    return cols, w, expected


def q_source_pg_wal_decode(spark, sf_dir):
    """S5/S6 at the WIRE level (r4): decode a recorded pgoutput logical
    replication stream (Relation/Begin/Insert/Update/Delete/Commit
    messages inside XLogData frames) and normalize via from_pg_tuples —
    with the REAL column names recovered from the Relation message
    (the reference's pglogrepl path loses them to col_N synthetics).
    Unchanged-TOAST ('u') columns decode as ABSENT with partial=True
    (ADVICE r04) — the flag that routes them to the partial-update
    merge. Oracle = the literal event list the fixture wrote; seq is
    the frame LSN. Only the walsender transport remains a stand-in."""
    from replicator_spark.sources.normalize import from_pg_tuples
    from replicator_spark.sources.pgoutput import read_pgoutput_feed

    cols, w, _expected = _pgoutput_fixture()
    d = _scratch("pg_wal_decode")
    w.save(f"{d}/seg.000001")
    feed = read_pgoutput_feed(spark, d)
    # identity rename → struct-shaped doc (deterministic key order,
    # null columns omitted like the canonical convention)
    return from_pg_tuples(feed, rename={c: c for c in cols}).select(
        "seq", "op", "db", "tbl", "doc", "partial"
    )


def _sql_source_pg_wal_decode() -> str:
    _cols, _w, expected = _pgoutput_fixture()
    values = ",\n  ".join(
        f"({seq}, '{op}', '{db}', '{tbl}', '{doc}', {str(partial).upper()})"
        for seq, op, db, tbl, doc, partial in expected
    )
    return (
        "SELECT CAST(seq AS BIGINT) AS seq, op, db, tbl, doc,"
        " partial FROM (VALUES\n  "
        + values
        + "\n) AS t(seq, op, db, tbl, doc, partial)"
    )


SQL_source_pg_wal_decode = _sql_source_pg_wal_decode()


def _changestream_fixture():
    """Deterministic recorded Mongo change-stream segment (real BSON
    bytes via sources.bson_wire.ChangeStreamWriter) + expected decoded
    rows.  Same contract as the binlog/pgoutput fixtures: the writer is
    fixture machinery; the DECODER is what the oracle verifies —
    expected rows are derived from the event list and the writer's
    clusterTime contract, never from the decoder."""
    import json as _json

    from replicator_spark.sources.bson_wire import ChangeStreamWriter, ObjectId

    w = ChangeStreamWriter(db="appdb", coll="files")
    expected = []
    T0 = 1_700_000_000

    def _j(v):  # event-list value → Extended-JSON-able (fixture-side)
        if isinstance(v, ObjectId):
            return {"$oid": v.hex}
        if isinstance(v, dict):
            return {k: _j(x) for k, x in v.items()}
        if isinstance(v, list):
            return [_j(x) for x in v]
        return v

    def emit(op, key, doc):
        seq = (T0 << 32) | (len(expected) + 1)  # writer clusterTime law
        expected.append(
            (
                seq,
                op,
                "files",
                _json.dumps(_j(key), separators=(",", ":")),
                "{}" if doc is None
                else _json.dumps(_j(doc), separators=(",", ":")),
            )
        )

    for i in range(1, 26):
        key = {"_id": ObjectId.from_int(i)}
        doc = {
            "_id": ObjectId.from_int(i),
            "rev": i,
            "name": None if i % 5 == 0 else f"f{i}.txt",
            "score": i * 0.5,
            "flag": i % 2 == 0,
            "tags": ["a", f"t{i}"],
            "meta": {"depth": 1, "big": 2**40 + i},
        }
        w.insert(key, doc)
        emit("insert", key, doc)
    for i in range(1, 13):
        key = {"_id": ObjectId.from_int(i)}
        if i % 4 == 0:
            # updateLookup miss: no fullDocument → tier-3 empty doc
            w.update(key, None, updated={"rev": i * 100})
            emit("update", key, None)
        else:
            doc = {"_id": ObjectId.from_int(i), "rev": i * 100}
            w.update(key, doc, updated={"rev": i * 100})
            emit("update", key, doc)
    for i in (13, 14):
        key = {"_id": ObjectId.from_int(i)}
        doc = {"_id": ObjectId.from_int(i), "rev": -i}
        w.replace(key, doc)
        emit("update", key, doc)  # canonical: replace → update
    for i in range(15, 22, 3):
        key = {"_id": ObjectId.from_int(i)}
        w.delete(key)
        emit("delete", key, None)
    return w, expected


def q_source_mongo_changestream_decode(spark, sf_dir):
    """S3/S4 at the WIRE level (r4): decode a recorded Mongo
    change-stream segment — real BSON documents per the public spec
    (int32/int64/double/string/bool/null/ObjectId/timestamp, nested
    docs + arrays) — and normalize via from_mongo_events (replace →
    update, delete → '{{}}', updateLookup-miss → tier-3 empty doc).
    Oracle = the literal event list the fixture wrote; seq is the
    clusterTime ``(t<<32)|i``, the oplog's native total order.  Only
    the command transport (hello/getMore) remains a sandbox stand-in.
    Ref: pkg/streams/mongodb_stream.go:306-399,500-581."""
    from replicator_spark.sources.bson_wire import read_changestream_feed
    from replicator_spark.sources.normalize import from_mongo_events

    w, _expected = _changestream_fixture()
    d = _scratch("changestream_decode")
    w.save(f"{d}/seg.000001")
    feed = read_changestream_feed(spark, d)
    return from_mongo_events(feed).select("seq", "op", "tbl", "key", "doc")


def _sql_source_mongo_changestream_decode() -> str:
    _w, expected = _changestream_fixture()
    values = ",\n  ".join(
        f"({seq}, '{op}', '{tbl}', '{key}', '{doc}')"
        for seq, op, tbl, key, doc in expected
    )
    return (
        "SELECT CAST(seq AS BIGINT) AS seq, op, tbl, key, doc FROM (VALUES\n  "
        + values
        + "\n) AS t(seq, op, tbl, key, doc)"
    )


SQL_source_mongo_changestream_decode = _sql_source_mongo_changestream_decode()


def _kafka_segment_fixture():
    """Deterministic recorded Kafka log segments (real RecordBatch v2
    bytes via sources.kafka_wire.KafkaSegmentWriter) + expected
    normalized rows.  Expected rows are derived from the message list
    and the segment-offset law (offsets continue across batches and
    segments), never from the decoder.  Tombstones and non-JSON
    payloads are written but expected ABSENT (the reference
    log-and-skips them, kafka_stream.go:393-397)."""
    import json as _json

    from replicator_spark.sources.kafka_wire import KafkaSegmentWriter

    expected = []  # (seq, op, db, tbl, doc)
    offset = 0
    segments = []

    def batch(w, msgs):
        nonlocal offset
        recs = []
        for m in msgs:
            if m is None:  # tombstone
                recs.append((str(offset).encode(), None))
            elif isinstance(m, str):  # raw non-JSON payload
                recs.append((str(offset).encode(), m.encode()))
            else:
                data = _json.dumps(m["row"], separators=(",", ":"))
                payload = {
                    k: v
                    for k, v in (
                        ("action", m.get("action")),
                        ("schema", m.get("schema")),
                        ("collection", m.get("collection")),
                        ("data", data),
                    )
                    if v is not None
                }
                recs.append(
                    (str(offset).encode(),
                     _json.dumps(payload, separators=(",", ":")).encode())
                )
                expected.append(
                    (
                        offset,
                        m.get("action", "insert"),
                        m.get("schema", "srcdb"),
                        m.get("collection", "files-topic"),
                        data,
                    )
                )
            offset += 1
        w.append_batch(recs)

    w1 = KafkaSegmentWriter(base_offset=0)
    batch(
        w1,
        [
            {"action": "insert", "schema": "appdb", "collection": "files",
             "row": {"id": i, "rev": i * 10, "name": f"f{i}.txt"}}
            for i in range(1, 21)
        ],
    )
    batch(
        w1,
        # defaulted fields: action→insert, schema→srcdb, collection→topic
        [{"row": {"id": 100 + i, "rev": i}} for i in range(1, 6)]
        + [None, "not json"],  # tombstone + junk: dropped
    )
    segments.append(w1)
    w2 = KafkaSegmentWriter(base_offset=offset)
    batch(
        w2,
        [
            {"action": "update" if i % 3 else "delete", "schema": "appdb",
             "collection": "files", "row": {"id": i, "rev": i * 10 + 1}}
            for i in range(1, 13)
        ],
    )
    segments.append(w2)
    return segments, expected


def q_source_kafka_wire_decode(spark, sf_dir):
    """S7 at the WIRE level (r4): decode recorded Kafka log segments —
    real RecordBatch v2 bytes (61-byte batch header, CRC32C verified,
    zigzag-varint records, null keys/values, offsets continuing across
    batches and segment rolls) — and normalize via from_kafka_messages
    (action/schema/collection defaults; tombstones and non-JSON
    payloads log-and-skipped like the reference).  Oracle = the literal
    message list the fixture wrote; seq is the native partition offset.
    Only the group-join/fetch RPC transport remains a sandbox stand-in.
    Ref: pkg/streams/kafka_stream.go:226-274,382-414."""
    from replicator_spark.sources.kafka_wire import read_kafka_segments
    from replicator_spark.sources.normalize import from_kafka_messages

    segments, _expected = _kafka_segment_fixture()
    d = _scratch("kafka_wire_decode")
    for i, w in enumerate(segments):
        w.save(f"{d}/{i * 10**10:020d}.log")
    feed = read_kafka_segments(spark, d, topic="files-topic")
    return from_kafka_messages(feed).select("seq", "op", "db", "tbl", "doc")


def _sql_source_kafka_wire_decode() -> str:
    _segments, expected = _kafka_segment_fixture()
    values = ",\n  ".join(
        f"({seq}, '{op}', '{db}', '{tbl}', '{doc}')"
        for seq, op, db, tbl, doc in expected
    )
    return (
        "SELECT CAST(seq AS BIGINT) AS seq, op, db, tbl, doc FROM (VALUES\n  "
        + values
        + "\n) AS t(seq, op, db, tbl, doc)"
    )


SQL_source_kafka_wire_decode = _sql_source_kafka_wire_decode()


def q_quality_unigram_logprob(spark, sf_dir):
    """Corpus-unigram log-probability quality score (CCNet-style LM
    proxy): mean ln(count/total) over each doc's tokens, model fit on
    the corpus itself. Pure JVM: explode → count agg → token join →
    per-doc avg."""
    from replicator_spark.ops.text import unigram_logprob

    return unigram_logprob(_spread(_load(spark, sf_dir, "documents")))


SQL_quality_unigram_logprob = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
),
counts AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM counts)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(AVG(ln(CAST(c.cnt AS DOUBLE) / total)), 4) AS avg_logprob
FROM tok t JOIN counts c USING (tok), tot
GROUP BY t.doc_id
"""


_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def q_sample_mixture(spark, sf_dir):
    """Deterministic domain-mixture resampling (DoReMi/Pile-style
    domain weights): keep the largest subcorpus matching the target
    per-source proportions, selecting survivors by salted md5 fraction
    (stable across runs and cluster sizes, no RNG).  One |groups|-row
    broadcast; the corpus side never shuffles — the filter is a
    map-side predicate at any scale."""
    from replicator_spark.ops.text import sample_mixture

    docs = _load(spark, sf_dir, "documents")
    return sample_mixture(docs, _MIX_WEIGHTS).select(
        "doc_id", "source", F.round("keep_rate", 4).alias("keep_rate")
    )


def _sql_sample_mixture() -> str:
    wt = ",".join(f"('{s}', {w})" for s, w in _MIX_WEIGHTS.items())
    return f"""
WITH wt(source, w) AS (VALUES {wt}),
sizes AS (
  SELECT d.source, CAST(COUNT(*) AS DOUBLE) AS n, ANY_VALUE(w) AS w
  FROM documents d JOIN wt USING (source)
  WHERE w > 0
  GROUP BY 1
),
cap AS (SELECT MIN(n / w) AS c FROM sizes),
rates AS (
  SELECT source, LEAST(1.0, c * w / n) AS keep_rate FROM sizes, cap
)
SELECT d.doc_id, d.source, round(r.keep_rate, 4) AS keep_rate
FROM documents d
JOIN rates r USING (source)
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix-v1'), 1, 8))::BIGINT
      / 4294967296.0 < r.keep_rate
"""


SQL_sample_mixture = _sql_sample_mixture()


def q_tfidf_keywords(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (content tagging / topic
    sketch).  Rank over ROUNDED score with token tiebreak so the
    result is total-ordered and hash-stable; the only window is
    partitioned by document — no global sort anywhere."""
    from replicator_spark.ops.text import tfidf_keywords

    return tfidf_keywords(_spread(_load(spark, sf_dir, "documents")), k=3).select(
        "doc_id", "token", F.col("rank").cast("long").alias("rank"), "score"
    )


SQL_tfidf_keywords = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
scored AS (
  SELECT doc_id, token, round(tf * ln(nd / df), 4) AS score
  FROM tf JOIN dfreq USING (token), n
),
ranked AS (
  SELECT doc_id, token, score,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, token ASC
         ) AS rank
  FROM scored
)
SELECT doc_id, token, CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 3
"""


def q_ngram_novelty(spark, sf_dir):
    """Pairless near-dup scoring: per doc, the share of its word
    3-grams first seen in an EARLIER doc (by doc_id).  Late template
    copies score ≈1, fresh text ≈0 — the incremental-crawl dedup
    signal without candidate pairs.  Two gram-keyed shuffles, no
    window, no O(n²) stage."""
    from replicator_spark.ops.text import ngram_novelty

    return ngram_novelty(_spread(_load(spark, sf_dir, "documents")), n=3)


SQL_ngram_novelty = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents
),
idx AS (
  SELECT doc_id, ws,
         unnest(range(1, GREATEST(len(ws) - 2, 1) + 1)) AS i
  FROM w
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ws, i, i + 2), ' ') AS gram
  FROM idx
),
first_seen AS (SELECT gram, MIN(doc_id) AS first_id FROM grams GROUP BY 1)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       round(AVG(CASE WHEN f.first_id < g.doc_id THEN 1.0 ELSE 0.0 END), 4)
         AS seen_frac
FROM grams g JOIN first_seen f USING (gram)
GROUP BY 1
"""


def q_substring_dedup(spark, sf_dir):
    """Exact duplicated-substring stripping at 15-token-window
    granularity (Lee et al. 2022 suffix-array dedup, approximated with
    k-gram windows): any 15-token run occurring more than once in the
    corpus is removed from every occurrence, overlapping windows
    merging through the covered-position union.  All linear gram-keyed
    shuffles — no pairs, no global sort, no Python."""
    from replicator_spark.ops.dedup_text import strip_duplicated_substrings

    return strip_duplicated_substrings(
        _spread(_load(spark, sf_dir, "documents")), k=15
    )


SQL_substring_dedup = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents
),
starts AS (
  SELECT doc_id, ws,
         unnest(range(1, GREATEST(len(ws) - 14, 0) + 1)) AS i
  FROM w
),
grams AS (
  SELECT doc_id, i - 1 AS p,
         array_to_string(list_slice(ws, i, i + 14), ' ') AS gram
  FROM starts
),
dup AS (SELECT gram FROM grams GROUP BY 1 HAVING COUNT(*) > 1),
cov AS (
  SELECT DISTINCT g.doc_id, g.p + t.u AS pos
  FROM grams g JOIN dup USING (gram)
  CROSS JOIN unnest(range(0, 15)) AS t(u)
),
toks AS (
  SELECT doc_id, ws, unnest(range(0, len(ws))) AS pos FROM w
),
kept AS (
  SELECT t.doc_id, t.pos, t.ws[t.pos + 1] AS tok
  FROM toks t ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
),
asm AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned
  FROM kept GROUP BY 1
)
SELECT w.doc_id,
       CAST(len(w.ws) AS BIGINT) AS n_tokens,
       CAST(len(w.ws) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(a.cleaned, '') AS cleaned
FROM w LEFT JOIN asm a USING (doc_id)
"""


def q_doc_chunking(spark, sf_dir):
    """Fixed-size token-window chunking with overlap (context-window
    preparation / long-doc RAG indexing) — pure JVM sequence→transform→
    explode, no shuffle, one narrow pass at any corpus size."""
    from replicator_spark.ops.text import chunk_documents

    return chunk_documents(
        _spread(_load(spark, sf_dir, "documents")), max_tokens=64, overlap=8
    )


SQL_doc_chunking = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
sized AS (SELECT doc_id, toks, len(toks) AS n FROM d),
ch AS (
  SELECT doc_id,
         unnest([{'k': k,
                  'nt': least(n - k*56, 64),
                  'ct': array_to_string(toks[k*56+1 : k*56+64], ' ')}
                 for k in range(0, greatest(CAST(ceil((n - 8) / 56.0) AS INT), 1))]) AS u
  FROM sized
)
SELECT doc_id, CAST(u.k AS INT) AS chunk_idx, CAST(u.nt AS INT) AS n_tokens,
       u.ct AS chunk_text
FROM ch
"""


def q_pack_sequences(spark, sf_dir):
    """Greedy next-fit sequence packing into 256-token training
    contexts, per shard (doc_id % 8) in ascending id order — the final
    data-prep stage of an LLM pipeline. Arrow applyInPandas per shard
    (packing is sequential within a shard BY DESIGN; shards are the
    parallelism). Oracle: a recursive CTE walking each shard in id
    order — deterministic, so hash-equality proves the packing
    byte-for-byte."""
    from replicator_spark.ops.pack import pack_greedy

    return pack_greedy(
        _load(spark, sf_dir, "documents"), max_tokens=256, n_shards=8
    )


SQL_pack_sequences = r"""
WITH RECURSIVE d AS (
  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS INT) AS rn
  FROM documents
),
pack(shard, rn, doc_id, n, bin_id, fill) AS (
  SELECT shard, rn, doc_id, n, 0, n FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.n,
         CASE WHEN p.fill + d.n > 256 THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + d.n > 256 THEN d.n ELSE p.fill + d.n END
  FROM pack p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT doc_id, shard, CAST(bin_id AS INT) AS bin_id, n AS n_tokens FROM pack
"""


def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization of the events stream (30-min cut) with
    per-session rollups — lag + running-sum window pair, one shuffle on
    user_id, whole-stage codegen throughout. The value sum goes through
    DECIMAL so partial-aggregation order cannot flip the rounding."""
    from replicator_spark.ops.sessions import sessionize

    ev = _load(spark, sf_dir, "events")
    s = sessionize(ev, gap_s=1800)
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


SQL_sessionize_events = """
WITH s AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR CAST(floor(epoch(ts)) AS BIGINT)
                      - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s2 AS (
  SELECT user_id, ts, value,
         CAST(SUM(brk) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS INT)
           AS session_idx
  FROM s
)
SELECT user_id, session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM s2 GROUP BY 1, 2
"""


def q_knn_bruteforce(spark, sf_dir):
    """Brute-force cosine top-3 neighbors for query vectors 0-4
    (similarity-search baseline; JVM-side F.zip_with/F.aggregate)."""
    emb = _spread(_load(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    pairs = (
        q.crossJoin(emb)
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(dot / (norm(F.col("qv")) * norm(F.col("v"))), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


SQL_knn_bruteforce = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(q.qv, e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 4) AS cos
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT query_id, vec_id AS neighbor_id, cos, rank FROM ranked WHERE rank <= 3
"""

def q_text_quality_ops(spark, sf_dir):
    """Quality scoring via ops.text.quality_features (length/punct/
    stopword/uppercase/repetition signals)."""
    from replicator_spark.ops.text import quality_features

    return quality_features(_spread(_load(spark, sf_dir, "documents")))


SQL_text_quality_ops = r"""
SELECT doc_id,
       length(text) AS len,
       round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1), 4) AS punct_ratio,
       round(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1), 4) AS upper_ratio,
       round(CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
             / greatest(len(string_split_regex(trim(text), '\s+')), 1), 4) AS stopword_ratio,
       round(CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
             / greatest(len(string_split_regex(trim(text), '\s+')), 1), 4) AS distinct_token_ratio
FROM documents
"""


def q_lang_id(spark, sf_dir):
    """Marker-lexicon language ID (ops.text.detect_lang) — n-gram
    heuristic, JVM-side."""
    from replicator_spark.ops.text import detect_lang

    out = detect_lang(_spread(_load(spark, sf_dir, "documents")))
    return out.select(
        "doc_id", "lang_pred", F.round("lang_pred_score", 2).alias("score")
    )


def _lang_score_sql(markers: list[str]) -> str:
    terms = [
        f"(length(p) - length(replace(p, ' {m} ', ''))) / {len(m) + 2}.0"
        for m in markers
    ]
    return " + ".join(terms)


SQL_lang_id = f"""
WITH p0 AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
scored AS (
  SELECT doc_id, unnest([
    {{'score': CAST({_lang_score_sql(['the', 'and', 'of'])} AS DOUBLE), 'lang': 'en'}},
    {{'score': CAST({_lang_score_sql(['der', 'und', 'die'])} AS DOUBLE), 'lang': 'de'}},
    {{'score': CAST({_lang_score_sql(['le', 'et', 'les'])} AS DOUBLE), 'lang': 'fr'}},
    {{'score': CAST({_lang_score_sql(['el', 'y', 'los'])} AS DOUBLE), 'lang': 'es'}},
    {{'score': CAST({_lang_score_sql(['的', '是', '了'])} AS DOUBLE), 'lang': 'zh'}}
  ]) AS s
  FROM p0
)
SELECT doc_id, max(s)['lang'] AS lang_pred, round(max(s)['score'], 2) AS score
FROM scored GROUP BY doc_id
"""


def q_ngram_jaccard(spark, sf_dir):
    """Exact 5-gram Jaccard similarity for a bounded candidate set
    (doc pairs with id < 12) — the LSH verification stage."""
    from replicator_spark.ops.dedup_text import ngram_jaccard_pairs

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 12)
    cands = (
        docs.select(F.col("doc_id").alias("id_a"))
        .crossJoin(docs.select(F.col("doc_id").alias("id_b")))
        .where(F.col("id_a") < F.col("id_b"))
    )
    return ngram_jaccard_pairs(docs, cands, threshold=0.0)


SQL_ngram_jaccard = """
WITH sh AS (
  SELECT doc_id,
         -- range() upper bound is EXCLUSIVE (Spark sequence is inclusive):
         -- greatest(len-3, 2) ≙ Spark's sequence(1, greatest(len-4, 1))
         list_distinct([substr(text, i, 5)
                        for i in range(1, greatest(length(text) - 3, 2))]) AS s
  FROM documents WHERE doc_id < 12
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.0
"""


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (cos >= 0.4), exact, via
    block nested-loop + numpy matmul kernel (ops.similarity.
    cosine_near_dup_blocked) — the crossJoin + zip_with fold formulation
    is ~50x slower (interpreted lambda per element per pair). Threshold
    0.4 because the synthetic embeddings are near-orthogonal (max
    pairwise cos ≈ 0.51): a 0.9 cut would be vacuously empty.

    DEMOTED to a bounded exact baseline (VERDICT r03 #3): corpus-wide
    all-pairs is O(n²) flops — 10,000× the work at 100× docs — so the
    contract query runs it on a bounded slice (vec_id < 800; the whole
    corpus at sf ≤ 0.01) while dedup-at-scale duty moved to the chained
    ``embedding_dedup_end2end`` (LSH candidates → exact verify → CC)."""
    from replicator_spark.ops.similarity import cosine_near_dup_blocked

    emb = _load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 800)
    # n_blocks auto-sized from corpus count × dim under a byte budget
    # (a fixed count hits the 2 GB collect_list row ceiling at 100×)
    return cosine_near_dup_blocked(emb, threshold=0.4)


SQL_embedding_near_dup = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id < 800)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4
"""


def q_embedding_dedup_end2end(spark, sf_dir):
    """The embedding dedup chain as ONE pipeline (VERDICT r03 #3),
    mirroring ``dedup_pipeline_end2end`` for vectors: sign-projection
    LSH buckets → candidate pairs (star edges for oversized buckets) →
    exact cosine verify (≥ 0.95) → connected components → cluster ids.

    The corpus's synthetic embeddings are near-orthogonal (max pairwise
    cos ≈ 0.51), so near-dup structure is derived deterministically IN
    the query: every vec_id % 10 == 0 vector gets a copy at id+100000
    perturbed by +0.1 on element 0, and every vec_id % 20 == 0 vector a
    second copy at id+200000 perturbed by +0.15 — worst-case true cos
    ≈ 0.981, two orders of magnitude of margin over background. The
    oracle is the EXACT all-pairs closure in DuckDB, so hash-equality
    asserts LSH candidate recall 1.0 on this corpus. 16 tables, not 8:
    the %10-but-not-%20 families are 2-cliques whose single edge has no
    CC redundancy, so the per-edge miss probability must be driven far
    below 1/families — at cos ≥ 0.9955 (worst planted +0.1 edge),
    p = 1−θ/π ≈ 0.970, miss = (1−p^8)^16 ≈ 3e-11; even the softer
    (d1,d2) 3-clique edges at cos ≈ 0.981 sit at ~5e-7 with two
    redundant paths. 8 tables measured green but left ~1% failure mass
    at sf0.1 — a flaky driver gate is a bug (review r4 #3)."""
    from replicator_spark.ops.dedup_text import connected_components
    from replicator_spark.ops.similarity import lsh_near_dup_pairs

    emb = _spread(_load(spark, sf_dir, "embeddings"))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v"))
    perturb = lambda off: F.concat(  # noqa: E731
        F.array(F.col("v")[0] + F.lit(off)), F.slice(F.col("v"), 2, 63)
    )
    d1 = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), perturb(0.1).alias("v")
    )
    d2 = base.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"), perturb(0.15).alias("v")
    )
    aug = base.unionByName(d1).unionByName(d2)
    pairs = lsh_near_dup_pairs(
        aug, vec_col="v", dim=64, threshold=0.95, hash_bits=8, num_tables=16
    )
    return connected_components(
        pairs.select("id_a", "id_b"), aug.select("vec_id"), "vec_id"
    )


SQL_embedding_dedup_end2end = """
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
aug AS (
  SELECT vec_id, v FROM e
  UNION ALL
  SELECT vec_id + 100000, list_prepend(v[1] + 0.1, v[2:]) FROM e
  WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 200000, list_prepend(v[1] + 0.15, v[2:]) FROM e
  WHERE vec_id % 20 = 0
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.95
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, root) AS (
  SELECT vec_id, vec_id FROM aug
  UNION
  SELECT e2.dst, r.root FROM reach r JOIN edges e2 ON e2.src = r.id
)
SELECT id AS vec_id, MIN(root) AS cluster FROM reach GROUP BY 1
"""


def _kmeans_ctes(src: str, k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """DuckDB CTE chain re-deriving ops/cluster.kmeans_fit_predict from
    scratch: init from the k smallest ids, ``iters`` assign→update
    rounds (centroids rounded to 5 dp — the determinism contract both
    engines share), one final assignment as ``outa(vec_id, v, cluster,
    d2)``. Distances are the same sequential index-order folds the
    Spark side computes, so assignments agree to the row."""
    d2 = (
        f"list_sum(list_transform(range(1,{dim + 1}), "
        "i -> (e.v[i]-c.c[i])*(e.v[i]-c.c[i])))"
    )

    def assign(name, cents):
        return f"""{name} AS (
  SELECT vec_id, v, cluster, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM (SELECT e.vec_id, e.v, c.cluster, {d2} AS d2
          FROM {src} e, {cents} c))
  WHERE rn = 1)"""

    parts = [
        f"""cent0 AS (
  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cluster, v AS c
  FROM {src} ORDER BY vec_id LIMIT {k})"""
    ]
    for it in range(1, iters + 1):
        parts.append(assign(f"assign{it}", f"cent{it - 1}"))
        parts.append(
            f"""newc{it} AS (
  SELECT cluster, list(val ORDER BY i) AS c FROM (
    SELECT a.cluster, t.i, round(sum(a.v[t.i]) / count(*), 5) AS val
    FROM assign{it} a CROSS JOIN range(1,{dim + 1}) t(i)
    GROUP BY a.cluster, t.i) GROUP BY cluster)"""
        )
        parts.append(
            f"""cent{it} AS (SELECT p.cluster, coalesce(n.c, p.c) AS c
  FROM cent{it - 1} p LEFT JOIN newc{it} n USING (cluster))"""
        )
    parts.append(assign("outa", f"cent{iters}"))
    return ",\n".join(parts)


def q_embedding_kmeans(spark, sf_dir):
    """Deterministic Lloyd's k-means over the embedding corpus
    (ops/cluster.kmeans_fit_predict): init from the 8 smallest ids,
    2 assign→update rounds with centroids rounded to 5 dp, final
    assignment returned per row. The oracle recomputes the ENTIRE
    iterative algorithm in DuckDB CTEs — hash-equality proves init
    order, the argmin tiebreak, the empty-cluster carry, and both
    update rounds, not just the final projection. This is the trained
    partitioner SemDedup and IVF-style search build on; the reference
    has no clustering surface (extension op, like ops/dedup_text)."""
    from replicator_spark.ops.cluster import kmeans_fit_predict

    emb = _spread(_load(spark, sf_dir, "embeddings"))
    out, _ = kmeans_fit_predict(emb, k=8, iters=2)
    return out.select(
        "vec_id", "cluster", F.round("dist2", 3).alias("dist2")
    )


SQL_embedding_kmeans = f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_kmeans_ctes("e0")}
SELECT vec_id, cluster, round(d2, 3) AS dist2 FROM outa
"""


def q_semdedup(spark, sf_dir):
    """SemDedup (Abbas et al. 2023): k-means partition, then drop any
    row with a lower-id cosine-≥0.95 neighbour INSIDE its cluster —
    the quadratic verify is bounded per cluster, never global. The
    corpus is near-orthogonal, so the same deterministic near-dup
    families as ``embedding_dedup_end2end`` are planted in-query
    (%10 → +100000 copy perturbed +0.1, %20 → +200000 at +0.15); the
    oracle re-runs the full clustering chain plus the same drop rule,
    so hash-equality proves planted copies co-cluster with their
    originals and exactly the non-canonical family members drop."""
    from replicator_spark.ops.cluster import semdedup

    emb = _spread(_load(spark, sf_dir, "embeddings"))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v"))
    perturb = lambda off: F.concat(  # noqa: E731
        F.array(F.col("v")[0] + F.lit(off)), F.slice(F.col("v"), 2, 63)
    )
    d1 = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), perturb(0.1).alias("v")
    )
    d2 = base.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"), perturb(0.15).alias("v")
    )
    aug = base.unionByName(d1).unionByName(d2)
    return semdedup(aug, vec_col="v", k=8, iters=2, tau=0.95)


SQL_semdedup = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
aug AS (
  SELECT vec_id, v FROM e
  UNION ALL
  SELECT vec_id + 100000, list_prepend(v[1] + 0.1, v[2:]) FROM e
  WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 200000, list_prepend(v[1] + 0.15, v[2:]) FROM e
  WHERE vec_id % 20 = 0
),
{_kmeans_ctes("aug")},
sem AS (
  SELECT b.vec_id, b.cluster, min(a.vec_id) AS dup_of
  FROM outa b LEFT JOIN outa a
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
   AND round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.95
  GROUP BY b.vec_id, b.cluster
)
SELECT vec_id, cluster, dup_of IS NULL AS kept, dup_of FROM sem
"""


_TEMPLATE_TEXT = (
    "all rights reserved terms of service privacy policy cookie notice "
    "subscribe to our newsletter for updates contact us about careers"
)


def q_incremental_minhash_dedup(spark, sf_dir):
    """Incremental MinHash dedup riding the CDC lake table
    (ops/incremental_dedup): the corpus arrives as FOUR id-ordered
    batches (base-doc tertiles, then a planted 60-copy template
    family), each batch appended to a ``(band_key, doc_id)`` signature
    index held in a real LakeTable (mor merge, ledger idempotence,
    CAS commit) and joined against it for candidate pairs under the
    ONLINE bucket policy — ≤ max_bucket earlier members: pair with
    all; more: ONE star edge to the bucket min, so an adversarial dup
    family stays O(bands) per copy. The oracle recomputes the policy's
    CLOSED FORM over the final corpus (per (bucket, doc): n_earlier
    decides the branch), so hash-equality proves the table-replay path
    — four merges, four snapshot reads, the join and the cap — lands
    on exactly the arrival-order pair set. max_bucket=20 puts the
    planted family (60 copies sharing every band) through BOTH
    branches: its first 21 members pair fully, the rest take star
    edges. sha2-60 base hash + the same HUGEINT affine recomputation
    as ``minhash_lsh``; 64 hashes / 8 bands (r=8, the production
    banding ratio)."""
    from replicator_spark.ops.incremental_dedup import (
        replay_documents_incremental,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    plant = (
        _load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 60)
        .select(
            (F.col("doc_id") + 10000000).alias("doc_id"),
            F.lit(_TEMPLATE_TEXT).alias("text"),
        )
    )
    corpus = _spread(docs.unionByName(plant))
    t1, t2 = docs.selectExpr(
        "percentile(doc_id, 0.34) as t1", "percentile(doc_id, 0.67) as t2"
    ).first()
    tmp = _scratch("mh_incr")
    return replay_documents_incremental(
        spark,
        corpus,
        f"{tmp}/index",
        splits=[int(t1), int(t2), 10000000],
        num_hashes=64,
        bands=8,
        base_hash="sha2_60",
        max_bucket=20,
        # 8 index buckets at contract scale: 1/4 the per-merge file ops
        # of the 32-bucket default (same plans, same pairs — bucketing
        # only shards the layout)
        num_buckets=8,
    )


def _sql_incremental_minhash_dedup() -> str:
    from replicator_spark.ops.dedup_text import affine_constants

    a, b = affine_constants(64)
    consts = ",".join(f"({i},{int(a[i])},{int(b[i])})" for i in range(64))
    return f"""
WITH consts(i, a, b) AS (VALUES {consts}),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, '{_TEMPLATE_TEXT}' AS text
  FROM documents WHERE doc_id < 60
),
idx AS (
  SELECT doc_id, text, unnest(range(1, GREATEST(length(text) - 4, 1) + 1)) AS p
  FROM corpus
),
sh AS (SELECT DISTINCT doc_id, substr(text, p, 5) AS s FROM idx),
hx AS (SELECT doc_id, ('0x' || substr(sha256(s), 1, 15))::BIGINT AS x FROM sh),
signed AS (
  SELECT doc_id, i,
         (((a::HUGEINT * x::HUGEINT + b::HUGEINT) % 18446744073709551616::HUGEINT
           + 9223372036854775808::HUGEINT) % 18446744073709551616::HUGEINT
          - 9223372036854775808::HUGEINT)::BIGINT AS v
  FROM hx, consts
),
sig AS (SELECT doc_id, i, MIN(v) AS v FROM signed GROUP BY 1, 2),
bands AS (
  SELECT doc_id, i // 8 AS band_id,
         string_agg(v::VARCHAR, ',' ORDER BY i) AS key
  FROM sig GROUP BY 1, 2
),
rk AS (
  SELECT band_id, key, doc_id,
         row_number() OVER (PARTITION BY band_id, key ORDER BY doc_id) - 1
           AS n_earlier,
         MIN(doc_id) OVER (PARTITION BY band_id, key) AS min_id
  FROM bands
),
small AS (
  SELECT DISTINCT a.doc_id AS id_a, r.doc_id AS id_b
  FROM rk r JOIN bands a USING (band_id, key)
  WHERE r.n_earlier BETWEEN 1 AND 20 AND a.doc_id < r.doc_id
),
star AS (
  SELECT DISTINCT min_id AS id_a, doc_id AS id_b FROM rk WHERE n_earlier > 20
)
SELECT id_a, id_b FROM (SELECT * FROM small UNION SELECT * FROM star)
"""


SQL_incremental_minhash_dedup = _sql_incremental_minhash_dedup()


def q_incremental_embedding_dedup(spark, sf_dir):
    """Incremental EMBEDDING near-dup detection riding the CDC lake
    tables (ops/incremental_embed.EmbeddingIndex — the vector twin of
    ``incremental_minhash_dedup``): near-dup families are planted
    in-query over the near-orthogonal corpus (every vec_id % 10 == 0
    vector gets a copy at id+100000 perturbed +0.05 on element 0, every
    % 20 == 0 a second copy at id+200000 at +0.07 — true cos ≥ ~0.997,
    background ≤ ~0.51), then the corpus arrives as FOUR id-ordered
    batches (base halves, then the d1 copies, then the d2 copies). Each
    batch mor-merges into the two index LakeTables (vectors once +
    sign-projection band rows, ledger idempotence, CAS commit), joins
    against the standing band index for candidates, and exact-cosine
    VERIFIES (≥ 0.95) against the vectors table — so emitted pairs are
    near-dups, not candidates, and the oracle can be the EXACT
    all-pairs closure: hash-equality proves the four merges, the four
    snapshot reads, the candidate join, and the verify land on exactly
    the all-pairs truth, i.e. index recall 1.0 on this corpus.
    16 projection tables drive the per-pair direct-hit miss below
    1e-12 at the planted margins (no CC here to add path redundancy —
    every pair must be caught directly); max_bucket=500 keeps the
    contract run on the verify-all cap branch (the refinement-split /
    exact-pile star branches are pinned in test_incremental_embed.py,
    where the oracle-side policy is replicable)."""
    from replicator_spark.ops.incremental_embed import (
        replay_embeddings_incremental,
    )

    emb = _spread(_load(spark, sf_dir, "embeddings"))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v"))
    perturb = lambda off: F.concat(  # noqa: E731
        F.array(F.col("v")[0] + F.lit(off)), F.slice(F.col("v"), 2, 63)
    )
    d1 = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), perturb(0.05).alias("v")
    )
    d2 = base.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"), perturb(0.07).alias("v")
    )
    aug = base.unionByName(d1).unionByName(d2)
    mid = int(base.selectExpr("percentile(vec_id, 0.5) as m").first()[0])
    tmp = _scratch("emb_incr")
    return replay_embeddings_incremental(
        spark,
        aug,
        f"{tmp}/index",
        dim=64,
        splits=[mid, 100000, 200000],
        vec_col="v",
        num_tables=16,
        max_bucket=500,
        num_buckets=8,
    )


SQL_incremental_embedding_dedup = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
aug AS (
  SELECT vec_id, v FROM e
  UNION ALL
  SELECT vec_id + 100000, list_prepend(v[1] + 0.05, v[2:]) FROM e
  WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 200000, list_prepend(v[1] + 0.07, v[2:]) FROM e
  WHERE vec_id % 20 = 0
),
n AS (
  -- mirror the index numerics exactly: normalize THEN dot
  SELECT vec_id,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
  FROM aug
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v), 4) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v), 4) >= 0.95
"""


# -- non-SQL-expressible ops (driver records rows-only checks) --------------


def q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidates over documents — ORACLE-GATED
    since late r4 (VERDICT r03 #9 fully closed: zero non-media
    `no_oracle` rows left).  The contract query feeds the REAL numpy
    affine-permutation/min-reduceat kernel a sha2-derived 60-bit base
    hash instead of xxhash64 (the simhash trick) — DuckDB then
    recomputes the signatures exactly ((a·x+b) mod 2^64 via HUGEINT,
    min over the SIGNED interpretation like the kernel's int64 view),
    re-bands them, and regenerates pairs + star edges + stats from
    scratch.  A 60-copy template family is planted (mirrored in the
    SQL) so the oversized-star branch contributes real rows to the
    comparison — hash-equality proves the permutation kernel, the
    banding, the pair explosion, the star path, and the accounting in
    one gate, none of it vacuously.  The library default stays
    xxhash64 (faster; same kernel).

    The bucket accounting rides along on every row ("no silent caps",
    VERDICT r03 #1): oversized buckets contribute O(n) star edges, and
    the counts of buckets/docs that took the star path are columns.
    (Spark buckets on xxhash64(band-slice-string) while the oracle
    groups by the slice string itself — identical partitions absent a
    64-bit collision, which the hash gate would expose.)"""
    from replicator_spark.ops.dedup_text import (
        bucket_candidate_pairs,
        bucket_stats,
        lsh_band_buckets,
        minhash_signatures,
    )

    docs = _load(spark, sf_dir, "documents")
    # 128 hashes / 16 bands → r=8 rows per band: band collision prob s^8.
    # r=4 admitted ~23% of ALL pairs on this template-heavy corpus
    # (VERDICT r01 #6 — the verify stage trended O(n²)); r=8 keeps the
    # candidate share ~1% while holding recall ≥ 0.95 for jaccard ≥ 0.8
    # (1-(1-0.8^8)^16 ≈ 0.95; measured in tests/test_ops_dedup.py).
    # Band ONCE: the bucket frame is checkpointed and feeds both the
    # candidate pairs and the stats row — without this the 128-hash
    # signature + banding shuffle would execute twice.
    # Plant a 60-copy template family (deterministic, mirrored in the
    # SQL) so the OVERSIZED star branch produces rows UNDER the gate —
    # without it the synthetic corpus tops out at bucket size ~5 and the
    # star path would be vacuously compared (empty vs empty).
    planted = docs.where(F.col("doc_id") < 60).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.lit(_TEMPLATE_TEXT).alias("text"),
    )
    corpus = _spread(docs.select("doc_id", "text").unionByName(planted))
    sized = lsh_band_buckets(
        minhash_signatures(corpus, num_hashes=128, base_hash="sha2_60"),
        "doc_id",
        16,
    ).localCheckpoint(eager=True)
    cands = bucket_candidate_pairs(sized, max_bucket=50)
    stats = bucket_stats(sized, max_bucket=50)
    return cands.crossJoin(F.broadcast(stats))


def _sql_minhash_lsh() -> str:
    from replicator_spark.ops.dedup_text import affine_constants

    a, b = affine_constants(128)
    consts = ",".join(
        f"({i},{int(a[i])},{int(b[i])})" for i in range(128)
    )
    return f"""
WITH consts(i, a, b) AS (VALUES {consts}),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, '{_TEMPLATE_TEXT}' AS text
  FROM documents WHERE doc_id < 60
),
idx AS (
  SELECT doc_id, text, unnest(range(1, GREATEST(length(text) - 4, 1) + 1)) AS p
  FROM corpus
),
sh AS (SELECT DISTINCT doc_id, substr(text, p, 5) AS s FROM idx),
hx AS (SELECT doc_id, ('0x' || substr(sha256(s), 1, 15))::BIGINT AS x FROM sh),
signed AS (
  SELECT doc_id, i,
         (((a::HUGEINT * x::HUGEINT + b::HUGEINT) % 18446744073709551616::HUGEINT
           + 9223372036854775808::HUGEINT) % 18446744073709551616::HUGEINT
          - 9223372036854775808::HUGEINT)::BIGINT AS v
  FROM hx, consts
),
sig AS (SELECT doc_id, i, MIN(v) AS v FROM signed GROUP BY 1, 2),
bands AS (
  SELECT doc_id, i // 8 AS band_id,
         string_agg(v::VARCHAR, ',' ORDER BY i) AS key
  FROM sig GROUP BY 1, 2
),
buckets AS (
  SELECT band_id, key, COUNT(*) AS n FROM bands GROUP BY 1, 2
),
mem AS (
  SELECT b.band_id, b.key, b.doc_id, k.n
  FROM bands b JOIN buckets k USING (band_id, key)
),
small_pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM mem a JOIN mem b USING (band_id, key)
  WHERE a.n <= 50 AND a.doc_id < b.doc_id
),
star AS (
  SELECT DISTINCT min_id AS id_a, doc_id AS id_b
  FROM (
    SELECT doc_id, n,
           MIN(doc_id) OVER (PARTITION BY band_id, key) AS min_id
    FROM mem
  )
  WHERE n > 50 AND doc_id > min_id
),
pairs AS (SELECT * FROM small_pairs UNION SELECT * FROM star),
stats AS (
  SELECT CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS cand_buckets,
         CAST(SUM(CASE WHEN n > 50 THEN 1 ELSE 0 END) AS BIGINT) AS oversized_buckets,
         CAST(SUM(CASE WHEN n > 50 THEN n ELSE 0 END) AS BIGINT) AS oversized_docs,
         CAST(MAX(n) AS BIGINT) AS max_bucket_size
  FROM buckets
)
SELECT p.id_a, p.id_b, s.cand_buckets, s.oversized_buckets,
       s.oversized_docs, s.max_bucket_size
FROM pairs p CROSS JOIN stats s
"""


SQL_minhash_lsh = _sql_minhash_lsh()


def q_simhash_dedup(spark, sf_dir):
    """SimHash near-dup pairs (chunked pigeonhole blocking). Hamming
    radius 3 — the conventional simhash dedup setting; wide radii
    degrade blocking selectivity quadratically (radius 12 means 13
    chunks of ~5 bits → 32-value chunk alphabet → every bucket holds
    n/32 docs and the verify stage goes O(n²)).

    Oracle-gated since r4 (VERDICT r03 #9): the contract query uses the
    sha2-derived 60-bit token hash, which DuckDB reproduces exactly —
    the oracle recomputes the simhashes from scratch and takes the
    ALL-PAIRS hamming filter, so hash-equality also proves the
    pigeonhole blocking is lossless on this corpus. The library default
    stays xxhash64 (faster; cross-checked in pytest)."""
    from replicator_spark.ops.dedup_text import simhash64, simhash_near_dups

    docs = _spread(_load(spark, sf_dir, "documents"))
    return simhash_near_dups(simhash64(docs, token_hash="sha2"), max_hamming=3)


SQL_simhash_dedup = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
  FROM documents
),
th AS (
  SELECT doc_id, ('0x' || substr(sha256(t), 1, 15))::BIGINT AS h FROM tok
),
bits AS (
  SELECT doc_id, r.b AS b,
         SUM(CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, range(60) r(b)
  GROUP BY doc_id, r.b
),
sh AS (
  SELECT doc_id,
         SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def _with_measured_recall(approx, exact):
    """Attach measured recall@k vs the exact result as a column on every
    row (VERDICT r03 #9: the pytest recall gates exist — surface the
    number in the query result so the driver records it)."""
    e = exact.select("query_id", "neighbor_id")
    n_exact = e.count()
    hit = approx.join(e, ["query_id", "neighbor_id"], "left_semi").count()
    recall = round(hit / n_exact, 4) if n_exact else 1.0
    return approx.withColumn("recall_at_k", F.lit(recall))


def _ann_planted_corpus(emb):
    """Queries (vec_id < 5) + corpus augmented with three perturbed
    copies of each query vector. The synthetic embeddings are
    near-orthogonal (background cos ≤ ~0.51), so the planted copies
    (cos ≈ 0.995/0.989/0.981) are unambiguously the true top-3 of every
    query — which is what lets an APPROXIMATE index be hash-verified
    against the exact top-k oracle: on a corpus with real neighbor
    structure (the regime ANN exists for), the index must find it."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v"))
    q = base.where(F.col("vec_id") < 5)
    aug = base
    for i, off in enumerate((0.1, 0.15, 0.2), start=1):
        aug = aug.unionByName(
            q.select(
                (F.col("vec_id") + 100000 * i).alias("vec_id"),
                F.concat(
                    F.array(F.col("v")[0] + F.lit(off)), F.slice(F.col("v"), 2, 63)
                ).alias("v"),
            )
        )
    return q, aug


SQL_ANN_EXACT_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
aug AS (
  SELECT vec_id, v FROM e
  UNION ALL SELECT vec_id + 100000, list_prepend(v[1] + 0.1, v[2:]) FROM q
  UNION ALL SELECT vec_id + 200000, list_prepend(v[1] + 0.15, v[2:]) FROM q
  UNION ALL SELECT vec_id + 300000, list_prepend(v[1] + 0.2, v[2:]) FROM q
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))), 4) AS cos
  FROM q JOIN aug c ON c.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank,
       CAST(1.0 AS DOUBLE) AS recall_at_k
FROM ranked WHERE rank <= 3
"""


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate nearest neighbors (scale path of
    knn_bruteforce). Oracle-gated since r4 (VERDICT r03 #9): the corpus
    carries planted true neighbors (see ``_ann_planted_corpus``), the
    oracle is the EXACT top-3 in DuckDB, and hash-equality asserts the
    index recalls the true neighbors (recall column = 1.0) — an
    approximate index verified in the margin regime it is built for.
    Recall is measured, not assumed: a miss changes the column and the
    neighbor rows and fails the hash."""
    from replicator_spark.ops.similarity import brute_force_knn, lsh_bucket_knn

    emb = _spread(_load(spark, sf_dir, "embeddings"))
    q, aug = _ann_planted_corpus(emb)
    # 10 tables: the planted top-3 edges are single-path (no CC to
    # absorb a miss) — worst planted cos ≈ 0.981 gives per-edge miss
    # (1−0.938^4)^10 ≈ 4e-7, so the gate holds for any regenerated
    # corpus, not just the current seed
    approx = lsh_bucket_knn(
        aug, q, vec_col="v", dim=64, k=3, hash_bits=4, num_tables=10
    )
    return _with_measured_recall(approx, brute_force_knn(aug, q, vec_col="v", k=3))


SQL_ann_lsh = SQL_ANN_EXACT_TOPK


def q_ann_ivf(spark, sf_dir):
    """IVF-flat approximate nearest neighbors: KMeans coarse quantizer,
    queries probe n_probe nearest cells (the trained counterpart of
    ann_lsh). Oracle-gated like ann_lsh: planted-neighbor corpus, exact
    top-3 oracle, measured recall@k on every row.
    ``train_fraction=0.5`` exercises the 100-TB path: the quantizer
    trains on a deterministic sample, never the full corpus (VERDICT
    r02 #7; recall vs brute force also pinned in
    tests/test_ops_similarity.py)."""
    from replicator_spark.ops.similarity import brute_force_knn, ivf_knn

    emb = _spread(_load(spark, sf_dir, "embeddings"))
    q, aug = _ann_planted_corpus(emb)
    approx = ivf_knn(
        aug, q, vec_col="v", k=3, n_centroids=16, n_probe=4, train_fraction=0.5
    )
    return _with_measured_recall(approx, brute_force_knn(aug, q, vec_col="v", k=3))


SQL_ann_ivf = SQL_ANN_EXACT_TOPK


def q_repo_activity_stateful(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): a
    per-repo cumulative activity profile carried in Spark-managed state
    across micro-batches — the reference's EventStatistics accumulator
    as a state-store-backed Arrow operator. The final profile (max over
    the append-only audit trail) must equal the plain batch aggregate —
    hash-verified against that SQL."""
    from replicator_spark.streaming import run_repo_activity_stream

    tmp = _scratch("repo_activity")
    feed_dir, out_dir, ckpt = f"{tmp}/feed", f"{tmp}/out", f"{tmp}/ckpt"
    ev = _events_change_feed(spark, sf_dir, spread=True)
    ev = ev.withColumn("ts", F.lit(None).cast("timestamp")).withColumn(
        "db", F.lit(None).cast("string")
    ).withColumn("tbl", F.lit(None).cast("string")).withColumn(
        "old", F.lit(None).cast("string")
    ).withColumn("meta", F.lit(None).cast("map<string,string>")).withColumn(
        "batch_id", F.pmod(F.col("seq"), F.lit(4)).cast("int")
    )
    ev.select(
        "event_id", "seq", "op", "ts", "db", "tbl", "key", "doc", "old", "meta", "batch_id"
    ).coalesce(8).write.parquet(feed_dir)
    q = run_repo_activity_stream(spark, feed_dir, out_dir, ckpt, max_files_per_trigger=8)
    q.awaitTermination()
    out = spark.read.parquet(out_dir)
    return (
        out.groupBy("repo")
        .agg(
            F.max("n_inserts").alias("n_inserts"),
            F.max("n_updates").alias("n_updates"),
            F.max("n_deletes").alias("n_deletes"),
            F.max("seq_hi").alias("seq_hi"),
        )
    )


SQL_repo_activity_stateful = f"""
WITH {_FEED_CTE}
SELECT repo,
       CAST(SUM(CASE WHEN op = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
       CAST(SUM(CASE WHEN op = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
       CAST(SUM(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
       MAX(seq) AS seq_hi
FROM feed GROUP BY repo
"""


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: synthetic media table → mapInPandas feature
    extraction (stub codec, real Arrow batch path)."""
    from replicator_spark.ops.multimodal import extract_features, gen_media

    return extract_features(gen_media(spark, 200), feature_dim=8).drop("feature")


def q_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing (multimodal): each video row
    explodes into every-Nth-frame descriptors (decode stubbed, plumbing
    real). Deterministic given media_id, so oracle-checkable only in
    shape — rows-only."""
    from replicator_spark.ops.multimodal import frame_sample_plan, gen_media

    return frame_sample_plan(gen_media(spark, 300), every_n=30)


def q_cdc_replay_roundtrip(spark, sf_dir):
    """The real engine end-to-end, now hash-verified against the LWW
    final-state oracle (VERDICT r01 top-next): the events-derived change
    feed — including out-of-order cross-batch delivery (batch = seq % 4)
    and every-7th-event redelivery — replays through streaming-
    equivalent batches → MERGE (mor) → compaction; the final table state
    must equal the declarative LWW query DuckDB computes directly."""
    from pyspark.sql import types as T

    from replicator_spark.functions.hashing import sha256_arrow
    from replicator_spark.laketable import LakeTable
    from replicator_spark.pipeline import replay_feed

    tmp = _scratch("cdc_roundtrip")
    feed_dir, root = f"{tmp}/feed", f"{tmp}/table"
    ev = _events_change_feed(spark, sf_dir, spread=True)
    # out-of-order delivery across batches + at-least-once redelivery:
    # exactly the adversarial stream the tombstone/LWW design exists for
    ev = ev.unionByName(ev.where(F.col("seq") % 7 == 0))
    ev.withColumn(
        "batch_id", F.pmod(F.col("seq"), F.lit(4)).cast("int")
    ).write.partitionBy("batch_id").parquet(feed_dir)

    table = LakeTable(spark, root)
    table.create(
        T.StructType(
            [
                T.StructField("repo", T.StringType()),
                T.StructField("path", T.StringType()),
                T.StructField("commit", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("content", T.StringType()),
            ]
        ),
        num_buckets=8,
    )
    schema = T.StructType(
        [T.StructField("lang", T.StringType()), T.StructField("content", T.StringType())]
    )
    replay_feed(spark, feed_dir, table, payload_schema=schema, mode="mor", write_metrics=False)
    table.compact()
    return table.read().select(
        "repo",
        "path",
        "commit",
        "lang",
        # the mandated vectorized Arrow sha256 kernel (identical output
        # to F.sha2; cross-equality tested in test_sources.py)
        sha256_arrow(F.col("content")).alias("content_sha"),
    )


SQL_cdc_replay_roundtrip = f"""
WITH {_FEED_CTE}, {_LWW_CTE}
SELECT repo, path, "commit", substr("commit", 1, 2) AS lang,
       sha256(props) AS content_sha
FROM latest WHERE rn = 1 AND op <> 'delete'
"""


def q_cdc_partial_update_merge(spark, sf_dir):
    """$set/UpdateFields partial-update merge end-to-end (K3 — reference
    ``pkg/estuary/mongo.go:345-347``, ``pkg/models/models.go:37``): even
    user_ids' updates carry ONLY field b (meta.partial='true'); the
    engine must coalesce per column so a keeps the value of the latest
    full image while b tracks every update. Oracle: per-key, per-column
    last-non-null after the last delete."""
    from pyspark.sql import types as T

    from replicator_spark.laketable import LakeTable
    from replicator_spark.pipeline import replay_feed

    tmp = _scratch("partial_merge")
    feed_dir, root = f"{tmp}/feed", f"{tmp}/table"
    f = _feed(spark, sf_dir, spread=True)
    is_part = (F.col("op") == "update") & (F.col("user_id") % 2 == 0)
    doc = (
        F.when(F.col("op") == "delete", F.lit("{}"))
        .when(is_part, F.to_json(F.struct((F.col("value") * 2).alias("b"))))
        .otherwise(
            F.to_json(
                F.struct(
                    F.substring(F.md5("props"), 1, 8).alias("a"),
                    F.col("value").alias("b"),
                )
            )
        )
    )
    meta = F.when(
        is_part, F.create_map(F.lit("partial"), F.lit("true"))
    ).otherwise(F.lit(None).cast("map<string,string>"))
    ev = f.select(
        F.concat(F.lit("e"), F.col("seq").cast("string")).alias("event_id"),
        "seq",
        "op",
        F.struct("repo", "path", "commit").alias("key"),
        doc.alias("doc"),
        meta.alias("meta"),
    )
    # partial semantics assume per-key in-order delivery ACROSS batches
    # (the reference's apply loop is strictly in order) → seq-ranged
    # batches; intra-batch reordering is handled by the collapse.
    # seq = event_id → parquet column stats answer the max directly (r6)
    max_seq = _load(spark, sf_dir, "events").agg(F.max("event_id")).first()[0]
    width = max_seq // 4 + 1
    ev.withColumn(
        "batch_id", (F.col("seq") / width).cast("int")
    ).write.partitionBy("batch_id").parquet(feed_dir)

    table = LakeTable(spark, root)
    table.create(
        T.StructType(
            [
                T.StructField("repo", T.StringType()),
                T.StructField("path", T.StringType()),
                T.StructField("commit", T.StringType()),
                T.StructField("a", T.StringType()),
                T.StructField("b", T.DoubleType()),
            ]
        ),
        num_buckets=8,
    )
    schema = T.StructType(
        [T.StructField("a", T.StringType()), T.StructField("b", T.DoubleType())]
    )
    replay_feed(
        spark, feed_dir, table, payload_schema=schema, mode="mor",
        partial_updates=True, write_metrics=False,
    )
    return table.read().select(
        "repo", "path", "commit", "a", F.round("b", 2).alias("b")
    )


SQL_cdc_partial_update_merge = f"""
WITH {_FEED_CTE},
keyed AS (
  SELECT repo, path, "commit", seq, op,
         CASE WHEN op = 'delete' OR (op = 'update' AND user_id % 2 = 0)
              THEN NULL ELSE substr(md5(props), 1, 8) END AS a,
         CASE WHEN op = 'delete' THEN NULL
              WHEN op = 'update' AND user_id % 2 = 0 THEN value * 2
              ELSE value END AS b
  FROM feed
),
d AS (
  SELECT repo, path, "commit",
         coalesce(MAX(CASE WHEN op = 'delete' THEN seq END), -1) AS dseq
  FROM keyed GROUP BY 1, 2, 3
)
SELECT k.repo, k.path, k."commit",
       max_by(k.a, CASE WHEN k.a IS NOT NULL THEN k.seq END) AS a,
       round(max_by(k.b, CASE WHEN k.b IS NOT NULL THEN k.seq END), 2) AS b
FROM keyed k
JOIN d ON k.repo = d.repo AND k.path = d.path AND k."commit" = d."commit"
WHERE k.seq > d.dseq AND k.op <> 'delete'
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC LWW final state after full replay, sha256-stamped."""
    return q_cdc_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_final_state": q_cdc_final_state,
        "cdc_lww_latest": q_cdc_lww_latest,
        "cdc_dedup_redelivery": q_cdc_dedup_redelivery,
        "cdc_op_stats": q_cdc_op_stats,
        "cdc_source_filter": q_cdc_source_filter,
        "cdc_field_filter_typed": q_cdc_field_filter_typed,
        "transform_shift_rename": q_transform_shift_rename,
        "transform_default_concat": q_transform_default_concat,
        "transform_timestamp_ops": q_transform_timestamp_ops,
        "transform_tiering": q_transform_tiering,
        "lookup_join_enrich": q_lookup_join_enrich,
        "metrics_rollup": q_metrics_rollup,
        "decimal_generated_column": q_decimal_generated_column,
        "transform_engine_chain": q_transform_engine_chain,
        "transform_jq_engine": q_transform_jq_engine,
        "transform_lua_engine": q_transform_lua_engine,
        "transform_js_engine": q_transform_js_engine,
        "extjson_decode": q_extjson_decode,
        "filter_regex_in": q_filter_regex_in,
        "source_mysql_normalize": q_source_mysql_normalize,
        "source_pg_normalize": q_source_pg_normalize,
        "source_kafka_normalize": q_source_kafka_normalize,
        "source_mongo_normalize": q_source_mongo_normalize,
        "source_cosmos_normalize": q_source_cosmos_normalize,
        "transform_dead_letter": q_transform_dead_letter,
        # stateful engine roundtrips, hash-verified against LWW SQL:
        "cdc_replay_roundtrip": q_cdc_replay_roundtrip,
        "schema_evolution_roundtrip": q_schema_evolution_roundtrip,
        "schema_type_conflict_roundtrip": q_schema_type_conflict_roundtrip,
        "cdc_partial_update_merge": q_cdc_partial_update_merge,
        "cdc_op_stats_streaming": q_cdc_op_stats_streaming,
        "cdc_incremental_read": q_cdc_incremental_read,
        "cdc_point_lookup": q_cdc_point_lookup,
        "cdc_event_filter": q_cdc_event_filter,
        "dedup_exact_documents": q_dedup_exact_documents,
        "text_token_count": q_text_token_count,
        "text_quality": q_text_quality,
        "lang_distribution": q_lang_distribution,
        "doc_fingerprint": q_doc_fingerprint,
        "knn_bruteforce": q_knn_bruteforce,
        "text_quality_ops": q_text_quality_ops,
        "lang_id": q_lang_id,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_near_dup": q_embedding_near_dup,
        "boilerplate_lines": q_boilerplate_lines,
        "dataset_split": q_dataset_split,
        "pii_redaction": q_pii_redaction,
        "dedup_clusters": q_dedup_clusters,
        "dedup_pipeline_end2end": q_dedup_pipeline_end2end,
        "embedding_dedup_end2end": q_embedding_dedup_end2end,
        "embedding_kmeans": q_embedding_kmeans,
        "semdedup": q_semdedup,
        "incremental_minhash_dedup": q_incremental_minhash_dedup,
        "incremental_embedding_dedup": q_incremental_embedding_dedup,
        "decontaminate": q_decontaminate,
        "repetition_filter": q_repetition_filter,
        "doc_chunking": q_doc_chunking,
        "pack_sequences": q_pack_sequences,
        "sessionize_events": q_sessionize_events,
        "quality_unigram_logprob": q_quality_unigram_logprob,
        "sample_mixture": q_sample_mixture,
        "tfidf_keywords": q_tfidf_keywords,
        "ngram_novelty": q_ngram_novelty,
        "substring_dedup": q_substring_dedup,
        "source_mysql_binlog_decode": q_source_mysql_binlog_decode,
        "source_pg_wal_decode": q_source_pg_wal_decode,
        "source_mongo_changestream_decode": q_source_mongo_changestream_decode,
        "source_kafka_wire_decode": q_source_kafka_wire_decode,
        "simhash_dedup": q_simhash_dedup,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "minhash_lsh": q_minhash_lsh,
        # rows-only (honestly non-SQL: stubbed media codecs):
        "media_features": q_media_features,
        "frame_sample": q_frame_sample,
        # oracle-gated (SQL_repo_activity_stateful value-matches the
        # stateful stream's output — listed last only by history):
        "repo_activity_stateful": q_repo_activity_stateful,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_final_state": SQL_cdc_final_state,
        "cdc_lww_latest": SQL_cdc_lww_latest,
        "cdc_dedup_redelivery": SQL_cdc_dedup_redelivery,
        "cdc_op_stats": SQL_cdc_op_stats,
        "cdc_source_filter": SQL_cdc_source_filter,
        "cdc_field_filter_typed": SQL_cdc_field_filter_typed,
        "transform_shift_rename": SQL_transform_shift_rename,
        "transform_default_concat": SQL_transform_default_concat,
        "transform_timestamp_ops": SQL_transform_timestamp_ops,
        "transform_tiering": SQL_transform_tiering,
        "lookup_join_enrich": SQL_lookup_join_enrich,
        "metrics_rollup": SQL_metrics_rollup,
        "decimal_generated_column": SQL_decimal_generated_column,
        "transform_engine_chain": SQL_transform_engine_chain,
        "transform_jq_engine": SQL_transform_jq_engine,
        "transform_lua_engine": SQL_transform_lua_engine,
        "transform_js_engine": SQL_transform_js_engine,
        "extjson_decode": SQL_extjson_decode,
        "filter_regex_in": SQL_filter_regex_in,
        "source_mysql_normalize": SQL_source_mysql_normalize,
        "source_pg_normalize": SQL_source_pg_normalize,
        "source_kafka_normalize": SQL_source_kafka_normalize,
        "source_mongo_normalize": SQL_source_mongo_normalize,
        "source_cosmos_normalize": SQL_source_cosmos_normalize,
        "transform_dead_letter": SQL_transform_dead_letter,
        "cdc_replay_roundtrip": SQL_cdc_replay_roundtrip,
        "schema_evolution_roundtrip": SQL_schema_evolution_roundtrip,
        "schema_type_conflict_roundtrip": SQL_schema_type_conflict_roundtrip,
        "cdc_partial_update_merge": SQL_cdc_partial_update_merge,
        "cdc_op_stats_streaming": SQL_cdc_op_stats_streaming,
        "repo_activity_stateful": SQL_repo_activity_stateful,
        "cdc_incremental_read": SQL_cdc_incremental_read,
        "cdc_point_lookup": SQL_cdc_point_lookup,
        "cdc_event_filter": SQL_cdc_event_filter,
        "dedup_exact_documents": SQL_dedup_exact_documents,
        "text_token_count": SQL_text_token_count,
        "text_quality": SQL_text_quality,
        "lang_distribution": SQL_lang_distribution,
        "doc_fingerprint": SQL_doc_fingerprint,
        "knn_bruteforce": SQL_knn_bruteforce,
        "text_quality_ops": SQL_text_quality_ops,
        "lang_id": SQL_lang_id,
        "ngram_jaccard": SQL_ngram_jaccard,
        "embedding_near_dup": SQL_embedding_near_dup,
        "boilerplate_lines": SQL_boilerplate_lines,
        "dataset_split": SQL_dataset_split,
        "pii_redaction": SQL_pii_redaction,
        "dedup_clusters": SQL_dedup_clusters,
        "dedup_pipeline_end2end": SQL_dedup_pipeline_end2end,
        "embedding_dedup_end2end": SQL_embedding_dedup_end2end,
        "embedding_kmeans": SQL_embedding_kmeans,
        "semdedup": SQL_semdedup,
        "incremental_minhash_dedup": SQL_incremental_minhash_dedup,
        "incremental_embedding_dedup": SQL_incremental_embedding_dedup,
        "decontaminate": SQL_decontaminate,
        "repetition_filter": SQL_repetition_filter,
        "simhash_dedup": SQL_simhash_dedup,
        "ann_lsh": SQL_ann_lsh,
        "ann_ivf": SQL_ann_ivf,
        "doc_chunking": SQL_doc_chunking,
        "pack_sequences": SQL_pack_sequences,
        "sessionize_events": SQL_sessionize_events,
        "quality_unigram_logprob": SQL_quality_unigram_logprob,
        "sample_mixture": SQL_sample_mixture,
        "tfidf_keywords": SQL_tfidf_keywords,
        "ngram_novelty": SQL_ngram_novelty,
        "substring_dedup": SQL_substring_dedup,
        "source_mysql_binlog_decode": SQL_source_mysql_binlog_decode,
        "source_pg_wal_decode": SQL_source_pg_wal_decode,
        "source_mongo_changestream_decode": SQL_source_mongo_changestream_decode,
        "source_kafka_wire_decode": SQL_source_kafka_wire_decode,
        "minhash_lsh": SQL_minhash_lsh,
    }
