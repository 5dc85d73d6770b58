"""Property-based correctness: random event sequences (duplicates,
out-of-order seqs across batches, delete/update races, replays) applied
through the real pipeline must match the sequential oracle — the
reference's one-event-at-a-time apply loop
(``pkg/replicator/service.go:391-413``).

hypothesis drives the event-sequence shape; one Spark replay per
example (examples kept small — Spark latency dominates).
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from replicator_spark.laketable import LakeTable
from replicator_spark.model import CHANGE_SCHEMA, REPOS_SCHEMA
from replicator_spark.pipeline import replay_feed

from .oracle import content_sha, sequential_apply

REPOS = ["r0", "r1", "hot"]
PATHS = ["a", "b"]
COMMITS = ["c1", "c2"]

event_st = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["insert", "update", "delete", "replace"]),
        "repo": st.sampled_from(REPOS),
        "path": st.sampled_from(PATHS),
        "commit": st.sampled_from(COMMITS),
        "content": st.text(alphabet="xyz", min_size=0, max_size=5),
        "batch": st.integers(0, 2),
        "dup": st.booleans(),  # redeliver this event in a later batch
    }
)


def _materialize(events):
    """Assign unique seq by list position (the log order), decouple
    arrival (batch) from seq, inject redeliveries."""
    rows = []
    for i, e in enumerate(events):
        doc = json.dumps({"lang": "py", "content": e["content"]})
        row = {
            "event_id": f"e{i}",
            "seq": i,
            "op": e["op"],
            "ts": None,
            "db": "d",
            "tbl": "t",
            "key": {"repo": e["repo"], "path": e["path"], "commit": e["commit"]},
            "doc": None if e["op"] == "delete" else doc,
            "old": None,
            "meta": None,
            "batch_id": e["batch"],
        }
        rows.append(row)
        if e["dup"]:
            rows.append({**row, "batch_id": min(e["batch"] + 1, 2)})
    return rows


FEED_SCHEMA = T.StructType(
    list(CHANGE_SCHEMA.fields) + [T.StructField("batch_id", T.IntegerType(), False)]
)

PAYLOAD = T.StructType(
    [
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(event_st, min_size=1, max_size=40))
def test_random_sequences_match_oracle(spark, tmp_path_factory, events):
    rows = _materialize(events)
    tmp = str(tmp_path_factory.mktemp("prop"))
    feed, root = f"{tmp}/feed", f"{tmp}/table"
    spark.createDataFrame(rows, FEED_SCHEMA).write.partitionBy("batch_id").parquet(feed)

    table = LakeTable(spark, root)
    table.create(REPOS_SCHEMA, num_buckets=4)
    replay_feed(spark, feed, table, payload_schema=PAYLOAD, mode="mor", write_metrics=False)

    # oracle: sequential apply in seq order with event-id dedup
    want = content_sha(sequential_apply(rows))
    got = {
        (r["repo"], r["path"], r["commit"]): r["sha"]
        for r in table.read()
        .selectExpr("repo", "path", "commit", "sha2(coalesce(content, ''), 256) AS sha")
        .collect()
    }
    assert got == want
