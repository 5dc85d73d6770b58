"""Training-pipeline prep operators: token-window chunking, greedy
sequence packing, gap sessionization."""

from datetime import datetime

from pyspark.sql import functions as F

from replicator_spark.ops.pack import pack_greedy, packing_efficiency
from replicator_spark.ops.sessions import session_stats, sessionize
from replicator_spark.ops.text import chunk_documents


def test_chunk_documents_windows_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(150))  # 150 tokens
    df = spark.createDataFrame(
        [(0, words), (1, "short doc"), (2, "")], "doc_id long, text string"
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(df, max_tokens=64, overlap=8).collect()
    }
    # 150 tokens, stride 56: ceil((150-8)/56) = 3 chunks
    assert {k for k in out if k[0] == 0} == {(0, 0), (0, 1), (0, 2)}
    c0, c1, c2 = out[(0, 0)], out[(0, 1)], out[(0, 2)]
    assert c0["n_tokens"] == 64 and c0["chunk_text"].startswith("w0 ")
    assert c1["chunk_text"].startswith("w56 ")  # stride = 64 - 8
    # overlap: last 8 tokens of chunk 0 are the first 8 of chunk 1
    assert c0["chunk_text"].split()[-8:] == c1["chunk_text"].split()[:8]
    assert c2["n_tokens"] == 150 - 2 * 56  # tail remainder
    # short + empty docs: exactly one chunk each
    assert out[(1, 0)]["n_tokens"] == 2
    assert (1, 1) not in out and (2, 0) in out


def test_pack_greedy_semantics_and_efficiency(spark):
    # shard 0 (ids 0,8,16,24): counts 100, 100, 100, 30
    #   -> bins [0,0,1,1] at max 256 (100+100 fits, +100 overflows)
    # oversized doc (id 1: 300 tokens > 256) gets its own bin
    def doc(n):
        return " ".join("x" for _ in range(n))

    rows = [(0, doc(100)), (8, doc(100)), (16, doc(100)), (24, doc(30)),
            (1, doc(300)), (9, doc(10))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_greedy(df, max_tokens=256, n_shards=8)
    got = {r["doc_id"]: (r["shard"], r["bin_id"], r["n_tokens"])
           for r in packed.collect()}
    assert got[0] == (0, 0, 100) and got[8] == (0, 0, 100)
    assert got[16] == (0, 1, 100) and got[24] == (0, 1, 30)
    assert got[1] == (1, 0, 300)  # oversized: own bin, count preserved
    assert got[9] == (1, 1, 10)   # next doc on that shard opens a new bin

    eff = packing_efficiency(packed, max_tokens=256).first()
    assert eff["n_bins"] == 4
    assert eff["total_tokens"] == 100 + 100 + 100 + 30 + 300 + 10
    assert 0 <= eff["pad_frac"] < 1


def test_sessionize_gap_cuts(spark):
    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: events at 0, 10, 50 min -> gap 40min > 30min cuts
        (0, t(0), 1, "click", 1.0, "{}"),
        (1, t(10), 1, "click", 2.0, "{}"),
        (2, t(50), 1, "buy", 3.0, "{}"),
        # user 2: single event
        (3, t(5), 2, "click", 4.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    s = {r["event_id"]: r["session_idx"] for r in sessionize(ev, gap_s=1800).collect()}
    assert s == {0: 0, 1: 0, 2: 1, 3: 0}
    stats = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(ev, gap_s=1800).collect()
    }
    assert stats[(1, 0)]["n_events"] == 2
    assert stats[(1, 0)]["total_value"] == 3.0
    assert stats[(1, 1)]["session_start"] == t(50)
    assert stats[(2, 0)]["n_events"] == 1


def test_unigram_logprob_ranks_rare_token_docs_low(spark):
    from math import isclose, log

    from replicator_spark.ops.text import unigram_logprob

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the mat"),
        (2, "zyxwv qqjjx floop"),  # all-rare tokens -> lowest score
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert got[2]["avg_logprob"] < got[0]["avg_logprob"]
    assert got[2]["avg_logprob"] < got[1]["avg_logprob"]
    assert got[0]["n_tokens"] == 6 and got[2]["n_tokens"] == 3
    # exact value: doc 2's tokens are singletons out of 15 total
    assert isclose(got[2]["avg_logprob"], round(log(1 / 15), 4), abs_tol=1e-9)
