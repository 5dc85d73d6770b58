"""Long-document stress pins for the gram-keyed curation ops
(VERDICT r04 #5): one ≥200k-token document through substring_dedup,
ngram_novelty, and tfidf_keywords proves the per-doc ``collect_list``
reassembly, the ``sequence()``/``posexplode`` paths, and the
single-row string columns survive document scale without hitting
array/row-size ceilings. Walls are printed per op (captured by
``pytest -s``; the driver's suite run records the totals).

These run in the normal suite (~tens of seconds each at local[8]);
marked slow so a quick dev loop can `-m "not slow"` them away.
"""

import time

import pytest
from pyspark.sql import functions as F

N_TOKENS = 200_000


@pytest.fixture(scope="module")
def longdoc_df(spark):
    """One 200k-token doc (deterministic) + two small companions.

    The big doc embeds a 120-token block repeated twice (so
    substring_dedup has a real ≥k duplicated run to strip) inside
    otherwise position-unique tokens; companion doc 2 shares a 40-token
    run with doc 1 for the cross-doc path.
    """
    block = [f"dup{i}" for i in range(120)]
    shared = [f"sh{i}" for i in range(40)]
    body = [f"w{i}" for i in range(N_TOKENS - 2 * 120 - 40)]
    big = (
        body[: len(body) // 2]
        + block
        + shared
        + body[len(body) // 2 :]
        + block
    )
    assert len(big) >= N_TOKENS
    rows = [
        (1, " ".join(big)),
        (2, " ".join(shared + ["solo1", "solo2", "solo3"])),
        (3, " ".join(f"z{i}" for i in range(50))),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string").repartition(3)


@pytest.mark.slow
def test_substring_dedup_200k_token_doc(longdoc_df):
    from replicator_spark.ops.dedup_text import strip_duplicated_substrings

    t0 = time.time()
    out = {
        r["doc_id"]: r
        for r in strip_duplicated_substrings(longdoc_df, k=15).collect()
    }
    wall = time.time() - t0
    big = out[1]
    assert big["n_tokens"] >= N_TOKENS
    # both copies of the 120-token block stripped, plus the shared run
    assert big["n_removed"] >= 2 * 120
    assert "dup0" not in big["cleaned"]
    assert "w0" in big["cleaned"]  # unique prefix survives
    # reassembly preserved order of the survivors
    toks = big["cleaned"].split(" ")
    assert toks[0] == "w0" and toks[1] == "w1"
    # doc 3 has no duplicated runs: returned verbatim
    assert out[3]["n_removed"] == 0 and out[3]["cleaned"].startswith("z0 z1 ")
    print(f"\nsubstring_dedup 200k-token doc wall: {wall:.1f}s")


@pytest.mark.slow
def test_ngram_novelty_200k_token_doc(longdoc_df):
    from replicator_spark.ops.text import ngram_novelty

    t0 = time.time()
    out = {r["doc_id"]: r for r in ngram_novelty(longdoc_df).collect()}
    wall = time.time() - t0
    # distinct 3-grams: ~N starts minus the repeated block's ~120
    # internal grams (second occurrence dedups away)
    assert out[1]["n_grams"] > N_TOKENS - 300
    assert out[1]["seen_frac"] == 0.0  # first doc: nothing seen earlier
    assert out[2]["seen_frac"] > 0.8  # mostly the shared run → seen
    assert out[3]["seen_frac"] == 0.0
    print(f"\nngram_novelty 200k-token doc wall: {wall:.1f}s")


@pytest.mark.slow
def test_tfidf_keywords_200k_token_doc(longdoc_df):
    from replicator_spark.ops.text import tfidf_keywords

    t0 = time.time()
    rows = tfidf_keywords(longdoc_df, k=3).collect()
    wall = time.time() - t0
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc[1]) == 3
    # the repeated block tokens dominate the big doc's tf-idf (tf=2,
    # corpus-unique): every winner is a dupN token
    assert all(r["token"].startswith("dup") for r in per_doc[1])
    assert [r["rank"] for r in sorted(per_doc[1], key=lambda r: r["rank"])] == [1, 2, 3]
    print(f"\ntfidf_keywords 200k-token doc wall: {wall:.1f}s")
