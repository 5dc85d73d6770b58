"""Text analysis operators: language-ID heuristic, quality features,
token statistics, document fingerprinting. All JVM-side Column
expressions (regex/length/split/hash builtins)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic;
# real lang-ID (fasttext etc.) would ride a pandas UDF — this stays JVM
_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
    "zh": ["的", "是", "了"],
}


def _count_occurrences(col, needle: str):
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(
        needle
    )


def detect_lang(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Marker-frequency language ID: score each language by marker-word
    hits (normalized by text length), take the argmax."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        s = None
        for m in markers:
            cnt = _count_occurrences(padded, f" {m} ")
            s = cnt if s is None else s + cnt
        scores.append(F.struct(s.cast("double").alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(out_col, best.getField("lang")).withColumn(
        f"{out_col}_score", best.getField("score")
    )


# GPT-2-style pretokenizer: contraction suffixes, letter runs, digit
# runs, punctuation runs — each optionally preceded by one space. The
# count of these pretokens is the standard cheap lower bound on BPE
# token count (real BPE only ever splits within a pretoken).
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish counts: a regex pretokenizer count
    (GPT-2 pattern) and a chars/4 estimate."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    bpe_pretokens = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    )
    word_chars = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    bpe_est = F.ceil(word_chars / 4).cast("long")
    return df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        bpe_pretokens.alias("bpe_pretokens"),
        bpe_est.alias("bpe_tokens_est"),
        F.round(word_chars / F.greatest(n_tokens, F.lit(1)), 4).alias("mean_token_len"),
    )


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality signals: length, punctuation ratio, stopword
    ratio, uppercase ratio, repetition (distinct-token ratio)."""
    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length(t), F.lit(1))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    stop = F.size(F.filter(toks, lambda x: x.isin("the", "a", "and", "of", "to")))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens
    return df.select(
        id_col,
        F.length(t).alias("len"),
        F.round(punct / n_chars, 4).alias("punct_ratio"),
        F.round(upper / n_chars, 4).alias("upper_ratio"),
        F.round(stop / n_tokens, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_token_ratio"),
    )


def boilerplate_line_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-level boilerplate detection (the CCNet/RefinedWeb trick):
    a line appearing in ≥ ``min_docs`` distinct documents is boilerplate
    (headers, footers, nav chrome, license banners). Returns per-doc
    (n_lines, n_boilerplate_lines). One explode + one shuffle on the
    line value — at 100 TB the groupBy key is the line string (or hash
    it first); no cross-document comparison ever happens."""
    lines = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("line")
    )
    bp = (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("line")
    )
    j = lines.join(bp.withColumn("_bp", F.lit(1)), "line", "left")
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.coalesce(F.col("_bp"), F.lit(0))).alias("n_boilerplate_lines"),
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_docs: int = 3,
) -> DataFrame:
    """Remove corpus-boilerplate lines from each document, preserving
    the remaining lines' order (array_filter keeps position)."""
    lines = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("line")
    )
    bp = (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .agg(F.collect_set("line").alias("bp"))
    )
    # the boilerplate set is corpus-small by construction (lines shared
    # by many docs) → broadcast-joined as a single-row array
    out = df.crossJoin(F.broadcast(bp))
    kept = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda ln: ~F.array_contains(F.coalesce(F.col("bp"), F.array()), ln),
    )
    return out.select(
        F.col(id_col), F.array_join(kept, "\n").alias("clean_text")
    )


# hex thresholds over the md5-prefix space: lexicographic compare on
# lowercase hex ≡ numeric compare, and both Spark and ANSI SQL engines
# produce identical md5 strings — a portable deterministic splitter.
# Everything above the last bound falls into _SPLIT_REST.
_SPLIT_BOUNDS = [("train", "e6666666"), ("val", "f3333333")]  # 0.9 / 0.05 / 0.05
_SPLIT_REST = "test"


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash — the
    held-out-split primitive a training pipeline needs: stable across
    runs and cluster sizes, no RNG, reassignment only if the salt
    changes. train/val/test ≈ 90/5/5 via md5-prefix thresholds."""
    h = F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 8)
    expr = None
    for label, bound in _SPLIT_BOUNDS:
        cond = h < bound
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return df.withColumn(out_col, expr.otherwise(F.lit(_SPLIT_REST)))


# conservative, dialect-portable patterns (no lookarounds — identical
# semantics in Java regex and RE2-style engines)
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"[0-9][0-9 \-]{6,}[0-9]", "<NUM>"),  # phone/account-number runs
]


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Regex PII scrubbing (emails, URLs, long digit runs) — the
    pre-training redaction pass, pure JVM regexp_replace."""
    c = F.col(text_col)
    for pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return df.withColumn(out_col, c)


def doc_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", *, window: int = 8
) -> DataFrame:
    """Winnowing-style fingerprint: min rolling-window hash over
    character ``window``-grams + whole-doc sha256."""
    c = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (window - 1), F.lit(1)))
    gram_hashes = F.transform(idx, lambda i: F.xxhash64(c.substr(i, F.lit(window))))
    return df.select(
        id_col,
        F.sha2(c, 256).alias("content_sha"),
        F.array_min(gram_hashes).alias("min_gram_hash"),
        F.array_max(gram_hashes).alias("max_gram_hash"),
    )


def benchmark_ngram_collisions(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of
    its distinct word ``n``-grams also occur in the evaluation/benchmark
    corpus (the GPT-3 appendix-C / Llama dedup-against-eval rule;
    ``contaminated`` = any collision).

    Scale shape: both sides explode to distinct xxhash64'd n-grams
    (whitespace-tokenized, lowercased) — one shuffle each — and meet in
    an equi-join on the 64-bit gram hash. Benchmark gram sets are small
    (eval suites are MBs), so Spark broadcasts that side; the training
    side streams through. Hashing keeps the shuffle rows at 8 bytes a
    gram instead of ~100.
    """

    def grams(df: DataFrame, keep_id: bool) -> DataFrame:
        # materialize the token array in its own projection: the
        # transform lambda below must reference an ATTRIBUTE, not the
        # split() expression — an expression captured in a lambda is
        # re-evaluated per element, turning the gram build O(tokens ×
        # doc_len). The alias is referenced ≥2× (size + lambda), which
        # blocks CollapseProject from inlining it back.
        wdf = df.select(
            *([F.col(id_col)] if keep_id else []),
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks"),
        )
        toks = F.col("_toks")
        k = F.size(toks) - F.lit(n - 1)
        hashes = F.when(
            k >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        out = wdf.select(
            *( [F.col(id_col)] if keep_id else [] ),
            F.explode(F.array_distinct(hashes)).alias("gram_h"),
        )
        return out

    bench_grams = grams(benchmark, keep_id=False).distinct()
    doc_grams = grams(docs, keep_id=True)
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_collisions"), F.lit(0)).alias("n_collisions"),
            (F.coalesce(F.col("n_collisions"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_dup_line_frac: float = 0.30,
    max_dup_char_frac: float = 0.20,
) -> DataFrame:
    """Within-document repetition metrics (the Gopher quality-filter
    family, Rae et al. 2021 table A1): fraction of lines that are
    duplicates of another line in the SAME document, and the fraction
    of characters in those duplicate lines; ``keep`` applies the
    standard thresholds. Boilerplate-heavy and looping generations
    fail exactly these.

    Two hash aggregations (doc_id,line) → doc_id — scale-safe; line
    text never leaves the executor un-aggregated."""
    line = F.explode(F.split(F.col(text_col), "\n")).alias("line")
    lines = (
        df.select(F.col(id_col), line)
        .where(F.length(F.trim(F.col("line"))) > 0)
    )
    per_line = lines.groupBy(id_col, "line").agg(
        F.count(F.lit(1)).alias("n"),
        F.length(F.first("line")).alias("len"),
    )
    per_doc = per_line.groupBy(id_col).agg(
        F.sum("n").alias("total_lines"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("dup_lines"),
        F.sum(F.col("n") * F.col("len")).alias("total_chars"),
        F.sum(F.when(F.col("n") > 1, F.col("n") * F.col("len")).otherwise(0)).alias(
            "dup_chars"
        ),
    )
    dlf = F.round(F.col("dup_lines") / F.col("total_lines"), 4)
    dcf = F.round(F.col("dup_chars") / F.col("total_chars"), 4)
    return per_doc.select(
        id_col,
        F.col("total_lines"),
        dlf.alias("dup_line_frac"),
        dcf.alias("dup_char_frac"),
        ((dlf <= max_dup_line_frac) & (dcf <= max_dup_char_frac)).alias("keep"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split long documents into fixed-size token windows with overlap —
    the standard pre-tokenization chunking step of an LLM training
    pipeline (context-window preparation, long-doc RAG indexing).

    Whitespace tokens; window k covers tokens [k·stride, k·stride +
    max_tokens) with stride = max_tokens − overlap. Pure JVM column
    expressions (sequence → transform → explode): one narrow pass, no
    shuffle, embarrassingly parallel at any corpus size — the chunk
    explosion multiplies rows ~len/stride, which is the point.

    Returns (id, chunk_idx, n_tokens, chunk_text). Deterministic, so
    exactly reproducible in ANSI SQL for the oracle gate.
    """
    if overlap >= max_tokens:
        raise ValueError(f"overlap {overlap} must be < max_tokens {max_tokens}")
    stride = max_tokens - overlap
    # split once into an attribute — a split() captured in the chunk
    # lambda would re-tokenize the whole doc per chunk (O(chunks × len))
    wdf = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    # number of windows: ceil((n - overlap) / stride), min 1
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.struct(
            k.cast("int").alias("chunk_idx"),
            F.least(n - k * stride, F.lit(max_tokens)).alias("n_tokens"),
            F.array_join(
                F.slice(toks, k * stride + 1, max_tokens), " "
            ).alias("chunk_text"),
        ),
    )
    return wdf.select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    round_to: int = 4,
) -> DataFrame:
    """Corpus-unigram log-probability quality score — the classic
    language-model quality proxy (CCNet-style: docs whose tokens are
    rare under the corpus distribution score low; gibberish, encoding
    damage, and boilerplate-free token salads sink to the bottom).

    score(doc) = mean over tokens of ln(count(token) / total_tokens),
    with the unigram model fit on the SAME corpus (no OOV by
    construction). Two shuffles at any scale: token-count aggregation,
    then a token-keyed join back (vocabulary-sized side — broadcastable
    for small corpora, a plain shuffle join at web scale); the total
    rides as a broadcast 1-row aggregate, never a driver collect.

    Returns (id, n_tokens, avg_logprob)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(F.sum("cnt").cast("double").alias("_total"))
    return (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("cnt").cast("double") / F.col("_total"))),
                round_to,
            ).alias("avg_logprob"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "avg_logprob")
    )


def sample_mixture(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    *,
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic corpus resampling to a target domain mixture —
    the DoReMi/Pile-style "domain weights" primitive: given target
    proportions per ``group_col`` value, keep the largest subcorpus
    whose composition matches them exactly, selecting documents by
    salted content hash (stable across runs and cluster sizes, no RNG).

    The math: with group sizes ``n_g`` and target weights ``w_g``, the
    binding group is the one minimizing ``n_g / w_g``; the achievable
    total is ``C = min_g(n_g / w_g)`` and each group keeps
    ``rate_g = C * w_g / n_g`` of its documents (the binding group
    keeps 100%).  A document survives iff its md5 fraction
    ``conv(md5-prefix)/2^32 < rate_g`` — the same threshold law as
    ``hash_split``, so survivors are a stable subset property of the
    document, not of the partitioning.

    Scale shape: one tiny groupBy (|groups| rows) broadcast back — the
    corpus-sized side never shuffles; the filter is a map-side
    predicate.  Groups absent from ``weights`` are dropped (weight 0).

    Returns the surviving rows of ``df`` plus ``keep_rate``.
    """
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    sizes = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .withColumn("_w", wmap[F.col(group_col)])
        .where(F.col("_w").isNotNull() & (F.col("_w") > 0))
    )
    binding = sizes.agg(F.min(F.col("_n") / F.col("_w")).alias("_cap"))
    rates = sizes.crossJoin(F.broadcast(binding)).select(
        group_col,
        F.least(
            F.lit(1.0), F.col("_cap") * F.col("_w") / F.col("_n")
        ).alias("keep_rate"),
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"), F.lit(":" + salt)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .where(frac < F.col("keep_rate"))
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the lightweight
    content-tagging / topic-sketch pass of a curation pipeline.

    ``score = tf * ln(N / df)`` with raw term counts and document
    frequency over the whole corpus.  Ties break on token text so the
    result is total-ordered and hash-stable.  Scale shape: explode →
    per-(doc,token) count → token-keyed document-frequency agg joined
    back (vocabulary-sized), then one window partitioned BY DOCUMENT —
    no global sort, no single-partition stage anywhere.

    Returns (id, token, rank, score).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    )
    tf = toks.groupBy("_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("df")), round_to
            ),
        )
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("_id").alias(id_col), "token", "rank", "score")
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Pairless near-duplication scoring: for each document, the share
    of its word ``n``-grams that first appeared in an EARLIER document
    (by ``id_col`` order).  A late near-copy of a template scores ≈1;
    genuinely fresh text scores ≈0 — the dedup-aware curriculum /
    incremental-crawl signal, without generating candidate pairs.

    Scale shape: explode to (gram, doc) → gram-keyed min-doc agg →
    join back → per-doc ratio.  Two shuffles on the gram key, no
    window, no pairs; the gram side prunes to DISTINCT per doc first
    so boilerplate repetition inside one doc doesn't inflate it.

    Returns (id, n_grams, seen_frac).
    """
    # split once into an attribute (≥2 references block CollapseProject)
    # — capturing the split() expression in the transform lambda would
    # re-tokenize the whole doc per gram: O(tokens × doc_len)
    wdf = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_w"),
    )
    words = F.col("_w")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    # shuffle the gram's 64-bit hash, not the string: distinct, the
    # min-doc agg and the join back only need gram identity — identical
    # groups absent an xxhash64 collision, which the oracle hash gate
    # would expose (the repo's banding precedent; r6)
    grams = wdf.select(
        "_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice(words, i, n))
                ),
            )
        ).alias("gram"),
    ).distinct()
    first_seen = grams.groupBy("gram").agg(F.min("_id").alias("first_id"))
    return (
        grams.join(first_seen, "gram")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.avg((F.col("first_id") < F.col("_id")).cast("double")),
                round_to,
            ).alias("seen_frac"),
        )
        .select(F.col("_id").alias(id_col), "n_grams", "seen_frac")
    )
