"""Sequence packing: fill fixed-size training contexts with documents.

The last data-prep stage of an LLM pipeline: concatenate documents into
``max_tokens``-sized training sequences with minimal padding. Exact
global first-fit packing is inherently sequential, so at corpus scale
every real pipeline packs per shard: documents are hash/id-assigned to
shards, each shard packs its documents in a deterministic order, and
shards are processed in parallel. That is exactly the Spark layout
here — one shuffle to the shard key, then an Arrow ``applyInPandas``
greedy pass per shard (the per-shard pass is a linear scan; the
parallelism knob is ``n_shards``, sized so a shard's doc list fits an
executor comfortably: metadata-only, ~16 bytes/doc).

Greedy next-fit by id order (the common choice — deterministic and
cache-friendly; first-fit-decreasing packs ~1-2% tighter but destroys
document order locality): a document that does not fit the current bin
opens a new one; oversized documents (> max_tokens) get their own bin
(real pipelines chunk them first — compose with
``text.chunk_documents``).

Deterministic ⇒ reproducible in ANSI SQL (recursive CTE walking each
shard in id order) for the oracle gate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_tokens: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """(id, shard, bin_id, n_tokens) — greedy next-fit packing of
    whitespace token counts into ``max_tokens`` bins, per shard
    (``shard = id % n_shards``), docs in ascending id order."""
    counted = df.select(
        F.col(id_col).alias("_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"),
    )

    out_schema = f"{id_col} long, shard int, bin_id int, n_tokens int"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id", ignore_index=True)
        bins, fill, cur = [], 0, -1
        for n in pdf["n_tokens"]:
            n = int(n)
            if cur < 0 or fill + n > max_tokens:
                cur += 1
                fill = n
            else:
                fill += n
            bins.append(cur)
        return pd.DataFrame(
            {
                id_col: pdf["_id"],
                "shard": pdf["shard"],
                "bin_id": pd.Series(bins, dtype="int32"),
                "n_tokens": pdf["n_tokens"].astype("int32"),
            }
        )

    return counted.groupBy("shard").applyInPandas(_pack, schema=out_schema)


def packing_efficiency(packed: DataFrame, *, max_tokens: int) -> DataFrame:
    """One-row accounting of a packing: bins, mean fill, waste fraction
    ("no silent caps" for the padding the packing failed to avoid)."""
    per_bin = packed.groupBy("shard", "bin_id").agg(
        F.sum("n_tokens").alias("fill")
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("fill").alias("total_tokens"),
        F.round(F.avg("fill"), 2).alias("mean_fill"),
        F.round(
            1 - F.sum("fill") / (F.count(F.lit(1)) * F.lit(max_tokens)), 4
        ).alias("pad_frac"),
    )
