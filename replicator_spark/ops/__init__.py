"""Large-scale training-data pipeline operators (beyond the reference's
own surface): deduplication (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine), similarity search (brute-force + LSH-
bucketed ANN), text analysis (lang-ID, quality, tokens, fingerprints),
and multimodal column plumbing."""

from .dedup_text import (  # noqa: F401
    bucket_candidate_pairs,
    bucket_stats,
    exact_dedup,
    lsh_band_buckets,
    minhash_signatures,
    minhash_lsh_bucket_stats,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dups,
)
from .similarity import (  # noqa: F401
    brute_force_knn,
    lsh_bucket_knn,
    lsh_near_dup_pairs,
)
from .text import (  # noqa: F401
    detect_lang,
    doc_fingerprints,
    quality_features,
    token_stats,
)
