"""Large-scale training-data pipeline operators (100 TB-first).

Beyond the reference's own surface (SURVEY.md §2.2), this package adds
the operations a training-data pipeline needs: deduplication families,
similarity search over embeddings, text analysis, and multimodal column
plumbing. All operators are DataFrame → DataFrame, shuffle-conscious,
and avoid driver-side collection.
"""

from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from .similarity import (  # noqa: F401
    cosine_similarity_col,
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_bucket_topk,
)
from .text import (  # noqa: F401
    language_id,
    quality_score,
    token_stats,
    document_fingerprint,
)
