"""Large-scale training-data pipeline operators (100 TB-first).

Beyond the reference's own surface (SURVEY.md §2.2), this package adds
the operations a training-data pipeline needs: deduplication families,
similarity search over embeddings, text analysis, and multimodal column
plumbing. All operators are DataFrame → DataFrame, shuffle-conscious,
and avoid driver-side collection.
"""

from .dedup import (  # noqa: F401
    dedup_clusters,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    span_dedup,
)
from .similarity import (  # noqa: F401
    cosine_similarity_col,
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_bucket_topk,
)
from .codec_meta import (  # noqa: F401
    codec_metadata,
    parse_h264,
    parse_mp3,
)
from .text import (  # noqa: F401
    document_fingerprint,
    language_id,
    quality_score,
    redact_pii,
    repetition_signals,
    token_stats,
    unigram_logprob,
)
