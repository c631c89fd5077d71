from .dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)
from .similarity import brute_force_knn, cosine_neardup_pairs, hyperplane_lsh_buckets
from .multimodal import attach_blob_metadata, decode_image_stub, extract_image_features

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_dedup",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_candidates",
    "brute_force_knn",
    "cosine_neardup_pairs",
    "hyperplane_lsh_buckets",
    "attach_blob_metadata",
    "decode_image_stub",
    "extract_image_features",
]
