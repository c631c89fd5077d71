from .dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)
from .similarity import (brute_force_knn, centroid_similarity,
                         cosine_neardup_pairs, group_centroids,
                         hyperplane_lsh_buckets, l2_normalize,
                         lsh_neardup_pairs, ivf_build, ivf_knn)
from .multimodal import attach_blob_metadata, decode_image_stub, extract_image_features
from .joins import asof_join, broadcast_dim_join, interval_join
from .sampling import (affine_uniform, sample_per_group, split_assign,
                       stratified_sample)
from .packing import concat_chunk_pack
from .corpus import line_stats, repetition_filter, top_ngram_share
from .cleaning import (c4_flags, c4_keep, c4_line_stats, ngram_contamination,
                       pii_counts, redact_pii)
from .ranking import (bm25_scores, build_vocab, doc_term_freqs, oov_rate,
                      tfidf_scores, top_terms)

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
    "lsh_neardup_pairs",
    "ivf_build",
    "ivf_knn",
    "l2_normalize",
    "group_centroids",
    "centroid_similarity",
    "asof_join",
    "broadcast_dim_join",
    "interval_join",
    "attach_blob_metadata",
    "decode_image_stub",
    "extract_image_features",
    "affine_uniform",
    "stratified_sample",
    "split_assign",
    "sample_per_group",
    "concat_chunk_pack",
    "line_stats",
    "top_ngram_share",
    "repetition_filter",
    "pii_counts",
    "redact_pii",
    "c4_line_stats",
    "c4_flags",
    "c4_keep",
    "ngram_contamination",
    "doc_term_freqs",
    "tfidf_scores",
    "top_terms",
    "bm25_scores",
    "build_vocab",
    "oov_rate",
]
