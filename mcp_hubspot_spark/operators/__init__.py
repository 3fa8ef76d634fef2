from .scans import filtered_scan, filtered_scan_with_total, recent_scan, semi_lookup
from .topk import top_k
from .joins import asof_join, association_expand, dedup_insert, range_join, snapshot_diff
from .analytics import ordered_funnel, percentile_buckets, transition_matrix
from .dedup import (
    connected_components,
    deletion_neighborhood_pairs,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_contamination,
    semantic_contamination,
    semantic_contamination_matmul,
    semantic_dedup,
    semantic_dedup_matmul,
    simhash,
)
from .graph import clustering_coefficients, pagerank, triangle_count
from .profiling import (
    dq_checks,
    profile_table,
    profile_table_approx,
    referential_violations,
)
from .sampling import (
    hash_split,
    hash_stratified_sample,
    per_group_cap,
    poisson_bootstrap_ci,
    weighted_sample,
)
from .classifier import (
    classifier_score,
    classifier_score_expr,
    hashed_weight_table,
)
from .profiling import heaps_fit, zipf_fit
from .text import (
    blocklist_hits,
    blocklist_scrub,
    phrase_occurrences,
    bpe_learn_merges,
    chunk_documents,
    greedy_pack_docs,
    redact_pii,
)
from .timeseries import resample_locf, scd2_intervals

__all__ = [
    "ordered_funnel",
    "clustering_coefficients",
    "triangle_count",
    "percentile_buckets",
    "transition_matrix",
    "deletion_neighborhood_pairs",
    "semantic_dedup_matmul",
    "profile_table_approx",
    "filtered_scan",
    "filtered_scan_with_total",
    "recent_scan",
    "semi_lookup",
    "top_k",
    "asof_join",
    "association_expand",
    "dedup_insert",
    "range_join",
    "snapshot_diff",
    "connected_components",
    "embedding_neardup_pairs",
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_contamination",
    "semantic_contamination",
    "semantic_contamination_matmul",
    "semantic_dedup",
    "simhash",
    "pagerank",
    "dq_checks",
    "profile_table",
    "referential_violations",
    "hash_split",
    "hash_stratified_sample",
    "per_group_cap",
    "poisson_bootstrap_ci",
    "weighted_sample",
    "classifier_score",
    "classifier_score_expr",
    "hashed_weight_table",
    "zipf_fit",
    "heaps_fit",
    "blocklist_hits",
    "blocklist_scrub",
    "phrase_occurrences",
    "bpe_learn_merges",
    "chunk_documents",
    "greedy_pack_docs",
    "redact_pii",
    "resample_locf",
    "scd2_intervals",
]
