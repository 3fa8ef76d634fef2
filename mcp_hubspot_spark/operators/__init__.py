from .scans import filtered_scan, filtered_scan_with_total, recent_scan, semi_lookup
from .topk import top_k
from .joins import asof_join, association_expand, dedup_insert, range_join, snapshot_diff
from .dedup import (
    connected_components,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_contamination,
    simhash,
)
from .graph import pagerank
from .sampling import hash_split, hash_stratified_sample
from .text import chunk_documents, redact_pii

__all__ = [
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
    "simhash",
    "pagerank",
    "hash_split",
    "hash_stratified_sample",
    "chunk_documents",
    "redact_pii",
]
