from .assemble import assemble_documents, ordered_concat
from .dedup import (
    benchmark_contamination,
    connected_components,
    drop_exact_duplicates,
    drop_near_duplicates,
    exact_duplicate_groups,
    incremental_near_dup_pairs,
    md5_hash60,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from .extract import (
    blocks_table,
    decode_binary_pages,
    extract_documents,
    extract_html_documents,
)
from .metrics import corpus_counters, partition_metrics, status_summary
from .resume import pending_documents, resume_run, with_doc_hash
from .asof import asof_join, sessionize
from .similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    ivf_topk,
    lsh_topk,
)
from .sampling import hash_sample, hash_split
from .packing import pack_sequences, packed_sequence_stats
from .lm import bigram_lm_scores, train_bigram_lm
from .urls import canonical_url, canonicalize_urls, domain_stats, registrable_domain
from .textstats import (
    document_fingerprint,
    gopher_quality,
    guess_language,
    quality_features,
    repetition_signals,
    scrub_pii,
    token_count,
    with_token_stats,
)

__all__ = [
    "benchmark_contamination",
    "canonical_url",
    "canonicalize_urls",
    "domain_stats",
    "hash_sample",
    "hash_split",
    "pack_sequences",
    "packed_sequence_stats",
    "bigram_lm_scores",
    "train_bigram_lm",
    "registrable_domain",
    "connected_components",
    "asof_join",
    "brute_force_topk",
    "ivf_topk",
    "sessionize",
    "document_fingerprint",
    "gopher_quality",
    "drop_exact_duplicates",
    "drop_near_duplicates",
    "embedding_near_duplicates",
    "exact_duplicate_groups",
    "guess_language",
    "lsh_topk",
    "md5_hash60",
    "incremental_near_dup_pairs",
    "minhash_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "quality_features",
    "repetition_signals",
    "scrub_pii",
    "simhash64",
    "simhash_near_pairs",
    "token_count",
    "with_token_stats",
    "assemble_documents",
    "blocks_table",
    "corpus_counters",
    "decode_binary_pages",
    "extract_documents",
    "extract_html_documents",
    "ordered_concat",
    "partition_metrics",
    "pending_documents",
    "resume_run",
    "status_summary",
    "with_doc_hash",
]
