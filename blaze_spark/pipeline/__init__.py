"""Large-scale training-data pipeline operators — EXTENSIONS beyond the
reference surface (BASELINE.json north_star): deduplication, similarity
search, text analysis, multimodal column plumbing.

All hot paths are JVM-side higher-order functions (transform/aggregate/
zip_with) over arrays — no per-row Python.  Python appears only in the
multimodal decode stubs (mapInPandas, Arrow-batched), where a real
deployment would call image/audio codecs.
"""

from .dedup import (  # noqa: F401
    cross_doc_dup_lines,
    cross_doc_dup_ngrams,
    cross_doc_dup_spans,
    dup_span_popularity,
    exact_dedup,
    edit_distance_pairs,
    exact_jaccard_pairs,
    normalized_dedup,
    minhash_signatures,
    minhash_candidates,
    simhash,
    simhash_candidates,
    ngram_jaccard_pairs,
    winnow_fingerprints,
    winnow_candidates,
)
from .recall import (  # noqa: F401
    pair_recall,
    topk_recall,
)
from .similarity import (  # noqa: F401
    assign_clusters,
    ann_topk,
    batched_topk,
    cosine_topk,
    embedding_neardup_pairs,
    lsh_auto_params,
    lsh_cosine_topk,
    lsh_tables_required,
    neardup_pairs,
    pq_neardup_pairs,
    semantic_dedup,
)
from .cluster import (  # noqa: F401
    canonical_docs,
    connected_components,
    dedup_clusters,
)
from .text import (  # noqa: F401
    language_id,
    quality_features,
    token_stats,
    fingerprint,
)
from .curation import (  # noqa: F401
    apply_source_mix,
    blocklist_filter,
    c4_clean,
    contamination_report,
    corpus_report,
    domain_mix,
    extract_urls,
    gopher_rules,
    ngram_array,
    pii_scrub,
    repetition_features,
    source_mix,
    temperature_source_mix,
    unimax_source_mix,
    token_commonness,
    top_ngram_share,
)
from .retrieval import (  # noqa: F401
    bm25_topk,
)
from .packing import (  # noqa: F401
    chunk_documents,
    pack_sequences,
    train_val_test_split,
)
from .tokenizer import (  # noqa: F401
    BPETokenizer,
    Tokenizer,
    UnigramTokenizer,
    VocabTokenizer,
    WhitespaceTokenizer,
    WordPieceTokenizer,
    tokenizer_from_wire,
)
from .bloom import (  # noqa: F401
    BloomFilter,
    bloom_contains,
    bloom_contamination,
    bloom_two_phase_contamination,
    build_bloom,
    build_ngram_bloom,
    expected_fpr,
    load_bloom,
    optimal_k,
    save_bloom,
    size_for,
)
from .tokenizer_train import (  # noqa: F401
    tokenizer_stats,
    train_bpe,
    train_unigram,
    train_vocab,
    train_wordpiece,
    word_frequencies,
)
from .pq import (  # noqa: F401
    ivf_pq_range_search,
    ivf_pq_topk,
    load_codebooks,
    pq_decode,
    pq_encode,
    pq_fit,
    pq_range_search,
    pq_topk,
    read_pq_codes,
    save_codebooks,
    write_pq_codes,
)
from .lm import (  # noqa: F401
    ngram_lm_fit,
    ngram_lm_logprob,
    perplexity_buckets,
    perplexity_filter,
)
from .selection import (  # noqa: F401
    calibrate_key_threshold,
    calibrate_score_threshold,
    dsir_log_weights,
    hashed_bucket_counts,
    model_weights,
    ngram_buckets,
    quality_classifier,
    token_buckets,
    train_quality_classifier,
    TrainedQualityModel,
    weighted_sample,
)
from .quantize import (  # noqa: F401
    dequantize_embeddings,
    quantize_embeddings,
    read_quantized,
    write_quantized,
)
from .multimodal import (  # noqa: F401
    IMAGE_SCHEMA,
    AUDIO_SCHEMA,
    attach_fake_binary,
    decode_images,
    extract_image_features,
    sample_video_frames,
)
