"""Large-scale data-pipeline operators: dedup, similarity, text analysis,
relational helpers. See each module's docstring for the scale design."""

from exon_duckdb_spark.operators.dedup import (  # noqa: F401
    duplicated_spans,
    remove_spans,
    contamination_report,
    decontaminate,
    dedup_clusters,
    embedding_dup_pairs,
    exact_dedup,
    exact_dedup_stats,
    minhash_lsh_pairs,
    minhash_signature,
    near_dedup_keep_list,
    chargram_near_dup_pairs,
    edit_distance_pairs,
    ngram_jaccard_pairs,
    paragraph_dedup,
    semantic_dedup,
    simhash,
)
from exon_duckdb_spark.operators.hashing import md5_int, md5_int_sql, seeded_hash, seeded_hash_sql  # noqa: F401
from exon_duckdb_spark.operators.multimodal import (  # noqa: F401
    attach_media_metadata,
    decode_audio,
    decode_image,
    encode_avi_mjpeg,
    image_features,
    mp4_duration,
    parse_avi_mjpeg,
    resize_image,
    sample_frames,
    sniff_mime,
)
from exon_duckdb_spark.operators.relational import (  # noqa: F401
    asof_join,
    range_join,
    sessionize,
    top_k_per_group,
)
from exon_duckdb_spark.operators.similarity import (  # noqa: F401
    ann_topk,
    bm25_topk,
    bm25_topk_multi,
    cosine,
    cosine_topk,
    dot,
    hybrid_topk,
    hyperplane_bucket,
    ivf_build,
    ivf_search,
    ivf_topk,
    kmeans_refine,
)
from exon_duckdb_spark.operators.quality import (  # noqa: F401
    bigram_perplexity_score,
    perplexity_score,
    pii_scrub,
    quality_filter,
    repetition_stats,
    source_mix_report,
    word_ngrams,
)
from exon_duckdb_spark.operators.pq import (  # noqa: F401
    ivfpq_build,
    ivfpq_search,
    pq_codebooks,
    pq_encode,
    pq_search,
    sq8_encode,
    sq8_search,
)
from exon_duckdb_spark.operators.text import (  # noqa: F401
    bpe_token_count,
    cluster_topics,
    bpe_tokens,
    chunk_documents,
    doc_fingerprint,
    hash_sample,
    temperature_mix,
    language_id,
    pack_sequences,
    text_stats,
    tfidf_top_terms,
    token_count,
    tokens,
    top_ngrams,
)
