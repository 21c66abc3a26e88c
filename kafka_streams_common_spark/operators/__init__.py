"""First-class extension operators for large-scale training-data pipelines.

These go beyond the reference's surface (SURVEY.md §2.7 disposition row
"dedup / similarity search / text analysis / multimodal"): deduplication
(exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding cosine), approximate
similarity search, text analysis, and multimodal binary-column plumbing.

Design rules (the 100 TB posture):
- pure DataFrame/higher-order-function expressions wherever possible — the
  whole dedup family is JVM-side, no Python in the hot path;
- candidate generation always goes through a bucketing/banding join (LSH
  bands, simhash blocks, IVF cells), never an O(n²) cross join — brute-force
  variants exist only as small-side baselines/oracles;
- all hashing is md5-derived (functions.hashing) so the DuckDB oracle can
  reproduce results bit-for-bit.
"""

from kafka_streams_common_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    word_shingles,
)
from kafka_streams_common_spark.operators.similarity import (
    brute_force_cosine_topk,
    embedding_near_dup_pairs,
    ivf_cosine_topk,
)
from kafka_streams_common_spark.operators.text import (
    document_fingerprints,
    lang_id,
    text_quality,
    token_counts,
)
from kafka_streams_common_spark.operators.multimodal import (
    attach_fake_image_payload,
    extract_byte_histogram_features,
)

__all__ = [
    "attach_fake_image_payload",
    "brute_force_cosine_topk",
    "document_fingerprints",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "extract_byte_histogram_features",
    "ivf_cosine_topk",
    "lang_id",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "text_quality",
    "token_counts",
    "word_shingles",
]
