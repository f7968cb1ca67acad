from ralf_spark.operators.dedup import (
    MinHashIndex,
    dedup_clusters,
    exact_dedup,
    minhash_signature,
    near_dup_pairs,
)
from ralf_spark.operators.joins import (
    asof_join,
    enrichment_join,
    one_shot_join,
)
from ralf_spark.operators.multimodal import (
    binary_stats,
    decode_image_features,
    frame_sample,
    resize_images,
    with_binary_payload,
)
from ralf_spark.operators.policies import (
    change_detection_filter,
    change_detection_window,
    keep_latest,
    sampling_shed,
)
from ralf_spark.operators.similarity import (
    IvfIndex,
    ann_topk,
    kmeans_fit,
    cosine_topk,
    embedding_near_dup,
    sign_lsh_bucket,
)
from ralf_spark.operators.text_analysis import (
    add_simhash,
    language_id,
    quality_score,
    simhash_fingerprint,
    token_count_regex,
)
from ralf_spark.operators.windows import (
    sliding_count_window,
    tumbling_count_window,
)

__all__ = [
    "IvfIndex",
    "MinHashIndex",
    "add_simhash",
    "ann_topk",
    "asof_join",
    "binary_stats",
    "change_detection_filter",
    "change_detection_window",
    "cosine_topk",
    "decode_image_features",
    "dedup_clusters",
    "embedding_near_dup",
    "enrichment_join",
    "exact_dedup",
    "frame_sample",
    "keep_latest",
    "kmeans_fit",
    "language_id",
    "minhash_signature",
    "near_dup_pairs",
    "one_shot_join",
    "quality_score",
    "resize_images",
    "sampling_shed",
    "sign_lsh_bucket",
    "simhash_fingerprint",
    "sliding_count_window",
    "token_count_regex",
    "tumbling_count_window",
    "with_binary_payload",
]
