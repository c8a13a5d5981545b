from neulix_datahub_spark.operators.dedupe import (
    dedupe_append,
    exact_dedup,
    minhash_near_duplicates,
    simhash,
)
from neulix_datahub_spark.operators.dedupe_index import (
    build_dedup_index,
    canonical_index_survivors,
    compact_dedup_index,
    dedup_survivors,
    ingest_dedup_delta,
)
from neulix_datahub_spark.operators.semantic_index import (
    build_semantic_index,
    compact_semantic_index,
    ingest_semantic_delta,
    semantic_survivors,
)
from neulix_datahub_spark.operators.classifier import (
    logistic_score,
    train_logistic_classifier,
)
from neulix_datahub_spark.operators.components import (
    canonical_by_components,
    dedup_by_components,
)
from neulix_datahub_spark.operators.passage_index import (
    build_passage_index,
    compact_passage_index,
    ingest_passage_delta,
    scrub_against_passage_index,
)
from neulix_datahub_spark.operators.passages import (
    matching_passages,
    remove_matching_passages,
    remove_repeated_passages,
    repeated_passages,
)
from neulix_datahub_spark.operators.profile import profile_table, profile_stats, top_k_values
from neulix_datahub_spark.operators.sequence import with_sequential_id
from neulix_datahub_spark.operators.similarity import (
    cosine_similarity_expr,
    cosine_top_k,
    vector_banded_signatures,
)
from neulix_datahub_spark.operators.upsert import upsert

__all__ = [
    "profile_table",
    "profile_stats",
    "top_k_values",
    "dedupe_append",
    "exact_dedup",
    "build_dedup_index",
    "ingest_dedup_delta",
    "compact_dedup_index",
    "dedup_survivors",
    "canonical_index_survivors",
    "train_logistic_classifier",
    "logistic_score",
    "build_semantic_index",
    "compact_semantic_index",
    "ingest_semantic_delta",
    "semantic_survivors",
    "minhash_near_duplicates",
    "simhash",
    "dedup_by_components",
    "canonical_by_components",
    "repeated_passages",
    "remove_repeated_passages",
    "matching_passages",
    "remove_matching_passages",
    "build_passage_index",
    "ingest_passage_delta",
    "compact_passage_index",
    "scrub_against_passage_index",
    "upsert",
    "with_sequential_id",
    "cosine_top_k",
    "vector_banded_signatures",
    "cosine_similarity_expr",
]
