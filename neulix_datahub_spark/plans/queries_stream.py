"""Driver-visible wrappers for the non-SQL streaming operators (S2/S4
extensions, U3): these run a bounded Structured Streaming query to
completion and return the materialized result. No DuckDB oracle exists
for stateful streaming — the driver records the weaker rows-only check;
exact batch parity is asserted in tests/test_streaming.py instead.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neulix_datahub_spark.sources.tables import load_table
from neulix_datahub_spark.streaming.sinks import (
    read_upsert_table,
    stream_upsert_to_parquet,
)
from neulix_datahub_spark.streaming.stateful import running_user_totals
from neulix_datahub_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
)


def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running totals, drained to completion; the
    final emission per user is the answer."""
    name = f"stateful_totals_{uuid.uuid4().hex[:8]}"
    stream = running_user_totals(read_events_stream(spark, sf_dir))
    run_stream_to_memory(stream, name, output_mode="update")
    return spark.sql(
        f"""SELECT user_id, n_events, sum_value, max_value FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY n_events DESC) AS rn
                FROM {name})
            WHERE rn = 1"""
    ).drop("rn")


def stream_upsert_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE sink: latest event per user after draining the
    stream into a snapshot-versioned parquet table."""
    tmp = tempfile.mkdtemp(prefix="neulix_stream_upsert_")
    stream = read_events_stream(spark, sf_dir)
    q = stream_upsert_to_parquet(
        stream, f"{tmp}/table", key="user_id", tiebreak="ts",
        checkpoint_dir=f"{tmp}/ckpt",
    )
    q.awaitTermination()
    out = read_upsert_table(spark, f"{tmp}/table")
    return out.select("user_id", "ts", "event_type", F.round("value", 4).alias("value"))


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 plumbing, driver-visible: synthesize a binary asset column from
    the documents fixture (payload = utf-8 text bytes), run the Arrow-
    batched mapInPandas feature extraction, and aggregate the derived
    metadata. Rows-only: the decode step is the documented deterministic
    stub; the schema/batching/partitioning are the real design."""
    from neulix_datahub_spark.operators.multimodal import extract_image_features
    from neulix_datahub_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    assets = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    feats = extract_image_features(assets)
    return (
        feats.groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
        )
    )


def lsh_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 end-to-end: MinHash LSH candidates → connected components →
    one survivor per near-dup cluster. The fixture has no near-dups, so
    the pipeline plants perturbed copies (id+1e6, first token dropped)
    and must remove exactly the planted rows — leaving the original
    corpus size per language. Rows-only (xxhash64 is Spark-specific);
    the survivor-count invariant is asserted in tests."""
    from neulix_datahub_spark.operators.components import dedup_by_components
    from neulix_datahub_spark.operators.dedupe import minhash_near_duplicates

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    perturbed = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "text", F.expr("substring(text, instr(text, ' ') + 1)")
    )
    corpus = docs.unionByName(perturbed)
    pairs = minhash_near_duplicates(corpus, "text", "doc_id", num_hashes=64, bands=16)
    kept = dedup_by_components(corpus, pairs, id_col="doc_id")
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs_kept"))
        .orderBy("lang")
    )


STREAM_QUERIES = {
    "multimodal_features": (multimodal_features, None, "L5 multimodal plumbing"),
    "lsh_dedup_pipeline": (lsh_dedup_pipeline, None, "L2 LSH dedup end-to-end"),
    "stateful_user_totals": (stateful_user_totals, None, "U3 applyInPandasWithState"),
    "stream_upsert_latest_events": (
        stream_upsert_latest_events,
        None,
        "J2/IO14 foreachBatch MERGE sink",
    ),
}
