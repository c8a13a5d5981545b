"""Multimodal column plumbing (SURVEY §2.11 L5).

Convention: a media asset is an opaque ``binary`` payload column plus a
typed metadata struct — the schema a 100 TB media lake actually uses
(payloads in parquet/object storage, metadata queryable columnar):

    content  binary
    media    struct<kind:string, mime:string, width:int, height:int,
                    duration_ms:bigint, sample_rate:int>

The Spark-side plumbing here is real and tested: binaryFile ingestion,
metadata derivation, Arrow-batched ``mapInPandas`` transforms with the
right schemas and partitioning. The actual codec work (image decode,
resample, frame extraction) requires media libraries not present in this
container — those steps are deterministic fakes behind the same
signatures, clearly marked, so swapping in PIL/ffmpeg later changes one
function body, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

_EXT_TO_KIND = {
    "jpg": ("image", "image/jpeg"), "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"), "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"), "mp4": ("video", "video/mp4"),
}


def read_binary_assets(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """L5 source: ``binaryFile`` scan → (path, modificationTime, length,
    content) + derived media metadata struct from the extension."""
    df = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind = F.coalesce(
        *[F.when(ext == e, F.lit(k)) for e, (k, _) in _EXT_TO_KIND.items()], F.lit("unknown")
    )
    mime = F.coalesce(
        *[F.when(ext == e, F.lit(m)) for e, (_, m) in _EXT_TO_KIND.items()],
        F.lit("application/octet-stream"),
    )
    return df.withColumn(
        "media",
        F.struct(
            kind.alias("kind"), mime.alias("mime"),
            F.lit(None).cast("int").alias("width"), F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fake for image decode (no PIL/opencv in this
    container). Derives a stable (width, height) from the payload bytes so
    the pipeline is testable end-to-end. Swap body for
    ``PIL.Image.open(io.BytesIO(payload)).size`` in a full environment."""
    import hashlib

    # hashlib, not hash(): builtin hash of bytes is salted per process, so
    # it would disagree across executors.
    h = int.from_bytes(hashlib.sha1(payload[:64]).digest()[:4], "big")
    return 64 + h % 1024, 64 + (h >> 10) % 1024


def extract_image_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """L5 transform: per-asset feature extraction via Arrow-batched
    mapInPandas — the batch shape (one pdf per ~few MB of payloads) is the
    real design; only the codec inside is faked. Output adds
    ``width/height/n_bytes``."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode_image(bytes(b)) for b in pdf[content_col]]
            pdf = pdf.assign(
                width=[d[0] for d in dims],
                height=[d[1] for d in dims],
                n_bytes=[len(bytes(b)) for b in pdf[content_col]],
            )
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000,
                        content_col: str = "content") -> DataFrame:
    """L5 transform: explode each video asset into frame rows
    (asset_path, frame_idx, frame_ts_ms, frame binary). Frame extraction
    itself is a STUB (no ffmpeg here) returning deterministic slices; the
    explode shape, schema, and partition fan-out are the real design."""
    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[content_col])
                # STUB duration model: 1 frame per KB, capped at 16.
                n_frames = min(16, max(1, len(payload) // 1024))
                for i in range(n_frames):
                    rows.append(
                        {
                            "path": r["path"],
                            "frame_idx": i,
                            "frame_ts_ms": i * every_ms,
                            "frame": payload[i * 64 : (i + 1) * 64],
                        }
                    )
            yield pd.DataFrame(rows, columns=["path", "frame_idx", "frame_ts_ms", "frame"])

    return df.select("path", content_col).mapInPandas(op, schema=out_schema)
