"""Driver-visible multimodal (L5) queries: the REAL binary decoders
exercised end-to-end under the exact-hash gate.

The testdata has no binary fixture tables, so each query SYNTHESIZES
deterministic media payloads from the documents table (pixel/sample
values are pure integer functions of (doc_id, position)), encodes them
with the real encoders (operators/multimodal.py encode_bmp /
encode_pcm_wav), runs the REAL decoders + feature extractors over the
binary column, and aggregates. The DuckDB oracle recomputes the same
features in closed form from the same integer formulas over
generate_series — so a green row proves the decode path (byte layout,
stride/padding, channel order, sample scaling) bit-for-bit, not just
that rows came back.

Exactness discipline: every hashed float is either an exact binary
fraction (integer sums divided by powers of two: channel means, peak)
or derived from one by IEEE-identical steps (rms = sqrt of an exactly-
representable mean), so both engines produce bit-identical doubles
with NO rounding tolerance. See the operator docstrings for why the
extractors deliberately emit un-rounded values.

Reference trace: the reference pipeline stores media as opaque blobs
next to queryable metadata (SURVEY §2.11); these queries are the
engine-side proof that decode-derived features can join that metadata
at scale (mapInPandas over the binary column, Arrow-batched, one pass).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neulix_datahub_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_IMG_W = _IMG_H = 16
_WAV_N = 1600
_WAV_RATE = 8000


def bmp_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 image tier under the hash gate: every doc_id % 3 == 0 document
    gets a 16x16 BMP whose pixel (i,j) is
        r = (7*doc_id + 3*i + 5*j) % 256
        g = (11*doc_id + i + 2*j) % 256
        b = (13*doc_id + 4*i + j) % 256
    encoded with encode_bmp and decoded back by the REAL
    decode_bmp_pixels inside extract_image_features. Per-language:
    image count, width/height checksums, and the average channel means
    (exact binary fractions — see module docstring).

    Plan shape: one documents scan, one mapInPandas encode, one
    mapInPandas decode (both Arrow-batched over the binary column), one
    hash aggregate. The binary column never leaves the executors.
    """
    from neulix_datahub_spark.operators.multimodal import (
        encode_bmp,
        extract_image_features,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", "lang")
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(_IMG_H).reshape(-1, 1)
        j = np.arange(_IMG_W).reshape(1, -1)
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                px = np.stack(
                    [
                        (7 * d + 3 * i + 5 * j) % 256,
                        (11 * d + i + 2 * j) % 256,
                        (13 * d + 4 * i + j) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "content": payloads}
            )

    assets = docs.mapInPandas(synth, schema=out_schema)
    feats = extract_image_features(assets)
    return (
        feats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.avg("mean_r").alias("avg_mean_r"),
            F.avg("mean_g").alias("avg_mean_g"),
            F.avg("mean_b").alias("avg_mean_b"),
        )
        .orderBy("lang")
    )


_BMP_SQL = f"""
WITH px AS (
    SELECT d.doc_id, d.lang,
           (7 * d.doc_id + 3 * i.i + 5 * j.j) % 256 AS r,
           (11 * d.doc_id + i.i + 2 * j.j) % 256 AS g,
           (13 * d.doc_id + 4 * i.i + j.j) % 256 AS b
    FROM documents d
    CROSS JOIN (SELECT unnest(generate_series(0, {_IMG_H - 1})) AS i) i
    CROSS JOIN (SELECT unnest(generate_series(0, {_IMG_W - 1})) AS j) j
    WHERE d.doc_id % 3 = 0
),
per_img AS (
    SELECT doc_id, lang,
           CAST(sum(r) AS DOUBLE) / {_IMG_W * _IMG_H} AS mean_r,
           CAST(sum(g) AS DOUBLE) / {_IMG_W * _IMG_H} AS mean_g,
           CAST(sum(b) AS DOUBLE) / {_IMG_W * _IMG_H} AS mean_b
    FROM px GROUP BY doc_id, lang
)
SELECT lang,
       count(*) AS n_images,
       CAST(count(*) * {_IMG_W} AS BIGINT) AS sum_width,
       CAST(count(*) * {_IMG_H} AS BIGINT) AS sum_height,
       avg(mean_r) AS avg_mean_r,
       avg(mean_g) AS avg_mean_g,
       avg(mean_b) AS avg_mean_b
FROM per_img
GROUP BY lang
ORDER BY lang
"""


def wav_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 audio tier under the hash gate: every doc_id % 4 == 0 document
    gets a 1600-sample 8 kHz mono PCM WAV whose sample i is
        s = (31*doc_id + 17*i + 7) % 65536 - 32768
    encoded with encode_pcm_wav and decoded back by the REAL
    decode_wav_samples inside extract_audio_content_features.
    Per-language: clip count, total samples, and the average rms/peak
    over clips (rms = sqrt of an exactly-representable mean of squares,
    peak = |s|max/2^15 — both bit-identical across engines).
    """
    from neulix_datahub_spark.operators.multimodal import (
        encode_pcm_wav,
        extract_audio_content_features,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 0)
        .select("doc_id", "lang")
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(_WAV_N, dtype=np.int64)
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                s = (31 * int(d) + 17 * i + 7) % 65536 - 32768
                payloads.append(encode_pcm_wav(_WAV_RATE, s.astype("<i2")))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "content": payloads}
            )

    assets = docs.mapInPandas(synth, schema=out_schema)
    feats = extract_audio_content_features(assets)
    return (
        feats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_samples").cast("long").alias("sum_samples"),
            # per-clip rms values are bit-identical across engines but
            # irrational, so their SUM picks up ±1 ulp of association
            # noise (~1e-16) — round the average at 9 dp (half-granule
            # 5e-10, a 5e6x margin). peak values are exact binary
            # fractions whose sum stays exactly representable: no
            # rounding needed or wanted.
            F.round(F.avg("rms"), 9).alias("avg_rms"),
            F.avg("peak").alias("avg_peak"),
        )
        .orderBy("lang")
    )


_WAV_SQL = f"""
WITH s AS (
    SELECT d.doc_id, d.lang,
           (31 * d.doc_id + 17 * i.i + 7) % 65536 - 32768 AS v
    FROM documents d
    CROSS JOIN (SELECT unnest(generate_series(0, {_WAV_N - 1})) AS i) i
    WHERE d.doc_id % 4 = 0
),
per_clip AS (
    -- mirror the decoder's float path exactly: x = s/2^15, so
    -- mean(x^2) = (sum(s^2) exact int) / 2^30 / n, every step an
    -- IEEE-identical double op
    SELECT doc_id, lang,
           sqrt(CAST(sum(v * v) AS DOUBLE) / 1073741824.0 / {_WAV_N}.0) AS rms,
           CAST(max(abs(v)) AS DOUBLE) / 32768.0 AS peak
    FROM s GROUP BY doc_id, lang
)
SELECT lang,
       count(*) AS n_clips,
       CAST(count(*) * {_WAV_N} AS BIGINT) AS sum_samples,
       round(avg(rms), 9) AS avg_rms,
       avg(peak) AS avg_peak
FROM per_clip
GROUP BY lang
ORDER BY lang
"""


MEDIA_QUERIES = {
    "bmp_decode_features": (
        bmp_decode_features,
        _BMP_SQL,
        "L5 image: real BMP pixel decode vs closed-form oracle",
    ),
    "wav_decode_features": (
        wav_decode_features,
        _WAV_SQL,
        "L5 audio: real PCM sample decode vs closed-form oracle",
    ),
}
