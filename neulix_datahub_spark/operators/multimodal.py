"""Multimodal column plumbing (SURVEY §2.11 L5).

Convention: a media asset is an opaque ``binary`` payload column plus a
typed metadata struct — the schema a 100 TB media lake actually uses
(payloads in parquet/object storage, metadata queryable columnar):

    content  binary
    media    struct<kind:string, mime:string, width:int, height:int,
                    duration_ms:bigint, sample_rate:int>

The Spark-side plumbing here is real and tested: binaryFile ingestion,
metadata derivation, Arrow-batched ``mapInPandas`` transforms with the
right schemas and partitioning. Container-format HEADER parsing is also
real where the format allows stdlib-only work: PNG IHDR and JPEG SOF
dimensions, WAV fmt/data sample-rate/channels/duration (``struct``
unpacking, no PIL/ffmpeg needed). Only pixel/sample DECODE work (image
resample, video frame extraction, mp3 decode) falls back to
deterministic fakes behind the same signatures, clearly marked, so
swapping in PIL/ffmpeg later changes one function body, not the
pipeline.
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png_dimensions(payload: bytes) -> tuple[int, int] | None:
    """REAL codec-free parse: (width, height) from the PNG IHDR chunk.

    The spec fixes the layout — 8-byte signature, then the IHDR chunk
    (4-byte length=13, b"IHDR", width u32be, height u32be) MUST come
    first — so the dimensions live at fixed offsets 16..24. Returns
    None for anything that isn't a well-formed PNG head."""
    import struct

    if len(payload) < 24 or not payload.startswith(_PNG_SIG):
        return None
    if payload[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return (w, h) if w > 0 and h > 0 else None


def parse_jpeg_dimensions(payload: bytes) -> tuple[int, int] | None:
    """REAL codec-free parse: (width, height) from the first JPEG SOFn
    marker segment (precision u8, height u16be, width u16be). Walks the
    marker stream; returns None if the stream is malformed or ends
    before a frame header."""
    import struct

    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        if i + 4 > len(payload):
            return None
        (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if seg_len < 2:
            return None
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry the frame size
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(payload):
                return None
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return (w, h) if w > 0 and h > 0 else None
        i += 2 + seg_len
    return None


def parse_wav_header(payload: bytes) -> tuple[int, int, int] | None:
    """REAL codec-free parse: (sample_rate, channels, duration_ms) from
    the RIFF/WAVE fmt and data chunks (all fields little-endian). Walks
    the chunk list, so extra chunks (LIST, fact, ...) in any order are
    fine. Returns None unless both fmt and data are present and sane."""
    import struct

    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    sample_rate = channels = byte_rate = None
    data_size = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if cid == b"fmt " and i + 20 <= len(payload):
            _fmt, channels, sample_rate, byte_rate = struct.unpack(
                "<HHII", payload[i + 8 : i + 20]
            )
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not sample_rate or not byte_rate or channels is None or data_size is None:
        return None
    return sample_rate, channels, data_size * 1000 // byte_rate


def parse_gif_dimensions(payload: bytes) -> tuple[int, int] | None:
    """REAL codec-free parse: (width, height) from the GIF logical
    screen descriptor — bytes 6..10, little-endian u16 pair, right
    after the GIF87a/GIF89a signature."""
    import struct

    if len(payload) < 10 or payload[0:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    return (w, h) if w > 0 and h > 0 else None


def parse_bmp_dimensions(payload: bytes) -> tuple[int, int] | None:
    """REAL codec-free parse: (width, height) from the BMP DIB header.
    The DIB size at offset 14 discriminates the two layouts: 12 is the
    legacy BITMAPCOREHEADER (u16 dims at 18/20 — reading it as i32
    would return garbage, not None); >=40 is BITMAPINFOHEADER (signed
    i32 pair at 18; a negative height encodes top-down row order, so
    its magnitude is the height)."""
    import struct

    if len(payload) < 22 or payload[0:2] != b"BM":
        return None
    (dib_size,) = struct.unpack("<I", payload[14:18])
    if dib_size == 12:
        w, h = struct.unpack("<HH", payload[18:22])
        return (w, h) if w > 0 and h > 0 else None
    if dib_size >= 40 and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return (w, abs(h)) if w > 0 and h != 0 else None
    return None


def parse_mp4_duration(payload: bytes) -> tuple[int, int] | None:
    """REAL codec-free parse: (timescale, duration_ms) from the MP4
    moov/mvhd box — an ISO-BMFF box walk (size u32be + fourcc), one
    level deep into moov, handling both mvhd versions (v0: u32 times,
    v1: u64). Returns None unless the file leads with ftyp and carries
    a sane mvhd."""
    import struct

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int, depth: int = 0):
        i = lo
        while i + 8 <= hi:
            (size,) = struct.unpack(">I", payload[i : i + 4])
            box = payload[i + 4 : i + 8]
            if size < 8 or i + size > hi:
                return None
            if box == b"moov" and depth == 0:
                found = walk(i + 8, i + size, 1)
                if found is not None:
                    return found
            elif box == b"mvhd" and depth == 1:
                ver = payload[i + 8]
                if ver == 0 and size >= 8 + 4 + 16:
                    ts, dur = struct.unpack(">II", payload[i + 20 : i + 28])
                elif ver == 1 and size >= 8 + 4 + 28:
                    (ts,) = struct.unpack(">I", payload[i + 28 : i + 32])
                    (dur,) = struct.unpack(">Q", payload[i + 32 : i + 40])
                else:
                    return None
                return (ts, dur * 1000 // ts) if ts > 0 else None
            i += size
        return None

    return walk(0, len(payload))


def _fake_decode_image(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fallback for image formats whose dimensions
    need a real decoder (no PIL/opencv in this container). Derives a
    stable (width, height) from the payload bytes so the pipeline is
    testable end-to-end. Swap body for
    ``PIL.Image.open(io.BytesIO(payload)).size`` in a full environment."""
    import hashlib

    # hashlib, not hash(): builtin hash of bytes is salted per process, so
    # it would disagree across executors.
    h = int.from_bytes(hashlib.sha1(payload[:64]).digest()[:4], "big")
    return 64 + h % 1024, 64 + (h >> 10) % 1024


def _image_dimensions(payload: bytes) -> tuple[int, int]:
    """Real PNG/JPEG/GIF/BMP header parse first; deterministic fake for
    the rest (TIFF/WebP/HEIC need a real decoder)."""
    return (
        parse_png_dimensions(payload)
        or parse_jpeg_dimensions(payload)
        or parse_gif_dimensions(payload)
        or parse_bmp_dimensions(payload)
        or _fake_decode_image(payload)
    )


def extract_image_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """L5 transform: per-asset feature extraction via Arrow-batched
    mapInPandas — the batch shape (one pdf per ~few MB of payloads) is
    the real design. PNG and JPEG dimensions are parsed for real from
    the container headers (stdlib struct); other formats fall back to
    the deterministic fake decode. Output adds ``width/height/n_bytes``."""
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
            dims = [_image_dimensions(bytes(b)) for b in pdf[content_col]]
            pdf = pdf.assign(
                width=[d[0] for d in dims],
                height=[d[1] for d in dims],
                n_bytes=[len(bytes(b)) for b in pdf[content_col]],
            )
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def extract_audio_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """L5 transform, audio tier: adds ``sample_rate/channels/duration_ms/
    n_bytes`` per asset via Arrow-batched mapInPandas. WAV headers are
    parsed for real (RIFF fmt/data chunks, stdlib struct); compressed
    formats (mp3 et al.) need a real decoder and get nulls — explicit
    "unparsed", never a fake number that could be mistaken for a
    measurement."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_wav_header(bytes(b)) for b in pdf[content_col]]
            pdf = pdf.assign(
                sample_rate=pd.array(
                    [p[0] if p else None for p in parsed], dtype="Int32"
                ),
                channels=pd.array(
                    [p[1] if p else None for p in parsed], dtype="Int32"
                ),
                duration_ms=pd.array(
                    [p[2] if p else None for p in parsed], dtype="Int64"
                ),
                n_bytes=[len(bytes(b)) for b in pdf[content_col]],
            )
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000,
                        content_col: str = "content") -> DataFrame:
    """L5 transform: explode each video asset into frame rows
    (asset_path, frame_idx, frame_ts_ms, frame binary). The frame COUNT
    is real for MP4 containers — parse_mp4_duration reads moov/mvhd, so
    an asset yields ceil(duration / every_ms) frames like a genuine
    sampler (capped at 64/asset); only the frame PIXELS are stub slices
    (no ffmpeg here). Non-MP4 payloads fall back to the deterministic
    1-frame-per-KB model. The explode shape, schema and partition
    fan-out are the real design."""
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
                mv = parse_mp4_duration(payload)
                if mv is not None:
                    # REAL sampling grid from the parsed duration
                    n_frames = min(64, mv[1] // every_ms + 1)
                else:
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
