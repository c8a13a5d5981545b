"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API) —
SURVEY §2.1 extension IO25.

The reference's ingest edge is a zoo of ad-hoc fetchers (spiders,
Sheets pulls, CSV drops) glued on the driver; Spark 4's Python Data
Source API is the engine-native way to wrap such a feed: the source
declares its schema and PARTITIONS, and each partition's `read()` runs
on an executor — a custom feed becomes a first-class, parallel,
Catalyst-planned scan (column pruning and everything downstream just
work) instead of a driver-side collect-and-parallelize.

Two sources:

- ``SyntheticCorpusDataSource`` — a deterministic document generator
  (``rows``/``shards`` options; text derived from md5 of the row id),
  the testable stand-in for any partition-parallel feed. Every byte is
  a pure function of (id), so an external SQL engine can re-derive the
  ENTIRE feed — the driver query hash-checks a full content checksum,
  proving rows arrive exactly-once across partitions with no
  duplication or loss at any parallelism.
- ``ManifestLinesDataSource`` — reads newline-delimited text files
  listed in a manifest option, one PARTITION PER FILE (the task-
  exchange pattern of sources/adapters.py lifted into a real scan):
  demonstrates option plumbing, per-partition IO, and executor-side
  file access without any Hadoop InputFormat.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def synthetic_doc(doc_id: int) -> tuple[int, int, str]:
    """The row contract, shared by the reader and tests: a pure
    function of ``doc_id`` (and nothing else), so any engine replays
    it. Shard is the decimal value of the md5 prefix mod 8 — matching
    the SQL mirror's ``CAST('0x' || substr(md5(...), 1, 4) ...)``."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return doc_id, int(h[:4], 16) % 8, f"doc {doc_id} body {h[:16]}"


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", "1000"))
        self.shards = int(options.get("shards", "8"))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.shards)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # contiguous id range per partition: rows // shards (+1 for the
        # first rows % shards partitions), like every range splitter
        i = partition.value
        base, extra = divmod(self.rows, self.shards)
        start = i * base + min(i, extra)
        n = base + (1 if i < extra else 0)
        for doc_id in range(start, start + n):
            yield synthetic_doc(doc_id)


class SyntheticCorpusDataSource(DataSource):
    """``spark.read.format("neulix_synthetic_corpus")`` after
    ``spark.dataSource.register(SyntheticCorpusDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "neulix_synthetic_corpus"

    def schema(self) -> str:
        return "doc_id bigint, shard int, text string"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticCorpusReader(self.options)


class ManifestLinesReader(DataSourceReader):
    def __init__(self, options: dict):
        manifest = options.get("paths", "")
        self.paths = [p for p in manifest.split(",") if p]

    def partitions(self) -> list[InputPartition]:
        # one partition per file — the task-exchange manifest pattern;
        # at scale group small files into partitions of ~128 MB instead
        return [InputPartition(p) for p in self.paths]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        path = partition.value
        with open(path, encoding="utf-8") as f:
            for lineno, line in enumerate(f):
                yield path, lineno, line.rstrip("\n")


class ManifestLinesDataSource(DataSource):
    """``spark.read.format("neulix_manifest_lines").option("paths",
    "a.txt,b.txt")`` — executor-side line reads, one task per file."""

    @classmethod
    def name(cls) -> str:
        return "neulix_manifest_lines"

    def schema(self) -> str:
        return "path string, lineno int, line string"

    def reader(self, schema) -> DataSourceReader:
        return ManifestLinesReader(self.options)


class SyntheticCorpusStreamReader(SimpleDataSourceStreamReader):
    """STREAMING form of the corpus generator: the offset is a plain
    row position, each micro-batch advances it by ``batch`` rows, and
    the rows are the SAME pure function of the id the batch reader
    emits — so a drained stream must equal the batch scan exactly
    (stream==batch parity, checked by the driver query's oracle).
    Offsets live in the checkpoint; a restarted query resumes from the
    committed position like any Structured Streaming source."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", "1000"))
        self.batch = int(options.get("batch", "250"))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = int(start["pos"])
        end = min(pos + self.batch, self.rows)
        return (
            iter([synthetic_doc(i) for i in range(pos, end)]),
            {"pos": end},
        )


class SyntheticCorpusStreamSource(DataSource):
    """``spark.readStream.format("neulix_synthetic_corpus_stream")`` —
    drain with ``query.processAllAvailable()`` (the Python micro-batch
    stream does not support Trigger.AvailableNow yet; Spark logs the
    fallback)."""

    @classmethod
    def name(cls) -> str:
        return "neulix_synthetic_corpus_stream"

    def schema(self) -> str:
        return "doc_id bigint, shard int, text string"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return SyntheticCorpusStreamReader(self.options)


def register_sources(spark) -> None:
    """Idempotent registration of all pysource feeds with the session."""
    spark.dataSource.register(SyntheticCorpusDataSource)
    spark.dataSource.register(ManifestLinesDataSource)
    spark.dataSource.register(SyntheticCorpusStreamSource)
