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
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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
        # small-file grouping: pack many tiny manifest files into one
        # partition of ~target_bytes (the real-deployment shape — a
        # 100k-file manifest must not become 100k tasks). 0 = one
        # partition per file (the task-exchange pattern).
        self.target_bytes = int(options.get("target_bytes", "0"))

    def partitions(self) -> list[InputPartition]:
        if self.target_bytes <= 0:
            return [InputPartition([p]) for p in self.paths]
        import os

        groups: list[list[str]] = []
        cur: list[str] = []
        cur_bytes = 0
        # greedy first-fit in manifest order — deterministic, and
        # preserves any locality the manifest's ordering encodes
        stat_sum = 0
        stat_n = 0
        for p in self.paths:
            try:
                size = os.path.getsize(p)
                stat_sum += size
                stat_n += 1
            except OSError:
                # driver can't stat it (deleted since manifest creation,
                # or executor-only visibility): don't fail PLANNING —
                # the file's own read task reports any real error, the
                # same failure surface as the ungrouped path. Estimate
                # with the running mean of stat-able files, else assume
                # a full group per file: a manifest where NOTHING stats
                # (the executor-only case this feature targets) must
                # degrade to one-partition-per-file parallelism, never
                # collapse into a single serial read task.
                size = stat_sum // stat_n if stat_n else self.target_bytes
            if cur and cur_bytes + size > self.target_bytes:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(p)
            cur_bytes += size
        if cur:
            groups.append(cur)
        return [InputPartition(g) for g in groups]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        for path in partition.value:
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

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return ManifestLinesWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return ManifestLinesStreamWriter(self.options, overwrite)


class _LinesCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int, pid: int = 0):
        self.path = path
        self.n_rows = n_rows
        self.pid = pid


class ManifestLinesWriter(DataSourceWriter):
    """Executor-side text sink with a DRIVER-SIDE atomic commit: each
    task writes its partition to a temp file and returns a commit
    message; ``commit()`` (driver, exactly once, only after every task
    succeeded) renames the temps into place and writes a
    ``_MANIFEST.json`` naming the files and their row counts — the
    standard two-phase output commit, in ~30 lines of the Python
    DataSource API. ``abort()`` removes the temps, so a failed job
    leaves no partial output visible (readers key off the manifest)."""

    def __init__(self, options: dict, overwrite: bool):
        self.dir = options["path_dir"]
        self.line_col = options.get("line_col", "line")
        self.overwrite = overwrite

    def write(self, iterator) -> WriterCommitMessage:
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f".part-{pid:05d}-{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(str(row[self.line_col]) + "\n")
                n += 1
        return _LinesCommit(tmp, n, pid)

    def commit(self, messages) -> None:
        import json
        import os

        files = {}
        # partition-id order, NOT temp-file UUID order: re-exports of the
        # same data land byte-identical part numbering (export_corpus's
        # shard discipline), so downstream checksums are stable
        for i, m in enumerate(sorted(messages, key=lambda m: m.pid)):
            final = os.path.join(self.dir, f"part-{i:05d}.txt")
            os.replace(m.path, final)
            files[os.path.basename(final)] = m.n_rows
        if self.overwrite:
            # honor mode("overwrite"): a previous, larger commit's
            # higher-index part files must not survive as ghost rows for
            # consumers that list *.txt instead of reading the manifest
            for name in os.listdir(self.dir):
                if (name.startswith("part-") and name.endswith(".txt")
                        and name not in files):
                    os.unlink(os.path.join(self.dir, name))
        with open(os.path.join(self.dir, "_MANIFEST.json"), "w",
                  encoding="utf-8") as f:
            json.dump({"files": files, "total_rows": sum(files.values())}, f,
                      sort_keys=True)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.unlink(m.path)
                except FileNotFoundError:
                    pass


class ManifestLinesStreamWriter(DataSourceStreamWriter):
    """Streaming form of the two-phase text sink: each micro-batch's
    tasks stage temp files; ``commit(messages, batchId)`` promotes them
    to ``batch=<id>/part-NNNNN.txt`` and appends one line to
    ``_COMMITS`` naming the batch and its row count — readers take only
    committed batches, so a crash between stage and commit leaves
    nothing visible, and a REPLAYED batch id (foreachBatch-style
    at-least-once delivery) is detected in ``commit`` and its staged
    temps are discarded instead of double-landing: the commit log is
    the idempotence ledger, same as streaming/sinks.py's stamps."""

    def __init__(self, options: dict, overwrite: bool):
        self.dir = options["path_dir"]
        self.line_col = options.get("line_col", "line")

    def write(self, iterator) -> WriterCommitMessage:
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f".stage-{pid:05d}-{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(str(row[self.line_col]) + "\n")
                n += 1
        return _LinesCommit(tmp, n, pid)

    def _committed(self) -> set[int]:
        import os

        try:
            with open(os.path.join(self.dir, "_COMMITS"), encoding="utf-8") as f:
                return {int(line.split()[0]) for line in f if line.strip()}
        except FileNotFoundError:
            return set()

    def commit(self, messages, batchId: int) -> None:
        import os

        if batchId in self._committed():
            self.abort(messages, batchId)  # replayed batch: drop the stage
            return
        bdir = os.path.join(self.dir, f"batch={batchId}")
        os.makedirs(bdir, exist_ok=True)
        total = 0
        for i, m in enumerate(sorted(messages, key=lambda m: m.pid)):
            os.replace(m.path, os.path.join(bdir, f"part-{i:05d}.txt"))
            total += m.n_rows
        with open(os.path.join(self.dir, "_COMMITS"), "a", encoding="utf-8") as f:
            f.write(f"{batchId} {total}\n")

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.unlink(m.path)
                except FileNotFoundError:
                    pass


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

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # failure recovery: re-read an uncommitted batch after a restart.
        # Rows are a pure function of position, so deterministic replay
        # is exactly the committed range — without this override the
        # SimpleDataSourceStreamReader default raises NotImplementedError
        # and a checkpoint-restarted query crashes.
        return iter(
            synthetic_doc(i) for i in range(int(start["pos"]), int(end["pos"]))
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
