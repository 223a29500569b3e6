"""Custom Python DataSource for the reference's native output format
(SURVEY.md §2A sources; reference contract ``mr/worker.go:190-207``:
``"<key> <value>"`` text lines, one ``part-*``/``mr-out-*`` file per
reduce partition).

This is the modern Spark-first way to ship a CONNECTOR rather than a
read helper: ``spark.read.format("mrout")`` goes through the Spark 4
Python DataSource API (``pyspark.sql.datasource``), which gives the
format three properties a ``spark.read.text`` + split wrapper lacks:

- **partition-parallel reads** — one ``InputPartition`` per file, so
  a 10,000-file output fans out across the cluster exactly like a
  parquet scan (the file list is enumerated driver-side, the bytes
  are only ever read on executors);
- **source-level filter pushdown** — ``pushFilters`` accepts
  key-column predicates (=, IN, prefix/contains/endswith, IS [NOT]
  NULL) and applies them DURING the scan, before rows are handed to
  Spark, so ``WHERE key = 'x'`` never materializes the other 100 TB
  of lines (the audit-visible analogue of parquet's PushedFilters);
- **a declared schema** — consumers see ``key string, value string``
  without an inference pass.

Rows stream out per-line (a generator), so a partition never holds
its file in memory.
"""

from __future__ import annotations

import glob
import os
import re
import uuid
from dataclasses import dataclass
from typing import Iterable, Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
    EqualTo,
    Filter,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)


class _MrOutPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class MrOutReader(DataSourceReader):
    """Reads ``<key> <value>`` lines; the first space splits key from
    value (values may contain spaces; the reference writes
    ``fmt.Fprintf(ofile, "%v %v\\n", key, value)``)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrout source requires a path")
        self._key_filters: List[Filter] = []

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        """Accept key-column string predicates; everything else is
        returned to Spark to evaluate post-scan (the contract: yield
        what you do NOT handle)."""
        for f in filters:
            handled = (
                isinstance(f, (EqualTo, In, StringStartsWith,
                               StringContains, StringEndsWith,
                               IsNull, IsNotNull))
                and f.attribute == ("key",))
            if handled:
                self._key_filters.append(f)
            else:
                yield f

    def _keep(self, key: str) -> bool:
        for f in self._key_filters:
            if isinstance(f, EqualTo) and key != f.value:
                return False
            if isinstance(f, In) and key not in f.value:
                return False
            if isinstance(f, StringStartsWith) and not key.startswith(f.value):
                return False
            if isinstance(f, StringContains) and f.value not in key:
                return False
            if isinstance(f, StringEndsWith) and not key.endswith(f.value):
                return False
            if isinstance(f, IsNull):
                return False  # text keys are never NULL
        return True

    def partitions(self):
        files = sorted(
            p for pat in ("mr-out-*", "part-*")
            for p in glob.glob(os.path.join(self.path, pat))
            if os.path.isfile(p) and not p.endswith((".crc", "_SUCCESS")))
        if not files and os.path.isfile(self.path):
            files = [self.path]
        return [_MrOutPartition(p) for p in files]

    def read(self, partition: _MrOutPartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                key, _, value = line.partition(" ")
                if self._keep(key):
                    yield (key, value)


class MrOutDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mrout"

    def schema(self) -> str:
        return "key string, value string"

    def reader(self, schema) -> MrOutReader:
        return MrOutReader(self.options)

    def simpleStreamReader(self, schema) -> "MrOutStreamReader":
        return MrOutStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "MrOutWriter":
        if len(schema.fields) != 2:
            raise ValueError(
                f"mrout sink writes (key, value) rows; got {schema}")
        return MrOutWriter(self.options, overwrite)


def register_mrout(spark) -> None:
    """Idempotently register the ``mrout`` format on a session.

    Python-source filter pushdown ships behind a conf (Spark 4.1);
    implementing ``pushFilters`` without it is an analysis error, so
    registration turns it on."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(MrOutDataSource)


class MrOutStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of :class:`MrOutReader`: the naturally-sorted
    file list is the log, the offset is the NAME of the last consumed
    file, and each micro-batch drains exactly one file.

    Offsets are name-based, not index-based, because the reference
    writes unpadded numeric suffixes (``mr/worker.go:190``:
    ``'mr-out-' + Itoa(id)``), where ``mr-out-10`` sorts
    lexicographically before ``mr-out-2``: under live file-drop
    ingestion an index into a re-sorted listing would shift when a
    late name lands before already-consumed ones, re-emitting
    consumed files and skipping new ones. Storing the last consumed
    name and consuming only files strictly GREATER (in natural
    order: numeric suffix compared as an integer) makes consumed
    work immutable — no late arrival can reorder it. The flip side
    is the same contract as Spark's own file source: producers must
    publish names in non-decreasing natural order (true for the
    reference sink, which publishes a whole job's files at commit);
    a name dropped BELOW the consumed watermark is skipped, never
    mis-replayed.

    ``read(start)`` returns (rows, next_offset) for the prefetch
    path; ``readBetweenOffsets`` deterministically REPLAYS an
    already-planned range after restart, yielding the files whose
    names fall in ``(start, end]``."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrout source requires a path")

    @staticmethod
    def _natkey(name: str) -> tuple:
        """Natural order: trailing digits compare as an integer, so
        mr-out-2 < mr-out-10 (lexicographic order gets this wrong)."""
        m = re.match(r"^(.*?)(\d+)$", name)
        return (m.group(1), int(m.group(2))) if m else (name, -1)

    def _files(self) -> List[str]:
        return sorted(
            (p for pat in ("mr-out-*", "part-*")
             for p in glob.glob(os.path.join(self.path, pat))
             if os.path.isfile(p) and not p.endswith((".crc", "_SUCCESS"))),
            key=lambda p: self._natkey(os.path.basename(p)))

    def _after(self, files: List[str], last: str | None) -> List[str]:
        if last is None:
            return files
        k = self._natkey(last)
        return [f for f in files
                if self._natkey(os.path.basename(f)) > k]

    @staticmethod
    def _read_file(path: str) -> Iterator[tuple]:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line:
                    key, _, value = line.partition(" ")
                    yield (key, value)

    def initialOffset(self) -> dict:
        return {"last": None}

    def read(self, start: dict):
        # rows are materialized (the prefetch contract pickles them);
        # one FILE per batch keeps the driver-resident slice bounded
        # by the reduce-partition size, not the dataset
        pending = self._after(self._files(), start["last"])
        if not pending:
            return [], start
        nxt = pending[0]
        return (list(self._read_file(nxt)),
                {"last": os.path.basename(nxt)})

    def readBetweenOffsets(self, start: dict, end: dict) -> List[tuple]:
        if end["last"] is None:
            return []
        hi = self._natkey(end["last"])
        return [row
                for f in self._after(self._files(), start["last"])
                if self._natkey(os.path.basename(f)) <= hi
                for row in self._read_file(f)]


@dataclass
class _MrOutCommit(WriterCommitMessage):
    """Per-task commit: the temp file written and its final name."""
    tmp_path: str
    final_name: str
    n_rows: int


class MrOutWriter(DataSourceWriter):
    """Write ``"<key> <value>"`` lines in the reference's exact sink
    layout (``mr/worker.go:190-207``): one ``mr-out-N`` file per
    partition, committed atomically.

    Two-phase commit, the same protocol contract as Spark's file
    sinks: each task writes to a uuid temp file and reports it in
    its commit message; only the DRIVER's ``commit`` renames temp
    files to their final ``mr-out-N`` names, so a failed/speculative
    task (``abort``) leaves no partial output visible. Rename-based
    publish is atomic on a POSIX dir; on an object store the same
    code shape swaps rename for a manifest write.
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrout sink requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> _MrOutCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{row[0]} {row[1]}\n")
                n += 1
        return _MrOutCommit(tmp_path=tmp, final_name=f"mr-out-{pid}",
                            n_rows=n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "mr-out-*")):
                os.remove(old)
        else:
            # append must never silently clobber a previous run's
            # mr-out-N (nor mix with stale higher-numbered files from
            # a run with more partitions): fail loudly, cleaning up
            # the temp files, and leave the prior output intact
            clobbered = [m.final_name for m in messages
                         if os.path.exists(
                             os.path.join(self.path, m.final_name))]
            if clobbered:
                self.abort(messages)
                raise FileExistsError(
                    f"mrout append would overwrite existing "
                    f"{sorted(clobbered)} in {self.path}; use "
                    f"mode('overwrite') or a fresh directory")
        for msg in messages:
            os.replace(msg.tmp_path,
                       os.path.join(self.path, msg.final_name))

    def abort(self, messages) -> None:
        for msg in messages:
            if msg is not None and os.path.exists(msg.tmp_path):
                os.remove(msg.tmp_path)
