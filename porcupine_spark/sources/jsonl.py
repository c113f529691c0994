"""``porcupine_jsonl`` — a complete read/WRITE Python DataSource over
JSONL directories, including the two-phase commit protocol.

sources/pyds.py proves the READ half of Spark 4's Python DataSource
surface (partitions, pushdown, streaming offsets); this module proves
the WRITE half, which is where correctness actually lives: executors
write to STAGED files and return commit messages; the driver publishes
on ``commit()`` by renaming staged files into place and deletes them
on ``abort()`` — so a job that fails BEFORE commit() leaves no partial
output visible (the same stage-and-swap discipline as
functions/maintenance.compact_partition, here through Spark's own
DataSourceWriter hooks). Atomicity is TASK-level, not job-level:
``commit()`` itself is the non-atomic window — it deletes prior
``.jsonl`` files (overwrite mode) then renames staged files one by
one, so a driver crash MID-COMMIT can lose prior data and expose a
partially published directory. That matches Hadoop's
FileOutputCommitter v2 semantics on plain filesystems; a real
REST/database backend swaps the file I/O for a transactional client
to close that window and keeps the same protocol shape.

Layout: one ``part-<uuid>.jsonl`` per write task, staged inside a
hidden per-JOB ``.staging-<uuid>/`` dir until commit (so abort() can
clean up even KILLED tasks' partial files, which never return a commit
message, by removing the whole dir). Reads plan one InputPartition per
published file — the natural parallelism of a directory-of-files
backend.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _FileCommit(WriterCommitMessage):
    staged: str
    final: str


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = options["path"]
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        files = sorted(
            f for f in os.listdir(self.path) if f.endswith(".jsonl")
        )
        return [_FilePartition(os.path.join(self.path, f)) for f in files] or [
            _FilePartition("")
        ]

    def read(self, part: _FilePartition) -> Iterator[tuple]:
        if not part.path:
            return
        with open(part.path, encoding="utf-8") as fh:
            for line in fh:
                if line.strip():
                    rec = json.loads(line)
                    yield tuple(rec.get(k) for k in self.fields)


class JsonlWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite
        # job-scoped staging dir, minted ON THE DRIVER and pickled to
        # every task: abort() can then clean up even the partial files
        # of KILLED tasks (which never return a commit message) by
        # removing the whole directory
        self.staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")

    def write(self, rows) -> _FileCommit:
        # runs ON THE EXECUTOR: stage the task's output inside the
        # job's hidden dir; visibility is the driver's decision
        os.makedirs(self.staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(self.staging, name)
        final = os.path.join(self.path, name)
        with open(staged, "w", encoding="utf-8") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict()) + "\n")
        return _FileCommit(staged=staged, final=final)

    def commit(self, messages) -> None:
        # driver-side atomic publish; optionally clear prior contents
        import shutil

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            if m is not None:
                os.rename(m.staged, m.final)
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil
        import time

        # KILLED tasks race this cleanup: their Python workers don't see
        # the kill mid-write, so a straggler can makedirs+write its staged
        # file AFTER a single rmtree here. Poll until the dir stays absent
        # for a few consecutive checks (stragglers land within ms; the
        # deadline bounds the failure path, not the happy path).
        if not os.path.exists(self.staging):
            return  # nothing was ever staged: no race to wait out
        deadline = time.monotonic() + 5.0
        stable = 0
        while stable < 3:
            if os.path.exists(self.staging):
                shutil.rmtree(self.staging, ignore_errors=True)
                stable = 0
            else:
                stable += 1
            if time.monotonic() > deadline:
                shutil.rmtree(self.staging, ignore_errors=True)
                break
            time.sleep(0.1)


class JsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "porcupine_jsonl"

    def schema(self) -> str:
        # reads require an explicit schema (.schema(...)); JSONL carries
        # no types of its own
        raise NotImplementedError(
            "porcupine_jsonl requires an explicit .schema(...) on read"
        )

    def reader(self, schema: StructType) -> JsonlReader:
        return JsonlReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options, overwrite)


_REGISTERED: set[str] = set()


def register_jsonl_source(spark) -> None:
    key = spark.sparkContext.applicationId
    if key in _REGISTERED:
        return
    spark.dataSource.register(JsonlDataSource)
    _REGISTERED.add(key)
