"""Batch acquisition — reader dispatch.

Mirrors the reference's BatchSpec → DataFrame dispatch
(sparkdf_execution_engine.py:227-348 + guess_reader_method_from_path
:370-391) with native Spark readers. Iceberg/Delta paths are gated behind
availability so the module loads in environments without those jars; at
production scale the Iceberg branch is the primary path (snapshot-pinned
scans make batches immutable and resumable).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from great_expectations_spark.core.config import deterministic_id

_EXTENSION_READERS = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".orc": "orc",
    ".avro": "avro",
}


def guess_reader_method_from_path(path) -> str:
    if isinstance(path, (list, tuple)):
        path = path[0]
    base = path.rstrip("/")
    _, ext = os.path.splitext(base)
    if ext in _EXTENSION_READERS:
        return _EXTENSION_READERS[ext]
    raise ValueError(f"cannot guess reader method for path: {path}")


@dataclass
class BatchSpec:
    """What to read; identity hashes to a deterministic batch_id
    (reference: core/batch_spec.py + IDDict.to_id())."""

    path: Optional[Any] = None  # str, or list[str] (a discovered batch
    # whose files span directories — sources/discovery.py)
    table: Optional[str] = None  # catalog table, e.g. Iceberg cat.db.tbl
    reader_method: Optional[str] = None
    reader_options: dict[str, Any] = field(default_factory=dict)
    schema: Optional[Any] = None  # StructType or DDL string
    snapshot_id: Optional[int] = None  # Iceberg VERSION AS OF
    as_of_timestamp: Optional[str] = None  # Iceberg TIMESTAMP AS OF

    @property
    def batch_id(self) -> str:
        return deterministic_id(
            {
                "path": self.path,
                "table": self.table,
                "reader_method": self.reader_method,
                "reader_options": self.reader_options,
                "snapshot_id": self.snapshot_id,
                "as_of_timestamp": self.as_of_timestamp,
            }
        )


def load_batch(spark: SparkSession, spec: BatchSpec) -> DataFrame:
    if spec.table:
        reader = spark.read
        if spec.snapshot_id is not None:
            reader = reader.option("snapshot-id", spec.snapshot_id)
        if spec.as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", spec.as_of_timestamp)
        return reader.table(spec.table)
    if not spec.path:
        raise ValueError("BatchSpec needs `path` or `table`")
    method = spec.reader_method or guess_reader_method_from_path(spec.path)
    reader = spark.read
    if spec.schema is not None:
        reader = reader.schema(spec.schema)
    opts = dict(spec.reader_options)
    first = spec.path[0] if isinstance(spec.path, (list, tuple)) else spec.path
    if method == "csv":
        opts.setdefault("header", "true")
        opts.setdefault("inferSchema", "false" if spec.schema is not None else "true")
        if first.endswith(".tsv"):
            opts.setdefault("sep", "\t")
    if opts:
        reader = reader.options(**opts)
    if method in ("delta", "iceberg"):
        return reader.format(method).load(spec.path)
    if isinstance(spec.path, (list, tuple)):
        # an explicit multi-file batch (discovery grouping): DataFrameReader
        # .load accepts a path list; .parquet/.csv/... take varargs only
        return reader.format(method).load(list(spec.path))
    return getattr(reader, method)(spec.path)


def input_fingerprint(spark: SparkSession, spec: BatchSpec) -> str:
    """Stable identity of the input for checkpoint-resume: on Iceberg this is
    (table, snapshot_id); on files it's the batch_id of the spec."""
    return spec.batch_id
