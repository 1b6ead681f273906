"""`capturefs` — a Spark 4 Python DataSource for the reference's capture-file
layout (``{CAPTURES_DIR}/{session}/{capture}/data``; /root/reference/
process.py:16,460-462), exposing the whole directory tree as ONE logical
table without a staging ingest.

Why a custom connector (vs ``spark.read.json(glob)``): the capture layout
encodes two partition columns in the PATH (session, capture epoch) that a
plain JSON scan cannot prune by. This source maps each capture file to one
input partition and implements ``pushFilters`` so ``session_id = :x`` /
``capture_id = :y`` equality and IN filters prune partitions BEFORE any file
is opened — the Python-DataSource analogue of Hive-style partition pruning,
and exactly the filter shape every reference analytic issues
(process.py:83,149,207).

Scale design (100 TB): partition = capture file, the natural unit of work
(files are written once per session recording and are typically MBs; a
pathological multi-GB capture would be split by byte range in `partitions`).
``read`` yields ONE Arrow RecordBatch per file — the vectorized path, no
per-row Python objects; schema is fixed (CAPTURE_FILE_SCHEMA), so there is
no inference scan. Directory listing happens driver-side once per query; at
millions of captures, swap `glob` for a manifest table (the `captures`
control table already holds exactly that listing).

Corrupt files follow the STREAMING dead-letter contract (skip, keep going;
streaming/ingest.py) rather than batch FAILFAST, because a multi-capture
scan is an availability surface: one bad capture must not kill a 100 TB
query. Per-capture FAILFAST ingest remains in sources/capture.py.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass
from typing import Iterable, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType

#: Arrow schema mirroring CAPTURE_FILE_SCHEMA (komodo_data_spark.schemas).
_COLUMNS = ("capture_id", "session_id", "client_id", "type", "ts", "seq", "message")


@dataclass
class CaptureFilePartition(InputPartition):
    capture_id: str
    path: str


def _read_capture_arrow(path: str):
    """Parse one capture file into Arrow RecordBatches (vectorized path —
    no per-row Python objects cross to the JVM). Structural format
    detection as sources.capture.read_capture_file: leading '[' = records
    array, else JSON-lines. Corrupt files yield nothing (dead-letter
    semantics; see module docstring)."""
    import pyarrow as pa

    try:
        with open(path, "rb") as fh:
            raw = fh.read()
        head = raw.lstrip()
        if head.startswith(b"["):
            records = json.loads(raw)
        else:
            records = [
                json.loads(line) for line in raw.splitlines() if line.strip()
            ]
    except (OSError, ValueError):
        return
    if not records:
        return
    arrow_schema = pa.schema(
        [
            ("capture_id", pa.string()),
            ("session_id", pa.int32()),
            ("client_id", pa.int32()),
            ("type", pa.string()),
            ("ts", pa.int64()),
            ("seq", pa.int64()),
            ("message", pa.string()),
        ]
    )
    try:
        cols = {c: [r.get(c) for r in records] for c in _COLUMNS}
        # message may arrive as a JSON object (records-array files) — keep
        # the raw-text contract of the `data` table
        cols["message"] = [
            m if isinstance(m, (str, type(None))) else json.dumps(m)
            for m in cols["message"]
        ]
        batch = pa.RecordBatch.from_pydict(cols, schema=arrow_schema)
    except (pa.ArrowInvalid, pa.ArrowTypeError, AttributeError, TypeError,
            OverflowError):
        # schema-violating records (string ts, non-dict rows, ...) are the
        # same dead-letter class as unparseable bytes: skip the file, keep
        # the scan alive
        return
    yield batch


class CaptureFsReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.root = options.get("path")
        if not self.root:
            raise ValueError("capturefs requires .option('path', <captures dir>)")
        # capture_id values admitted by pushed filters; None = all
        self._keep_captures: set[str] | None = None
        self._keep_sessions: set[str] | None = None

    @staticmethod
    def _intersect(current: set[str] | None, new: set[str]) -> set[str]:
        """Conjunction semantics: each pushed filter CONSTRAINS the keep-set.
        ``session_id = 1 AND session_id = 2`` must yield the empty set, not
        whichever filter arrived last."""
        return new if current is None else current & new

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Use equality/IN filters on the path-derived columns to shrink the
        partition list — files outside the keep-sets never open. Every filter
        (including the ones used for pruning) is returned in ``remaining`` so
        Spark re-evaluates it row-level post-scan: the prune is a best-effort
        partition skip, and the re-check protects against a capture file whose
        JSON session_id disagrees with its directory name."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("session_id",):
                self._keep_sessions = self._intersect(
                    self._keep_sessions, {str(f.value)}
                )
            elif isinstance(f, EqualTo) and f.attribute == ("capture_id",):
                self._keep_captures = self._intersect(
                    self._keep_captures, {str(f.value)}
                )
            elif isinstance(f, In) and f.attribute == ("session_id",):
                self._keep_sessions = self._intersect(
                    self._keep_sessions, {str(v) for v in f.value}
                )
            elif isinstance(f, In) and f.attribute == ("capture_id",):
                self._keep_captures = self._intersect(
                    self._keep_captures, {str(v) for v in f.value}
                )
        return list(filters)

    def partitions(self) -> Sequence[CaptureFilePartition]:
        parts = []
        for path in sorted(glob.glob(os.path.join(self.root, "*", "*", "data"))):
            capture_dir, _ = os.path.split(path)
            session_dir, capture = os.path.split(capture_dir)
            _, session = os.path.split(session_dir)
            if self._keep_sessions is not None and session not in self._keep_sessions:
                continue
            cid = f"{session}_{capture}"
            if self._keep_captures is not None and cid not in self._keep_captures:
                continue
            parts.append(CaptureFilePartition(capture_id=cid, path=path))
        return parts

    def read(self, partition: CaptureFilePartition):
        """One Arrow RecordBatch per capture file (vectorized transfer)."""
        yield from _read_capture_arrow(partition.path)


class CaptureFsStreamReader(DataSourceStreamReader):
    """Streaming form: the reference's 10-second capture poll
    (process.py:455-469) as a CUSTOM exactly-once source. The offset is the
    set of capture files already committed; each micro-batch's partitions
    are the newly appeared files, read executor-side as Arrow batches (same
    code path as the batch reader).

    Offset growth is bounded by capture count (control-plane scale: one
    file per recorded session); at millions of captures, replace the
    file-set offset with a (mtime-watermark, lexicographic tiebreak) pair
    or drive discovery from the `captures` control table, which already is
    the manifest. Spark checkpoints the offset JSON — restart resumes
    without re-reading committed files (the `processed` flag, for free).
    """

    def __init__(self, schema: StructType, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("capturefs requires .option('path', <captures dir>)")

    def _listing(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.root, "*", "*", "data")))

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": self._listing()}

    def partitions(self, start: dict, end: dict) -> Sequence[CaptureFilePartition]:
        new = sorted(set(end.get("files", [])) - set(start.get("files", [])))
        parts = []
        for path in new:
            capture_dir, _ = os.path.split(path)
            session_dir, cap = os.path.split(capture_dir)
            session = os.path.basename(session_dir)
            parts.append(
                CaptureFilePartition(capture_id=f"{session}_{cap}", path=path)
            )
        return parts

    def read(self, partition: CaptureFilePartition):
        yield from _read_capture_arrow(partition.path)

    def commit(self, end: dict) -> None:
        # Progress lives entirely in Spark's offset checkpoint; nothing to
        # clean up source-side (capture files are immutable once written).
        pass


class CaptureDataSource(DataSource):
    """Register with ``spark.dataSource.register(CaptureDataSource)``; read
    via ``spark.read.format("capturefs").option("path", root).load()`` or
    ``spark.readStream.format("capturefs")...`` for the polling form."""

    @classmethod
    def name(cls) -> str:
        return "capturefs"

    def schema(self) -> str:
        return (
            "capture_id string, session_id int, client_id int, type string, "
            "ts long, seq long, message string"
        )

    def reader(self, schema: StructType) -> CaptureFsReader:
        return CaptureFsReader(schema, self.options)

    def streamReader(self, schema: StructType) -> CaptureFsStreamReader:
        return CaptureFsStreamReader(schema, self.options)
