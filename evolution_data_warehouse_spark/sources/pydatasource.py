"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the official extension point for sources Spark has no built-in reader
for (internal feeds, bespoke formats, synthetic generators).

This module implements a deterministic synthetic-rows source used by
the ``src_python_datasource`` registry query: N rows split
round-robin across P planned InputPartitions, each partition
generating ONLY its own slice — the source parallelizes like any
file-based scan (one task per partition, no driver data path), which
is the property the registry query's oracle checksums verify.

The row formula is pure int64 arithmetic chosen to be replayable in
ANSI SQL (the DuckDB oracle recomputes it over generate_series):
``val = (row_id * 2654435761) % 1000000007`` — a Knuth
multiplicative hash kept below 2^63 so no engine can overflow.

Reference parity note: the reference warehouse
(haelbrek/Evolution-DATA-WAREHOUSE) ingests bespoke feeds with
hand-rolled Python loaders (ingestion/*); this is the Spark-native
re-expression of "a source only Python can read".
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

SYNTH_MULT = 2654435761  # Knuth's 2^32 golden-ratio multiplier
SYNTH_MOD = 1_000_000_007

_SCHEMA = "row_id bigint, part_id int, val bigint"


def synth_val(row_id: int) -> int:
    """The row formula — importable so tests and oracles share it."""
    return (row_id * SYNTH_MULT) % SYNTH_MOD


class SynthRangeReader(DataSourceReader):
    """Plans one InputPartition per round-robin slice; each task
    generates only its own rows (row_id % parts == part_id)."""

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 100_000))
        self.parts = int(options.get("parts", 8))
        if self.n < 0 or self.parts <= 0:
            raise ValueError(
                f"synthrange needs n >= 0 and parts > 0, got "
                f"n={self.n} parts={self.parts}"
            )

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        p = partition.value
        for row_id in range(p, self.n, self.parts):
            yield (row_id, p, synth_val(row_id))


class SynthRangeDataSource(DataSource):
    """`spark.read.format("synthrange").option("n", ...).load()`."""

    @classmethod
    def name(cls) -> str:
        return "synthrange"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SynthRangeReader:
        return SynthRangeReader(self.options)


def register_synth_source(spark) -> None:
    """Idempotent registration (latest registration wins in Spark)."""
    spark.dataSource.register(SynthRangeDataSource)


# ---------------------------------------------------------------------------
# Custom Python DataSource WRITER — transactional JSONL sink
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import tempfile as _tempfile
from dataclasses import dataclass as _dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

MANIFEST_NAME = "_MANIFEST.json"


@_dataclass
class JsonlCommit(WriterCommitMessage):
    """Per-task commit message: which file this task published and its
    row count (picklable — it travels executor -> driver)."""

    filename: str
    n_rows: int


def _write_jsonl_part(path: str, prefix: str, iterator) -> JsonlCommit:
    """Shared task-side body for BOTH jsonl writers (batch + stream):
    one uniquely named file per task attempt, tmp + atomic rename so a
    retried attempt can never publish a torn file. One implementation
    so a hardening fix (fsync, tmp cleanup) cannot miss a twin."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    name = f"{prefix}-{ctx.partitionId():05d}-{ctx.taskAttemptId()}.jsonl"
    fd, tmp = _tempfile.mkstemp(dir=path, suffix=".tmp")
    n = 0
    try:
        with _os.fdopen(fd, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
            fh.flush()
            _os.fsync(fh.fileno())
    except BaseException:
        # a failed/retried attempt must leave no tmp debris behind —
        # abort() only knows manifest-named .jsonl files
        try:
            _os.unlink(tmp)
        except OSError:
            pass
        raise
    _os.replace(tmp, _os.path.join(path, name))
    return JsonlCommit(filename=name, n_rows=n)


class JsonlSinkWriter(DataSourceWriter):
    """Executor-side JSONL writer with the two-phase commit protocol
    the DataSourceWriter API prescribes: every task writes a uniquely
    named file (tmp + atomic rename, so a re-attempted task can never
    publish a torn file), and ONLY the driver-side commit() makes work
    visible by writing the manifest. A reader that trusts the manifest
    (as snk_python_datasource's re-read does) can never observe
    uncommitted or duplicated task output — speculative/retried task
    attempts leave orphan files that the manifest simply never lists.
    """

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonlsink requires .option('path', ...)")
        self.path = path

    def write(self, iterator) -> JsonlCommit:
        return _write_jsonl_part(self.path, "part", iterator)

    def commit(self, messages) -> None:
        # a failed task's message is None (API contract) — filter, as
        # the streaming twin does
        done = [m for m in messages if m]
        manifest = {
            "files": sorted(m.filename for m in done),
            "n_rows": sum(m.n_rows for m in done),
        }
        fd, tmp = _tempfile.mkstemp(dir=self.path, suffix=".tmp")
        try:
            with _os.fdopen(fd, "w", encoding="utf-8") as fh:
                fh.write(_json.dumps(manifest, sort_keys=True))
                fh.flush()
                _os.fsync(fh.fileno())
        except BaseException:
            try:
                _os.unlink(tmp)
            except OSError:
                pass
            raise
        _os.replace(tmp, _os.path.join(self.path, MANIFEST_NAME))
        # data files are fsynced before their rename in _write_jsonl_part;
        # fsync the directory so both the part renames and the manifest
        # rename are durable — no window where the manifest survives a
        # crash but the data it lists does not
        dfd = _os.open(self.path, _os.O_RDONLY)
        try:
            _os.fsync(dfd)
        finally:
            _os.close(dfd)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:  # the failed task that triggered the abort
                continue
            try:
                _os.remove(_os.path.join(self.path, m.filename))
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    """`df.write.format("jsonlsink").option("path", ...).save()`."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


def read_manifest(path: str) -> dict:
    with open(_os.path.join(path, MANIFEST_NAME), encoding="utf-8") as fh:
        return _json.load(fh)


# ---------------------------------------------------------------------------
# Custom Python STREAMING source — offset-tracked, replayable
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class SynthStreamReader(SimpleDataSourceStreamReader):
    """Offset-based streaming form of the synth source: the offset is
    simply the next row position, each micro-batch advances by
    ``batch_rows`` (never past ``n``), and readBetweenOffsets replays
    any committed range bit-identically — which is ALL that
    exactly-once needs from a source: deterministic replay between
    offsets. The engine's checkpoint owns progress; the source holds
    no state beyond its pure row formula."""

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1_000))
        self.batch = int(options.get("batch_rows", 100))
        if self.n < 0 or self.batch <= 0:
            raise ValueError(
                f"synthrange stream needs n >= 0 and batch_rows > 0, "
                f"got n={self.n} batch_rows={self.batch}"
            )

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, start: int, end: int) -> list[tuple]:
        # a LIST, not a generator: the engine's prefetch cache
        # copy.copy()s the returned iterator for replay, and
        # generators are not copyable
        return [
            (row_id, row_id % 8, synth_val(row_id))
            for row_id in range(start, end)
        ]

    def read(self, start: dict):
        s = int(start["pos"])
        e = min(s + self.batch, self.n)
        return iter(self._rows(s, e)), {"pos": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["pos"]), int(end["pos"])))


def _synth_simple_stream_reader(self, schema):
    return SynthStreamReader(self.options)


# attach the streaming hook to the batch DataSource class (one format
# name, both read paths — exactly how built-in sources behave)
SynthRangeDataSource.simpleStreamReader = _synth_simple_stream_reader


# ---------------------------------------------------------------------------
# Custom Python STREAMING writer — per-epoch commit manifests
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamWriter

EPOCH_MANIFEST_PREFIX = "_EPOCH-"


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming form of the JsonlSink commit protocol: each
    micro-batch's tasks publish uniquely named files (tmp + atomic
    rename), and commit(messages, batchId) writes ONE per-epoch
    manifest — so a reader that unions only manifest-listed files
    sees each epoch exactly once, even though task retries and
    replayed epochs (restart re-running an uncommitted batch) may
    leave orphan data files behind. abort() removes the epoch's
    files so a failed batch leaves no manifest and no debris."""

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonlsink stream requires .option('path')")
        self.path = path

    def write(self, iterator) -> JsonlCommit:
        return _write_jsonl_part(self.path, "epoch-part", iterator)

    def commit(self, messages, batchId: int) -> None:
        manifest = {
            "batch_id": batchId,
            "files": sorted(m.filename for m in messages if m),
            "n_rows": sum(m.n_rows for m in messages if m),
        }
        fd, tmp = _tempfile.mkstemp(dir=self.path, suffix=".tmp")
        with _os.fdopen(fd, "w", encoding="utf-8") as fh:
            fh.write(_json.dumps(manifest, sort_keys=True))
        _os.replace(
            tmp,
            _os.path.join(
                self.path, f"{EPOCH_MANIFEST_PREFIX}{batchId:09d}.json"
            ),
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                _os.remove(_os.path.join(self.path, m.filename))
            except OSError:
                pass


def _jsonl_stream_writer(self, schema, overwrite: bool):
    return JsonlStreamWriter(self.options)


JsonlSinkDataSource.streamWriter = _jsonl_stream_writer


def read_epoch_manifests(path: str) -> list[dict]:
    """All committed epochs, in batch order."""
    out = []
    for name in sorted(_os.listdir(path)):
        if name.startswith(EPOCH_MANIFEST_PREFIX) and name.endswith(".json"):
            with open(_os.path.join(path, name), encoding="utf-8") as fh:
                out.append(_json.load(fh))
    return out
