"""Custom Python DataSource WRITER (Spark 4 DataSource API) — the write
half of the custom-connector surface (sources/ticks.py is the read
half): a JSON-lines sink that writes one file per input partition and a
manifest on commit, the canonical shape for pushing results to systems
Spark has no native connector for (vendor APIs, internal feeds).

API points the writer path demands:
- `writer()` returns a per-batch DataSourceWriter; Spark calls
  `write(iterator)` once per partition ON THE EXECUTORS — the sink must
  never funnel rows through the driver.
- Each task writes its own file (named by partition id AND task attempt
  id via TaskContext — retried/speculative attempts must never share a
  path, or a zombie attempt clobbers the winner's committed file) and
  returns a WriterCommitMessage; `commit()` sees only the WINNING
  attempts' messages on the driver and finalizes atomically (here: a
  manifest listing exactly those parts) — the two-phase commit that
  makes the sink exactly-once per batch. Readers MUST consume the
  manifest, not a directory glob: orphaned loser-attempt files sit next
  to committed ones by design (`read_committed` below is the only
  correct readback).
- Payload fields are integers/strings only: JSON round-trips them
  exactly, so a full value-hash oracle survives the write+readback.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


class JsonLinesCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int) -> None:
        self.filename = filename
        self.n_rows = n_rows


class JsonLinesDataSource(DataSource):
    """df.write.format("jsonl_sink").option("path", dir).mode("append").save()"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":
        return JsonLinesWriter(self.options, [f.name for f in schema.fields])


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, columns) -> None:
        self.path = options["path"]
        self.columns = list(columns)

    def write(self, iterator) -> JsonLinesCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        # attempt id in the name: concurrent attempts (task retry,
        # speculation) each get a private file; commit() only records the
        # attempts Spark declared winners, so losers become inert orphans
        # instead of clobbering the committed bytes.
        fname = os.path.join(
            self.path,
            f"part-{ctx.partitionId():05d}-{ctx.taskAttemptId():08d}.jsonl",
        )
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.columns, row)), sort_keys=True))
                f.write("\n")
                n += 1
        return JsonLinesCommit(fname, n)

    def commit(self, messages) -> None:
        manifest = {
            "files": sorted(m.filename for m in messages if m is not None),
            "rows": sum(m.n_rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.filename):
                os.remove(m.filename)


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(JsonLinesDataSource)


def committed_files(path: str) -> list[str]:
    """The exactly-once read side of the two-phase commit: the files the
    driver's commit() recorded in _MANIFEST.json — and nothing else. A
    directory glob would also pick up orphaned loser-attempt files (task
    retry / speculation), double-counting rows; the manifest IS the
    committed state."""
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        return list(json.load(f)["files"])


def read_committed(spark, path: str, schema: str):
    """Read back exactly the committed part files as a DataFrame.

    Returns an empty DataFrame of ``schema`` when the manifest lists no
    files (an all-empty write still commits a manifest)."""
    files = committed_files(path)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
