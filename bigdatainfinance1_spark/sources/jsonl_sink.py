"""Custom Python DataSource WRITER (Spark 4 DataSource API) — the write
half of the custom-connector surface (sources/ticks.py is the read
half): a JSON-lines sink that writes one file per input partition and a
manifest on commit, the canonical shape for pushing results to systems
Spark has no native connector for (vendor APIs, internal feeds).

API points the writer path demands:
- `writer()` returns a per-batch DataSourceWriter; Spark calls
  `write(iterator)` once per partition ON THE EXECUTORS — the sink must
  never funnel rows through the driver.
- Each task writes its own file (named by partition id via TaskContext)
  and returns a WriterCommitMessage; `commit()` sees all messages on the
  driver and finalizes atomically (here: a manifest listing the parts) —
  the two-phase commit that makes the sink exactly-once per batch.
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

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{pid:05d}.jsonl")
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
