"""Custom Python DataSource (Spark 4 DataSource API — SURVEY.md §2.1 surface
extension): a deterministic synthetic tick generator, the canonical "custom
connector" shape for a finance engine (exchange feed adapters, flat binary
tick archives, vendor APIs).

Design points the API demands at scale:
- `partitions()` declares the split set up front, so Spark schedules one
  task per partition and generation is fully parallel — the reader never
  materializes the whole feed anywhere.
- Rows are strided across partitions (tick i → partition i % P) and every
  field is a pure function of the tick id, so the dataset is independent of
  the partition count — repartitioning the source cannot change results.
- All fields use integer LCG arithmetic + one power-of-two double division,
  which IEEE-754 doubles evaluate exactly; DuckDB's `range()` reproduces the
  identical values, giving this connector a FULL value-hash oracle (rare for
  a custom source — and exactly why the generator avoids float state).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

TICK_ROWS = 20_000
TICK_PARTS = 8

_M31 = 2_147_483_648  # 2^31; all LCG products stay < 2^53, exact in double


def tick_price(i: int) -> float:
    return 100.0 + ((1103515245 * i + 12345) % _M31) / float(_M31) * 10.0


def tick_qty(i: int) -> int:
    return ((69069 * i + 1) % 97) + 1


class SyntheticTicksDataSource(DataSource):
    """spark.read.format("synthetic_ticks").option("rows", N).option("parts", P)"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return "tick_id bigint, part_id int, price double, qty bigint"

    def reader(self, schema) -> "SyntheticTicksReader":
        return SyntheticTicksReader(self.options)

    def streamReader(self, schema) -> "SyntheticTicksStreamReader":
        # the SAME format serves batch and streaming — the dual-mode
        # connector shape (one adapter, spark.read OR spark.readStream)
        return SyntheticTicksStreamReader(self.options)


class SyntheticTicksReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", TICK_ROWS))
        self.n_parts = int(options.get("parts", TICK_PARTS))

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition: InputPartition):
        for i in range(partition.value, self.n_rows, self.n_parts):
            yield (i, partition.value, tick_price(i), tick_qty(i))


class SyntheticTicksStreamReader(DataSourceStreamReader):
    """Offset-tracked replay of the same deterministic feed: offsets are
    plain tick counts ({"tick": n}); `partitions(start, end)` strides the
    pending range across executors (reads never touch the driver — the
    full DataSourceStreamReader, not the driver-side Simple variant);
    `commit` is a no-op because the generator is pure. An availableNow
    run drains to the declared feed end in one scheduled batch."""

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", TICK_ROWS))
        self.n_parts = int(options.get("parts", TICK_PARTS))

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def latestOffset(self) -> dict:
        return {"tick": self.n_rows}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["tick"], end["tick"]
        return [InputPartition((lo + p, hi, self.n_parts)) for p in range(self.n_parts)]

    def read(self, partition: InputPartition):
        lo, hi, stride = partition.value
        for i in range(lo, hi, stride):
            yield (i, i % self.n_parts, tick_price(i), tick_qty(i))

    def commit(self, end: dict) -> None:
        pass


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(SyntheticTicksDataSource)
