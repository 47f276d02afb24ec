"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference reads only CSV/Delta (SURVEY §2.1); a 100 TB training-data
platform also ingests from systems Spark has no built-in connector for
(internal feature stores, label services, RPC-fronted corpora).  Spark 4's
Python DataSource API is the idiomatic extension point: the source
declares partitions, executors call ``read(partition)`` in parallel, and
the rows enter the JVM through Arrow — no driver-side collect, no RDD.

``SyntheticEventsDataSource`` is the registry's reference implementation:
a deterministic generator (LCG-derived columns, pure integer arithmetic)
so the parallel-read plumbing is testable against a DuckDB oracle that
recomputes the same closed-form rows with SQL — proving partition fan-out
loses/duplicates nothing, not just "returns some rows".

Scale notes: partition count is an option (default 8) — at cluster scale
one partition per executor-core slice of the id range; the generator holds
O(1) state per partition (no materialized list), so memory is flat no
matter how large a range a partition covers.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from pyspark_anomaly_detection_spark.registry import register

# LCG constants (glibc's) — shared with the oracle SQL below.
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2_147_483_648  # 2^31: division by it is exact in float64
BUCKET_MULT = 2_654_435_761  # Knuth multiplicative hash constant
N_BUCKETS = 97

DEFAULT_ROWS = 5000
DEFAULT_PARTITIONS = 8


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", DEFAULT_ROWS))
        self.n_partitions = int(options.get("partitions", DEFAULT_PARTITIONS))

    def partitions(self) -> list[_RangePartition]:
        step = -(-self.n_rows // self.n_partitions)  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for row_id in range(partition.start, partition.end):
            bucket = (row_id * BUCKET_MULT) % N_BUCKETS
            score = ((row_id * LCG_A + LCG_C) % LCG_M) / LCG_M
            yield (row_id, bucket, score)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "row_id bigint, bucket int, score double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register_python_datasource(spark: SparkSession) -> None:
    """Idempotent registration of the custom source with a session."""
    spark.dataSource.register(SyntheticEventsDataSource)


@register(
    "q111_python_datasource",
    oracle=f"""
    SELECT range AS row_id,
      CAST((range * {BUCKET_MULT}) % {N_BUCKETS} AS INT) AS bucket,
      CAST((range * {LCG_A} + {LCG_C}) % {LCG_M} AS DOUBLE) / {LCG_M}.0 AS score
    FROM range({DEFAULT_ROWS})
    ORDER BY row_id
    """,
)
def q111_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python DataSource with 8-way partition
    fan-out and return every generated row.  The DuckDB oracle recomputes
    the identical closed-form rows over ``range()`` — row-count + value
    parity proves the partitioned parallel read is exactly-once.  (sf_dir
    is unused: the source IS the data.)"""
    register_python_datasource(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", DEFAULT_ROWS)
        .option("partitions", DEFAULT_PARTITIONS)
        .load()
        .orderBy("row_id")
    )


# --------------------------------------------------------------------------
# Streaming variant: same deterministic rows, micro-batched with replayable
# offsets (Spark 4 SimpleDataSourceStreamReader).
# --------------------------------------------------------------------------

try:  # pragma: no cover - import surface differs across minor versions
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    STREAM_READER_AVAILABLE = True
except ImportError:  # pragma: no cover
    SimpleDataSourceStreamReader = object
    STREAM_READER_AVAILABLE = False

DEFAULT_BATCH_ROWS = 100


def _row(row_id: int) -> tuple:
    bucket = (row_id * BUCKET_MULT) % N_BUCKETS
    score = ((row_id * LCG_A + LCG_C) % LCG_M) / LCG_M
    return (row_id, bucket, score)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset = next row id to emit.  ``read`` advances the offset by one
    micro-batch; ``readBetweenOffsets`` regenerates any committed range
    bit-identically (the LCG is pure), which is what makes failure replay
    exactly-once without a write-ahead log."""

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", DEFAULT_BATCH_ROWS))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = lo + self.batch_rows
        return iter([_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["next"], end["next"])])


class SyntheticEventsStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "row_id bigint, bucket int, score double"

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_stream_datasource(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticEventsStreamSource)
