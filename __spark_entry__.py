"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — named query per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per oracle-checkable query.

The real surface lives in ``pyspark_anomaly_detection_spark``; this module
only adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_anomaly_detection_spark.registry import (  # noqa: E402
    all_queries,
    resolve_oracle,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The composite training-data pipeline (q100): exact dedup → quality
    gate → deterministic split → token-budget packing, as one declarative
    plan — the engine's reference-parity operators (content digests,
    violation-counter gates) and north-star operators (splits, packing)
    composed end-to-end.
    """
    from pyspark_anomaly_detection_spark.text.splits import (
        q100_training_pipeline,
    )

    return q100_training_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    # resolve_oracle binds file-addressing oracles (parquet_metadata) to
    # the driver's correctness-gate scale (sf0.01)
    return {
        name: resolve_oracle(q.oracle)
        for name, q in all_queries().items()
        if q.oracle is not None
    }
