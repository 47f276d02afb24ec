"""PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference pipeline (``q138ben/pyspark-anomaly-detection``,
a batch fraud/anomaly-detection Medallion pipeline), extended with the
operators a large-scale LLM training-data pipeline needs (dedup, similarity
search, text analysis, multimodal columns, event-time windows).

Design stance (SURVEY.md §7.1): a thin, well-factored PySpark library.
All execution is delegated to Spark/Catalyst/Tungsten — no custom execution
machinery, no custom Catalyst rules.  Every operator is expressed with the
DataFrame API so predicate pushdown, column pruning, whole-stage codegen and
AQE apply for free, and the same code scales from ``local[*]`` tests to a
1000-executor cluster.
"""

from pyspark_anomaly_detection_spark.session import get_spark_session

__all__ = ["get_spark_session"]
__version__ = "0.1.0"
