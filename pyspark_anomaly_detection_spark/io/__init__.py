from pyspark_anomaly_detection_spark.io.readers import (
    TABLE_NAMES,
    load_all_tables,
    load_table,
    read_csv_enforced,
    read_csv_permissive,
    register_views,
)
from pyspark_anomaly_detection_spark.io.writers import (
    write_partitioned,
    write_table,
)

__all__ = [
    "TABLE_NAMES",
    "load_all_tables",
    "load_table",
    "read_csv_enforced",
    "read_csv_permissive",
    "register_views",
    "write_partitioned",
    "write_table",
]
