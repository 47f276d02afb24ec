"""Triage helper: run ONE query against a fuzz variant dir and print
both frames + the first differing rows.  Usage::

    python tools/fuzz_triage.py empty q28_doc_stats
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb
import pandas as pd

from pyspark_anomaly_detection_spark.io.readers import TABLE_NAMES
from pyspark_anomaly_detection_spark.registry import all_queries, resolve_oracle
from pyspark_anomaly_detection_spark.session import get_spark_session
from tools.parity_check import _normalize, compare


def main() -> None:
    variant, name = sys.argv[1], sys.argv[2]
    sf_dir = os.path.join(REPO, ".fuzzdata", variant)
    spark = get_spark_session("triage", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    q = all_queries()[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    duck_pdf = con.execute(resolve_oracle(q.oracle, sf_dir)).df()
    err = compare(spark_pdf, duck_pdf, name)
    print(f"compare: {err}")
    pd.set_option("display.width", 250)
    pd.set_option("display.max_columns", 50)
    ns, nd = _normalize(spark_pdf), _normalize(duck_pdf)
    if len(ns) == len(nd) and list(ns.columns) == list(nd.columns):
        neq = (ns != nd).any(axis=1)
        print(f"-- differing rows ({int(neq.sum())}):")
        print("SPARK:\n", ns[neq].head(10))
        print("ORACLE:\n", nd[neq].head(10))
    else:
        print("SPARK:\n", ns.head(15))
        print("ORACLE:\n", nd.head(15))
    spark.stop()


if __name__ == "__main__":
    main()
