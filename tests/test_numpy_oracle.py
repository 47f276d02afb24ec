"""The sf1 scale-point lane replaces q52/q183's hour-scale all-pairs SQL
oracles with a chunked-numpy third engine (tools/parity_check.py::
SCALE_NUMPY_ORACLES).  That substitution is only evidence if the numpy
oracle is BITWISE what DuckDB would have computed — this pins exactly
that, at an SF small enough for DuckDB to recompute directly.

No Spark session: this is an oracle-vs-oracle test (DuckDB vs numpy);
the engine side is covered by the parity harness.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.parity_check import (  # noqa: E402
    _exact_neardup_pairs_numpy,
    _exact_semantic_keep_numpy,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    yield con
    con.close()


def _sql_oracle(name: str, duck) -> "object":
    from pyspark_anomaly_detection_spark.registry import (
        all_queries,
        resolve_oracle,
    )

    return duck.execute(
        resolve_oracle(all_queries()[name].oracle, SF_DIR)
    ).df()


def test_neardup_pairs_bitwise_matches_duckdb(duck):
    sql = _sql_oracle("q52_embedding_neardup", duck)
    np_df = _exact_neardup_pairs_numpy(SF_DIR)
    assert len(sql) == len(np_df), (len(sql), len(np_df))
    merged = sql.merge(
        np_df, on=["a_id", "b_id"], suffixes=("_sql", "_np")
    )
    assert len(merged) == len(sql), "pair sets differ"
    # BITWISE equality — the numpy lane recomputes cos_sim in the
    # engines' exact fold order, not via BLAS summation
    assert (merged["cos_sim_sql"] == merged["cos_sim_np"]).all()


def test_semantic_keep_bitwise_matches_duckdb(duck):
    sql = _sql_oracle("q183_semantic_dedup_keep", duck)
    sql["keep"] = sql["keep"].astype(bool)
    np_df = _exact_semantic_keep_numpy(SF_DIR)
    sql_n = sql.reindex(sorted(sql.columns), axis=1).reset_index(drop=True)
    np_n = np_df.reindex(sorted(np_df.columns), axis=1).reset_index(
        drop=True
    )
    assert sql_n.astype(str).equals(np_n.astype(str))
