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
    _LSH_PAIRS_CACHE,
    _exact_neardup_pairs_numpy,
    _exact_semantic_keep_numpy,
    _interval_join_numpy,
    _keep_longest_numpy,
    _ngram_jaccard_numpy,
    _normalize,
    _recursive_reach_numpy,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("embeddings", "documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
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


@pytest.mark.parametrize(
    "qname,np_oracle",
    [
        ("q35_ngram_jaccard_pairs", _ngram_jaccard_numpy),
        ("q76_recursive_reachability", _recursive_reach_numpy),
        ("q127_bucketized_interval_join", _interval_join_numpy),
        ("q196_keep_longest_rep", _keep_longest_numpy),
    ],
)
def test_numpy_oracle_bitwise_matches_duckdb(qname, np_oracle, duck):
    """VERDICT r15 item 2: the four sf1 exclusions whose SQL oracles are
    quadratic/recursive (hour-scale at 6M rows) close through chunked-
    numpy third engines — valid evidence only if each is BITWISE what
    DuckDB computes, pinned here at an SF DuckDB can recompute directly.
    Comparison = the parity sweep's own normalization (stringified
    cells, repr'd floats), so float bit patterns count."""
    _LSH_PAIRS_CACHE.clear()
    sql = _sql_oracle(qname, duck)
    np_df = np_oracle(SF_DIR)
    assert sql.shape == np_df.shape, (sql.shape, np_df.shape)
    assert sorted(sql.columns) == sorted(np_df.columns)
    a, b = _normalize(sql), _normalize(np_df)
    assert a.equals(b), a.compare(b, align_axis=0)
