"""Multi-SF oracle-parity sweep → committed evidence artifact.

The pytest parity harness (tests/test_oracle_parity.py) compares every
registered oracle pair exactly, but only at ONE scale factor per run
(``$SPARK_GRAFT_TEST_SF_DIR``, default sf0.001), and the driver's own
gate runs at sf0.01.  Bugs in SIZE-DEPENDENT dispatch (q52's
exact-below-cap / LSH-above switch is the canonical example) are
invisible to any single-SF run — they only show when the same oracle
comparison is executed at a second scale.

This tool runs the identical comparison (same normalization, same
exact-match rule, no float tolerance) for EVERY registered oracle pair
at one or more SF dirs and writes ``PARITY_sf{sf}.json`` per SF::

    {"sf_dir": ..., "n_oracle": N, "n_pass": N, "n_fail": 0,
     "queries": {"q01_...": "pass", ...}, "failures": {}}

Usage::

    python tools/parity_check.py                 # sf0.001 + sf0.01
    python tools/parity_check.py /root/testdata/sf0.01
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb
import pandas as pd

from pyspark_anomaly_detection_spark.io.readers import TABLE_NAMES
from pyspark_anomaly_detection_spark.registry import all_queries, resolve_oracle
from pyspark_anomaly_detection_spark.similarity.neardup import MAX_EXACT_ROWS
from pyspark_anomaly_detection_spark.session import get_spark_session

#: Same whitelist as tests/test_oracle_parity.py — queries whose oracle
#: binds as subset-containment above their exact-dispatch cap.  Keep in
#: sync with tests/test_oracle_parity.py::ADAPTIVE_SUBSET_CASES.
ADAPTIVE_SUBSET_CASES = {"q52_embedding_neardup", "q183_semantic_dedup_keep"}


def _cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.copy()
    for col in out.columns:
        out[col] = out[col].map(_cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def _semantic_keep_containment(
    spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame
) -> str | None:
    """Above-cap q183 rule (mirrors tests/test_oracle_parity.py::
    check_semantic_keep_containment): LSH pairs ⊆ exact pairs ⇒ spark
    components REFINE the oracle's.  Triggered by SCALE (row count above
    MAX_EXACT_ROWS), not by a row-count mismatch — q183 returns one row
    per vector in both engines regardless of dispatch."""
    m = spark_pdf.merge(duck_pdf, on="vec_id", suffixes=("_s", "_d"))
    if not (len(m) == len(spark_pdf) == len(duck_pdf)):
        return "vec_id sets differ"
    if not (m["component_s"] >= m["component_d"]).all():
        return "component not refined (id decreased)"
    if not (m["cluster_size_s"] <= m["cluster_size_d"]).all():
        return "cluster size grew under blocking"
    if m.groupby("component_s")["component_d"].nunique().max() != 1:
        return "spark component spans multiple oracle components"
    if not m.loc[m["keep_d"], "keep_s"].all():
        return "oracle-kept vector dropped"
    return None


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> str | None:
    """None if parity holds, else a short failure description."""
    if name == "q183_semantic_dedup_keep" and len(spark_pdf) > MAX_EXACT_ROWS:
        # above MAX_EXACT_ROWS the exact leg is capped: containment rule
        return _semantic_keep_containment(spark_pdf, duck_pdf)
    if name in ADAPTIVE_SUBSET_CASES and len(spark_pdf) < len(duck_pdf):
        key = ["a_id", "b_id"]
        merged = spark_pdf.merge(duck_pdf, on=key, suffixes=("_s", "_d"))
        if len(merged) != len(spark_pdf):
            return "blocked pair not in exact set"
        if (merged["cos_sim_s"] - merged["cos_sim_d"]).abs().max() != 0.0:
            return "cos_sim mismatch in subset"
        return None
    if len(spark_pdf) != len(duck_pdf):
        return f"rows {len(spark_pdf)} != {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    if not _normalize(spark_pdf).equals(_normalize(duck_pdf)):
        return "value mismatch"
    return None


def run_sf(sf_dir: str, only: "set[str] | None" = None) -> dict:
    spark = get_spark_session("parity", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        # testdata tables are single files; the sf1 scale dir's are
        # Spark-written DIRECTORIES of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    registry = all_queries()
    statuses: dict[str, str] = {}
    failures: dict[str, str] = {}
    start = time.perf_counter()
    for name, query in sorted(registry.items()):
        if not query.oracle:
            continue
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            spark_pdf = query.fn(spark, sf_dir).toPandas()
            t_spark = time.perf_counter() - t0
            duck_pdf = con.execute(
                resolve_oracle(query.oracle, sf_dir)
            ).df()
            t_duck = time.perf_counter() - t0 - t_spark
            err = compare(spark_pdf, duck_pdf, name)
        except Exception as e:  # noqa: BLE001 - sweep robustness
            err = f"error: {str(e)[:200]}"
            t_spark = t_duck = -1.0
        if err is None:
            statuses[name] = "pass"
        else:
            statuses[name] = "fail"
            failures[name] = err
        print(
            f"  {name}: {statuses[name]} "
            f"(spark {t_spark:.1f}s, oracle {t_duck:.1f}s)",
            file=sys.stderr,
            flush=True,
        )
    elapsed = round(time.perf_counter() - start, 1)
    con.close()
    spark.stop()
    from pyspark_anomaly_detection_spark.registry import registry_fingerprint

    return {
        "sf_dir": sf_dir,
        "n_oracle": len(statuses),
        "n_pass": sum(1 for s in statuses.values() if s == "pass"),
        "n_fail": len(failures),
        "elapsed_sec": elapsed,
        # stale-artifact guard (verdict r10 item 1): the freshness test
        # fails when this no longer matches the live registry
        "registry_fingerprint": registry_fingerprint(),
        "queries": statuses,
        "failures": failures,
    }


def scale_point_queries() -> set[str]:
    """The sf1 audit set (VERDICT r13 item 8): the slope-lane queries —
    the q37/q116 BLAS lane and the size-adaptive dispatches all engage
    at the 10× dir.  The q52/q183 adaptive pair is deliberately NOT
    here: their DuckDB oracles are exact ALL-PAIRS recomputations
    (20k×20k at sf1), which is an hour-scale oracle cost for no extra
    engine coverage — their blocking lanes are already containment-
    checked at sf0.1 where the caps engage (ADAPTIVE_SUBSET_CASES)."""
    from tools.bench_slope import SCALE_EXTRA_QUERIES

    return (
        {n for n, q in all_queries().items() if q.headline}
        | set(SCALE_EXTRA_QUERIES)
    )


def main() -> None:
    if "--scale-point" in sys.argv:
        # hostile-SF oracle audit: same comparison, at the 10× explode
        from tools.make_scale_data import ensure

        sf_dir = ensure()
        result = run_sf(sf_dir, only=scale_point_queries())
        out = os.path.join(REPO, "PARITY_sf1.json")
        with open(out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=False)
            f.write("\n")
        print(
            f"sf1: {result['n_pass']}/{result['n_oracle']} pass, "
            f"{result['n_fail']} fail → {out}"
        )
        if result["n_fail"]:
            for name, why in result["failures"].items():
                print(f"  FAIL {name}: {why}")
            sys.exit(1)
        return
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    for sf_dir in sf_dirs:
        result = run_sf(sf_dir)
        tag = os.path.basename(sf_dir.rstrip("/"))
        out = os.path.join(REPO, f"PARITY_{tag}.json")
        with open(out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=False)
            f.write("\n")
        print(
            f"{tag}: {result['n_pass']}/{result['n_oracle']} pass, "
            f"{result['n_fail']} fail → {out}"
        )
        if result["n_fail"]:
            for name, why in result["failures"].items():
                print(f"  FAIL {name}: {why}")
            sys.exit(1)


if __name__ == "__main__":
    main()
