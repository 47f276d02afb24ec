"""Benchmark harness: times the headline query suite at a scale factor.

Usage: ``python bench.py`` — reads ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) and ``$SPARK_GRAFT_CPUS`` (default all cores),
executes every headline query end-to-end (materialized via the noop sink —
full execution, no driver collect), and prints ONE JSON line::

    {"metric": "headline_suite_seconds", "value": N, "unit": "sec",
     "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_anomaly_detection_spark.registry import all_queries
from pyspark_anomaly_detection_spark.session import get_spark_session


def materialize(df) -> None:
    """Execute the full plan without transferring rows to the driver."""
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    if "--all" in sys.argv:
        # Full-registry sweep: per-query wall time for EVERY registered
        # query — the tail-latency guard the 15-query headline suite
        # can't provide.  Warmup at sf0.001 per plan (codegen compiles
        # per distinct plan), then timed at sf_dir.
        timings: dict[str, float] = {}
        errors: dict[str, str] = {}
        for name, query in sorted(registry.items()):
            try:
                materialize(query.fn(spark, "/root/testdata/sf0.001"))
            except Exception as e:  # noqa: BLE001 - sweep robustness
                errors[name] = str(e)[:200]
                continue
            start = time.perf_counter()
            try:
                materialize(query.fn(spark, sf_dir))
                timings[name] = round(time.perf_counter() - start, 3)
            except Exception as e:  # noqa: BLE001
                errors[name] = str(e)[:200]
            print(f"  {name}: {timings.get(name, 'ERR')}", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "full_registry_seconds",
                    "value": round(sum(timings.values()), 3),
                    "unit": "sec",
                    "queries": timings,
                    "errors": errors,
                    "n_queries": len(registry),
                    "sf": sf,
                }
            )
        )
        spark.stop()
        return

    headline = {n: q for n, q in registry.items() if q.headline}

    # JVM/codegen warmup on the smallest SF so timings measure the engine,
    # not first-query initialization. Whole-stage codegen compiles per
    # distinct plan, so every headline plan is warmed, not just the first.
    for query in headline.values():
        materialize(query.fn(spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    total = 0.0
    for name, query in sorted(headline.items()):
        start = time.perf_counter()
        materialize(query.fn(spark, sf_dir))
        elapsed = round(time.perf_counter() - start, 3)
        timings[name] = elapsed
        total += elapsed

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
