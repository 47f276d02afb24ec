"""sf10 decade probe (VERDICT r15 item 3): hash-audit the overflow-
sensitive query families one decade above the sf1 scale point, and time
the headline suite there.

Why: the q01 bug (decimal sums crossing 2^53) and the q103 bug (OLS
closed form crossing 2^63) were each INVISIBLE one decade below the
scale where they broke — committed SFs were green while the next decade
errored or silently diverged.  sf10 (60M lineitem rows, 10M events,
500k documents) is the next decade after sf1, so the families where
that bug class lives get the identical exact oracle comparison there:

* decimal aggregation (q01/q04/q61/q108) — sums another 10× larger,
* closed-form stats (q103/q123/q176) — Σx², n·Σxy products another
  100× larger,
* span dedup (q182/q195) — rolling-hash collision surface 10× larger,
* identity/DML driver state (q220/q230) — offset maps over 10× files,
plus the headline suite for slope evidence (sf1 → sf10 with the
bench_slope bounds).

Oracle feasibility at 60M rows decides the hash set: queries whose
DuckDB/numpy oracle cannot answer inside the watchdog are timed only,
with the reason recorded in the artifact (same documented-exclusion
discipline as the sf1 lane).  q34 swaps to the numpy pairs engine
(``parity_check._lsh_pairs_numpy``) — its SQL banding self-join is
hour-scale at 500k docs.

Artifacts: PARITY_sf10.json + BENCH_SCALE_sf10.json.  These are
POINT-IN-TIME probe evidence (stamped with the generating fingerprint
and round), NOT freshness-enforced like the four committed-SF artifacts
— re-running the probe each round would double round-close cost for a
bug class that moves only when aggregation/stat code changes.

Usage::

    python tools/decade_probe.py            # build sf10 if needed + probe
    python tools/decade_probe.py --bench    # timing sweep only
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.make_scale_data import SCALE_DIR, ensure  # noqa: E402

SCALE10_DIR = os.path.join(REPO, ".scaledata", "sf10.0")

#: Hash-audited at sf10: the overflow-sensitive families + the headline
#: queries whose oracles stay feasible at 60M rows.
OVERFLOW_FAMILIES = [
    # decimal aggregation past 2^53/2^63 (the q01/q103 bug class)
    "q01_pricing_summary",
    "q04_daily_order_summary",
    "q61_rollup_cascade",
    "q108_brand_revenue_share",
    # closed-form statistics (products of corpus-sized sums)
    "q103_ols_trend",
    "q123_benford_profile",
    "q176_seasonal_residuals",
    # span dedup (rolling-hash collision surface)
    "q182_rolling_dup_spans",
    "q195_keep_one_dup_spans",
    # identity / DML driver-side state
    "q220_deltalite_dml_census",
    "q230_deltalite_identity_columns",
]

#: Headline queries additionally hash-audited where feasible.
HEADLINE_HASH = [
    "q02_top_revenue_orders",
    "q03_region_revenue",
    "q21_velocity_windows",
    "q24_tumbling_hourly",
    "q28_doc_stats",
    "q34_minhash_lsh_pairs",
    "q63_sessionization_gap",
    "q107_blocking_supplier",
    "q130_daily_anomaly_monitor",
]

#: Timed but NOT hash-audited at sf10, with the measured reason.  Each
#: stays hash-checked at all four smaller scale points.
PROBE_EXCLUDED = {
    "q37_ann_cosine_topk": (
        "exact brute-force oracle is 10k queries x 200k candidates of "
        "interpreted list_dot_product in DuckDB — hour-scale; the lane "
        "is hash-checked at 4 smaller SFs"
    ),
    "q116_ann_topk_vectorized": (
        "same brute-force oracle shape as q37"
    ),
    "q100_training_pipeline": (
        "multi-stage ML pipeline contract audit — its oracle replays "
        "the full pipeline in SQL; feasible but ~10 min at sf10, out "
        "of probe budget (hash-checked at 4 smaller SFs)"
    ),
}


def ensure_sf10(spark=None) -> str:
    """Build .scaledata/sf10.0 as a 10× explode of the sf1 dir (reuses
    make_scale_data.build — same key-shift construction, so sf10 keys
    stay disjoint and per-key group sizes flat)."""
    from tools import make_scale_data as msd

    ensure()  # sf1 first (the explode source)
    if msd.is_fresh(SCALE10_DIR):
        return SCALE10_DIR
    import shutil

    if os.path.exists(SCALE10_DIR):
        shutil.rmtree(SCALE10_DIR)
    own_session = spark is None
    if own_session:
        from pyspark_anomaly_detection_spark.session import get_spark_session

        spark = get_spark_session("make_sf10")
        spark.sparkContext.setLogLevel("ERROR")
    m = msd.build(spark, source=SCALE_DIR, out_dir=SCALE10_DIR)
    print(
        "decade_probe: built sf10: "
        + ", ".join(f"{t}={n}" for t, n in sorted(m["tables"].items())),
        file=sys.stderr,
    )
    return SCALE10_DIR


def run_hash_audit(sf_dir: str) -> dict:
    from tools.parity_check import (
        SCALE_NUMPY_ORACLES,
        _lsh_pairs_numpy,
        run_sf,
    )

    numpy_oracles = dict(SCALE_NUMPY_ORACLES)
    numpy_oracles["q34_minhash_lsh_pairs"] = _lsh_pairs_numpy
    only = set(OVERFLOW_FAMILIES + HEADLINE_HASH)
    result = run_sf(sf_dir, only=only, numpy_oracles=numpy_oracles)
    result["excluded"] = PROBE_EXCLUDED
    result["probe"] = "sf10-decade-r16"
    return result


def run_bench(sf_dir: str) -> dict:
    env = dict(
        os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_BENCH_REPS="3"
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    ).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    payload = json.loads(line)
    from pyspark_anomaly_detection_spark.registry import registry_fingerprint

    payload["registry_fingerprint"] = registry_fingerprint()
    payload["probe"] = "sf10-decade-r16"
    return payload


def main() -> None:
    sf_dir = ensure_sf10()
    if "--bench" not in sys.argv:
        result = run_hash_audit(sf_dir)
        out = os.path.join(REPO, "PARITY_sf10.json")
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
        print(
            f"sf10 hash audit: {result['n_pass']}/{result['n_oracle']} "
            f"pass, {result['n_fail']} fail → {out}"
        )
        if result["n_fail"]:
            for name, why in result["failures"].items():
                print(f"  FAIL {name}: {why}")
    bench = run_bench(sf_dir)
    out = os.path.join(REPO, "BENCH_SCALE_sf10.json")
    with open(out, "w") as f:
        json.dump(bench, f, separators=(",", ":"))
        f.write("\n")
    print(f"sf10 bench: {bench['value']}s headline suite → {out}")
    # slope sf1 → sf10 with the bench_slope bounds, informational line
    scale_art = os.path.join(REPO, "BENCH_SCALE_sf1.json")
    if os.path.exists(scale_art):
        with open(scale_art) as f:
            sf1 = json.load(f)
        worst = 0.0
        for name, t10 in bench["queries"].items():
            t1 = sf1.get("queries", {}).get(name)
            if t1 and t1 >= 0.3:
                worst = max(worst, t10 / t1)
        print(f"sf10 worst slope vs sf1 (t1>=0.3s): {worst:.1f}x for 10x")


if __name__ == "__main__":
    main()
