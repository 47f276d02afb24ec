"""Round-close gate (VERDICT r8 item 3): regenerate every registry-derived
artifact in dependency order, then prove the repo is internally consistent.

Two consecutive rounds ended with committed artifacts trailing the
registry (queries landed AFTER the sweeps ran), which turned the engine's
own freshness tests red.  This script IS the round workflow's mandatory
last step (README):

    python tools/round_close.py            # full close: ~15-20 min
    python tools/round_close.py --quick    # skip the sf0.1 sweeps (~5 min)

Order matters — artifacts first, pytest last, so the freshness tests run
against what was just written:

1. ``tools/plan_audit.py``        → PLAN_AUDIT.md        (one row per query)
2. ``tools/bench_slope.py``       → BENCH_ALL_sf0.01/0.1.json (two-SF sweep)
3. ``tools/parity_check.py``      → PARITY_sf0.001/0.01/0.1.json (3-SF matrix)
4. ``tools/bench_history.py``     → BENCH_HISTORY.json   (cross-round check)
5. ``tools/coverage_status.py``   → COVERAGE.md oracle-status block
6. ``tools/readme_counts.py``     → README.md derived counts (r14)
7. ``pytest tests/``              → the whole contract, including the
   freshness guards over the artifacts written in 1-6.

Refuses (non-zero exit) on the FIRST failing step.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> None:
    print(f"\n=== round_close: {label}: {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO)
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        print(
            f"round_close: REFUSED at step '{label}' "
            f"(exit {proc.returncode} after {dt:.0f}s)",
            file=sys.stderr,
        )
        sys.exit(proc.returncode)
    print(f"=== round_close: {label} OK ({dt:.0f}s)", flush=True)


def _scale_point_fresh() -> bool:
    import json

    path = os.path.join(REPO, "PARITY_sf1.json")
    if not os.path.exists(path):
        return False
    sys.path.insert(0, REPO)
    try:
        with open(path) as f:
            art = json.load(f)
        from pyspark_anomaly_detection_spark.registry import (
            registry_fingerprint,
        )
        from tools.parity_check import scale_point_queries

        live = registry_fingerprint()
        stamped = art.get("registry_fingerprint", {})
        return (
            stamped.get("registry_hash") == live["registry_hash"]
            # package_hash too (ADVICE r15): registry_hash only covers
            # query/oracle source — a library-only change (deltalite,
            # neardup, io...) must also invalidate the skip
            and stamped.get("package_hash") == live["package_hash"]
            and art.get("n_fail") == 0
            and scale_point_queries() <= set(art.get("queries", {}))
        )
    except Exception:
        return False


def _fuzz_fresh() -> bool:
    import json

    path = os.path.join(REPO, "FUZZ_PARITY.json")
    if not os.path.exists(path):
        return False
    sys.path.insert(0, REPO)
    try:
        with open(path) as f:
            art = json.load(f)
        from pyspark_anomaly_detection_spark.registry import (
            registry_fingerprint,
        )
        from tools.data_fuzz import VARIANTS

        live = registry_fingerprint()
        stamped = art.get("registry_fingerprint", {})
        return (
            stamped.get("registry_hash") == live["registry_hash"]
            and stamped.get("package_hash") == live["package_hash"]
            and set(art.get("variants", {})) == set(VARIANTS)
            and all(
                v.get("n_fail") == 0 for v in art["variants"].values()
            )
        )
    except Exception:
        return False


def main() -> None:
    quick = "--quick" in sys.argv
    py = sys.executable
    run("plan audit", [py, "tools/plan_audit.py"])
    if quick:
        print("round_close: --quick: keeping committed BENCH_ALL artifacts")
        run("bench slope (check only)", [py, "tools/bench_slope.py", "--check"])
    else:
        run("bench slope (two-SF sweep)", [py, "tools/bench_slope.py"])
    parity_dirs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    if not quick:
        parity_dirs.append("/root/testdata/sf0.1")
    run("parity matrix", [py, "tools/parity_check.py", *parity_dirs])
    if not quick:
        # hostile-SF oracle audit (r14): slope queries at the 10× dir —
        # caught q01's decimal→double divergence above 2^53 on arrival.
        # Skip ONLY when the committed artifact is provably current:
        # fingerprint == live registry (any query edit moves it), full
        # scale-point coverage, zero failures — the r15 99-query sweep
        # is ~20 min, and re-running it against identical query source
        # reproduces identical comparisons.
        if _scale_point_fresh():
            print(
                "round_close: PARITY_sf1.json is fingerprint-current, "
                "covering, and green — skipping the sf1 re-sweep"
            )
        else:
            run(
                "parity scale point (sf1)",
                [py, "tools/parity_check.py", "--scale-point"],
            )
    if not quick:
        # mutated-data differential fuzz (round 16): same skip rule as
        # the sf1 sweep — the committed artifact stands only while both
        # fingerprints match and every variant is green
        if _fuzz_fresh():
            print(
                "round_close: FUZZ_PARITY.json is fingerprint-current and "
                "green — skipping the fuzz re-sweep"
            )
        else:
            run("data fuzz", [py, "tools/data_fuzz.py"])
    run("bench history", [py, "tools/bench_history.py"])
    run("coverage oracle-status", [py, "tools/coverage_status.py"])
    run("readme counts", [py, "tools/readme_counts.py"])
    run("pytest", [py, "-m", "pytest", "tests/", "-q", "-x"])
    # commit-message counts DERIVED from the registry, never hand-typed
    # (verdict r10 item 1: commit 57b0328 said "224-query registry" over
    # a 223-entry registry — round-close messages are evidence)
    sys.path.insert(0, REPO)
    from pyspark_anomaly_detection_spark.registry import registry_fingerprint

    # End-of-close staleness self-check (VERDICT r16 item 1): r16's close
    # ran green, then commit d781ba1 edited four registered query files
    # and the snapshot commit shipped the four PARITY matrices stamped at
    # the pre-edit hash.  pytest above already compares stamped vs live,
    # but it runs mid-close — this FINAL re-read catches a registry that
    # moved while the close itself was running, the exact r16 hole.
    from tests.test_artifact_freshness import (
        JSON_ARTIFACTS,
        embedded_hash_of,
    )

    live_now = registry_fingerprint()["registry_hash"]
    stale = [
        name
        for name in [*JSON_ARTIFACTS, "PLAN_AUDIT.md"]
        if embedded_hash_of(os.path.join(REPO, name)) != live_now
    ]
    if stale:
        print(
            "round_close: REFUSED at final self-check — artifacts stamped "
            f"behind live registry {live_now[:12]}: {stale}. A registered "
            "query changed while the close ran; rerun tools/round_close.py.",
            file=sys.stderr,
        )
        sys.exit(1)

    fp = registry_fingerprint()
    print("\nround_close: ALL GREEN — safe to commit the round snapshot.")
    print(
        f"round_close: commit-message counts: {fp['n_queries']} registered "
        f"queries, {fp['n_oracle']} oracle-checked "
        f"(registry {fp['registry_hash'][:12]} at {fp['git_head'][:12]})"
    )


if __name__ == "__main__":
    main()
