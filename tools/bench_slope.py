"""Multi-scale sweep slope guard (round-3 verdict directive #3): run the
full-registry sweep at two scale factors and assert every query scales
sub-quadratically — the automatic catcher for q172-class degeneracies
(a hidden all-pairs join looks fine at one SF and explodes at the next).

Usage:
    python tools/bench_slope.py            # run both sweeps + check
    python tools/bench_slope.py --check    # check committed artifacts only

Artifacts: BENCH_ALL_sf0.01.json, BENCH_ALL_sf0.1.json, and (round 12)
BENCH_SCALE_sf1.json at the repo root (stable names — refreshed per
round, diffable in git history).  The third point sweeps the headline +
driver-state-sensitive queries over a deterministic 10× explode of
sf0.1 (tools/make_scale_data.py) and checks sf0.1 → sf1 with the same
bounds — on arrival it caught q37's 78× interpreted-fold cliff.
tests/test_bench_slope.py re-runs the checks on the committed artifacts
so a regression cannot land silently alongside stale ones.

Method: for 10× rows, a linear operator costs ~10×, an n·log n one a bit
more, a quadratic one ~100×.  The bound is ratio < SLOPE_BOUND (15) for
every query whose small-SF time exceeds NOISE_FLOOR (0.3 s) — below the
floor, constant per-query overhead (session, planning, codegen) dominates
and ratios are noise, so those queries are instead bounded ABSOLUTELY
(t_big < ABS_BOUND).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMALL = "/root/testdata/sf0.01"
BIG = "/root/testdata/sf0.1"
SMALL_ART = os.path.join(REPO, "BENCH_ALL_sf0.01.json")
BIG_ART = os.path.join(REPO, "BENCH_ALL_sf0.1.json")

SLOPE_BOUND = 15.0  # 10× data may cost at most 15×
NOISE_FLOOR = 0.3  # seconds at the small SF before ratios mean anything
ABS_BOUND = 12.0  # big-SF ceiling for queries too fast to ratio

# --- third point (VERDICT r11 item 6): ~10× sf0.1, synthesized by
# tools/make_scale_data.py into .scaledata/ (gitignored).  Covers the
# headline suite plus the driver-state-sensitive paths (identity offset
# map q230, shard manifest q168, global row ids q185, deltalite file
# census q220) — the queries whose driver-side state could grow with
# input — rather than all 230 (a full sweep at sf1 is ~1 h).
SCALE_ART = os.path.join(REPO, "BENCH_SCALE_sf1.json")
SCALE_EXTRA_QUERIES = [
    "q168_shard_manifest",
    "q185_global_row_ids",
    "q220_deltalite_dml_census",
    "q230_deltalite_identity_columns",
]
SCALE_ABS_BOUND = 60.0  # sf1 ceiling for queries under the noise floor

# Per-query variance bound at the scale point (VERDICT r15 item 7): the
# slope test bounds the MEAN, so a straggler class could hide inside a
# passing mean — r14's sf1 sweep recorded a 6× q116 rep spike that the
# trimmed mean absorbed.  Root cause was warmup methodology (the sf0.001
# warmup spawns 1-2 Python workers; rep 1 at sf1 paid ~30 worker forks +
# first-touch page cache — fixed by bench.py's target-SF warmup pass,
# BENCH_NOTES.md round 15); post-fix the observed worst max/min is 1.7,
# so 3.0 is a true straggler alarm, not a noise trip.  Sub-second
# spreads are exempt (DISPERSION_ABS_SLACK): at that scale JIT/GC noise
# dominates and a ratio has no signal.
DISPERSION_RATIO_BOUND = 3.0
DISPERSION_ABS_SLACK = 1.0  # seconds of max-min below which ratios are noise


def check_scale_dispersion(scale_art: str = SCALE_ART) -> list[str]:
    """Per-query rep-spread bound on the committed sf1 sweep."""
    with open(scale_art) as f:
        scale = json.load(f)
    problems = []
    for name, disp in sorted((scale.get("dispersion") or {}).items()):
        lo, hi = disp.get("min", 0.0), disp.get("max", 0.0)
        if hi - lo <= DISPERSION_ABS_SLACK or lo <= 0:
            continue
        ratio = hi / lo
        if ratio > DISPERSION_RATIO_BOUND:
            problems.append(
                f"{name}: sf1 rep spread {lo:.2f}s → {hi:.2f}s = "
                f"{ratio:.1f}× (bound {DISPERSION_RATIO_BOUND}×) — a "
                "straggler class is hiding inside the mean"
            )
    return problems


def run_sweep(
    sf_dir: str, artifact: str, only: "list[str] | None" = None, reps: int = 0
) -> None:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    if reps:
        env["SPARK_GRAFT_BENCH_REPS"] = str(reps)
    args = (
        ["--only", ",".join(only)] if only is not None else ["--all"]
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *args],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    ).stdout
    # bench prints ONE json line (stderr carries progress); stamp the
    # registry fingerprint so stale artifacts are detectable (verdict
    # r10 item 1 — tests/test_artifact_freshness.py enforces it)
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    payload = json.loads(line)
    sys.path.insert(0, REPO)
    from pyspark_anomaly_detection_spark.registry import registry_fingerprint

    payload["registry_fingerprint"] = registry_fingerprint()
    with open(artifact, "w") as f:
        json.dump(payload, f, separators=(",", ":"))
        f.write("\n")


def check(small_art: str = SMALL_ART, big_art: str = BIG_ART) -> list[str]:
    """Return a list of violation strings (empty = pass)."""
    with open(small_art) as f:
        small = json.load(f)
    with open(big_art) as f:
        big = json.load(f)
    problems = []
    if small.get("errors"):
        problems.append(f"small-SF sweep errors: {sorted(small['errors'])}")
    if big.get("errors"):
        problems.append(f"big-SF sweep errors: {sorted(big['errors'])}")
    sq, bq = small["queries"], big["queries"]
    if set(sq) != set(bq):
        problems.append(
            f"query sets differ: only-small={sorted(set(sq) - set(bq))} "
            f"only-big={sorted(set(bq) - set(sq))}"
        )
    for name in sorted(set(sq) & set(bq)):
        ts, tb = sq[name], bq[name]
        if ts >= NOISE_FLOOR:
            ratio = tb / ts
            if ratio >= SLOPE_BOUND:
                problems.append(
                    f"{name}: {ts:.2f}s → {tb:.2f}s = {ratio:.1f}× for 10× "
                    f"data (bound {SLOPE_BOUND}×) — super-linear blow-up"
                )
        elif tb >= ABS_BOUND:
            problems.append(
                f"{name}: {tb:.2f}s at sf0.1 from {ts:.2f}s at sf0.01 — "
                f"absolute ceiling {ABS_BOUND}s exceeded"
            )
    return problems


def check_scale(
    big_art: str = BIG_ART, scale_art: str = SCALE_ART
) -> list[str]:
    """Third-point check: sf0.1 → sf1 (10×) with the same slope bound."""
    with open(big_art) as f:
        big = json.load(f)
    with open(scale_art) as f:
        scale = json.load(f)
    problems = []
    if scale.get("errors"):
        problems.append(f"scale sweep errors: {sorted(scale['errors'])}")
    bq, cq = big["queries"], scale["queries"]
    missing = sorted(set(cq) - set(bq))
    if missing:
        problems.append(f"scale queries absent from the sf0.1 sweep: {missing}")
    for name in sorted(set(cq) & set(bq)):
        tb, tc = bq[name], cq[name]
        if tb >= NOISE_FLOOR:
            ratio = tc / tb
            if ratio >= SLOPE_BOUND:
                problems.append(
                    f"{name}: {tb:.2f}s @sf0.1 → {tc:.2f}s @sf1 = "
                    f"{ratio:.1f}× for 10× data (bound {SLOPE_BOUND}×) — "
                    "super-linear blow-up"
                )
        elif tc >= SCALE_ABS_BOUND:
            problems.append(
                f"{name}: {tc:.2f}s at sf1 from {tb:.2f}s at sf0.1 — "
                f"absolute ceiling {SCALE_ABS_BOUND}s exceeded"
            )
    return problems


def _artifact_current(artifact: str, expected: "set[str]") -> bool:
    """True when ``artifact`` was generated from the LIVE registry (any
    query edit moves the stamped hash) and covers ``expected`` — in
    which case re-sweeping identical code re-measures the same plans
    and the committed timings remain valid slope evidence.  The checks
    still run on the committed artifact either way, so a skip can never
    hide a violation."""
    if not os.path.exists(artifact):
        return False
    try:
        with open(artifact) as f:
            art = json.load(f)
        sys.path.insert(0, REPO)
        from pyspark_anomaly_detection_spark.registry import (
            registry_fingerprint,
        )

        covered = set(art.get("queries", {})) | set(art.get("errors", {}))
        return (
            art.get("registry_fingerprint", {}).get("registry_hash")
            == registry_fingerprint()["registry_hash"]
            and expected <= covered
        )
    except Exception:
        return False


def main() -> None:
    if "--check" not in sys.argv:
        sys.path.insert(0, REPO)
        from pyspark_anomaly_detection_spark.registry import all_queries

        registry = set(all_queries())
        for sf_dir, artifact in ((SMALL, SMALL_ART), (BIG, BIG_ART)):
            if _artifact_current(artifact, registry):
                print(
                    f"{os.path.basename(artifact)} is fingerprint-current "
                    "and covering — skipping re-sweep",
                    file=sys.stderr,
                )
                continue
            print(f"sweep at {sf_dir} → {artifact}", file=sys.stderr)
            run_sweep(sf_dir, artifact)
        from tools.make_scale_data import ensure

        scale_queries = sorted(
            [n for n, q in all_queries().items() if q.headline]
            + SCALE_EXTRA_QUERIES
        )
        if _artifact_current(SCALE_ART, set(scale_queries)):
            print(
                f"{os.path.basename(SCALE_ART)} is fingerprint-current "
                "and covering — skipping re-sweep",
                file=sys.stderr,
            )
        else:
            scale_dir = ensure()
            print(
                f"scale sweep at {scale_dir} → {SCALE_ART}", file=sys.stderr
            )
            # reps=5 (VERDICT r13 item 4): the slope point gets the same
            # dispersion discipline as the headline suite — two samples
            # are not a spread, and the 15× bound can trip on noise
            # without it
            run_sweep(scale_dir, SCALE_ART, only=scale_queries, reps=5)
    problems = check() + check_scale() + check_scale_dispersion()
    if problems:
        print("SLOPE CHECK FAILED:")
        for p in problems:
            print(f"  {p}")
        sys.exit(1)
    with open(SMALL_ART) as f:
        n = len(json.load(f)["queries"])
    with open(SCALE_ART) as f:
        ns = len(json.load(f)["queries"])
    print(
        f"slope check OK: {n} queries sub-quadratic across sf0.01 → sf0.1; "
        f"{ns} across sf0.1 → sf1 (10× third point)"
    )


if __name__ == "__main__":
    main()
