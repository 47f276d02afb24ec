"""Slope-guard freshness: the committed two-SF sweep artifacts must pass
the sub-quadratic check AND cover exactly the current registry — so a
newly-registered degenerate query cannot hide behind stale artifacts.

Regenerate with ``python tools/bench_slope.py`` after plan changes."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def artifacts():
    import bench_slope

    if not (
        os.path.exists(bench_slope.SMALL_ART) and os.path.exists(bench_slope.BIG_ART)
    ):
        pytest.fail(
            "BENCH_ALL_sf0.01.json / BENCH_ALL_sf0.1.json missing — run "
            "`python tools/bench_slope.py`"
        )
    return bench_slope


def test_slope_check_passes(artifacts):
    problems = artifacts.check()
    assert not problems, "\n".join(problems)


def test_artifacts_cover_current_registry(artifacts):
    from pyspark_anomaly_detection_spark.registry import all_queries

    registry = set(all_queries())
    for art in (artifacts.SMALL_ART, artifacts.BIG_ART):
        with open(art) as f:
            data = json.load(f)
        covered = set(data["queries"]) | set(data.get("errors", {}))
        missing = registry - covered
        assert not missing, (
            f"{os.path.basename(art)} is stale — registry queries not in the "
            f"sweep: {sorted(missing)}; regenerate with tools/bench_slope.py"
        )


def test_parity_artifacts_cover_current_registry():
    """Mirror of the bench-artifact guard for the 3-SF parity matrix
    (VERDICT r8 item 2): two consecutive rounds shipped PARITY_*.json
    that trailed the registry — parity staleness now fails as loudly as
    bench staleness."""
    from pyspark_anomaly_detection_spark.registry import all_queries

    oracles = {n for n, q in all_queries().items() if q.oracle}
    for tag in ("sf0.001", "sf0.01", "sf0.1"):
        path = os.path.join(REPO, f"PARITY_{tag}.json")
        assert os.path.exists(path), (
            f"PARITY_{tag}.json missing — run tools/parity_check.py"
        )
        with open(path) as f:
            data = json.load(f)
        covered = set(data["queries"])
        missing = oracles - covered
        assert not missing, (
            f"PARITY_{tag}.json is stale — oracle queries not in the "
            f"matrix: {sorted(missing)}; regenerate with tools/parity_check.py"
        )
        assert data["n_fail"] == 0, data["failures"]


def test_scale_point_slope_passes():
    """Third slope point (VERDICT r11 item 6): the committed sf1 sweep
    (headline + driver-state-sensitive queries over the deterministic
    10× explode of sf0.1) must exist, cover the expected query set, and
    pass the sf0.1 → sf1 sub-quadratic check.  This lane caught a real
    cliff on arrival: q37's interpreted pair fold at 78× for 10× data,
    fixed by size-adaptive dispatch to the BLAS lane."""
    import bench_slope

    from pyspark_anomaly_detection_spark.registry import all_queries

    assert os.path.exists(bench_slope.SCALE_ART), (
        "BENCH_SCALE_sf1.json missing — run `python tools/bench_slope.py`"
    )
    expected = {
        n for n, q in all_queries().items() if q.headline
    } | set(bench_slope.SCALE_EXTRA_QUERIES)
    with open(bench_slope.SCALE_ART) as f:
        data = json.load(f)
    covered = set(data["queries"]) | set(data.get("errors", {}))
    missing = expected - covered
    assert not missing, (
        f"BENCH_SCALE_sf1.json is stale — expected queries not swept: "
        f"{sorted(missing)}; regenerate with tools/bench_slope.py"
    )
    # dispersion discipline (VERDICT r13 item 4): the slope point runs
    # the same ≥5-rep rule as the headline suite — stdev from two
    # samples is not a spread
    assert int(data.get("reps", 0)) >= 5, (
        f"BENCH_SCALE_sf1.json has reps={data.get('reps')} — the slope "
        "point needs >= 5 reps; regenerate with tools/bench_slope.py"
    )
    problems = bench_slope.check_scale()
    assert not problems, "\n".join(problems)
    # per-query variance bound (VERDICT r15 item 7): the slope bound
    # constrains the mean; this constrains the SPREAD, so one 6×-slow
    # rep (the r14 q116 spike class) fails loudly instead of hiding
    # inside a passing trimmed mean
    problems = bench_slope.check_scale_dispersion()
    assert not problems, "\n".join(problems)
