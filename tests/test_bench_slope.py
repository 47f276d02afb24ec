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
