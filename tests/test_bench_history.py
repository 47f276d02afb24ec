"""Cross-round bench history consistency + regression guard (round-7
verdict directive #4).  Re-derives the history from the committed
``BENCH_r*.json`` driver artifacts and checks the committed
``BENCH_HISTORY.json`` against it.

The committed artifact must agree with the re-derivation on every round
it LISTS — but the driver appends a new ``BENCH_r{N}.json`` after each
round, so newly-appeared rounds absent from the committed history are
fine (the artifact is regenerated next round per the round workflow).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench_history():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import bench_history

    if not os.path.exists(bench_history.HISTORY):
        pytest.skip(
            "BENCH_HISTORY.json not committed — regenerate with "
            "`python tools/bench_history.py`"
        )
    return bench_history


def test_committed_history_matches_rederivation(bench_history):
    rederived = {r["round"]: r for r in bench_history.build()["rounds"]}
    with open(bench_history.HISTORY) as f:
        committed = json.load(f)["rounds"]
    assert committed, "empty committed history"
    for row in committed:
        fresh = rederived.get(row["round"])
        assert fresh is not None, (
            f"committed history lists round {row['round']} but "
            f"BENCH_r*.json for it is gone"
        )
        assert row == fresh, (
            f"round {row['round']} drifted from its BENCH_r artifact — "
            "regenerate with `python tools/bench_history.py`"
        )


def test_truncated_r06_tail_recovered(bench_history):
    """The r06 artifact's metric line is front-truncated (pre-round-7
    bench output); the regex path must still recover its surviving
    scalar pairs — this pins the tolerance the verdict asked for."""
    r06_path = os.path.join(REPO, "BENCH_r06.json")
    if not os.path.exists(r06_path):
        pytest.skip("BENCH_r06.json absent")
    rows = {r["round"]: r for r in bench_history.build()["rounds"]}
    r06 = rows[6]
    assert r06["partial"] is True and r06["total"] is None
    assert r06["queries"]["q24_tumbling_hourly"] == pytest.approx(0.396)
    # dispersion objects must NOT leak in as zero/garbage scalars
    assert all(v > 0 for v in r06["queries"].values())
    assert len(r06["queries"]) >= 5


def test_no_cross_round_regression(bench_history):
    history = bench_history.build()
    problems = bench_history.regressions(history)
    assert not problems, "\n".join(problems)


def test_regressions_skipped_across_sf_change():
    """Timings at different scale factors are not comparable: an sf bump
    must not trip the 2x gate, and an sf drop must not mask a real
    regression — the checker skips (with a warning) instead of judging."""
    from tools.bench_history import regressions

    history = {
        "rounds": [
            {"round": 1, "sf": 0.1, "queries": {"q01_x": 1.0}},
            {"round": 2, "sf": 1.0, "queries": {"q01_x": 9.0}},
        ]
    }
    assert regressions(history) == []
    same_sf = {
        "rounds": [
            {"round": 1, "sf": 0.1, "queries": {"q01_x": 1.0}},
            {"round": 2, "sf": 0.1, "queries": {"q01_x": 9.0}},
        ]
    }
    assert regressions(same_sf), "same-sf regression must still trip"


# ------------- round 11: automated bench-drift A/B (verdict r10 item 6)


def test_classify_ab_distinguishes_drift_from_regression():
    """Fresh prior-code ≈ fresh HEAD → the historical number was machine
    state (drift); fresh HEAD ≫ fresh prior-code → the code regressed."""
    from tools.bench_history import AB_DRIFT_BOUND, classify_ab

    prior = {"q1": 1.0, "q2": 1.0, "q3": 0.5}
    head = {"q1": 1.2, "q2": 1.0 * AB_DRIFT_BOUND + 0.1, "q3": 0.5}
    got = classify_ab(prior, head)
    assert got == {
        "q1": "machine_drift",
        "q2": "code_regression",
        "q3": "machine_drift",
    }


def test_artifact_commit_resolves_prior_round():
    """The A/B anchors the prior round at the commit that ADDED its
    bench artifact — resolvable for every committed round."""
    import subprocess

    from tools.bench_history import REPO, _artifact_commit

    commit = _artifact_commit(10)
    assert commit and len(commit) == 40
    # that commit must actually contain the artifact
    shown = subprocess.run(
        ["git", "show", f"{commit}:BENCH_r10.json"],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert shown.returncode == 0 and '"n": 10' in shown.stdout


def test_ab_bisect_reports_unbisectable_rounds():
    """No artifact commit (unknown round) → raw problems pass through
    unchanged rather than being silently waived."""
    from tools.bench_history import ab_bisect

    history = {"rounds": [{"round": 98}, {"round": 99}]}
    problems = ["q01_pricing_summary: 1.00s (r98) → 3.00s (r99) = 3.0×"]
    verdicts, remaining = ab_bisect(problems, history)
    assert verdicts == {} and remaining == problems
