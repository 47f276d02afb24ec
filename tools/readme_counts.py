"""Derive README.md's counts from the registry and the pytest
collection (VERDICT r13 item 5): the README was the one stale-able
artifact left — its test/query counts were hand-maintained and lagged
the suite by two rounds.  This tool rewrites the numbers between
explicit ``<!--COUNT:*-->`` markers; ``--check`` verifies without
writing (the mode ``tests/test_artifact_freshness.py`` runs, so a
stale README fails the suite like every other artifact).

Usage:
    python tools/readme_counts.py            # rewrite README.md
    python tools/readme_counts.py --check    # exit 1 when stale
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, "README.md")

_MARK = r"<!--COUNT:{key}-->([^<]*)<!--/COUNT-->"


def live_counts(with_tests: bool = True) -> dict[str, str]:
    sys.path.insert(0, REPO)
    from pyspark_anomaly_detection_spark.registry import all_queries

    qs = all_queries()
    out = {
        "QUERIES": str(len(qs)),
        "ORACLE": str(sum(1 for q in qs.values() if q.oracle)),
    }
    if with_tests:
        collected = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout
        m = re.search(r"(\d+) tests collected", collected)
        if not m:
            raise RuntimeError(
                f"pytest collection did not report a count:\n{collected[-500:]}"
            )
        out["TESTS"] = m.group(1)
    return out


def embedded_counts(text: str) -> dict[str, str]:
    out = {}
    for key in ("QUERIES", "ORACLE", "TESTS"):
        m = re.search(_MARK.format(key=key), text)
        if m:
            out[key] = m.group(1)
    return out


def main() -> None:
    check = "--check" in sys.argv
    with open(README) as f:
        text = f.read()
    live = live_counts()
    have = embedded_counts(text)
    missing = set(live) - set(have)
    if missing:
        print(f"README.md lacks COUNT markers for {sorted(missing)}")
        sys.exit(1)
    stale = {k: (have[k], live[k]) for k in live if have[k] != live[k]}
    if check:
        if stale:
            print(
                "README.md counts stale: "
                + ", ".join(
                    f"{k} says {a}, live {b}" for k, (a, b) in stale.items()
                )
                + " — run `python tools/readme_counts.py`"
            )
            sys.exit(1)
        print("README counts fresh: " + ", ".join(
            f"{k}={v}" for k, v in sorted(live.items())
        ))
        return
    for key, val in live.items():
        text = re.sub(
            _MARK.format(key=key),
            f"<!--COUNT:{key}-->{val}<!--/COUNT-->",
            text,
        )
    with open(README, "w") as f:
        f.write(text)
    print("README counts updated: " + ", ".join(
        f"{k}={v}" for k, v in sorted(live.items())
    ))


if __name__ == "__main__":
    main()
