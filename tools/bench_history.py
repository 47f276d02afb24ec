"""Cross-round bench history (round-7 verdict directive #4): extract the
per-query headline timings from every driver bench artifact
(``BENCH_r*.json``) into ONE diffable ``BENCH_HISTORY.json`` so
round-over-round regressions are mechanically checkable instead of
re-derived by each judge.

The driver captures only the TAIL of bench stdout, so older artifacts come
in two shapes:

* ``parsed`` non-null — the driver parsed the metric line itself; use it.
* ``parsed`` null with a FRONT-truncated tail (``BENCH_r06.json`` — the
  pre-round-7 bench emitted the dispersion block inline and blew the
  2000-char capture): the metric line's opening brace is gone, but the
  scalar ``"qNN_name": seconds`` pairs survive verbatim, so they are
  recovered by regex.  Dispersion entries (``"qNN": {"min": …}``) are
  object-valued and never match the scalar pattern; a pair whose query
  name itself was cut off is dropped (recorded via ``"partial": true``).

Usage:
    python tools/bench_history.py            # regenerate + regression check
    python tools/bench_history.py --check    # check committed artifact only

tests/test_bench_history.py re-derives the history from the committed
``BENCH_r*.json`` files and asserts the committed ``BENCH_HISTORY.json``
agrees on every round it lists (new rounds appended by the driver later
do not fail the test — the artifact must be a consistent prefix, not a
prophecy) and that no query regressed super-noise between the two most
recent extractable rounds.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY = os.path.join(REPO, "BENCH_HISTORY.json")

#: scalar per-query timing pair as printed by bench.py's compact line;
#: object-valued dispersion entries ("q63…": {"min": …}) cannot match.
_PAIR = re.compile(r'"(q\d+[a-z0-9_]*)":\s*(\d+(?:\.\d+)?)(?=[,}])')

NOISE_FLOOR = 0.3  # seconds — below this, constant overhead dominates
REGRESS_BOUND = 2.0  # hard cross-round ratio (same machine, 5-rep means)

#: Per-(round, query) waivers for KNOWN, justified cross-round
#: regressions in the immutable driver artifacts.  A waiver records why
#: the recorded ratio is accepted; the gate prints it instead of
#: failing.  Add entries only with a recovery or an explicit design
#: trade documented in the justification string.
WAIVERS: dict[tuple[int, str], str] = {
    (9, "q100_training_pipeline"): (
        "round-9 rebase of the packing prefix sum onto grouped_running_sum "
        "(scale-correct range-exchange shape) cost 2.9x at sf0.1; round 10 "
        "added size-adaptive dispatch (text/shards.py SMALL_PLAN_BYTES_CONF) "
        "that restores the plain window below 32 MB plan estimates — "
        "recovery visible in BENCH_r10"
    ),
}


def _extract_round(path: str) -> dict:
    """One history row from one driver artifact, tolerating truncation."""
    with open(path) as f:
        art = json.load(f)
    rnd = art.get("n")
    parsed = art.get("parsed")
    if parsed and isinstance(parsed.get("queries"), dict):
        return {
            "round": rnd,
            "sf": parsed.get("sf", art.get("sf")),
            "total": parsed.get("value"),
            "partial": False,
            "queries": dict(sorted(parsed["queries"].items())),
        }
    tail = art.get("tail", "")
    # Drop everything after the dispersion block opens — its "samples"
    # arrays contain bare floats but no quoted names, and its object
    # values can't match _PAIR anyway; this keeps intent explicit.
    head = tail.split('"dispersion"')[0]
    queries = {name: float(sec) for name, sec in _PAIR.findall(head)}
    return {
        "round": rnd,
        "sf": art.get("sf"),
        "total": None,  # "value" lived before the surviving fragment
        "partial": True,
        "queries": dict(sorted(queries.items())),
    }


def build(repo: str = REPO) -> dict:
    rounds = []
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        row = _extract_round(path)
        if row["round"] is None:
            # an artifact without a round number can't be ordered into the
            # history — flag it rather than TypeError on None-vs-int sort
            print(f"skipping {path}: no round number ('n')", file=sys.stderr)
            continue
        if row["queries"]:
            rounds.append(row)
    rounds.sort(key=lambda r: r["round"])
    return {"unit": "sec", "rounds": rounds}


def regressions(history: dict) -> list[str]:
    """Violations between the two most recent rounds (empty = pass)."""
    rounds = history["rounds"]
    if len(rounds) < 2:
        return []
    prev, last = rounds[-2], rounds[-1]
    if prev.get("sf") != last.get("sf"):
        # timings at different scale factors are not comparable: an sf
        # bump would trip the gate spuriously, an sf drop would mask a
        # real regression — warn and skip rather than judge
        print(
            f"bench history: sf changed r{prev['round']}={prev.get('sf')} → "
            f"r{last['round']}={last.get('sf')}; cross-round comparison "
            "skipped",
            file=sys.stderr,
        )
        return []
    problems = []
    for name in sorted(set(prev["queries"]) & set(last["queries"])):
        tp, tl = prev["queries"][name], last["queries"][name]
        waiver = WAIVERS.get((last.get("round"), name))
        if waiver is not None:
            print(
                f"bench history: waived r{last.get('round')} {name}: {waiver}",
                file=sys.stderr,
            )
            continue
        if tp >= NOISE_FLOOR and tl / tp >= REGRESS_BOUND:
            problems.append(
                f"{name}: {tp:.2f}s (r{prev['round']}) → {tl:.2f}s "
                f"(r{last['round']}) = {tl / tp:.1f}× — cross-round "
                f"regression (bound {REGRESS_BOUND}×)"
            )
    return problems


def main() -> None:
    if "--check" in sys.argv:
        with open(HISTORY) as f:
            history = json.load(f)
    else:
        history = build()
        with open(HISTORY, "w") as f:
            json.dump(history, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {HISTORY}: rounds "
              f"{[r['round'] for r in history['rounds']]}", file=sys.stderr)
    problems = regressions(history)
    if problems:
        print("BENCH HISTORY REGRESSION:")
        for p in problems:
            print(f"  {p}")
        sys.exit(1)
    last = history["rounds"][-1]
    print(
        f"bench history OK: {len(history['rounds'])} rounds, latest r"
        f"{last['round']} total={last['total']} "
        f"({len(last['queries'])} queries)"
    )


if __name__ == "__main__":
    main()
