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
        # canonical per-round artifacts ONLY: the driver also drops
        # variant probes next to them (``BENCH_r16_c8.json`` — the
        # 8-core scaling probe, r17), which the bare glob matched and
        # which then OVERWROTE round 16's history row with the low-core
        # numbers (two round-16 entries, committed-vs-rederived drift).
        if not re.fullmatch(r"BENCH_r\d+\.json", os.path.basename(path)):
            print(f"skipping {path}: variant probe, not a round artifact",
                  file=sys.stderr)
            continue
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


#: A fresh same-machine rerun of the PRIOR round's code that is at most
#: this much faster than fresh HEAD counts as "the old code is slow
#: today too" → machine drift, not a code regression.  1.5 sits between
#: bench noise (5-rep trimmed-mean dispersion ≲ 15 %) and any real
#: regression the 2.0× cross-round bound would care about.
AB_DRIFT_BOUND = 1.5


def classify_ab(
    prior_fresh: dict[str, float], head_fresh: dict[str, float]
) -> dict[str, str]:
    """Per-query verdicts from a same-machine A/B: 'machine_drift' when
    fresh HEAD is within AB_DRIFT_BOUND of the fresh prior-code rerun
    (the recorded historical number was taken on a faster machine
    state), 'code_regression' when HEAD is genuinely slower than the
    prior code measured NOW."""
    out = {}
    for name in sorted(set(prior_fresh) & set(head_fresh)):
        tp, th = prior_fresh[name], head_fresh[name]
        ratio = th / tp if tp > 0 else float("inf")
        out[name] = (
            "machine_drift" if ratio <= AB_DRIFT_BOUND else "code_regression"
        )
    return out


def _artifact_commit(rnd: int) -> str | None:
    """The commit that ADDED ``BENCH_r{rnd}.json`` — the repository state
    the driver benched for that round (the artifact-landing commit
    contains the round's final code; it only appends evidence files)."""
    import subprocess

    name = f"BENCH_r{rnd:02d}.json"
    out = subprocess.run(
        ["git", "log", "--diff-filter=A", "--format=%H", "--", name],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.split()
    return out[0] if out else None


def _bench_subset(repo_dir: str, queries: list[str], reps: int = 3) -> dict:
    """Run ``bench.py --only`` in ``repo_dir``; returns per-query trimmed
    means.  One Spark boot per invocation — bounded by the tripped-query
    count, not the suite."""
    import subprocess

    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_REPS=str(reps),
    )
    out = subprocess.run(
        [sys.executable, "bench.py", "--only", ",".join(queries)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=repo_dir,
    ).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["queries"]


def ab_bisect(problems: list[str], history: dict) -> tuple[dict, list[str]]:
    """Automated same-machine A/B for tripped cross-round bounds
    (verdict r10 item 6 — the manual BENCH_NOTES runbook, wired in):
    check out the PRIOR round's artifact commit in a throwaway worktree,
    rerun ONLY the tripped queries there and at HEAD, and classify each
    as machine drift vs code regression.  Returns (per-query verdicts,
    remaining code-regression problem strings)."""
    import re as _re
    import subprocess
    import tempfile

    prior_round = history["rounds"][-2]["round"]
    names = sorted(
        {_re.match(r"(q\d+[a-z0-9_]*):", p).group(1) for p in problems}
    )
    commit = _artifact_commit(prior_round)
    if commit is None:
        print(
            f"bench A/B: no commit found for BENCH_r{prior_round:02d}.json "
            "— cannot bisect, reporting raw regressions",
            file=sys.stderr,
        )
        return {}, problems
    wt = tempfile.mkdtemp(prefix="bench_ab_")
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, commit],
            check=True,
            cwd=REPO,
            capture_output=True,
        )
        print(
            f"bench A/B: reran {names} at r{prior_round} commit "
            f"{commit[:12]} (worktree) and HEAD, same machine",
            file=sys.stderr,
        )
        prior_fresh = _bench_subset(wt, names)
        head_fresh = _bench_subset(REPO, names)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            capture_output=True,
        )
    verdicts = classify_ab(prior_fresh, head_fresh)
    remaining = []
    for p in problems:
        name = _re.match(r"(q\d+[a-z0-9_]*):", p).group(1)
        v = verdicts.get(name, "code_regression")
        detail = (
            f"prior-code-fresh {prior_fresh.get(name)}s vs HEAD-fresh "
            f"{head_fresh.get(name)}s"
        )
        if v == "machine_drift":
            print(
                f"bench A/B: {name}: MACHINE DRIFT ({detail}) — recorded "
                "historical number reflects a faster machine state, not "
                "better code; waiving",
                file=sys.stderr,
            )
        else:
            remaining.append(f"{p} [A/B CONFIRMED code regression: {detail}]")
    return verdicts, remaining


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
    if problems and "--no-ab" not in sys.argv and "--check" not in sys.argv:
        # tripped bound → automated same-machine A/B distinguishes code
        # regressions from machine drift without hand intervention
        _, problems = ab_bisect(problems, history)
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
