"""Property-based tests (hypothesis) for the hand-built operators whose
semantics aren't pinned by a SQL oracle: as-of join, salted aggregation,
gap sessionization, distributed running sum.  Each property is checked
against a straightforward Python reference implementation on small random
inputs — the adversarial-input complement to the fixed-corpus oracle
suite (SURVEY §5.2)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.events.analytics import sessionize
from pyspark_anomaly_detection_spark.events.temporal import distributed_running_sum
from pyspark_anomaly_detection_spark.relational.advanced import salted_aggregate
from pyspark_anomaly_detection_spark.windows.features import asof_join

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EPOCH = datetime(2024, 1, 1)

ts_offsets = st.integers(min_value=0, max_value=3 * 24 * 3600)
keys = st.integers(min_value=0, max_value=3)
values = st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 100.0)


@SETTINGS
@given(
    left=st.lists(st.tuples(keys, ts_offsets), min_size=1, max_size=25),
    right=st.lists(st.tuples(keys, ts_offsets, values), min_size=0, max_size=25),
)
def test_asof_join_matches_naive(spark, left, right):
    left_rows = [
        (i, k, EPOCH + timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    right_rows = [
        (k, EPOCH + timedelta(seconds=s), v) for k, s, v in right
    ]
    ldf = spark.createDataFrame(left_rows, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(right_rows, "user_id long, ts timestamp, value double")
    got = {
        r.event_id: r.asof_ts
        for r in asof_join(
            ldf, rdf, on="user_id", right_cols=("value",)
        ).collect()
    }
    for event_id, key, lts in left_rows:
        candidates = [rts for rk, rts, _ in right_rows if rk == key and rts <= lts]
        want = max(candidates) if candidates else None
        assert got[event_id] == want, (event_id, got[event_id], want)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "hot"]), values), min_size=1, max_size=60
    )
)
def test_salted_aggregate_matches_plain(spark, rows):
    df = spark.createDataFrame(rows, "k string, value double")
    got = {
        r.k: (r.n_events, r.total_value)
        for r in salted_aggregate(df, "k", "value").collect()
    }
    want: dict[str, list] = {}
    for k, v in rows:
        agg = want.setdefault(k, [0, 0.0])
        agg[0] += 1
        # mirror the engine's DECIMAL(18,2) exact accumulation in cents
        agg[1] += round(v * 100)
    for k, (n, cents) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(cents / 100.0, abs=1e-9)


@SETTINGS
@given(
    rows=st.lists(st.tuples(keys, ts_offsets), min_size=1, max_size=40, unique=True)
)
def test_sessionize_gap_property(spark, rows):
    data = [
        (i, k, EPOCH + timedelta(seconds=s)) for i, (k, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, user_id long, ts timestamp")
    out = sessionize(df, gap_minutes=30).select(
        "user_id", "ts", "session_seq"
    ).collect()
    per_user: dict[int, list] = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append((r.ts, r.session_seq))
    for user, items in per_user.items():
        items.sort()
        for (t0, s0), (t1, s1) in zip(items, items[1:]):
            gap = (t1 - t0).total_seconds()
            if gap > 1800:
                assert s1 == s0 + 1, "gap exceeded → must open a new session"
            else:
                assert s1 == s0, "within gap → must stay in the session"


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 1000), st.sampled_from([-1, 1])),
        min_size=1,
        max_size=50,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_distributed_running_sum_matches_sequential(spark, rows):
    df = spark.createDataFrame(rows, "part int, seq int, delta int")
    got = {
        (r.part, r.seq): r.running
        for r in distributed_running_sum(
            df, "part", [F.col("seq")], "delta"
        ).collect()
    }
    acc = 0
    for part, seq, delta in sorted(rows):
        acc += delta
        assert got[(part, seq)] == acc


@given(
    x=st.integers(min_value=0, max_value=255),
    y=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
def test_zorder_key_is_bijective(spark, x, y):
    """The Morton key must round-trip: de-interleaving even/odd bits
    recovers both coordinates exactly (no collisions across the domain)."""
    from pyspark_anomaly_detection_spark.relational.analytics_extra import (
        _zorder_spark,
    )

    row = (
        spark.range(1)
        .select(_zorder_spark(F.lit(x), F.lit(y)).alias("z"))
        .first()
    )
    z = row.z
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (rx, ry) == (x, y)


@given(
    total=st.integers(min_value=0, max_value=10**13),
    target=st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=50, deadline=None)
def test_plan_file_count_covers_bytes(total, target):
    """Compaction sizing: enough files to hold every byte at ≤ target
    each (except the unavoidable ≥1 floor), never more than one extra."""
    from pyspark_anomaly_detection_spark.io.maintenance import plan_file_count

    n = plan_file_count(total, target)
    assert n >= 1
    assert n * target >= total
    if total > target:
        assert (n - 1) * target < total


@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=1000, allow_nan=False).map(
            lambda v: round(v, 2)
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_decay_smoother_bounded_by_window(spark, vals):
    """The dyadic smoother is a convex combination of the last ≤8 values:
    every smoothed point must lie within [min, max] of its own window."""
    from pyspark_anomaly_detection_spark.events.anomaly import SMOOTHER_TAPS

    from pyspark_anomaly_detection_spark.registry import all_queries  # noqa: F401
    from pyspark.sql import Row
    from pyspark.sql.window import Window as W

    df = spark.createDataFrame(
        [Row(event_type="t", event_id=i, value=v) for i, v in enumerate(vals)]
    )
    w = W.partitionBy("event_type").orderBy("event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    base = df.withColumn("cents", cents)
    lag_cols = [
        (F.lag("cents", k).over(w) if k else F.col("cents")).alias(f"lag_{k}")
        for k in range(SMOOTHER_TAPS)
    ]
    lagged = base.select("event_id", "value", *lag_cols)
    num = sum(
        (
            F.coalesce(F.col(f"lag_{k}"), F.lit(0)) * F.lit(1 << (SMOOTHER_TAPS - 1 - k))
            for k in range(SMOOTHER_TAPS)
        ),
        start=F.lit(0),
    )
    den = sum(
        (
            F.when(F.col(f"lag_{k}").isNotNull(), F.lit(1 << (SMOOTHER_TAPS - 1 - k)))
            .otherwise(F.lit(0))
            for k in range(SMOOTHER_TAPS)
        ),
        start=F.lit(0),
    )
    out = lagged.withColumn(
        "smoothed", (num.cast("double") / den.cast("double")) / 100.0
    ).collect()
    for r in sorted(out, key=lambda r: r.event_id):
        window_vals = vals[max(0, r.event_id - SMOOTHER_TAPS + 1) : r.event_id + 1]
        assert min(window_vals) - 0.011 <= r.smoothed <= max(window_vals) + 0.011


def test_bpe_merges_match_hand_computed(spark):
    """The classic BPE walkthrough (low/lower/newest/widest with freqs
    5/2/6/3): merge sequence is hand-computable — es, est, est</w>, lo,
    low — with exact weighted pair frequencies and lexicographic
    tie-breaks."""
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.text.stats import bpe_train

    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(" ".join(corpus),)], "text string")
    got = [
        (r.rank, r.left, r.right, r.pair_freq)
        for r in bpe_train(docs, n_merges=5).orderBy("rank").collect()
    ]
    assert got == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "est", "</w>", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_bpe_deterministic_across_partitionings(spark, sf_dir):
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.text.stats import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    a = bpe_train(docs, n_merges=4).orderBy("rank").collect()
    b = bpe_train(docs.repartition(13), n_merges=4).orderBy("rank").collect()
    assert a == b and len(a) == 4


def test_bpe_local_and_distributed_paths_agree(spark, sf_dir):
    """The in-memory merge rounds and the distributed per-round path are
    the same algorithm: forcing the distributed path (driver_vocab_limit=0)
    must reproduce the dispatch default exactly."""
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.text.stats import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    local = bpe_train(docs, n_merges=4).orderBy("rank").collect()
    dist = bpe_train(docs, n_merges=4, driver_vocab_limit=0).orderBy("rank").collect()
    assert local == dist and len(local) == 4


def test_psi_scalar_matches_duckdb_ln_sum(spark, duck, sf_dir):
    """psi_from_components (glibc math.log over q151's exact per-bin
    components) must equal DuckDB's own LN-based PSI bitwise — both call
    the same libm.  (The JVM can't be in this loop: Math.log differs by
    one ulp on some inputs, which is why the hashed query is log-free.)"""
    from pyspark_anomaly_detection_spark.quality.drift import (
        psi_from_components,
        q163_psi_value_drift,
    )

    rows = q163_psi_value_drift(spark, sf_dir).collect()
    got = psi_from_components(rows)
    oracle = duck.execute(
        """
        WITH binned AS (
          SELECT
            CASE WHEN value < 5.0 THEN 0 WHEN value < 15.0 THEN 1
                 WHEN value < 30.0 THEN 2 WHEN value < 50.0 THEN 3
                 WHEN value < 75.0 THEN 4 WHEN value < 110.0 THEN 5
                 WHEN value < 160.0 THEN 6 WHEN value < 230.0 THEN 7
                 WHEN value < 330.0 THEN 8 ELSE 9 END AS bin_id,
            CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                 THEN 1 ELSE 0 END AS is_base
          FROM events
        ),
        counts AS (
          SELECT bin_id, CAST(SUM(is_base) AS BIGINT) AS base_n,
                 CAST(SUM(1 - is_base) AS BIGINT) AS new_n
          FROM binned GROUP BY bin_id
        ),
        totals AS (
          SELECT CAST(SUM(base_n) AS DOUBLE) AS base_t,
                 CAST(SUM(new_n) AS DOUBLE) AS new_t FROM counts
        )
        SELECT SUM(
          (CAST(base_n AS DOUBLE)/base_t - CAST(new_n AS DOUBLE)/new_t)
          * LN((CAST(base_n AS DOUBLE)/base_t)
               / (CAST(new_n AS DOUBLE)/new_t))) AS psi
        FROM counts, totals
        WHERE base_n > 0 AND new_n > 0
        """
    ).fetchone()[0]
    assert got == oracle
    assert got >= 0.0  # PSI is a nonnegative divergence


# --- prefix-filtered set-similarity join: completeness + exactness -------

_psj_words = st.sampled_from(
    ["red", "blue", "gear", "bolt", "widget", "spark", "fast", "slow"]
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(_psj_words, min_size=3, max_size=12), min_size=2, max_size=18
    ),
    dup_of=st.lists(st.integers(min_value=0, max_value=17), max_size=6),
)
def test_prefix_jaccard_matches_bruteforce(spark, docs, dup_of):
    """Completeness property: the prefix-filtered join must return
    EXACTLY the brute-force all-pairs shingle-Jaccard ≥ θ set on random
    corpora (near-dups injected by appending mutated copies)."""
    from pyspark_anomaly_detection_spark.text.setjoin import (
        JACCARD_THRESHOLD,
        SHINGLE_N,
        prefix_jaccard_pairs,
    )

    texts = [" ".join(ws) for ws in docs]
    # inject near-duplicates: copy an existing doc, tweak the tail word
    for j, src in enumerate(dup_of):
        if src < len(docs):
            texts.append(" ".join(docs[src][:-1] + ["tail%d" % j]))
    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_jaccard_pairs(sdf).collect()
    }

    def shingle_set(text: str) -> set:
        ws = text.split(" ")
        return {
            " ".join(ws[i : i + SHINGLE_N])
            for i in range(len(ws) - SHINGLE_N + 1)
        }

    want = {}
    sets = {i: shingle_set(t) for i, t in rows}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                j = inter / (len(sets[a]) + len(sets[b]) - inter)
                if j >= JACCARD_THRESHOLD:
                    want[(a, b)] = j
    assert set(got) == set(want), (sorted(got), sorted(want))
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-12


def test_bpe_encode_matches_trainer_final_state(spark):
    """Encoding the training corpus with the learned merge table must
    reproduce the trainer's final symbol counts exactly (the encode fold
    mirrors the trainer's left-to-right non-overlapping merge), and the
    hand-computable example pins absolute token counts."""
    from pyspark_anomaly_detection_spark.text.stats import (
        BPE_EOW,
        _bpe_merge_rounds_local,
        bpe_encode,
        bpe_train,
    )

    rows = [(0, "lowest lowest low"), (1, "newest newest newest lowest")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_train(docs, n_merges=5)

    got = {r.doc_id: r.n_bpe_tokens for r in bpe_encode(docs, merges).collect()}

    # independent reference: run the trainer's own fold over each doc
    merge_list = [(r.left, r.right) for r in merges.orderBy("rank").collect()]

    def encode(word):
        syms = list(word) + [BPE_EOW]
        for left, right in merge_list:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want = {
        doc_id: sum(encode(w) for w in text.split(" "))
        for doc_id, text in rows
    }
    assert got == want

    # merges only ever combine: encoded length ≤ raw symbol length,
    # and 5 merges on this corpus strictly compress
    raw = {doc_id: sum(len(w) + 1 for w in text.split(" ")) for doc_id, text in rows}
    for doc_id in got:
        assert got[doc_id] < raw[doc_id]


def test_bpe_encode_consistent_on_irregular_whitespace(spark):
    """Doubled/leading/trailing spaces: F.split leaves "" tokens which
    bpe_train must drop exactly like bpe_encode's `if w` filter — on such
    corpora encode must still reproduce the trainer's final symbol state,
    and the local and distributed trainer paths must agree."""
    from pyspark_anomaly_detection_spark.text.stats import bpe_encode, bpe_train

    rows = [(0, "  lowest  lowest low "), (1, "newest  newest newest  lowest  ")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    local = bpe_train(docs, n_merges=5).orderBy("rank").collect()
    dist = (
        bpe_train(docs, n_merges=5, driver_vocab_limit=0).orderBy("rank").collect()
    )
    assert [tuple(r) for r in local] == [tuple(r) for r in dist]
    # no merge may involve an empty symbol
    assert all(r.left != "" and r.right != "" for r in local)

    merges = bpe_train(docs, n_merges=5)
    got = {r.doc_id: r.n_bpe_tokens for r in bpe_encode(docs, merges).collect()}
    # same corpus with normalized single spaces must encode identically
    norm = spark.createDataFrame(
        [(i, " ".join(t.split())) for i, t in rows], ["doc_id", "text"]
    )
    want = {r.doc_id: r.n_bpe_tokens for r in bpe_encode(norm, merges).collect()}
    assert got == want


def test_q163_odds_ratio_null_on_empty_bin(spark, tmp_path):
    """A value bin empty in the post-split half must yield odds_ratio NULL
    (try_divide), not an ANSI DIVIDE_BY_ZERO error — and the oracle's
    NULLIF guard agrees.  Testdata is regenerated per round, so this is a
    plausible future input even when the current run has no empty bins."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_anomaly_detection_spark.quality.drift import q163_psi_value_drift
    from pyspark_anomaly_detection_spark.registry import all_queries

    base_day = datetime.datetime(2024, 1, 2)
    new_day = datetime.datetime(2024, 1, 20)
    rows = []
    # base half covers every bin; new half deliberately skips bin 0 (<5.0)
    for i, v in enumerate([1.0, 10.0, 20.0, 40.0, 60.0, 90.0, 120.0, 200.0, 300.0, 400.0]):
        rows.append((i, base_day, i, "view", v, "{}"))
    for i, v in enumerate([10.0, 20.0, 40.0, 60.0, 90.0, 120.0, 200.0, 300.0, 400.0]):
        rows.append((100 + i, new_day, i, "view", v, "{}"))
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = {
        r.bin_id: r.odds_ratio
        for r in q163_psi_value_drift(spark, str(tmp_path)).collect()
    }
    assert got[0] is None  # empty new half → NULL, not an error
    assert all(v is not None for b, v in got.items() if b != 0)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = {
        r[0]: r[5]
        for r in con.execute(all_queries()["q163_psi_value_drift"].oracle).fetchall()
    }
    con.close()
    assert got == oracle


def test_drift_queries_survive_empty_half(spark, tmp_path):
    """If EVERY event lands before the split (a plausible regenerated-
    testdata shape), new_t is 0 — both drift queries must yield NULL
    shares, not an ANSI DIVIDE_BY_ZERO, and agree with the NULLIF-guarded
    oracle."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_anomaly_detection_spark.quality.drift import (
        q163_psi_value_drift,
        q164_categorical_drift,
    )
    from pyspark_anomaly_detection_spark.registry import all_queries

    day = datetime.datetime(2024, 1, 2)  # everything in the base half
    n = 6
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([day] * n, pa.timestamp("us")),
            "user_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array(["view", "click"] * 3, pa.string()),
            "value": pa.array([1.0, 10.0, 40.0, 90.0, 200.0, 400.0], pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    for fn, name in (
        (q163_psi_value_drift, "q163_psi_value_drift"),
        (q164_categorical_drift, "q164_categorical_drift"),
    ):
        got = [tuple(r) for r in fn(spark, str(tmp_path)).collect()]
        want = [tuple(r) for r in con.execute(all_queries()[name].oracle).fetchall()]
        assert got == want, name
        # every share over the empty half is NULL, never an error
        assert all(r[4] is None for r in got), name
    con.close()


def test_bm25_empty_corpus_hit_returns_empty(spark):
    """If no query term occurs in the corpus the ranking must be an empty
    DataFrame with the output schema, not an .isin() arity error."""
    from pyspark_anomaly_detection_spark.text.search import q167_bm25_ranking

    docs = spark.createDataFrame(
        [(0, "nothing relevant here"), (1, "entirely unrelated words")],
        ["doc_id", "text"],
    )

    import pyspark_anomaly_detection_spark.text.search as search_mod
    from pyspark_anomaly_detection_spark.io import readers

    orig = readers.load_table
    try:
        readers.load_table = lambda spark, sf_dir, name: docs
        search_mod.load_table = readers.load_table
        out = q167_bm25_ranking(spark, "unused")
        assert out.columns == ["doc_id", "bm25", "n_terms_hit"]
        assert out.count() == 0
    finally:
        readers.load_table = orig
        search_mod.load_table = orig


def test_bpe_encode_deterministic_across_partitionings(spark, sf_dir):
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.text.stats import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=4)
    a = sorted(
        (r.doc_id, r.n_bpe_tokens) for r in bpe_encode(docs, merges).collect()
    )
    b = sorted(
        (r.doc_id, r.n_bpe_tokens)
        for r in bpe_encode(docs.repartition(13), merges).collect()
    )
    assert a == b and len(a) > 0


def test_weighted_sample_overrepresents_heavy_docs(spark, sf_dir):
    """Efraimidis-Spirakis invariant (q180): inclusion probability rises
    with weight, so the selected set's mean weight must exceed the
    corpus mean; determinism across partitionings pins the hash-based
    draw."""
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.registry import all_queries

    fn = all_queries()["q180_weighted_sample"].fn
    rows = fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sel_mean = sum(r.weight for r in rows) / len(rows)
    assert sel_mean > corpus_mean, (sel_mean, corpus_mean)
    # deterministic under arbitrary repartitioning of the input path:
    # second run must select the identical ranked list
    again = fn(spark, sf_dir).collect()
    assert [(r.rank, r.doc_id) for r in rows] == [
        (r.rank, r.doc_id) for r in again
    ]


def test_quality_budget_selection_within_budget_and_greedy(spark, sf_dir):
    """q181: every source stays within its char budget, and the selected
    docs are each source's TOP-quality prefix — no skipped better doc."""
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.registry import all_queries
    from pyspark_anomaly_detection_spark.text.splits import QBUDGET_CHARS

    rows = all_queries()["q181_quality_budget_selection"].fn(
        spark, sf_dir
    ).collect()
    assert rows, "selection must be non-empty"
    for r in rows:
        assert 0 < r.chars_used <= QBUDGET_CHARS
        assert r.n_selected > 0
