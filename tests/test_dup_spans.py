"""Unit tests for the round-6 additions: q182 rolling-window dup spans
(Lee-et-al-shape substring dedup) and q183 semantic-dedup keep-set.

The oracle parity harness proves engine equality; these tests pin the
SEMANTICS against hand-constructed corpora where the right answer is
knowable by inspection — planted boilerplate with exact span boundaries,
and a vector corpus with a known component structure.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.similarity.neardup import (
    semantic_dedup_keep,
)
from pyspark_anomaly_detection_spark.text.dedup import (
    DUP_WINDOW_TOKENS,
    rolling_dup_spans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_boilerplate_span_boundaries(spark):
    """A shared 12-token passage inside otherwise-unique 30-token docs:
    with window K, the passage is covered by 12-K+1 rolling windows that
    merge into EXACTLY one span of 12 tokens per doc — boundary-exact,
    which chunk-level q138 cannot deliver."""
    boiler = _words("shared", 12)
    texts = [
        f"{_words('a', 9)} {boiler} {_words('b', 9)}",
        f"{_words('c', 9)} {boiler} {_words('d', 9)}",
        _words("unique", 30),
    ]
    out = rolling_dup_spans(_docs(spark, texts)).collect()
    by_id = {r.doc_id: r for r in out}
    for doc in (0, 1):
        r = by_id[doc]
        assert r.n_tokens == 30
        assert r.n_spans == 1
        assert r.dup_tokens == 12, f"span not boundary-exact: {r.dup_tokens}"
        assert abs(r.dup_fraction - 12 / 30) < 1e-15
    assert by_id[2].n_spans == 0 and by_id[2].dup_tokens == 0
    assert by_id[2].dup_fraction == 0.0


def test_two_disjoint_passages_stay_two_spans(spark):
    """Two shared passages separated by a unique gap > window width must
    NOT merge into one span."""
    p1, p2 = _words("x", 10), _words("y", 10)
    texts = [
        f"{p1} {_words('gapa', 15)} {p2}",
        f"{p1} {_words('gapb', 15)} {p2}",
    ]
    out = {r.doc_id: r for r in rolling_dup_spans(_docs(spark, texts)).collect()}
    for doc in (0, 1):
        assert out[doc].n_spans == 2
        assert out[doc].dup_tokens == 20


def test_within_doc_repetition_counts(spark):
    """A window repeated INSIDE one document is duplication too (count
    ≥2 corpus-wide, not distinct-doc ≥2) — degenerate looping text must
    not score clean just because it is unique to its document."""
    k = DUP_WINDOW_TOKENS
    loop = _words("loop", k)
    texts = [f"{loop} {loop} {loop}", _words("clean", 3 * k)]
    out = {r.doc_id: r for r in rolling_dup_spans(_docs(spark, texts)).collect()}
    assert out[0].dup_fraction == 1.0  # every window recurs
    assert out[1].dup_tokens == 0


def test_doc_shorter_than_window_scores_zero(spark):
    texts = ["only three tokens", _words("z", 40), _words("z", 40)]
    out = {r.doc_id: r for r in rolling_dup_spans(_docs(spark, texts)).collect()}
    assert out[0].n_tokens == 3
    assert out[0].n_spans == 0 and out[0].dup_tokens == 0
    assert out[1].dup_fraction == 1.0 and out[2].dup_fraction == 1.0


def _emb(spark, vectors):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        ["vec_id", "embedding"],
    )


def test_semantic_keep_known_components(spark):
    """4 vectors: {0,1} identical direction, {2} nearly opposite, {3}
    orthogonal ⇒ components {0,1}, {2}, {3}; keep = {0, 2, 3}."""
    vecs = [
        [1.0, 0.0, 0.0],
        [2.0, 0.0, 0.0],   # same direction as 0 → cos 1.0
        [-1.0, 0.1, 0.0],  # cos ≈ -1 vs 0/1
        [0.0, 0.0, 5.0],   # orthogonal to all
    ]
    out = {r.vec_id: r for r in semantic_dedup_keep(_emb(spark, vecs)).collect()}
    assert out[0].component == 0 and out[0].keep and out[0].cluster_size == 2
    assert out[1].component == 0 and not out[1].keep
    assert out[2].component == 2 and out[2].keep and out[2].cluster_size == 1
    assert out[3].component == 3 and out[3].keep


def test_semantic_keep_transitive_chain(spark):
    """A near-dup CHAIN a~b~c where a and c are NOT direct near-dups
    must still collapse to one component (the SemDeDup cluster
    semantic, not pairwise-only)."""
    a = np.array([1.0, 0.0])
    b = np.array([np.cos(0.6), np.sin(0.6)])   # cos(a,b) ≈ 0.83
    c = np.array([np.cos(1.2), np.sin(1.2)])   # cos(b,c) ≈ 0.83, cos(a,c) ≈ 0.36
    out = {
        r.vec_id: r
        for r in semantic_dedup_keep(_emb(spark, [a, b, c]), threshold=0.8).collect()
    }
    assert [out[i].component for i in range(3)] == [0, 0, 0]
    assert [out[i].keep for i in range(3)] == [True, False, False]
    assert out[0].cluster_size == 3


def test_keep_set_respects_containment_under_lsh(spark):
    """Above the exact cap the LSH path may split components but must
    never drop an exact-kept representative — the invariant the parity
    harness asserts at sf0.1, reproduced here on a controlled corpus."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(60, 16))
    # 30 planted near-dup partners → 30 components of 2 + no singleton loss
    vecs = np.vstack([base, base + rng.normal(scale=0.01, size=(60, 16))])
    emb = _emb(spark, vecs)
    exact = {
        r.vec_id: r.keep
        for r in semantic_dedup_keep(emb, threshold=0.99).collect()
    }
    from pyspark_anomaly_detection_spark.similarity import neardup as nd
    from pyspark_anomaly_detection_spark.text.clusters import (
        connected_components,
    )

    lsh_pairs = nd.lsh_blocked_neardup(emb, threshold=0.99)
    comp = connected_components(lsh_pairs, src="a_id", dst="b_id")
    dropped_lsh = {r.node for r in comp.collect() if r.node != r.component}
    kept_exact = {v for v, k in exact.items() if k}
    assert kept_exact.isdisjoint(dropped_lsh), (
        "LSH dropped an exact-kept representative"
    )


def test_strip_dup_spans_rewrites_exactly(spark):
    """Planted boilerplate: the cleaned text must be the original with
    PRECISELY the shared passage removed — boundary-exact rewrite."""
    from pyspark_anomaly_detection_spark.text.dedup import strip_dup_spans

    boiler = _words("shared", 12)
    head0, tail0 = _words("a", 9), _words("b", 9)
    head1, tail1 = _words("c", 9), _words("d", 9)
    texts = [
        f"{head0} {boiler} {tail0}",
        f"{head1} {boiler} {tail1}",
        _words("unique", 30),
    ]
    out = {r.doc_id: r for r in strip_dup_spans(_docs(spark, texts)).collect()}
    assert out[0].cleaned_text == f"{head0} {tail0}"
    assert out[1].cleaned_text == f"{head1} {tail1}"
    assert out[0].kept_tokens == 18 and out[0].n_tokens == 30
    assert out[2].cleaned_text == texts[2]  # untouched
    assert out[2].kept_tokens == 30


def test_strip_fully_duplicated_doc_empties(spark):
    from pyspark_anomaly_detection_spark.text.dedup import strip_dup_spans

    t = _words("z", 40)
    out = {r.doc_id: r for r in strip_dup_spans(_docs(spark, [t, t])).collect()}
    assert out[0].cleaned_text == "" and out[0].kept_tokens == 0
    assert out[1].cleaned_text == "" and out[1].kept_tokens == 0


def test_global_row_ids_match_row_number(spark):
    """q185's two-phase ids vs literal ROW_NUMBER semantics on a skewed,
    shuffled key distribution, at several partition counts."""
    from pyspark_anomaly_detection_spark.text.shards import global_row_ids

    keys = [(k * 37) % 10_007 for k in range(2_000)]  # permuted, unique
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).repartition(13)
    for n_parts in (1, 4, 32):
        got = {
            r.k: r.row_id
            for r in global_row_ids(df, "k", num_partitions=n_parts).collect()
        }
        expected = {k: i + 1 for i, k in enumerate(sorted(keys))}
        assert got == expected, f"mismatch at num_partitions={n_parts}"


def test_global_row_ids_contiguous_on_documents(spark, sf_dir):
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.text.shards import global_row_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ids = sorted(r.row_id for r in global_row_ids(docs).collect())
    assert ids == list(range(1, len(ids) + 1))


# ------------------- round 7: keep-one-occurrence policy (q195)


def test_keep_one_cross_doc_first_doc_survives(spark):
    """Shared passage in docs 0 and 1: owner election by (doc_id, pos)
    keeps doc 0's copy VERBATIM and strips doc 1's — exactly one
    occurrence survives corpus-wide (the strip-all policy removes
    both)."""
    from pyspark_anomaly_detection_spark.text.dedup import (
        keep_one_dup_spans,
        strip_dup_spans,
    )

    boiler = _words("shared", 12)
    head0, tail0 = _words("a", 9), _words("b", 9)
    head1, tail1 = _words("c", 9), _words("d", 9)
    texts = [
        f"{head0} {boiler} {tail0}",
        f"{head1} {boiler} {tail1}",
        _words("unique", 30),
    ]
    keep_one = {r.doc_id: r for r in keep_one_dup_spans(_docs(spark, texts)).collect()}
    assert keep_one[0].cleaned_text == texts[0], "owner copy must survive verbatim"
    assert keep_one[0].kept_tokens == 30
    assert keep_one[1].cleaned_text == f"{head1} {tail1}"
    assert keep_one[1].kept_tokens == 18
    assert keep_one[2].cleaned_text == texts[2]

    strip_all = {r.doc_id: r for r in strip_dup_spans(_docs(spark, texts)).collect()}
    assert strip_all[0].kept_tokens == 18, "strip-all removes the owner copy too"


def test_keep_one_within_doc_first_occurrence_survives(spark):
    """A passage repeated twice INSIDE one doc: the first occurrence is
    the owner.  Exact survivor count: with the passage at positions p2
    (second copy), windows starting in [p2-K+1, p2+L-K] are non-owner
    duplicates (the straddle windows repeat around BOTH copies, so the
    copies' straddles around copy 2 lose the election), stripping a
    merged span that covers the second copy."""
    from pyspark_anomaly_detection_spark.text.dedup import keep_one_dup_spans

    k = DUP_WINDOW_TOKENS
    passage = _words("p", 12)
    gap = _words("g", 10)
    text = f"{passage} {gap} {passage}"
    out = {r.doc_id: r for r in keep_one_dup_spans(_docs(spark, [text])).collect()}
    r = out[0]
    assert r.n_tokens == 34
    # First copy + gap survive; the second copy is stripped entirely
    # (every window touching it also occurs around the first copy).
    assert r.cleaned_text.startswith(passage), r.cleaned_text
    assert "g0" in r.cleaned_text and "g9" in r.cleaned_text
    # tokens p0..p11 appear exactly once in the survivor text
    assert r.cleaned_text.split().count("p0") == 1
    assert r.cleaned_text.split().count("p11") == 1


def test_keep_one_identical_docs_keep_exactly_one(spark):
    from pyspark_anomaly_detection_spark.text.dedup import keep_one_dup_spans

    t = _words("z", 40)
    out = {r.doc_id: r for r in keep_one_dup_spans(_docs(spark, [t, t, t])).collect()}
    assert out[0].cleaned_text == t and out[0].kept_tokens == 40
    assert out[1].cleaned_text == "" and out[1].kept_tokens == 0
    assert out[2].cleaned_text == "" and out[2].kept_tokens == 0


def test_strip_adversarial_alternating_megadoc(spark):
    """q184 worst case (round-6 verdict item 4): a single doc whose text
    alternates duplicated windows with unique separators produces ~n/(2K)
    merged spans in ONE document.  The complement-gap-slice rewrite is
    O(tokens + spans) per doc, so this completes quickly and exactly;
    the old per-token exists() over the span array was O(tokens×spans).
    Correctness is pinned against a pure-Python reference."""
    from pyspark_anomaly_detection_spark.text.dedup import strip_dup_spans

    k = DUP_WINDOW_TOKENS
    n_blocks = 400  # ~ 400 spans, ~ 400*(2k) = 6400 tokens in the megadoc
    blocks = []
    for i in range(n_blocks):
        blocks.append(_words("dup", k))          # same k tokens every time
        blocks.append(_words(f"u{i}x", k))       # unique separator
    mega = " ".join(blocks)
    out = {r.doc_id: r for r in strip_dup_spans(_docs(spark, [mega])).collect()}
    r = out[0]
    toks = mega.split()
    assert r.n_tokens == len(toks) == 2 * k * n_blocks

    # Python reference: mark every window whose k-token tuple recurs.
    from collections import Counter

    wins = [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    counts = Counter(wins)
    covered = set()
    for i, w in enumerate(wins):
        if counts[w] >= 2:
            covered.update(range(i, i + k))
    expect_kept = [t for i, t in enumerate(toks) if i not in covered]
    assert r.kept_tokens == len(expect_kept)
    assert r.cleaned_text == " ".join(expect_kept)


def test_keep_one_dominates_strip_all_on_random_corpus(spark):
    """Policy dominance invariant on a high-collision random corpus:
    non-owner dup windows are a SUBSET of all dup windows, so keep-one's
    stripped spans are contained in strip-all's — per doc keep-one
    retains at least as many tokens, and strip-all's survivor string is
    a subsequence of keep-one's."""
    import random

    from pyspark_anomaly_detection_spark.text.dedup import (
        keep_one_dup_spans,
        strip_dup_spans,
    )

    rng = random.Random(1234)
    vocab = [f"v{i}" for i in range(12)]  # tiny vocab → dense collisions
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 60)))
        for _ in range(30)
    ]
    # plus one planted pair whose shared passage sits in UNIQUE context:
    # its owner occurrence cannot be covered by other hashes' spans, so
    # the election provably beats strip-all somewhere in the corpus
    boiler = _words("boil", 12)
    texts += [f"{_words('ctxa', 9)} {boiler}", f"{_words('ctxb', 9)} {boiler}"]
    docs = _docs(spark, texts)
    keep_one = {r.doc_id: r for r in keep_one_dup_spans(docs).collect()}
    strip_all = {r.doc_id: r for r in strip_dup_spans(docs).collect()}

    def is_subsequence(small, big):
        it = iter(big)
        return all(tok in it for tok in small)

    total_owner_kept = 0
    for i in range(len(texts)):
        ko, sa = keep_one[i], strip_all[i]
        assert ko.n_tokens == sa.n_tokens
        assert ko.kept_tokens >= sa.kept_tokens, f"doc {i}: dominance violated"
        assert is_subsequence(
            sa.cleaned_text.split(), ko.cleaned_text.split()
        ), f"doc {i}: strip-all survivors not contained in keep-one's"
        total_owner_kept += ko.kept_tokens - sa.kept_tokens
    # the corpus is collision-dense: the election must actually preserve
    # owner copies somewhere, not degenerate to the strip-all answer
    assert total_owner_kept > 0


def test_strip_by_spans_random_disjoint_intervals(spark):
    """_strip_by_spans vs a pure-Python reference on random DISJOINT
    span sets (edge-touching, adjacent, whole-doc, empty) — the gap
    construction must complement arbitrary disjoint interval layouts,
    not just dup-derived ones."""
    import random

    from pyspark_anomaly_detection_spark.text.dedup import _strip_by_spans

    rng = random.Random(77)
    docs_rows, span_rows, expected = [], [], {}
    for doc_id in range(40):
        n = rng.randint(0, 50)
        toks = [f"t{doc_id}_{j}" for j in range(n)]
        docs_rows.append((doc_id, " ".join(toks)))
        # random disjoint intervals: walk positions, flip coverage
        spans, pos = [], 0
        while pos < n:
            if rng.random() < 0.4:
                end = min(n - 1, pos + rng.randint(0, 6))
                spans.append((pos, end))
                pos = end + 2  # ≥1 gap… unless the next span touches
            else:
                pos += rng.randint(1, 4)
        if rng.random() < 0.2 and n >= 1:
            spans = [(0, n - 1)]  # whole-doc span
        for s, e in spans:
            span_rows.append((doc_id, s, e))
        covered = {i for s, e in spans for i in range(s, e + 1)}
        kept = [t for i, t in enumerate(toks) if i not in covered]
        expected[doc_id] = (n, len(kept), " ".join(kept))

    docs = spark.createDataFrame(docs_rows, ["doc_id", "text"])
    spans_df = spark.createDataFrame(
        [(d, s, e) for d, s, e in span_rows], ["doc_id", "s", "e"]
    ).selectExpr("doc_id", "CAST(s AS LONG) s", "CAST(e AS LONG) e")
    out = {r.doc_id: r for r in _strip_by_spans(docs, spans_df).collect()}
    for doc_id, (n, n_kept, text) in expected.items():
        r = out[doc_id]
        got = (r.n_tokens, r.kept_tokens, r.cleaned_text)
        # empty text tokenizes to [''] in Spark's split — skip the
        # degenerate zero-token doc the same way the operators do
        if n == 0:
            continue
        assert got == (n, n_kept, text), f"doc {doc_id}: {got} != {(n, n_kept, text)}"


# ---------------- round 8: two-granularity run profile (q202)


def test_dup_run_profile_planted_boundaries(spark):
    """A 40-token shared passage is recovered at BOTH widths with exact
    length; a 10-token shared passage only at the fine width; unique
    docs report zeros; coarse spans always contained in fine spans."""
    from pyspark_anomaly_detection_spark.text.dedup import dup_run_profile

    long_p = " ".join(f"L{i}" for i in range(40))
    short_p = " ".join(f"S{i}" for i in range(10))

    def filler(tag, n):
        return " ".join(f"{tag}{i}" for i in range(n))

    docs = spark.createDataFrame(
        [
            (1, f"{filler('a', 12)} {long_p} {filler('b', 7)}"),
            (2, f"{filler('c', 5)} {long_p} {filler('d', 11)}"),
            (3, f"{filler('e', 9)} {short_p} {filler('f', 6)}"),
            (4, f"{short_p} {filler('g', 13)}"),
            (5, filler("h", 30)),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dup_run_profile(docs).collect()}
    for d in (1, 2):
        assert out[d].max_run_fine == 40, out[d]
        assert out[d].max_run_coarse == 40, out[d]
        assert out[d].dup_tokens_fine == 40
        assert out[d].dup_tokens_coarse == 40
    for d in (3, 4):
        assert out[d].max_run_fine == 10, out[d]
        assert out[d].max_run_coarse == 0, out[d]
    assert out[5].max_run_fine == 0 and out[5].dup_tokens_fine == 0
    assert all(r.n_uncontained_coarse == 0 for r in out.values())
