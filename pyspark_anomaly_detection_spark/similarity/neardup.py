"""Embedding-cosine near-duplicate detection + IVF approximate search
(north-star operators; no reference analogue — the reference has no vector
surface at all, cf. SURVEY.md §2.10).

Two scale regimes, same semantics:

* ``cosine_neardup_pairs`` — EXACT thresholded all-pairs (a < b).  O(N²)
  pairs but norm computation is O(N) (precomputed once, not per pair).
  This is the oracle-checkable version (q52).
* ``lsh_blocked_neardup`` — the 100 TB path: sign-LSH bucket as the
  blocking key, so the self-join shuffles on ``bucket`` and only
  same-bucket pairs are scored.  Recall < 1 by construction; verified by
  set-containment against the exact pairs in tests, not by oracle hash.
* ``ivf_topk`` (q53) — IVF approximate nearest neighbour: deterministic
  numpy-Lloyd coarse quantizer fit on a hash-sample (one applyInPandas
  group — one Spark job, not one per iteration), candidates limited to
  the ``nprobe`` cells nearest each query.  At cluster scale the cell id
  is the partitioning / bucketing key and the centroid table is broadcast
  (k × dim floats).

Threshold note: the synthetic embeddings are near-orthogonal (max pairwise
cosine ≈ 0.51 at sf0.01), so the "near-dup" threshold is set at the 99.9th
percentile of the pair distribution (0.38) to exercise the operator with a
non-empty result; the semantics are threshold-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register
from pyspark_anomaly_detection_spark.similarity.ann import (
    _as_double,
    _dot,
    _hyperplanes,
)

NEARDUP_THRESHOLD = 0.38
IVF_K = 16
IVF_NPROBE = 4  # 4/16 cells scanned → recall@5 ≈ 0.62 on the (structureless,
# near-orthogonal) synthetic vectors; real clustered embeddings do far better

#: All-pairs above this is a scale bug, not a choice: N² pair growth means
#: 10⁶ rows → 5·10¹¹ pairs.  The exact form exists as the oracle baseline;
#: anything bigger must go through the LSH-blocked path.
MAX_EXACT_ROWS = 1000

#: Blocking degree target: expected rows per sign-LSH bucket.  A FIXED
#: plane count leaves the blocked lane at N²/2^planes — still quadratic
#: (r15: 20k vectors × 4 planes = ~12M in-bucket pairs through the
#: interpreted fold, minutes of serial work).  Scaling planes with
#: log2(N / target) holds expected bucket size constant, so in-bucket
#: pair work stays ~N·target — the linear 100 TB shape.  125 reproduces
#: the historical 4-plane blocking exactly at sf0.1's 2000 vectors, so
#: committed-SF outputs are unchanged.  Correctness is blocking-degree
#: independent: the lane's contract is containment in the exact pair
#: set (parity ADAPTIVE_SUBSET_CASES) PLUS recall floors vs the exact
#: oracle (r16, tools/parity_check.py::NEARDUP_RECALL_FLOOR) — exact
#: duplicates always share every bucket regardless of plane count.
TARGET_BUCKET_ROWS = 125


def _planes_for(n: int, floor: int = 4) -> int:
    """Plane count holding expected bucket occupancy near
    ``TARGET_BUCKET_ROWS`` (never below ``floor``)."""
    import math

    if n <= TARGET_BUCKET_ROWS:
        return floor
    return max(floor, math.ceil(math.log2(n / TARGET_BUCKET_ROWS)))


def _normed(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    """Project to (id, vec, norm) with the norm computed once per vector."""
    vec = _as_double(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"), vec.alias(f"{prefix}vec")
    ).withColumn(
        f"{prefix}norm",
        F.sqrt(_dot(F.col(f"{prefix}vec"), F.col(f"{prefix}vec"))),
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = NEARDUP_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_exact_rows: int | None = MAX_EXACT_ROWS,
) -> DataFrame:
    """Exact cosine near-dup pairs (id_a < id_b, cos >= threshold).

    The canonical-survivor convention downstream is "keep min id": marking
    ``id_b`` rows as duplicates of ``id_a`` reproduces the exact-dedup
    keep-first rule (cf. text/dedup.py) on the vector surface.

    Guard: refuses inputs above ``max_exact_rows`` (pair count grows N²) —
    use ``lsh_blocked_neardup`` or ``adaptive_neardup_pairs`` instead.
    Pass ``max_exact_rows=None`` only in tests that knowingly pay N².
    """
    if max_exact_rows is not None:
        n = df.count()
        if n > max_exact_rows:
            raise ValueError(
                f"exact all-pairs refused: {n} rows > {max_exact_rows} "
                "(N² pair growth); use lsh_blocked_neardup / "
                "adaptive_neardup_pairs, or pass max_exact_rows=None "
                "if you really mean brute force"
            )
    a = _normed(df, id_col, vec_col, "a")
    b = _normed(df, id_col, vec_col, "b")
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            F.col("a_id"),
            F.col("b_id"),
            (
                _dot(F.col("avec"), F.col("bvec")) / (F.col("anorm") * F.col("bnorm"))
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_blocked_neardup(
    df: DataFrame,
    threshold: float = NEARDUP_THRESHOLD,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
) -> DataFrame:
    """Scale path: same output columns as ``cosine_neardup_pairs`` but the
    self-join is blocked on the sign-LSH bucket — shuffle key = bucket, so
    pair generation is sum over buckets of |bucket|² instead of N².

    ``n_tables`` > 1 is OR-amplification (ADVICE r15): L INDEPENDENT
    bucket tables (disjoint hyperplane sets), a pair is a candidate if it
    collides in ANY table — recall rises from p^r to 1-(1-p^r)^L while
    in-bucket pair work stays linear (L·N·bucket_target).  Growing a
    SINGLE band instead (r15's fix) silently collapsed near-threshold
    recall ~0.62^r; the multi-table form is the standard LSH recall/cost
    dial.  Table 0's planes are the historical single-band planes, so
    n_tables=1 reproduces prior candidate sets exactly.

    Execution shape (r16): both the bucket hashing and the in-bucket
    scoring run as Arrow-batched numpy stages that accumulate dot
    products SEQUENTIALLY OVER DIMENSIONS, vectorized over rows — the
    exact IEEE order of the JVM fold (``ann._dot``) and of DuckDB's
    ``list_dot_product``, so cos_sim is bitwise what the exact lane and
    the SQL/numpy oracles produce, at ~100× the interpreted fold's
    throughput (the q37 cliff class: 134 s → ~4 s for the sf1 audit).
    Shuffle = L·N (id, vec) rows grouped by (table, bucket); per-bucket
    pair scoring is a ~bucket_target² numpy triangle, never a join;
    duplicate cross-table candidates collapse in the final distinct.
    Skew bound: a B-row hot bucket costs one B² in-memory triangle —
    same bound as the bucketed join it replaces."""
    all_planes = np.asarray(_hyperplanes(n_tables * n_planes), dtype=np.float64)
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    )
    id_type = dict(base.dtypes)["id"]
    n_bits = n_planes

    def _fold_rows(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
        # per-pair dot, sequential over dims (IEEE order of the engines'
        # fold), vectorized over the pair axis
        acc = np.zeros(a.shape[0])
        for i in range(a.shape[1]):
            acc = acc + a[:, i] * b[:, i]
        return acc

    def bucketize(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf["vec"].to_numpy())
            # plane dots in the same sequential-over-dims order
            dots = np.zeros((mat.shape[0], all_planes.shape[0]))
            for i in range(mat.shape[1]):
                dots = dots + mat[:, i : i + 1] * all_planes[None, :, i]
            bits = dots >= 0.0
            for t in range(n_tables):
                bucket = np.zeros(mat.shape[0], dtype=np.int64)
                for j in range(n_bits):
                    bucket |= bits[:, t * n_bits + j].astype(np.int64) << j
                yield pd.DataFrame(
                    {
                        "id": pdf["id"].to_numpy(),
                        "vec": pdf["vec"].to_numpy(),
                        "tbl": np.full(mat.shape[0], t, dtype=np.int32),
                        "bucket": bucket,
                    }
                )

    out_schema = f"a_id {id_type}, b_id {id_type}, cos_sim double"

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []})
        pdf = pdf.sort_values("id")
        mat = np.vstack(pdf["vec"].to_numpy())
        ids = pdf["id"].to_numpy()
        nrm = np.sqrt(_fold_rows(mat, mat))
        ia, ib = np.triu_indices(len(ids), k=1)
        cos = _fold_rows(mat[ia], mat[ib]) / (nrm[ia] * nrm[ib])
        keep = cos >= threshold
        return pd.DataFrame(
            {"a_id": ids[ia[keep]], "b_id": ids[ib[keep]], "cos_sim": cos[keep]}
        )

    bucketed = base.mapInPandas(
        bucketize,
        schema=f"id {id_type}, vec array<double>, tbl int, bucket long",
    )
    return (
        bucketed.groupBy("tbl", "bucket")
        .applyInPandas(score, schema=out_schema)
        .distinct()
    )


#: OR-amplification ceiling for the adaptive lane above the exact cap:
#: up to 8 independent tables at ``_planes_for(n)`` planes each keeps
#: total in-bucket pair work ≤ L·N·TARGET_BUCKET_ROWS (linear) while
#: lifting near-threshold recall from p^r to 1-(1-p^r)^L.  The recall
#: floor is enforced against the exact numpy oracle at the sf1 scale
#: point (tools/parity_check.py::NEARDUP_RECALL_FLOOR) — exact-duplicate
#: pairs (cos≈1) collide in every table, so their recall is 1.0 by
#: construction regardless of this dial.
N_OR_TABLES = 8


def _tables_for(n_planes: int, ceiling: int = N_OR_TABLES) -> int:
    """OR-table count matched to the blocking degree (VERDICT r16 item 3:
    a FLAT L=8 was the sf1 recall answer applied at every scale — at
    sf0.1's 4-plane blocking it doubled q183's LSH work for recall the
    floor does not require).  Per-table candidate recall is ~p^r in the
    plane count r, so fewer planes (small corpora) need fewer OR-tables
    to clear the floor; L grows WITH r up to the ceiling.  Measured
    recall vs the exact pair set (numpy replay of the committed planes,
    sf0.1 N=2000, r=4): L=8 → 0.759, L=4 → 0.506, L=3 → 0.408 — L=r=4
    clears the 0.40 floor with margin, L=3 does not.  At sf1 (r=8)
    L=min(8,8)=8 reproduces the audited 0.476 candidate set exactly.
    ``_hyperplanes`` is prefix-stable (one seeded stream), so a smaller
    L uses a prefix of the same tables — candidates shrink, never
    reshuffle."""
    return max(4, min(ceiling, n_planes))


def adaptive_neardup_pairs(
    df: DataFrame,
    threshold: float = NEARDUP_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_exact_rows: int = MAX_EXACT_ROWS,
    n_planes: "int | None" = None,
    n_tables: "int | None" = None,
) -> DataFrame:
    """Size-dispatching near-dup: exact all-pairs while the input fits the
    oracle-verification budget (≤ ``max_exact_rows``), LSH-blocked above it.
    One cheap count() job decides; same output columns either way.  This is
    the registry default — the exact form stays reachable for verification,
    the N² plan can never run on production-size input by accident.
    The blocking degree scales with the corpus (``_planes_for``) unless
    pinned explicitly, keeping in-bucket pair work linear in N; recall
    is held up by ``n_tables``-way OR-amplification (see
    ``lsh_blocked_neardup``)."""
    n = df.count()
    if n <= max_exact_rows:
        return cosine_neardup_pairs(
            df, threshold, id_col, vec_col, max_exact_rows=None
        )
    planes = _planes_for(n) if n_planes is None else n_planes
    tables = _tables_for(planes) if n_tables is None else n_tables
    return lsh_blocked_neardup(
        df, threshold, planes, id_col, vec_col, n_tables=tables
    )


@register(
    "q52_embedding_neardup",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) >= {NEARDUP_THRESHOLD}
    ORDER BY a_id, b_id
    """,
)
def q52_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over the embeddings table,
    size-dispatched: exact all-pairs at oracle scales (≤1000 vectors, where
    the DuckDB oracle hash-matches bitwise — dot products are sequential
    left-folds matching list_dot_product evaluation order), LSH-blocked
    above that (sf0.1's 2000 vectors and beyond — recall<1 by construction,
    bounded by set-containment tests instead of the oracle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return adaptive_neardup_pairs(emb).orderBy("a_id", "b_id")


# --------------------------------------------------------------------------
# IVF approximate nearest neighbour (coarse quantizer + probed cells).
# --------------------------------------------------------------------------


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: seeded KMeans cells; per query, scan only the ``nprobe``
    nearest cells.

    Cluster-scale layout: the candidate table is written bucketed/
    partitioned by ``cell``; the (query → probed cell) map is tiny and
    broadcast, so the probe is a broadcast-hash join that prunes to
    nprobe/n_cells of the data — no full shuffle of the big side.
    """
    feat = df.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cvec")
    ).withColumn("cnorm", F.sqrt(_dot(F.col("cvec"), F.col("cvec"))))

    # Coarse-quantizer training is sample-based by design: at 100 TB you
    # never run Lloyd iterations over the full corpus — a deterministic
    # hash-sample (~thousands of rows per cell) fixes the centroids, then
    # ONE pass assigns everything.  8 Lloyd sweeps because the quantizer
    # only needs rough cells, not converged clusters (probing covers the
    # slop).  Numpy Lloyd in a single applyInPandas group replaces MLlib
    # KMeans: one Spark job instead of one per iteration (cold-start was
    # 16 s at sf0.1, dominated by the JVM ML fit), and first-k-by-id init
    # makes reruns bitwise-identical.
    sample = feat.filter(
        F.pmod(F.xxhash64(F.col("cand_id")), F.lit(2)) == 0
    ).select(F.col("cand_id").alias("vid"), F.col("cvec").alias("vec"))

    def fit_cells(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vid")
        pts = np.vstack(pdf["vec"].to_numpy())
        if pts.shape[0] < n_cells:  # tiny sample: tile so every cell exists
            pts = np.tile(pts, (n_cells // pts.shape[0] + 1, 1))
        cents = pts[:n_cells].copy()
        for _ in range(8):
            d2 = -2.0 * (pts @ cents.T) + (cents**2).sum(axis=1)[None, :]
            assign_v = d2.argmin(axis=1)
            for j in range(n_cells):
                mask = assign_v == j
                if mask.any():
                    cents[j] = pts[mask].mean(axis=0)
        return pd.DataFrame(
            {"cell": range(n_cells), "center": [c.tolist() for c in cents]}
        )

    cent_rows = (
        sample.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(fit_cells, "cell int, center array<double>")
        .collect()
    )
    cent_mat = np.array(
        [r.center for r in sorted(cent_rows, key=lambda r: r.cell)]
    )
    bc = df.sparkSession.sparkContext.broadcast(cent_mat)

    def assign_batches(batches):
        cb = bc.value
        c2 = (cb**2).sum(axis=1)
        for pdf in batches:
            mat = np.vstack(pdf["cvec"].to_numpy())
            cell = (-2.0 * (mat @ cb.T) + c2[None, :]).argmin(axis=1)
            out = pdf.copy()
            out["cell"] = cell.astype("int32")
            yield out

    assigned = feat.mapInPandas(
        assign_batches, "cand_id long, cvec array<double>, cnorm double, cell int"
    )

    # Probe map: per query the nprobe nearest centroids (centroid table is
    # k rows — crossJoin with the broadcast-small query side is k×Q rows).
    from pyspark_anomaly_detection_spark.io.detach import local_rows_df

    centroids = [[float(x) for x in c] for c in cent_mat]
    centroid_df = local_rows_df(
        df.sparkSession,
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, center array<double>",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    ).withColumn("qnorm", F.sqrt(_dot(F.col("qvec"), F.col("qvec"))))
    wq = Window.partitionBy("query_id").orderBy("dist2", "cell")
    probes = (
        q.crossJoin(F.broadcast(centroid_df))
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(F.col("qvec"), F.col("center"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn("prb", F.row_number().over(wq))
        .filter(F.col("prb") <= nprobe)
        .select("query_id", "qvec", "qnorm", "cell")
    )

    # Pair scoring is a vectorized Arrow-batched pandas UDF (one einsum per
    # batch) rather than the interpreted zip_with/aggregate fold — q53 is
    # recall-checked, not oracle-hashed, so BLAS summation order is fine
    # and ~5× cheaper on the nprobe-pruned pair set.
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _pair_cos(qv: pd.Series, cv: pd.Series) -> pd.Series:
        qm = np.vstack(qv.to_numpy())
        cm = np.vstack(cv.to_numpy())
        dots = np.einsum("ij,ij->i", qm, cm)
        return pd.Series(dots)

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (
                _pair_cos(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm"))
            ).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


from pyspark_anomaly_detection_spark.similarity.ann import (  # noqa: E402
    ann_audit_oracle,
    ann_recall_audit,
)


@register("q53_ivf_ann_topk", oracle=ann_audit_oracle())
# promoted round 11 from rows-only (verdict r10 item 4): the k-means
# cell assignment stays engine-private, but the audit view is not —
# exact top-1 per query hash-checked against DuckDB's independent fold,
# mean recall@5 of the IVF probe banded ≥ 0.5 (its test floor).
def q53_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 for the same query set as q37
    (vec_id % 20 = 0), returned as its recall-audit view; the raw
    top-k pair listing remains available via :func:`ivf_topk`."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    approx = ivf_topk(emb, queries)
    return ann_recall_audit(approx, queries, emb, band=0.5)


# ------------------------------- semantic dedup keep-set (q183, SemDeDup)


def semantic_dedup_keep(
    emb: DataFrame,
    threshold: float = NEARDUP_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style selection (Abbas et al., "SemDeDup", public): the
    near-dup PAIR listing (q52) turned into the decision a pipeline
    actually ships — which rows to KEEP.  Near-dup pairs → connected
    components (min-label propagation, text/clusters.py) → keep the
    min-id representative of each component; singletons keep themselves.

    Output: (vec_id, component, cluster_size, keep) — a full manifest,
    not just survivors, so the drop set is auditable.

    Scale: pair generation is the adaptive exact/LSH-blocked dispatch
    (same as q52); components iterate over the EDGE list only (near-dup
    edges ≪ corpus); the final left join broadcasts nothing and
    shuffles (id, component) longs.  Above the exact cap the LSH pairs
    are a subset of the exact ones, so components split and the keep
    set can only GROW — dedup never drops a non-duplicate by blocking
    (tested as containment in the parity harness)."""
    from pyspark_anomaly_detection_spark.text.clusters import (
        connected_components,
    )

    pairs = adaptive_neardup_pairs(emb, threshold, id_col, vec_col)
    comp = connected_components(pairs, src="a_id", dst="b_id")
    base = emb.select(F.col(id_col))
    joined = base.join(
        comp, base[id_col] == comp["node"], "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
    )
    return (
        joined.withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("component")).cast("long"),
        )
        .withColumn("keep", F.col(id_col) == F.col("component"))
        .orderBy(id_col)
    )


@register(
    "q183_semantic_dedup_keep",
    oracle=f"""
    WITH RECURSIVE vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id
      FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm)
            >= {NEARDUP_THRESHOLD}
    ),
    und AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION
      SELECT b_id, a_id FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM und
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS vec_id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
    ),
    joined AS (
      SELECT e.vec_id, COALESCE(c.component, e.vec_id) AS component
      FROM (SELECT vec_id FROM embeddings) e
      LEFT JOIN comp c USING (vec_id)
    )
    SELECT vec_id, component,
           CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT)
             AS cluster_size,
           (vec_id = component) AS keep
    FROM joined
    ORDER BY vec_id
    """,
)
def q183_semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop manifest for embedding-level semantic dedup (see
    semantic_dedup_keep): exact components at oracle scales, LSH-blocked
    above the all-pairs cap (keep-set containment replaces equality
    there, mirroring q52's dispatch)."""
    return semantic_dedup_keep(load_table(spark, sf_dir, "embeddings"))
