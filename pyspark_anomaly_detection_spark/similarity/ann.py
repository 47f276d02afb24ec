"""Similarity search over the ``embeddings`` table (north-star operators).

* Brute-force cosine top-k — the exactness baseline.  Dot products are
  computed with ``F.zip_with`` + ``F.aggregate`` (sequential left-fold in
  double precision), which matches DuckDB's ``list_dot_product`` evaluation
  order bitwise → exact oracle comparison, no tolerance needed.
* Sign-LSH bucketed variant — the scale path: deterministic random
  hyperplanes (seeded numpy, inlined as literals into BOTH the Spark plan
  and the oracle SQL), bucket by sign bits, search within bucket only.

Scale design (100 TB): brute force is O(Q×N) — usable when the query set is
broadcast-small (it is here: queries are a keyed sample joined via
broadcast, so the big candidate side never shuffles).  The LSH variant cuts
candidates by ~2^planes; at cluster scale the bucket id becomes the shuffle
/ bucketing key and hot buckets are AQE-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.functions import cosine
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

EMBED_DIM = 64
N_PLANES = 4


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (matches DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


#: Decimal places every exact-top-k lane rounds ``cos_sim`` to BEFORE
#: ranking.  This is the lane-independence contract (ADVICE r12): the
#: interpreted JVM fold and the BLAS batch lane differ in float
#: summation order by ≲1e-13 relative, so ranking raw doubles makes the
#: hash-locked oracle depend on which lane ran; at 6dp both lanes (and
#: DuckDB's own fold) agree except when a true value sits within an ulp
#: of a 5e-7 boundary (~1e-9 per emitted value — negligible), and
#: near-ties inside 1e-6 become exact ties broken by cand_id
#: identically everywhere.
TOPK_ROUND_DP = 6


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side, rank per query.

    Norms are precomputed once per vector (N+Q sqrt/folds) instead of per
    pair (2·N·Q) — same bitwise result (sqrt of the identical dot), ~2× less
    work in the pair loop.  ``cos_sim`` is rounded to TOPK_ROUND_DP before
    ranking (lane-independence contract, see above); deterministic
    tie-break on candidate id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    ).withColumn("qnorm", F.sqrt(_dot(F.col("qvec"), F.col("qvec"))))
    c = candidates.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cvec")
    ).withColumn("cnorm", F.sqrt(_dot(F.col("cvec"), F.col("cvec"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                TOPK_ROUND_DP,
            ).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def ann_recall_audit(
    approx: DataFrame,
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    band: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Error-band audit view of an approximate top-k result (verdict r10
    item 4 — the q62/q99 sketch-promotion pattern applied to ANN):

    * the EXACT top-1 neighbor per query (cand id + cosine, computed by
      the q37 fold whose bitwise DuckDB parity q37 proves) — the
      hash-checked cross-engine half of the output;
    * ``recall_within_band`` — mean recall@k of ``approx`` against the
      exact top-k, asserted ≥ ``band`` (the oracle emits constant TRUE;
      a band miss means the approximate operator broke, not noise —
      bands sit well below each method's steady-state recall).

    The recall scalar is computed eagerly (two counts over k·|Q|-row
    frames — driver cost is two longs); the RETURNED frame is the
    persisted exact ranking's top-1 slice, a pure-JVM plan."""
    from pyspark_anomaly_detection_spark.cachepool import tracked_persist

    exact = tracked_persist(
        brute_force_topk(queries, candidates, k=k, id_col=id_col, vec_col=vec_col)
    )
    pairs = exact.select("query_id", "cand_id")
    n_exact = pairs.count()
    n_hit = pairs.join(
        approx.select("query_id", "cand_id"),
        ["query_id", "cand_id"],
        "left_semi",
    ).count()
    within = bool(n_hit >= band * max(n_exact, 1))
    return (
        exact.filter(F.col("rk") == 1)
        .select(
            "query_id",
            F.col("cand_id").alias("exact_top1_cand"),
            F.col("cos_sim").alias("exact_top1_cos"),
            F.lit(within).alias("recall_within_band"),
        )
        .orderBy("query_id")
    )


def ann_audit_oracle(query_pred: str = "vec_id % 20 = 0") -> str:
    """Oracle SQL for :func:`ann_recall_audit`: DuckDB independently
    recomputes the exact top-1 per query (same fold as the q37 oracle)
    and asserts the recall band TRUE."""
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
      FROM embeddings WHERE {query_pred}
    ),
    c AS (
      SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cvec FROM embeddings
    ),
    scored AS (
      SELECT
        query_id,
        cand_id,
        ROUND(list_dot_product(qvec, cvec)
          / (sqrt(list_dot_product(qvec, qvec))
             * sqrt(list_dot_product(cvec, cvec))), 6) AS cos_sim
      FROM c JOIN q ON query_id <> cand_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
      ) AS rk
      FROM scored
    )
    SELECT query_id, cand_id AS exact_top1_cand,
           cos_sim AS exact_top1_cos, TRUE AS recall_within_band
    FROM ranked WHERE rk = 1
    ORDER BY query_id
    """


@register(
    "q37_ann_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
      FROM embeddings WHERE vec_id % 20 = 0
    ),
    c AS (
      SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cvec FROM embeddings
    ),
    scored AS (
      SELECT
        query_id,
        cand_id,
        ROUND(list_dot_product(qvec, cvec)
          / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(cvec, cvec))), 6)
          AS cos_sim
      FROM c JOIN q ON query_id <> cand_id
    )
    SELECT query_id, cand_id, cos_sim, rk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
      ) AS rk
      FROM scored
    )
    WHERE rk <= 5
    ORDER BY query_id, rk
    """,
    headline=True,
)
def q37_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k, size-adaptively dispatched (the q100 pattern;
    round-12 scale lane finding): the query set is ``vec_id % 20 == 0``,
    so Q grows WITH the corpus and the pair count is quadratic in N by
    construction.  At small scales the interpreted JVM expression fold
    runs; above ~2M pairs it would dominate wall-clock (measured 148 s
    at the sf1 slope point vs 1.9 s at sf0.1 — a 78× cliff for 10× data),
    so the BLAS ``brute_force_topk_vectorized`` lane takes over.  Under
    the TOPK_ROUND_DP contract both lanes emit identical rounded values
    and ranks, so the hash-locked oracle holds REGARDLESS of which lane
    ran (ADVICE r12: parity no longer depends on corpus size crossing a
    hidden threshold), and the lane decision reads the parquet footer's
    row count — no Spark job.  Lane independence also moved the
    crossover down from 2M pairs (where the fold became a wall-clock
    cliff) to where the BLAS lane simply starts winning: measured at
    sf0.1 the fold took 1.7 s vs 0.59 s vectorized.  sf0.001/sf0.01
    stay on the fold, so the parity matrix keeps exercising BOTH lanes
    every round."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    n = _parquet_rows(sf_dir, "embeddings")
    topk = (
        brute_force_topk_vectorized
        if n * (n // 20 + 1) > 100_000  # pairs ≈ n·(n/20)
        else brute_force_topk
    )
    return topk(queries, emb).orderBy("query_id", "rk")


def _parquet_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet footer metadata — no Spark job, no scan."""
    import os

    import pyarrow.dataset as ds

    path = os.path.join(sf_dir, f"{table}.parquet")
    return sum(
        f.metadata.num_rows
        for f in ds.dataset(path, format="parquet").get_fragments()
    )


def _hyperplanes(n_planes: int = N_PLANES, dim: int = EMBED_DIM) -> list[list[float]]:
    """Deterministic hyperplanes: seeded numpy, rounded to 6dp so the SQL
    literal text and the float64 value are the same number."""
    import numpy as np

    rng = np.random.default_rng(42)
    return [[round(float(x), 6) for x in rng.standard_normal(dim)] for _ in range(n_planes)]


def sign_lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = (vec · plane_i) >= 0."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in plane]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"


def _bucket_sql(vec_sql: str, planes: list[list[float]]) -> str:
    parts = [
        f"(CASE WHEN list_dot_product({vec_sql}, {_plane_sql(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(parts) + ")"


def _q38_oracle() -> str:
    planes = _hyperplanes()
    bucket = _bucket_sql("embedding::DOUBLE[]", planes)
    return f"""
    SELECT {bucket} AS bucket, COUNT(*) AS n_vectors,
           CAST(MIN(vec_id) AS BIGINT) AS min_vec_id
    FROM embeddings
    GROUP BY bucket
    ORDER BY bucket
    """


@register("q38_lsh_bucket_profile", oracle=_q38_oracle())
def q38_lsh_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy profile of the sign-LSH index (the scale path's
    partitioning key).  Checks the bucketing function end-to-end."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    return (
        emb.select(
            sign_lsh_bucket(_as_double(F.col("embedding")), planes).alias("bucket"),
            "vec_id",
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )


def lsh_topk(
    df: DataFrame,
    k: int = 5,
    n_planes: int = N_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking within each LSH bucket.

    Recall < 1 by construction; verified against ``brute_force_topk`` by
    set-containment in tests (SURVEY §7.4), not hash equality.
    """
    planes = _hyperplanes(n_planes)
    vec = _as_double(F.col(vec_col))
    bucketed = df.select(
        F.col(id_col), vec.alias("vec"), sign_lsh_bucket(vec, planes).alias("bucket")
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias("cand_id"),
            # same rounding contract as brute_force_topk, so overlap
            # pairs carry identical scores across exact and LSH lanes
            F.round(
                cosine(F.col("a.vec"), F.col("b.vec")), TOPK_ROUND_DP
            ).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def brute_force_topk_vectorized(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The 100 TB formulation of exact cosine top-k: the (small) query
    matrix is a plain Spark broadcast variable; each Arrow batch of the
    (huge) candidate side does ONE numpy matmul (batch × dim @ dim ×
    n_queries) and emits only its local top-k per query; a final window
    keeps the global top-k over ≤ k·n_batches rows per query.

    Versus ``brute_force_topk``'s JVM fold: ~50× less per-pair work via
    BLAS, and the shuffle input shrinks from |candidates|·|queries|
    scored pairs to ~k per (query, batch).  Float summation order
    differs from the fold (pairwise/SIMD vs sequential) by ≲1e-13
    relative — under the TOPK_ROUND_DP contract both lanes emit the SAME
    rounded values and ranks (ADVICE r12: hash parity no longer depends
    on which lane ran).  Each batch selects its local top-k on the
    ROUNDED score and keeps the WHOLE tie group at the k-th value
    (ADVICE r13: the old fixed slack of 8 raw-score neighbors could
    drop a candidate that ties at 6dp and wins the global cand_id
    tie-break when a boundary tie group exceeded the slack) — a
    candidate strictly below a batch's k-th rounded value is beaten by
    ≥ k same-batch candidates globally, so the pruning is exact.
    """
    import numpy as np
    import pandas as pd

    _ROUND_DP = TOPK_ROUND_DP  # captured for the executor closure

    spark = queries.sparkSession
    qrows = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
    ).collect()
    qids = np.array([r.qid for r in qrows])
    qmat = np.array([r.qvec for r in qrows])  # Q × D
    qnorm = np.linalg.norm(qmat, axis=1)
    bc = spark.sparkContext.broadcast((qids, qmat, qnorm))

    def score_batches(batches):
        b_qids, b_qmat, b_qnorm = bc.value
        for pdf in batches:
            cids = pdf["cand_id"].to_numpy()
            cmat = np.vstack(pdf["cvec"].to_numpy())  # B × D
            cnorm = np.linalg.norm(cmat, axis=1)
            sims = (cmat @ b_qmat.T) / np.outer(cnorm, b_qnorm)  # B × Q
            sims[cids[:, None] == b_qids[None, :]] = -np.inf  # self-match
            # local top-k on the ROUNDED score, whole tie groups kept:
            # everything at-or-above the batch's k-th rounded value
            # survives to the global window (typically ~k rows/query)
            rounded = np.round(sims, _ROUND_DP)
            kk = min(k, rounded.shape[0])
            thresh = -np.partition(-rounded, kk - 1, axis=0)[kk - 1]  # Q
            ci, qi = np.nonzero(rounded >= thresh[None, :])
            yield pd.DataFrame(
                {
                    "query_id": b_qids[qi],
                    "cand_id": cids[ci],
                    "cos_sim": sims[ci, qi],
                }
            )

    c = candidates.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    local_topk = (
        c.mapInPandas(
            score_batches, schema="query_id long, cand_id long, cos_sim double"
        )
        .filter(F.col("cos_sim") != float("-inf"))
        # the rounding contract: rank on the 6dp value, cand_id breaks
        # ties — identical to the fold lane and the DuckDB oracle
        .withColumn("cos_sim", F.round("cos_sim", TOPK_ROUND_DP))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        local_topk.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


@register(
    "q116_ann_topk_vectorized",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
      FROM embeddings WHERE vec_id % 20 = 0
    ),
    c AS (
      SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cvec FROM embeddings
    ),
    scored AS (
      SELECT
        query_id,
        cand_id,
        ROUND(list_dot_product(qvec, cvec)
          / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(cvec, cvec))), 6)
          AS cos_sim
      FROM c JOIN q ON query_id <> cand_id
    )
    SELECT query_id, cand_id, cos_sim, rk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
      ) AS rk
      FROM scored
    )
    WHERE rk <= 5
    ORDER BY query_id, rk
    """,
    headline=True,
    python_lane=True,  # the Arrow-batched BLAS lane IS the operator
)
def q116_ann_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BLAS lane, pinned (q37 dispatches; this always runs
    vectorized) — promoted from rows-only to a full hash-checked oracle
    in round 13: the TOPK_ROUND_DP contract makes the vectorized lane's
    rounded values and ranks identical to DuckDB's sequential fold, so
    the ulp-level summation-order difference that forced rows-only
    status no longer reaches the output.  Adds ZERO Spark-side work to
    this headline bench query (the rounding was already in the plan via
    brute_force_topk_vectorized); the oracle cost is DuckDB's, paid only
    in the parity harness."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    return brute_force_topk_vectorized(queries, emb).orderBy("query_id", "rk")


# --- Product quantization (IVFADC-style PQ, Jégou et al. 2011) --------------

PQ_M = 16  # subspaces
PQ_K = 16  # centroids per subspace → 4-bit codes, M·log2(K)=64 bits/vector
PQ_ITERS = 8
PQ_SAMPLE_MOD = 4  # deterministic hash-sample for codebook training
PQ_SHORTLIST_FACTOR = 20  # ADC shortlist size = factor · k, re-ranked exactly


def pq_train_codebook(
    candidates: DataFrame,
    m: int = PQ_M,
    kc: int = PQ_K,
    iters: int = PQ_ITERS,
    sample_mod: int = PQ_SAMPLE_MOD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Per-subspace k-means codebook, trained distributed: the hash-sampled
    training set explodes into (subspace, subvector) rows, and ONE
    ``applyInPandas`` group per subspace runs seeded Lloyd iterations —
    the m fits parallelize across executors, and only m·kc centroid rows
    come back to the driver.  Vectors are L2-normalized first so PQ inner
    product approximates cosine.

    Deterministic: the sample is a modulo hash-sample, initial centroids are
    the first kc subvectors in vec_id order, and Lloyd runs a fixed ``iters``
    sweeps — two runs produce identical codebooks (sample-based quantizer
    training is the 100 TB-correct shape; probing absorbs the slop).

    Returns a numpy array of shape (m, kc, dim//m).
    """
    import numpy as np
    import pandas as pd

    head = candidates.select(vec_col).first()
    if head is None:
        raise ValueError("pq_train_codebook: empty candidate set")
    dim = len(head[0])
    d_sub = dim // m
    vec = _as_double(F.col(vec_col))
    norm = F.sqrt(_dot(vec, vec))
    # r16 optimization (guide §1.2 per-task work): the old shape
    # normalized via ``transform(vec, x -> x / norm)`` with ``norm`` an
    # inline expression — lambda bodies are interpreted and re-evaluated
    # per element, so the O(dim) dot-product fold ran once per vector
    # COMPONENT (O(dim²) per vector), and Catalyst's CollapseProject
    # re-inlines any single-use norm alias straight back into the
    # lambda.  Instead the RAW subvectors are exploded with the norm
    # carried as a plain column (fold per row, not per element) and the
    # division happens vectorized in the numpy fit — the same IEEE
    # double division, bitwise-identical normalized points, identical
    # codebook.
    sampled = (
        candidates.filter(F.col(id_col) % sample_mod == 0)
        .filter(norm > 0)  # zero vectors carry no direction to quantize
        .select(
            F.col(id_col).alias("vid"),
            vec.alias("_vec"),
            norm.alias("_norm"),
        )
    )
    parts = sampled.select(
        "vid",
        "_norm",
        F.posexplode(
            F.array(*[F.slice(F.col("_vec"), s * d_sub + 1, d_sub) for s in range(m)])
        ).alias("s", "subvec"),
    )

    def fit_subspace(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vid")
        pts = np.vstack(pdf["subvec"].to_numpy())  # n × d_sub (raw)
        pts = pts / pdf["_norm"].to_numpy()[:, None]  # normalize here
        if pts.shape[0] < kc:  # tiny sample: tile so every centroid exists
            pts = np.tile(pts, (kc // pts.shape[0] + 1, 1))
        cents = pts[:kc].copy()
        for _ in range(iters):
            d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(kc):
                mask = assign == j
                if mask.any():
                    cents[j] = pts[mask].mean(axis=0)
        s = int(pdf["s"].iloc[0])
        return pd.DataFrame(
            {"s": s, "cid": range(kc), "centroid": [c.tolist() for c in cents]}
        )

    rows = (
        parts.groupBy("s")
        .applyInPandas(fit_subspace, schema="s int, cid int, centroid array<double>")
        .collect()
    )
    codebook = np.zeros((m, kc, d_sub))
    for r in rows:
        codebook[r.s, r.cid] = r.centroid
    return codebook


def pq_encode(
    candidates: DataFrame,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to m nearest-centroid codes — the compressed
    index.  At kc=16 a 64-dim float32 vector (256 B) becomes m=4 4-bit
    codes (2 B): a 128× memory compression, which is what lets the scoring
    pass keep the whole index in executor memory at 100 TB scale.  One
    Arrow batch = one numpy argmin per subspace; nothing shuffles."""
    import numpy as np
    import pandas as pd

    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(codebook)

    def encode_batches(batches):
        cb = bc.value  # m × kc × d_sub
        m, kc, d_sub = cb.shape
        for pdf in batches:
            mat = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0  # zero vectors encode as themselves
            mat /= norms
            codes = np.empty((mat.shape[0], m), dtype=np.int32)
            for s in range(m):
                sub = mat[:, s * d_sub : (s + 1) * d_sub]  # B × d_sub
                # ||x−c||² = ||x||² − 2x·c + ||c||²; argmin over centroids
                d2 = -2.0 * (sub @ cb[s].T) + (cb[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"cand_id": pdf["cand_id"], "codes": list(codes)}
            )

    c = candidates.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("vec")
    )
    return c.mapInPandas(encode_batches, schema="cand_id long, codes array<int>")


def pq_ann_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    m: int = PQ_M,
    kc: int = PQ_K,
    shortlist_factor: int = PQ_SHORTLIST_FACTOR,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: ADC shortlist over PQ codes, then exact
    re-rank of the shortlist — the IVFADC production shape (Jégou et al.).

    Stage 1 (asymmetric distance computation): queries stay exact; each
    precomputes an m×kc lookup table of subspace inner products, so scoring
    a candidate is m table lookups + adds over its 4-bit codes — the float
    vectors are never re-read.  Each Arrow batch of the code table emits
    only its local top-``shortlist`` per query.

    Stage 2 (exact re-rank): the ≤ shortlist·|Q| surviving (query, cand)
    pairs join back to the raw vectors and re-score with the same exact
    JVM fold as q37, so the final ranking is bitwise-deterministic and the
    approximation only affects which candidates made the shortlist.

    Scale shape: codebook + Q×m×kc LUT broadcast (tiny); stage 1 shuffles
    ≤ shortlist·n_batches rows per query; stage 2 touches shortlist·|Q|
    vectors.  Recall against the exact fold is asserted in
    tests/test_similarity.py, the same contract as q116's BLAS path."""
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    shortlist = shortlist_factor * k
    codebook = pq_train_codebook(candidates, m=m, kc=kc, id_col=id_col, vec_col=vec_col)
    d_sub = codebook.shape[2]

    qrows = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
    ).collect()
    qids = np.array([r.qid for r in qrows])
    qmat = np.array([r.qvec for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    # LUT[q, s, j] = <q_s, centroid[s][j]>  → approx cos = Σ_s LUT[q, s, code_s]
    lut = np.stack(
        [qmat[:, s * d_sub : (s + 1) * d_sub] @ codebook[s].T for s in range(m)],
        axis=1,
    )  # Q × m × kc
    bc = spark.sparkContext.broadcast((qids, lut))

    encoded = pq_encode(candidates, codebook, id_col=id_col, vec_col=vec_col)

    def score_batches(batches):
        b_qids, b_lut = bc.value  # Q×m×kc
        nq, bm, _ = b_lut.shape
        for pdf in batches:
            cids = pdf["cand_id"].to_numpy()
            codes = np.vstack(pdf["codes"].to_numpy())  # B × m
            # gather: scores[b, q] = Σ_s LUT[q, s, codes[b, s]]
            scores = np.zeros((codes.shape[0], nq))
            for s in range(bm):
                scores += b_lut[:, s, :][:, codes[:, s]].T  # B × Q
            scores[cids[:, None] == b_qids[None, :]] = -np.inf
            top = min(shortlist, scores.shape[0])
            idx = np.argpartition(-scores, top - 1, axis=0)[:top]
            flat = idx.T.ravel()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(b_qids, top),
                    "cand_id": cids[flat],
                    "approx_cos": scores[flat, np.repeat(np.arange(nq), top)],
                }
            )

    local = encoded.mapInPandas(
        score_batches, schema="query_id long, cand_id long, approx_cos double"
    ).filter(F.col("approx_cos") != float("-inf"))
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("cand_id")
    )
    shortlisted = (
        local.withColumn("srk", F.row_number().over(ws))
        .filter(F.col("srk") <= shortlist)
        .select("query_id", "cand_id")
    )

    # Stage 2: exact re-rank of shortlist pairs with the q37 fold semantics.
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    ).withColumn("qnorm", F.sqrt(_dot(F.col("qvec"), F.col("qvec"))))
    c = candidates.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cvec")
    ).withColumn("cnorm", F.sqrt(_dot(F.col("cvec"), F.col("cvec"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        shortlisted.join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select(
            "query_id",
            "cand_id",
            # same TOPK_ROUND_DP contract as brute_force_topk: re-ranked
            # scores agree with the exact lanes wherever pairs overlap
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                TOPK_ROUND_DP,
            ).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


@register("q140_pq_ann_topk", oracle=ann_audit_oracle())
# promoted round 11 from rows-only (verdict r10 item 4): the k-means
# codebook + float LUT sums stay engine-private, but the audit view is
# not — exact top-1 per query hash-checked against DuckDB's independent
# fold, mean recall@5 of the PQ pipeline banded ≥ 0.75 (its test floor;
# steady state ≈ 0.9+).
def q140_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN over the same query set as q37/q116 (the
    three formulations — exact fold / exact BLAS / compressed ADC — stay
    directly comparable), returned as its recall-audit view: the raw
    top-k pair listing remains available via :func:`pq_ann_topk`."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    approx = pq_ann_topk(queries, emb)
    return ann_recall_audit(approx, queries, emb, band=0.75)


@register(
    "q214_hard_negative_mining",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, label AS anchor_label,
             embedding::DOUBLE[] AS qvec
      FROM embeddings WHERE vec_id % 25 = 0
    ),
    c AS (
      SELECT vec_id AS cand_id, label AS neg_label,
             embedding::DOUBLE[] AS cvec
      FROM embeddings
    ),
    scored AS (
      SELECT
        query_id, anchor_label, cand_id, neg_label,
        list_dot_product(qvec, cvec)
          / (sqrt(list_dot_product(qvec, qvec))
             * sqrt(list_dot_product(cvec, cvec))) AS cos_sim
      FROM c JOIN q ON anchor_label <> neg_label
    )
    SELECT query_id, CAST(anchor_label AS BIGINT) AS anchor_label,
           cand_id, CAST(neg_label AS BIGINT) AS neg_label, cos_sim, rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
      ) AS rk
      FROM scored
    )
    WHERE rk <= 3
    ORDER BY query_id, rk
    """,
)
def q214_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE mining for contrastive training: per sampled anchor,
    the 3 most-similar vectors with a DIFFERENT label — the
    embedding-space examples a contrastive loss learns most from (the
    ANN-driven twin of q121's hash-random negatives).  Same exact-parity
    arithmetic as q37 (left-fold dots, one IEEE division); the label
    inequality subsumes the self-pair exclusion.  Scale path: swap the
    broadcast-anchor exact scan for the IVF/LSH candidate generation
    (q38/q53) with the same label filter on the shortlist."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") % 25 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").cast("long").alias("anchor_label"),
            _as_double(F.col("embedding")).alias("qvec"),
        )
        .withColumn("qnorm", F.sqrt(_dot(F.col("qvec"), F.col("qvec"))))
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").cast("long").alias("neg_label"),
        _as_double(F.col("embedding")).alias("cvec"),
    ).withColumn("cnorm", F.sqrt(_dot(F.col("cvec"), F.col("cvec"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        c.join(F.broadcast(q), F.col("anchor_label") != F.col("neg_label"))
        .select(
            "query_id",
            "anchor_label",
            "cand_id",
            "neg_label",
            (
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm"))
            ).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("query_id", "rk")
    )
