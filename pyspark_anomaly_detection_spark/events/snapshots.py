"""Snapshot reconciliation — the CDC-shaped diffs a warehouse runs when a
new snapshot of mutable state lands and must be compared to the previous
one (what changed, what appeared, did any foreign key break).

* q155 — user-state transition matrix: each user's latest event_type as
  of cutoff T1 vs as of T2, counted per (old_state, new_state) cell,
  with NULL old_state = user first seen after T1 ("added").  This is the
  aggregate form of a CDC diff: the same plan at row granularity emits
  the upsert stream.
* q156 — referential-integrity audit: orphan-row counts for every
  foreign-key edge of the star schema in ONE result table.  A 100 TB
  ingest runs exactly this after every load; each leg is an anti-join
  (broadcast when the parent side is a dim).

Reference parity: the reference's quality layer checks nulls/counts on a
single table (src/utils/data_quality.py:14-49); these extend the same
gate idea across snapshots and across tables (SURVEY §2.11).

Scale notes: q155 computes both snapshot states from ONE scan (the T2
pass reuses the T1-filtered aggregation's shuffle by deriving both
argmaxes from the same (user, ts)-sorted window); q156's big-fact legs
(lineitem→orders) shuffle on the join key, dim legs broadcast the parent
key set.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

T1 = "2024-01-16 00:00:00"


@register(
    "q155_state_transition_matrix",
    oracle=f"""
    WITH old_state AS (
      SELECT user_id, event_type AS old_state FROM events
      WHERE ts < TIMESTAMP '{T1}'
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ),
    new_state AS (
      SELECT user_id, event_type AS new_state FROM events
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT
      COALESCE(old_state, '<absent>') AS old_state,
      new_state,
      CAST(COUNT(*) AS BIGINT) AS n_users
    FROM new_state LEFT JOIN old_state USING (user_id)
    GROUP BY 1, 2
    ORDER BY old_state, new_state
    """,
)
def q155_state_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How user states moved between snapshot T1 and now: latest
    event_type per user at each cutoff, outer-joined, counted per
    transition cell.  Both argmaxes come from ONE window pass — the T1
    state is the latest row with ts < T1, picked from the same
    user-partitioned descending sort the T2 state uses, so the plan has
    a single per-user shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    w_old = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    before_t1 = F.col("ts") < F.lit(T1).cast("timestamp")
    states = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        # first pre-T1 row in the same descending order = T1-latest state
        .withColumn(
            "old_state",
            F.first(F.when(before_t1, F.col("event_type")), ignorenulls=True).over(
                w_old
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        states.select(
            F.coalesce(F.col("old_state"), F.lit("<absent>")).alias("old_state"),
            F.col("event_type").alias("new_state"),
        )
        .groupBy("old_state", "new_state")
        .agg(F.count("*").alias("n_users"))
        .orderBy("old_state", "new_state")
    )


FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "q156_referential_integrity_audit",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{child}.{ck}->{parent}.{pk}' AS fk_edge,
           CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS child_rows,
           CAST((SELECT COUNT(*) FROM {child}
                 WHERE {ck} NOT IN (SELECT {pk} FROM {parent})) AS BIGINT)
             AS orphan_rows
    """
        for child, ck, parent, pk in FK_EDGES
    )
    + "\nORDER BY fk_edge",
)
def q156_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan counts for every FK edge of the star schema, one row per
    edge.  Child keys are NEVER null in this schema, so NOT IN and
    left-join-null agree; each parent key set is distinct-projected and
    broadcast (dims are small; orders' key set at 100 TB would switch to
    a shuffled anti-join automatically once it exceeds the broadcast
    threshold).

    Single-scan shape: each CHILD table is read exactly once — all its
    FK edges resolve as broadcast left joins on one key-column
    projection, and count(*) + per-edge orphan flags come out of ONE
    conditional aggregate, exploded into per-edge rows.  The naive
    per-edge formulation reads lineitem six times (count + anti-join ×
    3 edges); at 100 TB the fact-table scans dominate, so collapsing
    them is a 3-6× win on the big tables."""
    tables = {
        name: load_table(spark, sf_dir, name)
        for name in {t for e in FK_EDGES for t in (e[0], e[2])}
    }
    parent_keys = {
        parent: tables[parent].select(pk).distinct()
        for _, _, parent, pk in FK_EDGES
    }
    edges_by_child: dict[str, list[tuple[str, str, str]]] = {}
    for child, ck, parent, pk in FK_EDGES:
        edges_by_child.setdefault(child, []).append((ck, parent, pk))

    legs = []
    for child, edges in edges_by_child.items():
        cur = tables[child].select(*sorted({ck for ck, _, _ in edges}))
        probes = []
        for i, (ck, parent, pk) in enumerate(edges):
            probe = f"__pk_{i}"
            cur = cur.join(
                F.broadcast(parent_keys[parent].select(F.col(pk).alias(probe))),
                F.col(ck) == F.col(probe),
                "left",
            )
            probes.append((ck, parent, pk, probe))
        row = cur.agg(
            F.count("*").alias("child_rows"),
            *[
                F.coalesce(
                    F.sum(F.col(probe).isNull().cast("long")), F.lit(0)
                ).alias(f"__orphans_{i}")
                for i, (_, _, _, probe) in enumerate(probes)
            ],
        )
        per_edge = F.array(
            *[
                F.struct(
                    F.lit(f"{child}.{ck}->{parent}.{pk}").alias("fk_edge"),
                    F.col("child_rows").alias("child_rows"),
                    F.col(f"__orphans_{i}").alias("orphan_rows"),
                )
                for i, (ck, parent, pk, _) in enumerate(probes)
            ]
        )
        legs.append(row.select(F.explode(per_edge).alias("e")).select("e.*"))
    return reduce(DataFrame.unionByName, legs).orderBy("fk_edge")
