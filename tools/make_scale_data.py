"""Synthesize the third bench-slope point: a deterministic ~10× explode
of /root/testdata/sf0.1 (VERDICT r11 item 6).

The 100 TB claims otherwise rest on plan shapes plus a 2-point slope
guard; this adds a third point (~sf1: 6M lineitem rows) so super-linear
blow-ups that hide between sf0.01 and sf0.1 surface before a cluster
does.  Written INSIDE the repo (.scaledata/, gitignored) because
/root/testdata is read-only.

Construction (all JVM expressions, one scan + one write per table, no
randomness — rerunning produces byte-stable content):

* 10 disjoint key-shifted copies: copy ``k`` shifts every key column by
  ``k * (max_key + 1)``, preserving ALL join structure (each copy is a
  self-contained TPC-H universe over the shared region/nation dims) and
  per-key group sizes (windows, sessions, per-user series stay constant
  size — scaling is in the number of groups, the 100 TB direction).
* ``documents.text``: every token gets the copy index appended
  (regexp_replace, JVM-side) so copies are NOT near-duplicates of each
  other — exploding verbatim would give every doc 9 MinHash twins and
  inflate LSH pair counts ~45× for 10× data, a quadratic artifact of the
  DATA, not the plan.  Within-copy dup structure is preserved (the
  rewrite is injective per copy), so dedup workloads scale exactly 10×.
* ``region``/``nation`` stay verbatim (fixed dims, like TPC-H).

Usage::

    python tools/make_scale_data.py          # build if absent/stale
    python tools/make_scale_data.py --force  # rebuild
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOURCE = "/root/testdata/sf0.1"
#: dir basename must parse as bench.py's ``sf`` (strips the "sf" prefix)
SCALE_DIR = os.path.join(REPO, ".scaledata", "sf1.0")
COPIES = 10
MARKER = "_SCALE_MANIFEST.json"
#: bump to invalidate previously built scale dirs when the construction
#: changes (2 = r16 l_suppkey decorrelation; 3 = r17 multi-file layout —
#: every table wrote ONE parquet row group, so every sf1 scan stage ran
#: as one task regardless of core count, serializing the scale audit's
#: scan+fused work and flattening the 8-vs-32-core ratios the driver
#: probes.  Row VALUES are unchanged: the same frame is hash-
#: repartitioned on its leading key before the write, guide §6 file
#: layout / §2.5 unsplittable-input.  4 = multi-file restricted to the
#: tables that actually cross io/readers' repair byte threshold: v3
#: also split the ~1 MB embeddings table, which changed MLlib BRP's
#: approxQuantile-based candidate threshold — approxQuantile merges
#: per-partition summaries, so its estimate is partitioning-sensitive —
#: and dropped q177's probe recall below its 0.8 band at sf1; small
#: tables keep the single-file layout their consumers were audited on)
CONSTRUCTION_VERSION = 4

#: output files per big table (≥ the audit hosts' parallelism/2 so the
#: row-group-starved repartition repair in io/readers never fires on
#: scale data); small tables — everything below the repair threshold,
#: notably embeddings/customer — stay single-file.
N_OUTPUT_FILES = 16
MULTI_FILE_TABLES = {"orders", "lineitem", "events", "documents"}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: key columns shifted per copy, as {table: {column: shift_unit_source}}
#: where the unit source names the (table, column) whose max defines the
#: shift stride — referenced columns shift by the SAME stride everywhere
#: so foreign keys stay consistent across tables.
KEY_UNITS = {
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("events", "event_id"),
    ("events", "user_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
}

SHIFTS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}


def build(spark, source: str = SOURCE, out_dir: str = SCALE_DIR) -> dict:
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.io.readers import load_table

    units: dict[tuple[str, str], int] = {}
    for table, col in sorted(KEY_UNITS):
        units[(table, col)] = int(
            load_table(spark, source, table).agg(F.max(col)).head()[0]
        ) + 1

    os.makedirs(out_dir, exist_ok=True)
    manifest: dict = {
        "source": source,
        "copies": COPIES,
        "construction": CONSTRUCTION_VERSION,
        "tables": {},
    }
    for table in TABLES:
        src = load_table(spark, source, table)
        dtypes = dict(src.dtypes)
        if table in ("region", "nation"):
            out = src
        else:
            exploded = src.withColumn(
                "_copy", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
            )
            cols = []
            for name in src.columns:
                c = F.col(name)
                unit_ref = SHIFTS.get(table, {}).get(name)
                if table == "lineitem" and name == "l_suppkey":
                    # Decorrelate the z-order dimensions (VERDICT r15
                    # item 5): shifting l_suppkey by the SAME copy index
                    # as l_partkey correlates the two block-wise, so a
                    # linear sort on l_partkey incidentally prunes
                    # l_suppkey ranges and q207's layout verdict is
                    # meaningless at sf1.  A deterministic per-row
                    # pseudo-copy (xxhash64) spreads each copy's
                    # lineitems uniformly over ALL copies' suppliers —
                    # every shifted suppkey still exists in the exploded
                    # supplier table (FK valid), per-supplier group
                    # sizes stay ~constant, and the rewrite is
                    # deterministic.  Only the lineitem→supplier edge
                    # crosses copies; every other FK stays within-copy.
                    pseudo = F.pmod(
                        F.xxhash64(
                            F.col("l_orderkey"),
                            F.col("l_linenumber"),
                            F.col("_copy"),
                        ),
                        F.lit(COPIES),
                    )
                    c = (c + pseudo * F.lit(units[unit_ref])).cast(
                        dtypes[name]
                    )
                elif unit_ref is not None:
                    c = (
                        c + F.col("_copy") * F.lit(units[unit_ref])
                    ).cast(dtypes[name])
                elif table == "documents" and name == "text":
                    # token-suffix rewrite: copy 0 keeps the original,
                    # copies 1..9 append the copy index to EVERY token so
                    # cross-copy Jaccard collapses to ~0 (see module doc)
                    c = F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                        F.regexp_replace(
                            F.col("text"),
                            r"(\S+)",
                            F.concat(F.lit("$1"), F.col("_copy").cast("string")),
                        )
                    )
                cols.append(c.alias(name))
            out = exploded.select(*cols)
            if table == "documents":
                out = out.withColumn("n_chars", F.length("text"))
        path = os.path.join(out_dir, f"{table}.parquet")
        if table in MULTI_FILE_TABLES:
            # deterministic hash split on the leading (PK-ish) column:
            # identical rows, a real multi-file/multi-row-group layout
            out = out.repartition(N_OUTPUT_FILES, F.col(out.columns[0]))
        out.write.mode("overwrite").parquet(path)
        manifest["tables"][table] = spark.read.parquet(path).count()
    with open(os.path.join(out_dir, MARKER), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def is_fresh(out_dir: str = SCALE_DIR) -> bool:
    marker = os.path.join(out_dir, MARKER)
    if not os.path.exists(marker):
        return False
    try:
        m = json.load(open(marker))
    except (json.JSONDecodeError, OSError):
        return False
    return (
        m.get("copies") == COPIES
        and m.get("construction") == CONSTRUCTION_VERSION
        and set(m.get("tables", {})) == set(TABLES)
        and all(
            os.path.exists(os.path.join(out_dir, f"{t}.parquet"))
            for t in TABLES
        )
    )


def ensure(spark=None, out_dir: str = SCALE_DIR) -> str:
    """Build the scale dataset if absent/stale; return its path."""
    if is_fresh(out_dir):
        return out_dir
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    own_session = spark is None
    if own_session:
        sys.path.insert(0, REPO)
        from pyspark_anomaly_detection_spark.session import get_spark_session

        spark = get_spark_session("make_scale_data")
        spark.sparkContext.setLogLevel("ERROR")
    m = build(spark, out_dir=out_dir)
    print(
        f"make_scale_data: built {out_dir}: "
        + ", ".join(f"{t}={n}" for t, n in sorted(m["tables"].items())),
        file=sys.stderr,
    )
    return out_dir


if __name__ == "__main__":
    if "--force" in sys.argv and os.path.exists(SCALE_DIR):
        shutil.rmtree(SCALE_DIR)
    ensure()
    print(SCALE_DIR)
