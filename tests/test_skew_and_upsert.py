"""Salted-join equivalence and dynamic partition overwrite semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.io.writers import overwrite_partitions
from pyspark_anomaly_detection_spark.relational.skew import salted_join


def _agg(df):
    return {
        r.c_mktsegment: (r.n, r.total)
        for r in df.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    }


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    plain = _agg(orders.join(cust, orders["o_custkey"] == cust["c_custkey"]))
    salted = _agg(salted_join(orders, cust, "o_custkey", "c_custkey"))
    assert salted == plain


def test_salted_join_spreads_keys(spark, sf_dir):
    """Every salt value must actually receive fact rows (uniform spread)."""
    orders = load_table(spark, sf_dir, "orders")
    salts = (
        orders.withColumn(
            "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(8))
        )
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(salts) == 8
    counts = [r["count"] for r in salts]
    assert min(counts) > 0.5 * (sum(counts) / len(counts))


def test_partitioned_layout_prunes_at_read(spark, sf_dir, tmp_path):
    """A date predicate on a hive-partitioned layout must become a
    PartitionFilter (directories skipped), not a row filter."""
    out = str(tmp_path / "events_pruned")
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    overwrite_partitions(ev, out, ["day"])
    one_day = ev.agg(F.min(F.to_date("ts"))).collect()[0][0]
    plan = (
        spark.read.parquet(out)
        .filter(F.col("day") == F.lit(one_day))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "day" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0], plan


def test_overwrite_partitions_touches_only_present_partitions(
    spark, sf_dir, tmp_path
):
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    overwrite_partitions(ev, out, ["day"])
    before = spark.read.parquet(out)
    n_before = before.count()
    n_days = before.select("day").distinct().count()
    assert n_days > 1

    # Rewrite ONE day with a modified value; other partitions must survive.
    one_day = ev.agg(F.min(F.to_date("ts"))).collect()[0][0]
    patch = ev.filter(F.col("day") == F.lit(one_day)).withColumn(
        "value", F.lit(0.0)
    )
    n_patch = patch.count()
    overwrite_partitions(patch, out, ["day"])

    after = spark.read.parquet(out)
    assert after.count() == n_before  # nothing lost
    assert (
        after.filter(F.col("day") == F.lit(one_day))
        .agg(F.sum(F.abs("value")))
        .collect()[0][0]
        == 0.0
    )
    # untouched partitions keep their original values
    untouched_sum = (
        after.filter(F.col("day") != F.lit(one_day))
        .agg(F.sum(F.abs("value")))
        .collect()[0][0]
    )
    assert untouched_sum and untouched_sum > 0
    assert after.filter(F.col("day") == F.lit(one_day)).count() == n_patch
