"""Pre-join pruning: the semi prefilter must preserve the downstream join
result exactly while dropping the non-matching fact fraction early."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.relational.analytics_extra import semi_prefilter


def _selective_keys(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450_000)
        .select("o_orderkey")
    )


def test_semi_prefilter_preserves_join_result(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    keys = _selective_keys(spark, sf_dir)
    plain = (
        li.join(keys, li["l_orderkey"] == keys["o_orderkey"])
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .collect()[0]
    )
    pruned_fact = semi_prefilter(li, keys, "l_orderkey", "o_orderkey")
    pre = (
        pruned_fact.join(keys, pruned_fact["l_orderkey"] == keys["o_orderkey"])
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .collect()[0]
    )
    assert (plain.n, plain.q) == (pre.n, pre.q)


def test_semi_prefilter_actually_prunes(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    keys = _selective_keys(spark, sf_dir)
    assert keys.count() > 0, "fixture needs at least one selective key"
    total = li.count()
    kept = semi_prefilter(li, keys, "l_orderkey", "o_orderkey").count()
    assert kept < 0.5 * total, (kept, total)


def test_runtime_bloom_filter_conf_enabled(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
