"""Scale-technique tests: salted aggregation under synthetic skew, and
bucketed co-located joins eliminating the join shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_internal_spark.operators.skew import (
    salted_agg,
    salted_broadcast_left_join,
    salted_counts,
)
from pulsar_internal_spark.sources.sinks import write_bucketed


def _skewed_df(spark):
    # 90% of rows share one hot key
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("key"),
        (F.col("id") % 7).alias("v"),
    )


def test_salted_counts_match_plain(spark):
    df = _skewed_df(spark)
    plain = {r.key: r.cnt for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r.key: r.cnt for r in salted_counts(df, ["key"], salt_buckets=8).collect()}
    assert salted == plain


def test_salted_agg_sum_min_max(spark):
    df = _skewed_df(spark)
    plain = {
        r.key: (r.s, r.mn, r.mx)
        for r in df.groupBy("key")
        .agg(F.sum("v").alias("s"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    out = {
        r.key: (r.s, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["key"],
            aggs={"s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
            salt_buckets=8,
        ).collect()
    }
    assert out == plain


def test_salted_agg_spreads_hot_key(spark):
    """The stage-1 partials for the hot key must actually land in
    multiple salt groups — otherwise the operator is a no-op."""
    df = _skewed_df(spark).withColumn(
        "_salt", (F.rand(seed=42) * 8).cast("int")
    )
    n_groups = (
        df.filter(F.col("key") == "HOT").select("_salt").distinct().count()
    )
    assert n_groups >= 4


def test_broadcast_join_avoids_big_side_shuffle(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame([("HOT", 1), ("k1", 2)], ["key", "tag"])
    out = salted_broadcast_left_join(big, dim, "key")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # big side never shuffles
    assert out.count() == big.filter(F.col("key").isin("HOT", "k1")).count()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # managed tables land in the session warehouse (static conf). A
    # fresh in-memory catalog can inherit ORPHANED files from a previous
    # test session (DROP IF EXISTS no-ops, files block the write), so
    # clear both catalog entries and leftover directories first.
    import shutil

    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    write_bucketed(a, "bkt_a", ["k"], num_buckets=8)
    write_bucketed(b, "bkt_b", ["k"], num_buckets=8)
    # test tables are tiny, so disable auto-broadcast to force the
    # shuffle-join path the bucketing exists to optimize
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan  # co-located
        assert "Bucketed: true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_partitioned_write_prunes_at_read(spark, tmp_path):
    """write_table(partition_by=...) must yield reads where a partition
    predicate prunes directories (PartitionFilters), not data filters."""
    from pulsar_internal_spark.sources.sinks import write_table

    df = spark.range(0, 1000).selectExpr("id", "id % 4 AS shard")
    out = write_table(df, "parts", str(tmp_path), partition_by=["shard"])
    read = spark.read.parquet(out).filter(F.col("shard") == 2)
    read.collect()
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "shard" in plan.split("PartitionFilters")[1][:120], plan
    assert read.count() == 250
