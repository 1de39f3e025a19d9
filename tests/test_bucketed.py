"""Bucketed-table co-located join: the equi-join between two tables bucketed
on the same key/count must plan WITHOUT a shuffle Exchange."""

import pytest
from pyspark.sql import functions as F

from logparse_rs_spark.sources.bucketed import (bucketed_join,
                                                plan_has_shuffle,
                                                write_bucketed)


@pytest.fixture(scope="module", autouse=True)
def no_broadcast(spark):
    """Force SortMergeJoin so the Exchange assertions test bucketing, not
    the broadcast planner (tables here are tiny)."""
    keys = ["spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v_l"))
    right = spark.range(0, 10_000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("v_r"))
    write_bucketed(left, "t_bleft", ["k"], 8)
    write_bucketed(right, "t_bright", ["k"], 8)
    yield "t_bleft", "t_bright"
    spark.sql("DROP TABLE IF EXISTS t_bleft")
    spark.sql("DROP TABLE IF EXISTS t_bright")


class TestBucketedJoin:
    def test_join_is_shuffle_free(self, spark, bucketed_pair):
        lt, rt = bucketed_pair
        joined = bucketed_join(spark, lt, rt, ["k"])
        assert not plan_has_shuffle(joined), \
            joined._jdf.queryExecution().executedPlan().toString()

    def test_join_results_correct(self, spark, bucketed_pair):
        lt, rt = bucketed_pair
        joined = bucketed_join(spark, lt, rt, ["k"])
        assert joined.count() == len(range(0, 10_000, 3))
        row = joined.filter("k = 9").first()
        assert row["v_l"] == 18 and row["v_r"] == 16

    def test_unbucketed_join_shuffles(self, spark):
        # control: the same join over plain DataFrames DOES shuffle
        a = spark.range(0, 1000).select(F.col("id").alias("k"))
        b = spark.range(0, 1000).select(F.col("id").alias("k"))
        j = a.join(b, ["k"]).filter("k >= 0")
        j.count()
        assert plan_has_shuffle(j)
