"""Row parity of the Arrow-path collect() wrapper (_ArrowCollectFrame)
against the stock pickled-row path — the wrapper must be invisible to any
consumer of a declared query's rows."""

import datetime

import pytest

from pyspark.sql import Row, functions as F

import __spark_entry__ as entrymod


def _wrap(df):
    return entrymod._ArrowCollectFrame(df._jdf, df.sparkSession)


def _assert_row_parity(df):
    fast = _wrap(df).collect()
    slow = df.collect()
    assert fast == slow
    assert [type(v) for r in fast for v in r] \
        == [type(v) for r in slow for v in r]
    for rf, rs in zip(fast, slow):
        assert rf.asDict() == rs.asDict()
        assert rf.__fields__ == rs.__fields__


def test_atoms_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, True, None), (2, None, None, None, 7)],
        "l long, s string, d double, b boolean, i long")
    _assert_row_parity(df)


def test_int_float_widths(spark):
    df = spark.range(3).select(
        F.col("id").cast("int").alias("i"),
        F.col("id").cast("short").alias("sh"),
        F.col("id").cast("byte").alias("by"),
        (F.col("id") / 3).cast("float").alias("f"))
    _assert_row_parity(df)


def test_arrays(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3], ["x", None]), (2, [], None)],
        "id long, xs array<long>, ss array<string>")
    _assert_row_parity(df)


def test_empty_result(spark):
    df = spark.range(5).filter("id < 0")
    assert _wrap(df).collect() == []


def test_timestamp_falls_back(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 12, 0, 0))], "id long, ts timestamp")
    wrapped = _wrap(df)
    assert not entrymod._arrow_collect_safe(df.schema["ts"].dataType)
    assert wrapped.collect() == df.collect()


def test_wrapper_is_transparent_dataframe(spark):
    df = _wrap(spark.range(10))
    # the wrapper must stay a full DataFrame for every other consumer
    assert df.count() == 10
    assert df.schema.fieldNames() == ["id"]
    assert df.filter("id < 3").count() == 3


def test_large_roundtrip_matches(spark):
    df = spark.range(100_000).select(
        F.col("id").alias("id_a"),
        (F.col("id") * 7 % 1000).alias("id_b"))
    fast = _wrap(df).collect()
    slow = df.collect()
    assert fast == slow


@pytest.mark.parametrize("name", ["doc_exact_dedup", "events_top_users"])
def test_declared_queries_are_wrapped(spark, name):
    qs = entrymod.queries()
    df = qs[name](spark, "/root/testdata/sf0.001")
    assert isinstance(df, entrymod._ArrowCollectFrame)
    rows = df.collect()
    assert rows and isinstance(rows[0], Row)
