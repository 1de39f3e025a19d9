"""Physical-plan regression tests: the plan properties the 100 TB design
depends on, pinned so refactors can't silently regress them.

Each assertion reads the executed/spark plan string — the same evidence a
human gets from .explain("formatted").
"""

import os

import pytest
from pyspark.sql import functions as F

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as e
    return e


class TestParsePlans:
    def test_single_python_crossing(self, spark, entrymod):
        """All three parse UDFs (line/hash/qfields) fold into ONE
        ArrowEvalPython stage; a second stage would double the Python
        crossing cost on 10^12 rows."""
        df = entrymod.queries()["log_route_counts"](spark, SF)
        assert plan_of(df).count("ArrowEvalPython") == 1

    def test_hash_udf_pruned_when_unused(self, spark):
        """A query that never reads hash64 must not pay for the hash UDF."""
        from logparse_rs_spark.operators.parse import parse_pages
        from logparse_rs_spark.schema import load_schema
        schema = load_schema(os.path.join(ROOT, "schemas", "schema.json"))
        pages = spark.createDataFrame(
            [("u", "a,b,c,SYSTEM,x", "en")], "url string, text string, lang string")
        df = parse_pages(pages, schema).groupBy("log_type").count()
        assert "_hash64_of" not in plan_of(df)


class TestJoinPlans:
    def test_small_dims_broadcast(self, spark, entrymod):
        plan = plan_of(entrymod.queries()["tpch_q3ish"](spark, SF))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_topk_uses_take_ordered(self, spark, entrymod):
        """top-k must plan as TakeOrderedAndProject (partial top-k per
        partition), never a global sort."""
        plan = plan_of(entrymod.queries()["events_top_users"](spark, SF))
        assert "TakeOrderedAndProject" in plan


class TestShufflePlans:
    def test_exact_dedup_single_exchange(self, spark, entrymod):
        """Dedup shuffles once, on the 8-byte hash key — never the text."""
        plan = plan_of(entrymod.queries()["doc_exact_dedup"](spark, SF))
        assert plan.count("Exchange") == 1

    def test_scan_prunes_columns(self, spark, entrymod):
        """events aggregation reads only the 3 columns it needs."""
        df = entrymod.queries()["events_value_quantiles"](spark, SF)
        scan = [l for l in plan_of(df).splitlines() if "FileScan" in l]
        assert scan and "user_id" not in scan[0]

    def test_filter_pushdown_reaches_scan(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        df = li.filter(F.col("l_quantity") > 30).select("l_orderkey")
        assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30" \
            in plan_of(df).replace("30.0", "30")


class TestParsedCache:
    def test_cached_parse_identical_results(self, spark, entrymod):
        """_parsed memoizes per (session, fixture); the cached frame must be
        the same plan (one persist) and produce identical aggregates."""
        a = entrymod.queries()["log_status_counts"](spark, SF)
        b = entrymod.queries()["log_status_counts"](spark, SF)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        from __spark_entry__ import _PARSED_CACHE
        assert any(spark.sparkContext.applicationId == k[0]
                   for k in _PARSED_CACHE)


class TestRound3Plans:
    def test_contamination_broadcasts_eval_side(self, spark, entrymod):
        """The corpus side must NOT shuffle: eval shingles broadcast,
        train side stays a map-side hash probe over the scan."""
        plan = plan_of(entrymod.queries()["doc_contamination"](spark, SF))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_q5_bounded_dims_broadcast_facts_not(self, spark, entrymod):
        """supplier/nation/region broadcast; customer (O(SF)) must not
        carry a forced broadcast at scale — it may still be planned as a
        broadcast at sf0.01 size by AQE, so assert only the hint side:
        no CartesianProduct, >=3 broadcast joins for the bounded dims."""
        plan = plan_of(entrymod.queries()["tpch_q5ish"](spark, SF))
        assert plan.count("BroadcastHashJoin") >= 3
        assert "CartesianProduct" not in plan

    def test_pii_scrub_stays_in_codegen(self, spark, entrymod):
        plan = plan_of(entrymod.queries()["log_pii_scrub"](spark, SF))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_vocab_top_uses_take_ordered_and_partial_agg(self, spark,
                                                         entrymod):
        plan = plan_of(entrymod.queries()["doc_vocab_top25"](spark, SF))
        assert "TakeOrderedAndProject" in plan
        assert "partial_count" in plan or "HashAggregate" in plan
