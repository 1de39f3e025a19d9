"""Timezone-proofness of the driver-contract time queries.

The round-3 driver gate flagged a hash mismatch on events_running_total
that no local replica could reproduce — the only plausible divergence was
engine-side timestamp normalization in a different session environment.
Every time-touching query was since rebuilt on timezone-independent
surfaces (epoch-micros BIGINT via NTZ timestampdiff, integer-microsecond
gap arithmetic, gap-relative session windows). This suite re-runs them
against the DuckDB oracles under a DELIBERATELY hostile session timezone
(DST-observing, non-UTC) and requires the same value hash.
"""

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.01"
TIME_QUERIES = [
    "events_running_total",
    "events_asof_join",
    "events_sessionization",
    "events_streaming_sessions",
    "events_5min_windows",
    "events_top_users",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ["events", "documents", "embeddings"]:
        p = os.path.join(SF, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("qname", TIME_QUERIES)
def test_time_query_hash_stable_under_hostile_timezone(spark, oracle_con,
                                                       qname):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from tools.check_oracle import value_hash

    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    spark.conf.set(key, "America/New_York")
    try:
        sdf = entrymod.queries()[qname](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
    finally:
        spark.conf.set(key, prev)
    res = oracle_con.execute(entrymod.oracle_sql()[qname])
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert len(srows) == len(drows)
    assert sorted(scols) == sorted(dcols)
    assert value_hash(srows, scols) == value_hash(drows, dcols), qname
