"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes one
callable per implemented operator (SURVEY.md §2); ``oracle_sql()`` gives the
DuckDB-equivalent SQL. Log-pipeline queries run over the deterministic
synthetic pages fixture (FIXTURES.md §1), materialized idempotently under
``.fixtures/`` together with an expected-output parquet produced by the
pure-Python canonical reference implementation — the oracle SQL reads that
expected parquet via read_parquet(), so the DuckDB side is genuinely
independent of the Spark execution path.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

ROOT = os.path.dirname(os.path.abspath(__file__))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

FIXTURE_ROOT = os.path.join(ROOT, ".fixtures")
# pages-fixture size per driver scale factor (sf0.01 is the correctness gate)
SF_PAGES = {"sf0.001": 120, "sf0.01": 1000, "sf0.1": 12000}
ORACLE_SF = "sf0.01"

DIMS = ["source_address", "destination_address", "rule_name", "source_user",
        "application", "action", "device_name"]


def _sf_tag(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base if base in SF_PAGES else ORACLE_SF


def _fixture_paths(sf_dir: str):
    from logparse_rs_spark.fixtures import ensure_fixture_pair

    n_pages = SF_PAGES[_sf_tag(sf_dir)]
    return ensure_fixture_pair(FIXTURE_ROOT, n_pages, anonymized=True)


def _load(spark_or_none=None):
    from logparse_rs_spark.anonymizer import load_anonymizer
    from logparse_rs_spark.schema import load_schema

    schema = load_schema(os.path.join(ROOT, "schemas", "schema.json"))
    anon = load_anonymizer(os.path.join(ROOT, "configs", "anonymizer.sample.json"))
    return schema, anon


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logparse_rs_spark.operators.parse import parse_pages

    schema, _ = _load()
    pages_path, _ = _fixture_paths(sf_dir)
    pages = spark.read.parquet(pages_path)
    return parse_pages(pages, schema)


def _traffic(spark: SparkSession, sf_dir: str, anonymized: bool = False) -> DataFrame:
    from logparse_rs_spark.operators.parse import parse_pages, project_type

    schema, anon = _load()
    pages_path, _ = _fixture_paths(sf_dir)
    pages = spark.read.parquet(pages_path)
    parsed = parse_pages(pages, schema)
    return project_type(parsed, schema, "TRAFFIC", columns=DIMS,
                        anon=anon if anonymized else None)


def _expected_path_for_oracle() -> str:
    _, expected = _fixture_paths(ORACLE_SF)
    return expected


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: routed-row counts by log type over the sf0.001 pages fixture
    (the reference report's G2 aggregate, pan_dynamic_parser.py:1087)."""
    from logparse_rs_spark.operators.aggregates import count_by_log_type

    return count_by_log_type(_parsed(spark, "sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyspark.sql import functions as F

    def log_route_counts(spark, sf_dir):
        from logparse_rs_spark.operators.aggregates import count_by_log_type
        return count_by_log_type(_parsed(spark, sf_dir))

    def log_status_counts(spark, sf_dir):
        return (_parsed(spark, sf_dir)
                .groupBy("status").agg(F.count("*").alias("n")))

    def log_action_counts(spark, sf_dir):
        from logparse_rs_spark.operators.aggregates import count_by
        return count_by(_traffic(spark, sf_dir), "action")

    def log_top10_sources_anon(spark, sf_dir):
        from logparse_rs_spark.operators.aggregates import top_k
        df = _traffic(spark, sf_dir, anonymized=True)
        return top_k(df, "source_address", 10)

    def log_top10_applications(spark, sf_dir):
        from logparse_rs_spark.operators.aggregates import top_k
        return top_k(_traffic(spark, sf_dir), "application", 10)

    def log_url_hash_xor(spark, sf_dir):
        # byte-identity evidence at aggregate level: per-url XOR of all ok
        # line hashes + line count (order-insensitive, overflow-free)
        parsed = _parsed(spark, sf_dir)
        return (parsed.filter("status = 'ok'")
                .groupBy("url")
                .agg(F.count("*").alias("n_ok"),
                     F.expr("bit_xor(hash64)").alias("hash_xor")))

    def log_first_sample_per_type(spark, sf_dir):
        from logparse_rs_spark.operators.aggregates import first_sample_per_type
        return first_sample_per_type(_parsed(spark, sf_dir)) \
            .select("log_type", "url", "line_ordinal", "hash64")

    def log_integrity_table(spark, sf_dir):
        from logparse_rs_spark.operators.anonymize import audit_table
        from logparse_rs_spark.operators.parse import parse_pages, project_type
        schema, anon = _load()
        pages_path, _ = _fixture_paths(sf_dir)
        parsed = parse_pages(spark.read.parquet(pages_path), schema)
        pre = project_type(parsed, schema, "TRAFFIC", columns=DIMS)
        return audit_table(pre, anon, DIMS)

    return {
        "log_route_counts": log_route_counts,
        "log_status_counts": log_status_counts,
        "log_action_counts": log_action_counts,
        "log_top10_sources_anon": log_top10_sources_anon,
        "log_top10_applications": log_top10_applications,
        "log_url_hash_xor": log_url_hash_xor,
        "log_first_sample_per_type": log_first_sample_per_type,
        "log_integrity_table": log_integrity_table,
    }


def oracle_sql() -> dict[str, str]:
    exp = _expected_path_for_oracle()
    E = f"read_parquet('{exp}')"
    # only the fields the sample anonymizer config actively transforms appear
    # in the integrity table (rule_name/source_user are NOT matched by the
    # config's 'rule'/'user' keys -> passthrough, never recorded)
    integrity_union = " UNION ALL ".join(
        f"SELECT '{d}' AS field, {d} AS original, {d}_anon AS replacement "
        f"FROM {E} WHERE status='ok' AND log_type='TRAFFIC' AND {d} IS NOT NULL"
        for d in ["source_address", "destination_address", "device_name"]
    )
    return {
        "log_route_counts": f"""
            SELECT log_type, COUNT(*) AS n FROM {E}
            WHERE status = 'ok' GROUP BY log_type
            ORDER BY n DESC, log_type ASC
        """,
        "log_status_counts": f"""
            SELECT status, COUNT(*) AS n FROM {E} GROUP BY status
        """,
        "log_action_counts": f"""
            SELECT action, COUNT(*) AS n FROM {E}
            WHERE status = 'ok' AND log_type = 'TRAFFIC' AND action IS NOT NULL
            GROUP BY action ORDER BY n DESC, action ASC
        """,
        "log_top10_sources_anon": f"""
            SELECT source_address_anon AS source_address, COUNT(*) AS n
            FROM {E}
            WHERE status = 'ok' AND log_type = 'TRAFFIC'
              AND source_address_anon IS NOT NULL
            GROUP BY 1 ORDER BY n DESC, source_address ASC LIMIT 10
        """,
        "log_top10_applications": f"""
            SELECT application, COUNT(*) AS n FROM {E}
            WHERE status = 'ok' AND log_type = 'TRAFFIC'
              AND application IS NOT NULL
            GROUP BY 1 ORDER BY n DESC, application ASC LIMIT 10
        """,
        "log_url_hash_xor": f"""
            SELECT url, COUNT(*) AS n_ok, BIT_XOR(hash64) AS hash_xor
            FROM {E} WHERE status = 'ok' GROUP BY url
        """,
        "log_first_sample_per_type": f"""
            SELECT log_type, url, line_ordinal, hash64 FROM (
              SELECT log_type, url, line_ordinal, hash64,
                     ROW_NUMBER() OVER (PARTITION BY log_type
                                        ORDER BY url, line_ordinal) AS rn
              FROM {E} WHERE status = 'ok'
            ) WHERE rn = 1
        """,
        "log_integrity_table": f"""
            SELECT DISTINCT field, original, replacement FROM (
              {integrity_union}
            )
        """,
    }
