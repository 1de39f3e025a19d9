#!/usr/bin/env python3
"""Where does the TRAFFIC sink's time go? compute vs parquet-encode vs
codegen-compile. Usage: python tools/probe_sink2.py CORES"""
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

cores = int(sys.argv[1])
pages_path = os.path.join(ROOT, ".fixtures", "bench_pages_n200000.parquet")

from pyspark.sql import functions as F  # noqa: E402
from logparse_rs_spark.anonymizer import load_anonymizer  # noqa: E402
from logparse_rs_spark.operators.parse import (  # noqa: E402
    explode_lines, parse_lines, project_type)
from logparse_rs_spark.plans.pipeline import with_bucket  # noqa: E402
from logparse_rs_spark.schema import load_schema  # noqa: E402
from logparse_rs_spark.session import get_spark  # noqa: E402
from logparse_rs_spark.sources.writers import ParquetWriter  # noqa: E402

spark = get_spark("probe-sink2", cores=cores, shuffle_partitions=64)
schema = load_schema(os.path.join(ROOT, "schemas", "schema.json"))
anon = load_anonymizer(os.path.join(ROOT, "configs", "anonymizer.sample.json"))
out_root = "/dev/shm/probe_sink2"
shutil.rmtree(out_root, ignore_errors=True)
writer = ParquetWriter(out_root)

pages = spark.read.parquet(pages_path)
bucketed = with_bucket(pages, 64).repartition(64, "bucket")
parsed_plan = parse_lines(explode_lines(bucketed, keep_cols=("lang", "bucket")), schema)
t0 = time.perf_counter()
writer.write(parsed_plan, "_parsed_stage", partition_by=["log_type"],
             overwrite_mode="static")
print(f"stage_write {time.perf_counter()-t0:.1f}s", flush=True)
parsed = writer.read(spark, "_parsed_stage")


def t(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s", flush=True)


def proj():
    return project_type(parsed, schema, "TRAFFIC", anon=anon,
                        extra_cols=("bucket",)).repartition(64, "bucket")


def proj_noanon():
    return project_type(parsed, schema, "TRAFFIC", anon=None,
                        extra_cols=("bucket",)).repartition(64, "bucket")


t("noop write (compute only, anon)", lambda: proj()
  .write.format("noop").mode("overwrite").save())
t("noop write AGAIN (codegen cached)", lambda: proj()
  .write.format("noop").mode("overwrite").save())
t("noop write no-anon", lambda: proj_noanon()
  .write.format("noop").mode("overwrite").save())
t("parquet write 1", lambda: writer.write(proj(), "t1", partition_by=["bucket"]))
t("parquet write 2 (same plan)", lambda: writer.write(proj(), "t1", partition_by=["bucket"]))
t("parquet write no-anon", lambda: writer.write(proj_noanon(), "t2", partition_by=["bucket"]))
t("scan only (count lines)", lambda: parsed.filter(
    (F.col("status") == "ok") & (F.col("log_type") == "TRAFFIC")).count())
shutil.rmtree(out_root, ignore_errors=True)
