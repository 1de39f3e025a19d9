#!/usr/bin/env python3
"""Where does the map-sink job's time go: compute vs the 512-dir
(log_type x bucket) commit? Usage: python tools/probe_map_sink.py [CORES]"""
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8

from logparse_rs_spark.anonymizer import load_anonymizer  # noqa: E402
from logparse_rs_spark.operators.parse import explode_lines, parse_lines  # noqa: E402
from logparse_rs_spark.plans.pipeline import (build_map_payload,  # noqa: E402
                                              default_sinks, with_bucket)
from logparse_rs_spark.schema import load_schema  # noqa: E402
from logparse_rs_spark.session import get_spark  # noqa: E402
from logparse_rs_spark.sources.writers import ParquetWriter  # noqa: E402

spark = get_spark("probe-map", cores=cores, shuffle_partitions=64)
schema = load_schema(os.path.join(ROOT, "schemas", "schema.json"))
anon = load_anonymizer(os.path.join(ROOT, "configs", "anonymizer.sample.json"))
out_root = os.environ.get("PROBE_OUT", "/tmp/probe_map")
shutil.rmtree(out_root, ignore_errors=True)
writer = ParquetWriter(out_root)

pages = spark.read.parquet(
    os.path.join(ROOT, ".fixtures", "bench_pages_n200000.parquet"))
bucketed = with_bucket(pages, 64).repartition(64, "bucket")
parsed_plan = parse_lines(explode_lines(bucketed, keep_cols=("lang", "bucket")),
                          schema)
writer.write(parsed_plan, "_stage", partition_by=["log_type"],
             overwrite_mode="static")
parsed = writer.read(spark, "_stage")

map_types = [s.log_type for s in default_sinks(schema)
             if s.payload == "map"]
anon_by_type = {t: anon for t in map_types}


def t(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s", flush=True)


def payload():
    return build_map_payload(parsed, schema, anon_by_type)


for rep in (1, 2):
    t(f"noop (compute only) r{rep}", lambda: payload()
      .write.format("noop").mode("overwrite").save())
    t(f"(log_type,bucket) 512-dir r{rep}", lambda: writer.write(
        payload().repartition(64, "log_type", "bucket"), f"m1_{rep}",
        partition_by=["log_type", "bucket"]))
    t(f"(bucket) 64-dir r{rep}", lambda: writer.write(
        payload().repartition(64, "bucket"), f"m2_{rep}",
        partition_by=["bucket"]))
shutil.rmtree(out_root, ignore_errors=True)
