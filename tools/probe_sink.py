#!/usr/bin/env python3
"""Isolate the sink-write phase: build the parse stage once, then time each
sink job alone (no concurrency) and report Spark task counts per job.

Usage: python tools/probe_sink.py CORES [PAGES_PATH]
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

cores = int(sys.argv[1])
pages_path = sys.argv[2] if len(sys.argv) > 2 else \
    os.path.join(ROOT, ".fixtures", "bench_pages_n200000.parquet")

from pyspark.sql import functions as F  # noqa: E402

from logparse_rs_spark.anonymizer import load_anonymizer  # noqa: E402
from logparse_rs_spark.operators.parse import (  # noqa: E402
    explode_lines, parse_lines, project_type)
from logparse_rs_spark.plans.pipeline import with_bucket  # noqa: E402
from logparse_rs_spark.schema import load_schema  # noqa: E402
from logparse_rs_spark.session import get_spark  # noqa: E402
from logparse_rs_spark.sources.writers import ParquetWriter  # noqa: E402

spark = get_spark("probe-sink", cores=cores, shuffle_partitions=64)
sc = spark.sparkContext
schema = load_schema(os.path.join(ROOT, "schemas", "schema.json"))
anon = load_anonymizer(os.path.join(ROOT, "configs", "anonymizer.sample.json"))

out_root = os.environ.get("PROBE_OUT", "/dev/shm/probe_sink")
import shutil
shutil.rmtree(out_root, ignore_errors=True)
writer = ParquetWriter(out_root)

pages = spark.read.parquet(pages_path)
bucketed = with_bucket(pages, 64).repartition(64, "bucket")
parsed_plan = parse_lines(explode_lines(bucketed, keep_cols=("lang", "bucket")), schema)
parsed_plan = parsed_plan.withColumn("part_id", F.spark_partition_id())

t0 = time.perf_counter()
writer.write(parsed_plan, "_parsed_stage", partition_by=["log_type"],
             overwrite_mode="static")
print(f"stage_write {time.perf_counter()-t0:.1f}s", flush=True)
parsed = writer.read(spark, "_parsed_stage")

# file layout of the stage
stage_dir = writer.path("_parsed_stage")
for d in sorted(os.listdir(stage_dir)):
    p = os.path.join(stage_dir, d)
    if os.path.isdir(p):
        files = [f for f in os.listdir(p) if f.endswith(".parquet")]
        sz = sum(os.path.getsize(os.path.join(p, f)) for f in files) / 1e6
        print(f"  stage {d}: {len(files)} files, {sz:.0f} MB", flush=True)


def timed_job(label, fn):
    before = sc.statusTracker().getJobIdsForGroup(None) or []
    t = time.perf_counter()
    fn()
    dt = time.perf_counter() - t
    jobs = [j for j in (sc.statusTracker().getJobIdsForGroup(None) or [])
            if j not in before]
    ntasks = 0
    for jid in jobs:
        ji = sc.statusTracker().getJobInfo(jid)
        if ji:
            for sid in ji.stageIds:
                si = sc.statusTracker().getStageInfo(sid)
                if si:
                    ntasks += si.numTasks
    print(f"{label}: {dt:.1f}s  jobs={len(jobs)} tasks={ntasks}", flush=True)


def sink(log_type, table, repart):
    proj = project_type(parsed, schema, log_type, anon=anon,
                        extra_cols=("bucket",))
    if repart:
        proj = proj.repartition(64, "bucket")
    writer.write(proj, table, partition_by=["bucket"])


timed_job("traffic (repart)", lambda: sink("TRAFFIC", "t1", True))
timed_job("traffic (no repart)", lambda: sink("TRAFFIC", "t2", False))
timed_job("threat (repart)", lambda: sink("THREAT", "t3", True))
t1 = os.path.join(out_root, "t1")
n1 = sum(len([f for f in fs if f.endswith(".parquet")])
         for _, _, fs in os.walk(t1))
t2 = os.path.join(out_root, "t2")
n2 = sum(len([f for f in fs if f.endswith(".parquet")])
         for _, _, fs in os.walk(t2))
print(f"files: repart={n1} norepart={n2}")
shutil.rmtree(out_root, ignore_errors=True)
