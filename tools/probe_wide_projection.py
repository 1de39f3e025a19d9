#!/usr/bin/env python3
"""VERDICT r1 #9: is the TRAFFIC full-width projection (117 F.get + anon
expressions, JVM codegen) slower than one Arrow/pandas stage doing the same
split+project+anonymize in numpy? Measure both on the staged parse output.

Usage: python tools/probe_wide_projection.py [CORES]
"""
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from logparse_rs_spark.anonymizer import load_anonymizer  # noqa: E402
from logparse_rs_spark.kernels import split_csv  # noqa: E402
from logparse_rs_spark.operators.parse import (  # noqa: E402
    explode_lines, parse_lines, project_type)
from logparse_rs_spark.plans.pipeline import with_bucket  # noqa: E402
from logparse_rs_spark.schema import load_schema  # noqa: E402
from logparse_rs_spark.session import get_spark  # noqa: E402
from logparse_rs_spark.sources.writers import ParquetWriter  # noqa: E402

spark = get_spark("probe-wide", cores=cores, shuffle_partitions=64)
schema = load_schema(os.path.join(ROOT, "schemas", "schema.json"))
anon = load_anonymizer(os.path.join(ROOT, "configs", "anonymizer.sample.json"))
out_root = "/dev/shm/probe_wide"
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

pairs = schema.effective_positions("TRAFFIC")
plans = [(name, anon.plan_for(name)) for name, _ in pairs]


def jvm_form():
    return project_type(parsed, schema, "TRAFFIC", anon=anon,
                        extra_cols=("bucket",)).repartition(64, "bucket")


def pandas_form():
    """One mapInPandas stage: split + project + anonymize in Python."""
    out_fields = ([T.StructField("url", T.StringType()),
                   T.StructField("line_ordinal", T.IntegerType())]
                  + [T.StructField(n, T.StringType()) for n, _ in pairs]
                  + [T.StructField("raw_excerpt", T.StringType()),
                     T.StructField("hash64", T.LongType()),
                     T.StructField("bucket", T.IntegerType())])
    out_schema = T.StructType(out_fields)

    def project(it):
        for pdf in it:
            fields = [r if isinstance(r, list) else split_csv(l)
                      for l, r in zip(pdf["line"], pdf["qfields"])]
            data = {"url": pdf["url"], "line_ordinal": pdf["line_ordinal"]}
            for name, pos in pairs:
                col = [f[pos] if pos < len(f) else None for f in fields]
                plan = anon.plan_for(name)
                if plan.mode is not None:
                    col = [plan.apply_one(v, anon.default_salt) for v in col]
                data[name] = col
            data["raw_excerpt"] = pdf["raw_excerpt"]
            data["hash64"] = pdf["hash64"]
            data["bucket"] = pdf["bucket"]
            yield pd.DataFrame(data)

    src = parsed.filter((F.col("status") == "ok")
                        & (F.col("log_type") == "TRAFFIC"))
    return src.mapInPandas(project, schema=out_schema) \
              .repartition(64, "bucket")


for label, fn in [("jvm 117-get form", jvm_form),
                  ("pandas one-stage form", pandas_form)]:
    for rep in (1, 2):
        t0 = time.perf_counter()
        writer.write(fn(), f"t_{label[:3]}{rep}", partition_by=["bucket"])
        print(f"{label} run{rep}: {time.perf_counter()-t0:.1f}s", flush=True)

shutil.rmtree(out_root, ignore_errors=True)
