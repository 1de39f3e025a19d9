"""The end-to-end batch pipeline plan (north rule):

    parse -> enrich -> anonymize -> route (fan-out sinks) -> aggregate

with explicit partitioning (url-hash buckets, M5), per-partition lineage +
metrics (M2), an integrity/audit sink (M3), and checkpoint-based resume via a
bucket ledger (M4) — a killed job replays only unfinished buckets, and bucket
replays are idempotent (dynamic partition overwrite / Iceberg
overwritePartitions).

Scale notes (the design constraints this file encodes):
- the bucket column is pmod(xxhash64(url), n_buckets): input-deterministic,
  uniform even when a few domains are hot (hashing the full url, not the
  domain, is the skew defence — a hot domain's pages scatter across all
  buckets). n_buckets should be sized so one bucket ≈ 100-500 MB of input at
  the target scale; buckets are the resume/lineage grain, while Spark's own
  task parallelism *within* a run comes from the repartition below.
- one cached parse pass feeds every sink + the metrics/report aggregates:
  the fan-out never re-reads or re-parses the input.
- all per-sink aggregates are hash aggregates with map-side partials; the
  only wide shuffles are the repartition-by-bucket and the final groupBys
  over already-narrow columns.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..anonymizer import CompiledAnonymizer, load_anonymizer
from ..operators.anonymize import audit_table
from ..operators.parse import STATUS_OK, parse_lines, explode_lines, project_type
from ..schema import CompiledSchema, load_schema
from ..sources.writers import ParquetWriter, make_writer


@dataclass
class SinkSpec:
    """One fan-out sink: a log type routed to its own table.

    payload:
      "columns" — per-field columnar projection (its own table/write job)
      "map"     — type-erased map<string,string> payload (SURVEY §1.2);
                  all map-payload sinks share ONE table partitioned by
                  (log_type, bucket) and ONE write job — the fixed-cost
                  saver for the long tail of low-volume log types
    """

    log_type: str
    table: str
    columns: Optional[Sequence[str]] = None   # None = full schema width
    anonymize: bool = True
    payload: str = "columns"


@dataclass
class PipelineConfig:
    schema_path: str
    anonymizer_path: Optional[str]
    out_root: str
    sinks: List[SinkSpec]
    n_buckets: int = 64
    audit_dims: Sequence[str] = ("source_address", "destination_address",
                                 "device_name")
    write_rejects: bool = True
    partitions_per_run: Optional[int] = None   # task parallelism; default 2x cores
    writer: Optional[object] = None   # injected sink writer; default make_writer


@dataclass
class PipelineResult:
    run_id: str
    buckets_processed: int
    buckets_skipped: int
    per_sink_rows: Dict[str, int]
    status_counts: Dict[str, int]
    wall_s: float
    docs_in: int
    lines_in: int
    timings: Dict[str, float] = field(default_factory=dict)


LEDGER_TABLE = "_ledger"
STAGE_TABLE = "_parsed_stage"
METRICS_TABLE = "_metrics"
AUDIT_TABLE = "_audit"
REJECTS_TABLE = "_rejects"


def build_map_payload(parsed: DataFrame, schema: CompiledSchema,
                      anon_by_type: Dict[str, Optional[CompiledAnonymizer]]
                      ) -> DataFrame:
    """Type-erased map<string,string> payload for the long-tail map sinks:
    one when-chain over the configured types, each branch zipping the
    type's schema names with the split fields (anonymized per its plan)."""
    from ..operators.anonymize import anonymize_expr
    from ..operators.parse import fields_col

    types = list(anon_by_type)
    df = fields_col(parsed.filter(
        (F.col("status") == STATUS_OK) & F.col("log_type").isin(types)))
    payload = None
    for t in types:
        pairs = schema.effective_positions(t)
        a = anon_by_type[t]
        vals = []
        for name, pos in pairs:
            c = F.get(F.col("fields"), pos)
            if a is not None:
                c = anonymize_expr(c, a.plan_for(name), a.default_salt)
            vals.append(c)
        m = F.map_from_arrays(
            F.array(*[F.lit(n) for n, _ in pairs]), F.array(*vals))
        payload = (F.when(F.col("log_type") == t, m) if payload is None
                   else payload.when(F.col("log_type") == t, m))
    return df.select("url", "line_ordinal", "log_type",
                     payload.alias("parsed"),
                     "raw_excerpt", "hash64", "bucket")


def with_bucket(pages: DataFrame, n_buckets: int) -> DataFrame:
    return pages.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )


def done_buckets(spark: SparkSession, writer: ParquetWriter) -> List[int]:
    ledger = writer.read(spark, LEDGER_TABLE)
    if ledger is None:
        return []
    rows = (ledger.filter(F.col("status") == "done")
            .select("bucket").distinct().collect())
    return sorted(r["bucket"] for r in rows)


def run_pipeline(spark: SparkSession, pages: DataFrame, cfg: PipelineConfig,
                 resume: bool = True,
                 max_buckets: Optional[int] = None) -> PipelineResult:
    """Run (or resume) the full pipeline over a pages DataFrame.

    `max_buckets` limits how many pending buckets this invocation processes —
    the hook the resume test uses to simulate a killed job (process K of N,
    rerun, verify only N-K replay).
    """
    t0 = time.perf_counter()
    timings: Dict[str, float] = {}

    def mark(label: str, t_start: float) -> None:
        timings[label] = round(time.perf_counter() - t_start, 3)

    run_id = uuid.uuid4().hex[:12]
    schema = load_schema(cfg.schema_path)
    anon = load_anonymizer(cfg.anonymizer_path) if cfg.anonymizer_path else None
    # Iceberg when the runtime has it (north rule: Iceberg sinks; out_root is
    # then a catalog namespace), parquet-dirs otherwise — same idempotent
    # replace-only-touched-partitions semantics either way
    writer = (make_writer(spark, cfg.out_root) if cfg.writer is None
              else cfg.writer)

    bucketed = with_bucket(pages, cfg.n_buckets)

    skipped: List[int] = []
    if resume:
        skipped = done_buckets(spark, writer)
        if skipped:
            bucketed = bucketed.filter(~F.col("bucket").isin(skipped))
    if max_buckets is not None:
        pending = [r["bucket"] for r in
                   bucketed.select("bucket").distinct()
                   .orderBy("bucket").limit(max_buckets).collect()]
        bucketed = bucketed.filter(F.col("bucket").isin(pending))

    n_parts = cfg.partitions_per_run or max(
        2 * int(spark.sparkContext.defaultParallelism), cfg.n_buckets // 4, 8)
    # explicit repartition on the bucket key: lines of one url always land
    # together, so per-bucket sink partitions are written by few tasks and
    # the (url, line_ordinal) identity never crosses partitions
    bucketed = bucketed.repartition(n_parts, "bucket")

    exploded = explode_lines(bucketed, keep_cols=("lang", "bucket"))
    parsed_plan = parse_lines(exploded, schema)
    parsed_plan = parsed_plan.withColumn("part_id", F.spark_partition_id())
    # narrow byte-count stage column: the metrics aggregation then never
    # scans the fat `line` column (same trick as the _adt_* audit dims —
    # bookkeeping reads must stay cheap relative to the data they describe)
    parsed_plan = parsed_plan.withColumn("_line_bytes",
                                         F.length("line").cast("long"))

    # audit-dim ORIGINALS as narrow stage columns: the audit job then reads
    # three pruned string columns instead of re-splitting every line (the
    # split is the expensive kernel; paying it once in the stage pass keeps
    # the fan-out phase pure column reads)
    audit_dims_active = [
        d for d in cfg.audit_dims
        if anon is not None and anon.plan_for(d).mode is not None
    ]
    if audit_dims_active:
        from ..operators.parse import fields_col

        sink_types = sorted({s.log_type for s in cfg.sinks})
        parsed_plan = fields_col(parsed_plan)
        for d in audit_dims_active:
            expr = None
            for t in sink_types:
                pos = dict(schema.effective_positions(t)).get(d)
                if pos is None:
                    continue
                cond = F.col("log_type") == t
                val = F.get(F.col("fields"), pos)
                expr = (F.when(cond, val) if expr is None
                        else expr.when(cond, val))
            parsed_plan = parsed_plan.withColumn(
                f"_adt_{d}",
                expr if expr is not None else F.lit(None).cast("string"))
        parsed_plan = parsed_plan.drop("fields")

    # ---- staging checkpoint: ONE parse pass materialized as parquet -------
    # Measured against .cache(): the in-memory columnar cache serializes the
    # fat line/array columns slower than parquet writes them, and every
    # cached read deserializes full batches; the staged parquet gives all 13+
    # downstream consumers real column pruning. Partitioning the stage by
    # log_type means every sink job's scan is partition-PRUNED to its own
    # rows (measured: the 8 small-type sinks each stop rescanning the full
    # stage). The stage table doubles as the run's lineage artifact.
    t_stage = time.perf_counter()
    writer.write(parsed_plan, STAGE_TABLE, partition_by=["log_type"],
                 overwrite_mode="static")
    mark("stage_write", t_stage)
    parsed = writer.read(spark, STAGE_TABLE)
    if parsed is None:  # nothing pending -> empty stage -> no parquet files
        return PipelineResult(run_id, 0, len(skipped), {}, {},
                              time.perf_counter() - t0, 0, 0, timings)

    # ---- bookkeeping aggregations (M2 metrics + ledger inputs + routed
    # counts) run as ONE light job in the same concurrent pool as the sink
    # writes; everything else (status counts, per-partition metrics rows,
    # ledger rows, docs-per-bucket) derives driver-side from its small
    # result — no dedicated Spark job per bookkeeping table. Docs are
    # counted as line_ordinal==0 rows of the STAGED parse (every non-null
    # text yields at least the ordinal-0 line, even empty text), so the
    # count never re-evaluates the raw source plan — for a WARC source that
    # re-run would repeat the whole gzip+extract pass, and a source that
    # changed between the two scans would break ledger consistency. A page
    # with NULL text explodes to zero lines and is not counted as a doc.
    fine_stats: List = []   # (part_id, bucket, status, log_type, n, bytes, docs)

    def collect_fine_stats() -> None:
        fine_stats.extend(
            parsed.groupBy("part_id", "bucket", "status", "log_type")
            .agg(F.count("*").alias("n"),
                 F.sum("_line_bytes").alias("bytes_in"),
                 F.sum((F.col("line_ordinal") == 0).cast("long"))
                 .alias("docs"))
            .collect())

    # ---- fan-out sinks (M1) + metrics + rejects + audit, as CONCURRENT
    # Spark jobs over the one cached parse (driver threads only queue jobs;
    # executors time-share tasks) --------------------------------------------
    from concurrent.futures import ThreadPoolExecutor

    per_sink_rows: Dict[str, int] = {}

    def write_sink(sink: SinkSpec) -> None:
        projected = project_type(
            parsed, schema, sink.log_type, columns=sink.columns,
            anon=anon if sink.anonymize else None,
            extra_cols=("bucket",),   # idempotent partition overwrite key
        )
        # cluster by the partition key BEFORE partitionBy: each bucket is
        # written by exactly one task -> 1 file per bucket dir instead of
        # (tasks x buckets) small files. The shuffle carries only this sink's
        # projected columns, and at scale the 100-500MB bucket grain IS the
        # file size you want; the file/commit count is what killed r1's
        # sink phase (217s@8c vs 60s@2c, BENCH_r01).
        projected = projected.repartition(cfg.n_buckets, "bucket")
        writer.write(projected, sink.table, partition_by=["bucket"])

    def write_columnar_group(sinks_in_table: List[SinkSpec]) -> None:
        """Columnar sinks that SHARE a table fold into ONE write job:
        per-type projections unioned by name (a type missing a column
        yields nulls there) and written partitioned by (log_type, bucket)
        — readers of one type still get partition pruning, replay still
        overwrites only the touched (type, bucket) partitions, and the
        phase pays one job's scheduling + codegen + commit instead of one
        per type. At 8 cores the per-job fixed cost (~2-4 s of planning +
        Janino codegen + commit setup, BENCH/BASELINE.md) dominated two
        nearly-empty write jobs — folding them is the N->4N efficiency
        lever, since fixed cost is what does NOT shrink with cores."""
        parts = []
        for s in sinks_in_table:
            parts.append(project_type(
                parsed, schema, s.log_type, columns=s.columns,
                anon=anon if s.anonymize else None,
                extra_cols=("log_type", "bucket"),
            ))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        out = out.repartition(cfg.n_buckets, "bucket")
        writer.write(out, sinks_in_table[0].table,
                     partition_by=["log_type", "bucket"])

    def write_map_sinks(map_sinks: List[SinkSpec]) -> None:
        """All map-payload sinks in ONE write job: type-erased
        map<string,string> parsed payload. Partitioned by BUCKET only
        (the replay/idempotence grain); log_type stays a data column,
        sorted within each file so readers filtering one type skip row
        groups via parquet min/max stats. Measured: (log_type, bucket)
        dirs cost ~2x the commit time at 64 buckets, and at 4096 buckets
        x T types the dir count would pressure catalog metadata for a
        long-tail table that is rarely read per-type."""
        out = build_map_payload(
            parsed, schema,
            {s.log_type: (anon if s.anonymize else None) for s in map_sinks})
        out = (out.repartition(cfg.n_buckets, "bucket")
               .sortWithinPartitions("log_type"))
        writer.write(out, map_sinks[0].table, partition_by=["bucket"])

    def write_rejects() -> None:
        rejects = parsed.filter(F.col("status") != STATUS_OK).select(
            "url", "line_ordinal", "bucket", "status", "log_type", "line")
        rejects = rejects.repartition(cfg.n_buckets, "bucket")
        writer.write(rejects, REJECTS_TABLE, partition_by=["bucket"])

    def write_audit() -> None:
        # the _adt_* stage columns already hold the per-type originals
        # (null for types lacking the dim / non-ok rows), so this is a
        # pruned 3-column scan -> distinct -> anonymize-the-distincts
        stacked = parsed.filter(F.col("status") == STATUS_OK).select(
            *[F.col(f"_adt_{d}").alias(d) for d in audit_dims_active])
        audit = audit_table(stacked, anon, audit_dims_active).withColumn(
            "run_id", F.lit(run_id))
        writer.append(audit, AUDIT_TABLE)

    columnar_sinks = [s for s in cfg.sinks if s.payload == "columns"]
    map_sinks = [s for s in cfg.sinks if s.payload == "map"]
    if map_sinks and len({s.table for s in map_sinks}) != 1:
        raise ValueError("all map-payload sinks must share one table")
    col_groups: Dict[str, List[SinkSpec]] = {}
    for s in columnar_sinks:
        col_groups.setdefault(s.table, []).append(s)
    # HEAVIEST-FIRST job order (classic LPT scheduling): the map-payload
    # union sink and the full-width columnar sinks dominate the phase's
    # critical path, so they enter the pool first and the small bookkeeping
    # jobs (fine_stats, audit) backfill the tail instead of extending it.
    jobs = []
    if map_sinks:
        jobs.append((map_sinks[0].table, lambda: write_map_sinks(map_sinks)))
    for table, group in col_groups.items():
        if len(group) == 1:
            jobs.append((table, lambda s=group[0]: write_sink(s)))
        else:
            jobs.append((table, lambda g=group: write_columnar_group(g)))
    if cfg.write_rejects:
        jobs.append(("rejects", write_rejects))
    jobs.append(("fine_stats", collect_fine_stats))
    if audit_dims_active:
        jobs.append(("audit", write_audit))
    t_sinks = time.perf_counter()
    # concurrent fan-out jobs: enough to hide per-job commit latency, FIXED
    # at 4 — r1 scaled this with defaultParallelism and the commit phase
    # anti-scaled (more cores -> more simultaneous partitionBy commits
    # contending on the store). Task-level parallelism inside each job
    # already uses every core; job-level concurrency only needs to cover
    # scheduling + commit gaps. Fixed (not core-derived) so an N-core and a
    # 4N-core run execute the IDENTICAL job schedule — the cluster-size
    # scaling comparison then varies exactly one thing.
    pool_width = int(os.environ.get("LOGPARSE_SINK_CONCURRENCY", "4"))
    def timed(label: str, job):
        def run():
            t = time.perf_counter()
            job()
            timings[f"sink:{label}"] = round(time.perf_counter() - t, 3)
        return run

    with ThreadPoolExecutor(max_workers=min(pool_width, len(jobs))) as pool:
        futures = [pool.submit(timed(lbl, j)) for lbl, j in jobs]
        for f in futures:
            f.result()  # surface the first failure
    mark("sink_writes", t_sinks)

    # ---- derive all bookkeeping driver-side from the two small stat sets ---
    status_counts: Dict[str, int] = {}
    type_counts: Dict[str, int] = {}
    metric_rows: Dict[tuple, Dict] = {}
    bucket_rows: Dict[int, Dict] = {}
    for r in fine_stats:
        status_counts[r["status"]] = status_counts.get(r["status"], 0) + r["n"]
        if r["status"] == STATUS_OK:
            type_counts[r["log_type"]] = \
                type_counts.get(r["log_type"], 0) + r["n"]
        mk = (r["part_id"], r["bucket"])
        m = metric_rows.setdefault(mk, {
            "part_id": r["part_id"], "bucket": r["bucket"], "rows_in": 0,
            "rows_ok": 0, "rows_rejected": 0, "bytes_in": 0, "run_id": run_id})
        m["rows_in"] += r["n"]
        m["bytes_in"] += r["bytes_in"] or 0
        m["rows_ok" if r["status"] == STATUS_OK else "rows_rejected"] += r["n"]
        b = bucket_rows.setdefault(r["bucket"], {
            "bucket": r["bucket"], "rows_in": 0, "rows_ok": 0, "docs": 0,
            "status": "done", "run_id": run_id})
        b["rows_in"] += r["n"]
        b["docs"] += r["docs"] or 0
        if r["status"] == STATUS_OK:
            b["rows_ok"] += r["n"]
    lines_in = sum(status_counts.values())

    for sink in cfg.sinks:
        shared = (sink.payload == "map"
                  or len(col_groups.get(sink.table, ())) > 1)
        key = (f"{sink.table}/log_type={sink.log_type}" if shared
               else sink.table)
        per_sink_rows[key] = type_counts.get(sink.log_type, 0)

    # ---- metrics + ledger writes (tiny local frames); ledger commit (M4)
    # stays ordered AFTER all sink writes ------------------------------------
    t_ledger = time.perf_counter()
    writer.append(
        spark.createDataFrame(
            list(metric_rows.values()),
            "part_id int, bucket int, rows_in long, rows_ok long, "
            "rows_rejected long, bytes_in long, run_id string"),
        METRICS_TABLE)
    writer.append(
        spark.createDataFrame(
            list(bucket_rows.values()),
            "bucket int, rows_in long, rows_ok long, docs long, "
            "status string, run_id string").withColumn(
                "committed_at", F.current_timestamp()),
        LEDGER_TABLE)
    mark("ledger", t_ledger)
    n_buckets_done = len(bucket_rows)
    docs_in = sum(b["docs"] for b in bucket_rows.values())

    return PipelineResult(
        run_id=run_id,
        buckets_processed=n_buckets_done,
        buckets_skipped=len(skipped),
        per_sink_rows=per_sink_rows,
        status_counts=status_counts,
        wall_s=time.perf_counter() - t0,
        docs_in=docs_in,
        lines_in=lines_in,
        timings=timings,
    )


def default_sinks(schema: CompiledSchema,
                  narrow: bool = True) -> List[SinkSpec]:
    """One sink per log type. With `narrow` (the at-scale shape):
    TRAFFIC/THREAT — the high-volume types — get columnar projections
    pruned to the analytic dimensions, folded into ONE shared table
    partitioned by (log_type, bucket) and written by ONE job; the long
    tail of low-volume types shares one map-payload table (also a single
    write job, partitioned per type). Three write jobs total (fact table,
    map table, rejects) regardless of how many log types the schema has.
    narrow=False gives every type its own full-width columnar table (the
    reference-NDJSON-parity shape)."""
    dims = ["source_address", "destination_address", "rule_name",
            "source_user", "application", "action", "device_name"]
    sinks = []
    for t in sorted(schema.type_to_fields):
        if narrow and t == "TRAFFIC":
            sinks.append(SinkSpec(t, "sink_fact", columns=dims))
        elif narrow and t == "THREAT":
            names = set(schema.type_to_fields[t])
            sinks.append(SinkSpec(
                t, "sink_fact",
                columns=[d for d in dims if d in names]))
        elif narrow:
            sinks.append(SinkSpec(t, "sink_other", payload="map"))
        else:
            sinks.append(SinkSpec(t, f"sink_{t.lower()}", columns=None))
    return sinks
