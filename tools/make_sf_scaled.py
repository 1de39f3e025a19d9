#!/usr/bin/env python3
"""Generate a scaled synthetic dataset matching the driver testdata's
schemas and distributions, for LOCAL perf measurement only (the driver's
round-end bench may escalate to sf1.0, which is not present on disk).

Everything is derived from the measured distributions of
/root/testdata/sf0.1 (30-word uniform vocab + rare 'dup' suffix docs,
unit-norm random embeddings with independent uniform labels, ts-sorted
events with Exp(50) values, TPC-H-ish tables replicated with key
offsets). Deterministic (numpy PCG64 seed 42). Single-file single-
row-group parquet per table, mirroring the driver layout so scan
behavior (one row group) is reproduced.

Usage: python tools/make_sf_scaled.py --scale 10 --out /root/sfbig/sf1.0
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def write_one(path: str, table: pa.Table) -> None:
    pq.write_table(table, path, row_group_size=1 << 30,
                   compression="snappy")


def gen_documents(out: str, n: int, rng: np.random.Generator) -> None:
    lengths = rng.integers(10, 100, size=n)
    word_idx = rng.integers(0, len(VOCAB), size=int(lengths.sum()))
    texts = []
    pos = 0
    for L in lengths:
        texts.append(" ".join(VOCAB[w] for w in word_idx[pos:pos + L]))
        pos += L
    # ~5% of docs carry a ' dup' suffix; ~0.3% of those are literal copies
    dup_ids = rng.choice(n, size=n // 20, replace=False)
    for i in dup_ids:
        texts[i] = texts[i] + " dup"
    copy_pairs = rng.choice(dup_ids, size=max(2, n // 600), replace=False)
    for k in range(0, len(copy_pairs) - 1, 2):
        texts[copy_pairs[k + 1]] = texts[copy_pairs[k]]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    tb = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{i % 20}" for i in range(n)]),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })
    write_one(f"{out}/documents.parquet", tb)


def gen_embeddings(out: str, n: int, rng: np.random.Generator) -> None:
    X = rng.standard_normal((n, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    tb = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(X), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
    })
    write_one(f"{out}/embeddings.parquet", tb)


def gen_events(out: str, n: int, n_users: int,
               rng: np.random.Generator) -> None:
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    t1 = np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64)
    ts = np.sort(rng.integers(t0, t1, size=n))
    tb = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.view("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, size=n)),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], size=n)),
        "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
        "props": pa.array([f'{{"k": {k}}}'
                           for k in rng.integers(0, 100, size=n)]),
    })
    write_one(f"{out}/events.parquet", tb)


def replicate_tpch(out: str, scale: int) -> None:
    """Replicate the TPC-H-ish tables with consistent key offsets so join
    fan-outs per key are preserved."""
    li = pq.read_table(f"{SRC}/lineitem.parquet")
    od = pq.read_table(f"{SRC}/orders.parquet")
    cu = pq.read_table(f"{SRC}/customer.parquet")
    pt = pq.read_table(f"{SRC}/part.parquet")
    sup = pq.read_table(f"{SRC}/supplier.parquet")
    n_ord = 1 + int(pa.compute.max(od["o_orderkey"]).as_py())
    n_cust = 1 + int(pa.compute.max(cu["c_custkey"]).as_py())
    n_part = 1 + int(pa.compute.max(pt["p_partkey"]).as_py())
    n_sup = 1 + int(pa.compute.max(sup["s_suppkey"]).as_py())

    def off(tb: pa.Table, col: str, step: int, k: int) -> pa.Table:
        i = tb.schema.get_field_index(col)
        return tb.set_column(i, col, pa.compute.add(tb[col], step * k))

    for name, tb, cols in [
        ("lineitem", li, [("l_orderkey", n_ord), ("l_partkey", n_part),
                          ("l_suppkey", n_sup)]),
        ("orders", od, [("o_orderkey", n_ord), ("o_custkey", n_cust)]),
        ("customer", cu, [("c_custkey", n_cust)]),
        ("part", pt, [("p_partkey", n_part)]),
        ("supplier", sup, [("s_suppkey", n_sup)]),
    ]:
        parts = []
        for k in range(scale):
            t = tb
            for col, step in cols:
                t = off(t, col, step, k)
            parts.append(t)
        write_one(f"{out}/{name}.parquet", pa.concat_tables(parts)
                  .combine_chunks())
    for name in ["nation", "region"]:
        write_one(f"{out}/{name}.parquet",
                  pq.read_table(f"{SRC}/{name}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--out", default="/root/sfbig/sf1.0")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(42)
    s = args.scale
    gen_documents(args.out, 5000 * s, rng)
    gen_embeddings(args.out, 2000 * s, rng)
    gen_events(args.out, 100000 * s, 1500 * s, rng)
    replicate_tpch(args.out, s)
    open(f"{args.out}/_DONE", "w").close()
    print("wrote", args.out)


if __name__ == "__main__":
    main()
