"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only cross-record state is the anonymizer integrity table —
a monotonically growing (field, orig) -> repl memo (table.rs:75-77). In
batch we recover it statelessly (tokens are deterministic); in streaming this
operator maintains it INCREMENTALLY across micro-batches with
applyInPandasWithState: per log_type group, state = set of value-hashes seen,
emitting only NEWLY seen (field, original, replacement) rows per batch — the
streaming audit feed.

Also provides running_type_counts: per-log_type cumulative routed-row counts
across micro-batches (the streaming form of the G2 report counter).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNT_OUTPUT = T.StructType([
    T.StructField("log_type", T.StringType()),
    T.StructField("total_rows", T.LongType()),
    T.StructField("batch_rows", T.LongType()),
])
COUNT_STATE = T.StructType([T.StructField("total", T.LongType())])


def _update_counts(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    batch = sum(len(p) for p in pdfs)
    total = (state.get[0] if state.exists else 0) + batch
    state.update((total,))
    yield pd.DataFrame({
        "log_type": [key[0]], "total_rows": [total], "batch_rows": [batch]})


def running_type_counts(parsed_stream: DataFrame) -> DataFrame:
    """Cumulative ok-row counts per log type across micro-batches (stateful
    G2). Input: the parsed stream (from operators.parse over readStream)."""
    ok = parsed_stream.filter("status = 'ok'").select("log_type")
    return ok.groupBy("log_type").applyInPandasWithState(
        _update_counts, COUNT_OUTPUT, COUNT_STATE, "append",
        GroupStateTimeout.NoTimeout)


NEW_VALUES_OUTPUT = T.StructType([
    T.StructField("field", T.StringType()),
    T.StructField("original", T.StringType()),
    T.StructField("replacement", T.StringType()),
])
NEW_VALUES_STATE = T.StructType([
    T.StructField("seen", T.ArrayType(T.LongType())),
])


def streaming_integrity_feed(pairs_stream: DataFrame) -> DataFrame:
    """Incremental integrity-table feed: input stream of already-computed
    (field, original, replacement) rows (e.g. from the anonymize expressions
    over a parsed stream); emits each distinct (field, original) exactly once
    across the stream's lifetime. State per field = 64-bit FNV-1a HASHES of
    the seen originals, not the strings themselves — same dedup semantics
    (a collision within one field's value set is a ~2^-64-per-pair event;
    the batch integrity table remains the exact reconciliation path), an
    ~8-byte-per-value checkpoint instead of the full original.

    At 10^12 scale the state per field is bounded by the field's value
    cardinality — the same bound the reference's in-memory memo has
    (table.rs:8), but partitioned by field across executors and checkpointed.
    """
    from ..kernels import fnv1a_series_signed

    def update(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        out_orig, out_repl = [], []
        for p in pdfs:
            if not len(p):
                continue
            hashes = fnv1a_series_signed(p["original"])
            for o, r, h in zip(p["original"], p["replacement"], hashes):
                if o is not None and int(h) not in seen:
                    seen.add(int(h))
                    out_orig.append(o)
                    out_repl.append(r)
        state.update((list(seen),))
        yield pd.DataFrame({
            "field": [key[0]] * len(out_orig),
            "original": out_orig,
            "replacement": out_repl,
        })

    return pairs_stream.groupBy("field").applyInPandasWithState(
        update, NEW_VALUES_OUTPUT, NEW_VALUES_STATE, "append",
        GroupStateTimeout.NoTimeout)


DEDUP_OUTPUT = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text_key", T.LongType()),
])
DEDUP_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _make_row_frames(columns: dict):
    """(empty_frame, one_row_frame) with pinned dtypes for a stateful
    update fn. applyInPandasWithState invokes the update generator ONCE
    PER GROUP and the state ops here key groups by fine-grained hashes
    (one per distinct text key / band bucket), so at bench scale the
    per-group Python cost is the whole operator: constructing a fresh
    pandas DataFrame per group (~100+ us) dominates the one boolean of
    real work. Both frames are built once per task; the one-row frame is
    mutated in place via .iat and re-yielded — safe because the Arrow
    serializer consumes each yielded frame before the generator resumes."""
    empty = pd.DataFrame({k: pd.Series(dtype=v)
                          for k, v in columns.items()})
    one = pd.DataFrame({k: pd.Series([0], dtype=v)
                        for k, v in columns.items()})
    return empty, one


def _one_row(template: pd.DataFrame, *values):
    """A FRESH one-row frame from the dtype-pinned template (.copy() +
    .iat writes, ~45us vs ~75us for the dict constructor). Must be fresh
    per yield: the ApplyInPandasWithState serializer buffers yielded
    frames by reference until an Arrow batch fills, so yielding a shared
    mutated frame would corrupt earlier groups' buffered rows. The shared
    EMPTY frame is safe — the serializer drops len==0 frames on arrival."""
    f = template.copy()
    for i, v in enumerate(values):
        f.iat[0, i] = v
    return f


def streaming_exact_dedup(docs_stream: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Incremental exact dedup over a document stream: emits each distinct
    normalized text exactly once across the stream's lifetime, keyed by
    xxhash64(normalized text). Within a micro-batch the canonical survivor
    is the min doc_id (the batch operator's tie-break, dedup.exact_dedup);
    across batches the first-seen batch wins.

    State = one boolean per distinct text key, sharded by key across
    executors and checkpointed — at ingest scale pair this with the RocksDB
    state store; the batch exact_dedup remains the backfill/compaction path.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import normalized_text

    keyed = docs_stream.select(
        F.col(id_col).alias("doc_id"),
        F.xxhash64(normalized_text(F.col(text_col))).alias("text_key"))

    empty, one = _make_row_frames({"doc_id": "int64", "text_key": "int64"})

    def update(key, pdfs, state: GroupState):
        if state.exists:
            # drain the iterator (contract) and emit nothing: dup of a
            # text seen in an earlier micro-batch
            for _ in pdfs:
                pass
            yield empty
            return
        first_id = None
        for p in pdfs:
            if len(p):
                m = int(p["doc_id"].min())
                first_id = m if first_id is None else min(first_id, m)
        state.update((True,))
        if first_id is None:
            yield empty
        else:
            yield _one_row(one, first_id, key[0])

    return keyed.groupBy("text_key").applyInPandasWithState(
        update, DEDUP_OUTPUT, DEDUP_STATE, "append",
        GroupStateTimeout.NoTimeout)


BAND_REG_OUTPUT = T.StructType([
    T.StructField("band", T.IntegerType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("doc_id", T.LongType()),
])
BAND_REG_STATE = T.StructType([T.StructField("taken", T.BooleanType())])


def streaming_band_registry(docs_stream: DataFrame, bands: int = 16,
                            num_perm: int = 64, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Incremental NEAR-dup state over a document stream: the minhash
    band registry. Each arriving doc computes its signature (stateless
    Arrow UDF) and explodes into (band, bucket) keys — the same banding
    as the batch LSH pair join (dedup._banded, identical xxhash64
    bucketing). State = one claimed flag per (band, bucket); the
    operator emits each bucket's FIRST owner exactly once across the
    stream's lifetime (within a micro-batch the min id wins, matching
    the batch tie-break). A doc that owns ALL of its buckets is novel;
    any lost bucket means a same-band collision with earlier content —
    the streaming analogue of incremental fuzzy dedup, with the batch
    minhash_lsh_pairs path as backfill/compaction.

    Scale shape: state is sharded by (band, bucket) across executors —
    bands multiply the key space, not the per-key state (one boolean);
    at ingest scale pair with the RocksDB state store provider exactly
    like streaming_exact_dedup."""
    from ..operators.dedup import _banded, minhash_signatures

    sigs = minhash_signatures(docs_stream, text_col=text_col,
                              id_col=id_col, num_perm=num_perm)
    banded = _banded(sigs, id_col, bands, num_perm)

    empty, one = _make_row_frames({"band": "int32", "bucket": "int64",
                                   "doc_id": "int64"})

    def update(key, pdfs, state: GroupState):
        if state.exists:
            for _ in pdfs:
                pass
            yield empty
            return
        first = None
        for p in pdfs:
            if len(p):
                m = int(p[id_col].min())
                first = m if first is None else min(first, m)
        state.update((True,))
        if first is None:
            yield empty
        else:
            yield _one_row(one, key[0], key[1], first)

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        update, BAND_REG_OUTPUT, BAND_REG_STATE, "append",
        GroupStateTimeout.NoTimeout)
