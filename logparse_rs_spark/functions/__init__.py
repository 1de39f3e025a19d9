"""Spark-level column functions backed by the vectorized kernels.

Everything here is an Arrow-batched pandas UDF (never row-at-a-time Python).
Catalyst groups all pandas UDFs referenced in one projection into a single
ArrowEvalPython stage, so e.g. six tokenized columns cost one Python crossing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import (
    fnv1a_seed,
    fnv1a_series,
    split_csv,
    strip_syslog_prefix_series,
)

# The three per-line Python kernels are SEPARATE nondeterministic pandas UDFs
# over the same raw input on purpose:
#   - all three land in ONE ArrowEvalPython stage (single Python crossing);
#   - a query that never reads hash64 gets the hash UDF pruned entirely;
#   - asNondeterministic() is an optimizer barrier so neither predicate
#     pushdown nor projection collapse re-evaluates a UDF per reference
#     (observed: the status filter otherwise duplicates the whole stage).
# Each re-does the (cheap, vectorized) prefix strip rather than chaining on a
# previous UDF's output — chained Python UDFs would need two stages.


@F.pandas_udf(T.StringType())
def _line_of(raw: pd.Series) -> pd.Series:
    """Stripped CSV line (syslog prefix removed, whitespace trimmed)."""
    return strip_syslog_prefix_series(raw)


@F.pandas_udf(T.LongType())
def _hash64_of(raw: pd.Series) -> pd.Series:
    """FNV-1a-64 of the stripped line, two's-complement int64."""
    line = strip_syslog_prefix_series(raw)
    return pd.Series(fnv1a_series(line).view("int64"), index=line.index)


@F.pandas_udf(T.ArrayType(T.StringType()))
def _qfields_of(raw: pd.Series) -> pd.Series:
    """Exact quote-aware split for lines containing a double quote; null for
    quote-free lines (the JVM built-in `split` is exactly equivalent there)."""
    line = strip_syslog_prefix_series(raw)
    has_quote = line.str.contains('"', regex=False)
    out = pd.Series([None] * len(line), index=line.index, dtype=object)
    if has_quote.any():
        out[has_quote] = line[has_quote].map(split_csv)
    return out


@F.pandas_udf(T.StringType())
def _line_of_raw(raw: pd.Series) -> pd.Series:
    """Raw-line variant (NDJSON path parity, bindings lib.rs:394-463: the
    reference parses the raw line — no syslog strip, no trim). Only a single
    trailing \\r is removed, replicating the Python path's universal-newline
    decoding of CRLF files (spark.read.text splits on \\n alone)."""
    return raw.str.replace(r"\r$", "", regex=True)


@F.pandas_udf(T.LongType())
def _hash64_of_raw(raw: pd.Series) -> pd.Series:
    line = raw.str.replace(r"\r$", "", regex=True)
    return pd.Series(fnv1a_series(line).view("int64"), index=line.index)


@F.pandas_udf(T.ArrayType(T.StringType()))
def _qfields_of_raw(raw: pd.Series) -> pd.Series:
    line = raw.str.replace(r"\r$", "", regex=True)
    has_quote = line.str.contains('"', regex=False)
    out = pd.Series([None] * len(line), index=line.index, dtype=object)
    if has_quote.any():
        out[has_quote] = line[has_quote].map(split_csv)
    return out


line_of = _line_of.asNondeterministic()
hash64_of = _hash64_of.asNondeterministic()
qfields_of = _qfields_of.asNondeterministic()
line_of_raw = _line_of_raw.asNondeterministic()
hash64_of_raw = _hash64_of_raw.asNondeterministic()
qfields_of_raw = _qfields_of_raw.asNondeterministic()


def fnv1a_col(col, salt_bytes: bytes = b"") -> F.Column:
    """FNV-1a-64 of a string column as two's-complement LongType."""
    seed = fnv1a_seed(salt_bytes)

    @F.pandas_udf(T.LongType())
    def _fnv(s: pd.Series) -> pd.Series:
        import numpy as np

        # duplicate-heavy batches (e.g. tokens drawn from a small
        # vocabulary): hash each DISTINCT value once and scatter — same
        # hashes, same null handling as the direct path
        if len(s) >= 1024:
            codes, uniq = s.factorize(use_na_sentinel=True)
            if 0 < len(uniq) and len(uniq) * 4 <= len(s):
                hu = fnv1a_series(pd.Series(uniq),
                                  seed=seed).view("int64")
                out = pd.Series(hu[np.maximum(codes, 0)], index=s.index)
                out[codes < 0] = None
                return out
        out = pd.Series(fnv1a_series(s, seed=seed).view("int64"),
                        index=s.index)
        out[s.isna()] = None
        return out

    return _fnv(col)


def tokenize_col(col, prefix: str, field_salt: str, default_salt: str) -> F.Column:
    """Deterministic anonymization token column (table.rs:28-44 semantics).
    Null in -> null out. The salt pair collapses to a precomputed FNV seed, so
    the UDF is a pure hash over the value bytes."""
    seed = fnv1a_seed(
        field_salt.encode("utf-8", errors="ignore")
        + default_salt.encode("utf-8", errors="ignore")
    )

    @F.pandas_udf(T.StringType())
    def _tok(s: pd.Series) -> pd.Series:
        import numpy as np

        isnull = s.isna()
        hashes = fnv1a_series(s, seed=seed)
        if len(s):
            hexes = pd.Series(
                pd.array(np.char.add(prefix, np.char.mod("%016x", hashes))),
                index=s.index,
            ).astype(object)
        else:
            hexes = pd.Series([], index=s.index, dtype=object)
        hexes[isnull] = None
        return hexes

    return _tok(col)


def exact_split_col(col) -> F.Column:
    """Exact quote-aware CSV split as a standalone column (used outside the
    main pipeline, e.g. to expose the reference's split_csv API surface)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _split(s: pd.Series) -> pd.Series:
        return s.fillna("").map(split_csv)

    return _split(col)
