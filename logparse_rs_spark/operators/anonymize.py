"""Anonymization as Catalyst column expressions (SURVEY §2.3).

The reference's anonymize_one (anonymizer/table.rs:45-78) is a stateful,
lock-guarded memo; because tokens are deterministic pure functions the memo is
unnecessary — each mode compiles to a column expression:

- fixed     -> F.lit(const)                         (table.rs:58)
- tokenize  -> Arrow-batched keyed-FNV pandas UDF   (table.rs:28-44)
- map       -> small dict: F.when chain; large dict: broadcast hash join
              (J1 in SURVEY §2.5); miss -> fallback expr; reject-miss keeps
              the ORIGINAL value (src/lib.rs:354-359)

Null values are never anonymized (src/lib.rs:353) — every expression is
null-preserving.

The integrity/audit table (field, original, replacement) is recovered as a
distinct aggregation over (pre, post) column pairs — see audit_table().
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..anonymizer import CompiledAnonymizer, FieldPlan
from ..functions import tokenize_col

# above this, a map-mode dictionary becomes a broadcast join instead of a
# when-chain (whole-stage codegen degrades on very long case chains)
WHEN_CHAIN_MAX = 32


def _tokenize_expr(col: Column, plan: FieldPlan, default_salt: str) -> Column:
    return tokenize_col(col, plan.token_prefix, plan.field_salt, default_salt)


def anonymize_expr(col: Column, plan: FieldPlan, default_salt: str) -> Column:
    """Column expression implementing plan.apply_one element-wise."""
    if plan.mode is None:
        return col
    if plan.mode == "fixed":
        return F.when(col.isNull(), F.lit(None).cast("string")) \
                .otherwise(F.lit(plan.fixed))
    if plan.mode == "tokenize":
        return _tokenize_expr(col, plan, default_salt)
    # map mode
    if plan.fallback == "fixed":
        miss: Column = F.lit(plan.fixed)
    elif plan.fallback == "reject":
        miss = col  # caller keeps the original value
    else:
        miss = _tokenize_expr(col, plan, default_salt)
    if len(plan.map) <= WHEN_CHAIN_MAX:
        expr: Optional[Column] = None
        for k, v in plan.map.items():
            expr = (F.when(col == F.lit(k), F.lit(v)) if expr is None
                    else expr.when(col == F.lit(k), F.lit(v)))
        hit = expr.otherwise(miss) if expr is not None else miss
        return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(hit)
    # large dictionary: try_element_at on a map literal keeps it JVM-side and
    # broadcast once per task via the literal; for very large dicts use
    # anonymize_with_dict_join instead.
    entries: List[Column] = []
    for k, v in plan.map.items():
        entries.extend([F.lit(k), F.lit(v)])
    lookup = F.try_element_at(F.create_map(*entries), col)
    return F.when(col.isNull(), F.lit(None).cast("string")) \
            .otherwise(F.coalesce(lookup, miss))


def anonymize_columns(df: DataFrame, anon: CompiledAnonymizer,
                      columns: Iterable[str]) -> DataFrame:
    """Wrap each named column of an already-projected DataFrame in its
    anonymization expression (one withColumns pass -> one ArrowEvalPython
    stage for all tokenized columns)."""
    replacements: Dict[str, Column] = {}
    for name in columns:
        plan = anon.plan_for(name)
        if plan.mode is None:
            continue
        replacements[name] = anonymize_expr(F.col(name), plan, anon.default_salt)
    return df.withColumns(replacements) if replacements else df


def anonymize_with_dict_join(df: DataFrame, spark: SparkSession, column: str,
                             mapping: Dict[str, str], miss: Column) -> DataFrame:
    """Broadcast-hash-join strategy for genuinely large map-mode dictionaries
    (SURVEY §2.5 J1): build a 2-column dim table, broadcast it, left-join on
    the value, coalesce(mapped, miss). At 100 TB the fact side never shuffles
    — only the dict moves."""
    dim = spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], schema=f"__orig string, __repl string"
    )
    joined = df.join(F.broadcast(dim), df[column] == dim["__orig"], "left")
    return (
        joined
        .withColumn(column, F.when(F.col(column).isNull(),
                                   F.lit(None).cast("string"))
                    .otherwise(F.coalesce(F.col("__repl"), miss)))
        .drop("__orig", "__repl")
    )


def audit_table(pre: DataFrame, anon: CompiledAnonymizer,
                columns: Iterable[str]) -> DataFrame:
    """Integrity/audit table: distinct (field, original, replacement) over all
    values the reference's integrity table would record (table.rs:75-77,
    S6/M3) — i.e. transformed values, excluding reject-misses and passthrough.

    `pre` must hold the PRE-anonymization projected columns. Stack the
    (field, orig) pairs, dedupe, then apply the pure token expressions to the
    tiny distinct set — the 100 TB-scale trick: anonymize distincts, not rows.
    """
    pieces: List[DataFrame] = []
    for name in columns:
        plan = anon.plan_for(name)
        if plan.mode is None:
            continue
        col = F.col(name)
        sel = pre.select(F.lit(name).alias("field"), col.alias("original")) \
                 .filter(col.isNotNull())
        if plan.mode == "map" and plan.fallback == "reject" and plan.map:
            sel = sel.filter(F.col("original").isin(list(plan.map)))
        elif plan.mode == "map" and plan.fallback == "reject":
            continue  # empty map + reject records nothing
        pieces.append(sel)
    if not pieces:
        raise ValueError("No anonymized columns among: " + ", ".join(columns))
    stacked = pieces[0]
    for p in pieces[1:]:
        stacked = stacked.unionByName(p)
    distinct = stacked.distinct()
    repl: Optional[Column] = None
    for name in columns:
        plan = anon.plan_for(name)
        if plan.mode is None:
            continue
        e = anonymize_expr(F.col("original"), plan, anon.default_salt)
        repl = (F.when(F.col("field") == name, e) if repl is None
                else repl.when(F.col("field") == name, e))
    return distinct.select("field", "original", repl.alias("replacement"))


def anonymizer_status(audit: DataFrame) -> Tuple[int, int]:
    """{fields, pairs} counts (get_anonymizer_status, src/lib.rs:302-317)."""
    row = audit.agg(
        F.countDistinct("field").alias("fields"), F.count("*").alias("pairs")
    ).collect()[0]
    return row["fields"], row["pairs"]
