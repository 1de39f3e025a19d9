"""Corpus-curation operators for web-scale training-data pipelines:
line-frequency boilerplate removal (C4/CCNet style), cross-document
paragraph dedup, Gopher-style quality rules, newest-crawl-per-URL
selection, and host blocklist filtering.

Design rule (same as operators/text.py): everything here is SQL-expressible
and stays JVM-side — no Python in the row path, so every operator has a
plain DuckDB oracle. The reference pipeline has no corpus-curation stage;
these extend the engine for the Common-Crawl-style corpus the north rule
targets (pages/documents at 10^12-row scale).

Scale notes are per-operator; the common theme is that line-granularity
work shuffles a (line, doc) stream keyed by the line text. Keying by
xxhash64(line) instead would halve shuffle width, but a 64-bit key starts
colliding (and silently conflating distinct lines) around ~4B distinct
lines, which a 10^12-doc corpus exceeds — so the exact operators key by the
line string itself and the docstrings say what the approximate variant
would change.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS, _words

# paragraph boundary for the line operators: literal newline (Java-regex and
# RE2 agree on it; documents carrying \r\n should be normalized upstream)
LINE_SEP = "\n"


def _exploded_lines(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, line) with pos 0-based in document order; trailing empty
    lines are kept (Spark split(limit=-1) and DuckDB string_split agree)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), LINE_SEP, -1))
        .alias("pos", "line"),
    )


def _reassemble(docs: DataFrame, kept: DataFrame, text_col: str,
                id_col: str) -> DataFrame:
    """Rebuild (id, text_clean, n_lines, n_kept) from surviving (id, pos,
    line) rows. collect_list is per-document — a document fits in one task
    by definition, so this agg is safe at any corpus size; array_sort on
    struct(pos, line) restores original line order deterministically."""
    clean = (kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"]),
            LINE_SEP).alias("text_clean"),
        F.count("*").alias("n_kept")))
    base = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), LINE_SEP, -1)).alias("n_lines"))
    # left join keeps documents whose every line was removed (empty result)
    return (base.join(clean, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                    F.col("n_lines").cast("long").alias("n_lines"),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept")))


def remove_frequent_lines(docs: DataFrame, min_docs: int = 50,
                          text_col: str = "text", id_col: str = "doc_id",
                          broadcast_boiler: bool = True) -> DataFrame:
    """C4/CCNet-style boilerplate removal: drop every line that occurs in
    >= min_docs DISTINCT documents (nav menus, cookie banners, copyright
    footers), keep everything else in original order. Empty lines are
    structural, never counted and never removed. Returns (id, text_clean,
    n_lines, n_kept).

    Scale shape: one exploded (id, line) stream; document-frequency is a
    two-level agg (groupBy(line, id) partial-dedups map-side before the
    distinct count, so hot boilerplate lines don't funnel raw row streams
    into one reducer). The boilerplate table itself is bounded by
    total_lines/min_docs and is usually tiny relative to the corpus —
    broadcast_boiler=True (default) makes the removal a BROADCAST left-anti
    join, so the full corpus never shuffles for the filter step; set it
    False to fall back to a shuffle anti-join when min_docs is small enough
    that the frequent-line table could be large."""
    lines = _exploded_lines(docs, text_col, id_col)
    # two-level distinct: (line, id) dedup first => partial agg both levels
    freq = (lines.filter(F.col("line") != "")
            .groupBy("line", id_col).agg(F.lit(1))
            .groupBy("line").agg(F.count("*").alias("df")))
    boiler = freq.filter(F.col("df") >= min_docs).select("line")
    if broadcast_boiler:
        boiler = F.broadcast(boiler)
    kept = lines.join(boiler, "line", "left_anti")
    return _reassemble(docs, kept, text_col, id_col)


def dedup_paragraphs(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Cross-document exact paragraph (line) dedup, keep-first: for each
    distinct non-empty line, only the occurrence with the smallest
    (doc_id, pos) survives; empty lines always survive (structure, not
    content). The RefinedWeb/Dolma recipe for inter-document repetition at
    paragraph granularity. Returns (id, text_clean, n_lines, n_kept).

    Scale shape: winner-per-line is min(struct(id, pos)) — a plain agg with
    map-side partials, no window. The join back is big-to-big keyed by line
    text: unavoidable for exact semantics (see module docstring on why not
    a 64-bit hash key); Catalyst gets a sort-merge join whose both sides
    partial-agg first."""
    lines = _exploded_lines(docs, text_col, id_col)
    ne = lines.filter(F.col("line") != "")
    winner = ne.groupBy("line").agg(
        F.min(F.struct(F.col(id_col).alias("id"), F.col("pos").alias("pos")))
        .alias("w"))
    kept_ne = (ne.join(winner, "line")
               .filter((F.col("w.id") == F.col(id_col))
                       & (F.col("w.pos") == F.col("pos")))
               .select(id_col, "pos", "line"))
    kept = kept_ne.unionByName(lines.filter(F.col("line") == ""))
    return _reassemble(docs, kept, text_col, id_col)


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = 50, max_words: int = 100_000) -> DataFrame:
    """Gopher-style (Rae et al. 2021, appendix A1.1) document quality rules,
    re-expressed in EXACT INTEGER arithmetic so the keep decision is
    bit-reproducible across engines (no float ratios on the output
    surface):

      word count in [min_words, max_words]
      mean word length in [3, 10]      <=> 3*n_words <= chars <= 10*n_words
      >= 80% of words contain a letter <=> 5*n_alpha_words >= 4*n_words
      '#' and '...' each <= 10% of words (symbol-to-word ratio)
      >= 2 distinct stopwords present  (the "natural language" check)

    Pure JVM expressions over one projection — runs inside whole-stage
    codegen on the scan, no shuffle, no Python."""
    words = _words(F.col(text_col))
    text = F.col(text_col)
    n_words = F.size(words).cast("long")
    n_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("long")
    n_stop = F.size(F.array_intersect(
        F.array_distinct(words),
        F.array(*[F.lit(s) for s in STOPWORDS]))).cast("long")
    n_hash = (F.length(text)
              - F.length(F.replace(text, F.lit("#")))).cast("long")
    n_ellipsis = F.floor(
        (F.length(text) - F.length(F.replace(text, F.lit("..."))))
        / F.lit(3)).cast("long")
    keep = (n_words.between(min_words, max_words)
            & (3 * n_words <= n_word_chars) & (n_word_chars <= 10 * n_words)
            & (5 * n_alpha >= 4 * n_words)
            & (n_hash * 10 <= n_words) & (n_ellipsis * 10 <= n_words)
            & (n_stop >= 2))
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_word_chars.alias("n_word_chars"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stopwords"),
        n_hash.alias("n_hash"),
        n_ellipsis.alias("n_ellipsis"),
        keep.cast("int").alias("keep"))


def latest_by_key(df: DataFrame, key_cols: Sequence[str], order_col: str,
                  payload_cols: Sequence[str]) -> DataFrame:
    """Newest-row-per-key (the recrawl dedup of a web corpus: keep the
    latest capture per canonical URL). One hash agg keyed by key_cols using
    max_by over struct(order, payload) — deterministic under order ties via
    the payload tie-break, partial-aggregates map-side, and never
    materializes a window or sort. Emits key_cols + payload_cols +
    latest_<order_col> + n_versions."""
    ordkey = F.struct(F.col(order_col), *[F.col(c) for c in payload_cols])
    aggs = [F.max_by(F.col(c), ordkey).alias(c) for c in payload_cols]
    return df.groupBy(*key_cols).agg(
        *aggs,
        F.max(order_col).alias(f"latest_{order_col}"),
        F.count("*").alias("n_versions"))


def filter_blocked_hosts(pages: DataFrame, blocked_hosts: Iterable[str],
                         url_col: str = "url") -> DataFrame:
    """Drop pages whose URL host is on a blocklist (spam/adult/SEO domain
    lists are a standard first gate of web-corpus curation). The blocklist
    is a driver-side list turned into a BROADCAST left-anti join — the
    corpus never shuffles; at 10^12 rows this stays a scan-side filter.
    Adds a 'host' column to the survivors."""
    spark = pages.sparkSession
    bl = spark.createDataFrame([(h,) for h in sorted(set(blocked_hosts))],
                               "host string")
    host = F.regexp_extract(F.col(url_col), "^[a-z]+://([^/]+)", 1)
    return (pages.withColumn("host", host)
            .join(F.broadcast(bl), "host", "left_anti"))
