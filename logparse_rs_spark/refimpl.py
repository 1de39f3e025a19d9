"""Pure-Python canonical reference implementation (driver-side oracle).

Single-record implementations of the full parse -> enrich -> anonymize
semantics, used ONLY for tests and for generating expected outputs that the
distributed Spark pipeline must match byte-for-byte. API shape mirrors the
reference's Python surface (bindings/python/python/logparse_rs/rust_accel.py)
with canonical-semantics choices pinned in SURVEY.md §8.

Not a Spark execution path — the Spark operators in ``operators/`` re-express
these semantics as DataFrame plans + vectorized kernels.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Optional, Tuple

from .anonymizer import CompiledAnonymizer
from .kernels import extract_field, fnv1a_hash64, split_csv, strip_syslog_prefix
from .schema import CompiledSchema


class UnknownLogType(ValueError):
    pass


class MalformedLine(ValueError):
    pass


def parse_kv(line: str, schema: CompiledSchema, include_all: bool = False
             ) -> Dict[str, Optional[str]]:
    """Schema-driven positional key->value projection.

    Dispatch on CSV index 3 (parser.rs:7-24); missing trailing fields -> None;
    extra CSV fields dropped; duplicate sanitized name -> last position wins
    (src/lib.rs:34-41). include_all adds ``field_i`` keys for every CSV
    position not already a schema key (rust_accel.py:262-282).
    """
    t = extract_field(line, 3)
    if t is None:
        raise MalformedLine("Could not extract log type at index 3")
    names = schema.type_to_fields.get(t)
    if names is None:
        raise UnknownLogType(f"Unknown log type in schema: {t}")
    fields = split_csv(line)
    out: Dict[str, Optional[str]] = {}
    for i, name in enumerate(names):
        out[name] = fields[i] if i < len(fields) else None
    if include_all:
        for i, v in enumerate(fields):
            k = f"field_{i}"
            if k not in out:
                out[k] = v
    return out


def parse_kv_enriched(line: str, schema: CompiledSchema, include_all: bool = False
                      ) -> Dict:
    """Enriched parse: {parsed, raw_excerpt, hash64}. Timing fields from the
    reference are non-deterministic and become per-partition metrics instead
    (SURVEY §2.2 P12). raw_excerpt = first 256 chars (canonical, §8.3);
    hash64 = unsigned FNV-1a-64 of the line (§8.4).
    """
    return {
        "parsed": parse_kv(line, schema, include_all=include_all),
        "raw_excerpt": line[:256],
        "hash64": fnv1a_hash64(line),
    }


def parse_kv_enriched_anon(line: str, schema: CompiledSchema,
                           anon: CompiledAnonymizer, include_all: bool = False
                           ) -> Dict:
    """Anonymized enriched parse (bindings/python/src/lib.rs:337-378):
    every parsed (key, value) run through the anonymizer; null values and
    passthrough/reject keep the original; adds ``_anonymized: True``.
    """
    d = parse_kv_enriched(line, schema, include_all=include_all)
    d["parsed"] = anon.anonymize_record(d["parsed"])
    d["_anonymized"] = True
    return d


def parse_many(lines: Iterable[str], schema: CompiledSchema,
               anon: Optional[CompiledAnonymizer] = None,
               include_all: bool = False) -> Iterator[Dict]:
    """Iterator entry point: skip falsy lines, rstrip '\\n' only
    (rust_accel.py:473-506)."""
    for line in lines:
        if not line:
            continue
        line = line.rstrip("\n")
        if anon is not None:
            yield parse_kv_enriched_anon(line, schema, anon, include_all=include_all)
        else:
            yield parse_kv_enriched(line, schema, include_all=include_all)


def integrity_entries(parsed: Dict[str, Optional[str]],
                      anon: CompiledAnonymizer) -> List[Tuple[str, str, str]]:
    """(field, orig, repl) tuples the reference's integrity table would record
    for this record: everything anonymize_one returns Some for — i.e. all
    transformed values, *excluding* reject-misses and passthrough
    (table.rs:45-78)."""
    out = []
    for k, v in parsed.items():
        if v is None:
            continue
        plan = anon.plan_for(k)
        if plan.mode is None:
            continue
        if plan.mode == "map" and v not in plan.map and plan.fallback == "reject":
            continue
        repl = plan.apply_one(v, anon.default_salt)
        out.append((k, v, repl))
    return out


# ---------------------------------------------------------------------------
# whole-pipeline reference: pages table rows -> expected extracted records.
# This is the oracle for "byte-identical extracted text per url".
# ---------------------------------------------------------------------------

def extract_page_records(url: str, text: str, schema: CompiledSchema,
                         anon: Optional[CompiledAnonymizer] = None) -> List[Dict]:
    """Expected per-line records for one page, in (url, line_ordinal) order.

    Mirrors the Spark pipeline: split text on '\\n', strip syslog prefix,
    classify (ok / empty / unknown_type / malformed), parse + enrich
    (+ anonymize) the ok lines. Every input line yields a record carrying its
    status so routed-row counts are exactly reconstructable.
    """
    records = []
    for ordinal, raw_line in enumerate(text.split("\n")):
        line = strip_syslog_prefix(raw_line)
        rec: Dict = {
            "url": url,
            "line_ordinal": ordinal,
            "line": line,
            "status": "ok",
            "log_type": None,
            "parsed": None,
            "raw_excerpt": None,
            "hash64": None,
        }
        if line == "":
            rec["status"] = "empty"
            records.append(rec)
            continue
        t = extract_field(line, 3)
        if t is None:
            rec["status"] = "malformed"
            records.append(rec)
            continue
        rec["log_type"] = t
        if t not in schema.type_to_fields:
            rec["status"] = "unknown_type"
            records.append(rec)
            continue
        enriched = (parse_kv_enriched_anon(line, schema, anon)
                    if anon is not None else parse_kv_enriched(line, schema))
        rec["parsed"] = enriched["parsed"]
        rec["raw_excerpt"] = enriched["raw_excerpt"]
        rec["hash64"] = enriched["hash64"]
        records.append(rec)
    return records
