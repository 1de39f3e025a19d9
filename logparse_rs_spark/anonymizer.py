"""Anonymizer configuration + compiled column plan (driver-side).

Config model mirrors crates/logparse_core/src/anonymizer/rules.rs:5-53 and the
resolution semantics of anonymizer/table.rs:17-78 (pinned in SURVEY.md §8.7):

- mode = field rule's mode, else defaults.mode, else passthrough.
- fixed = field.fixed else defaults.fixed else "REDACTED".
- when a field rule exists, its ``tokenize`` cfg is used wholesale: missing
  prefix -> "T_" (NOT the defaults' prefix); its salt (or "") is PREPENDED to
  the defaults' salt. With no field rule the defaults cfg is both the override
  and the base, so the defaults salt is chained twice (table.rs:31-36).
- map mode: field's dict; miss -> fallback in {tokenize (default), fixed,
  reject}; reject -> keep the ORIGINAL value (bindings/python/src/lib.rs:354-359).
- null/missing values are never anonymized (src/lib.rs:353).
- config "version" must be 1 when present (table.rs:83-87).

The compiled plan is pure per-field metadata; tokens are deterministic pure
functions so Spark needs no shared mutable integrity table — the audit table
is recovered afterwards as a distinct aggregation (SURVEY §2.7 M3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, Optional

from .kernels import tokenize_value

_VALID_MODES = {"fixed", "map", "tokenize"}
_VALID_FALLBACKS = {"tokenize", "fixed", "reject"}


@dataclass
class FieldPlan:
    """Resolved anonymization action for one field."""

    field_name: str
    mode: Optional[str]              # fixed | map | tokenize | None (passthrough)
    fixed: str                       # resolved constant (default "REDACTED")
    token_prefix: str                # resolved prefix (default "T_")
    field_salt: str                  # salt prepended before the default salt
    map: Dict[str, str] = field(default_factory=dict)
    fallback: str = "tokenize"       # tokenize | fixed | reject

    def apply_one(self, value: Optional[str], default_salt: str) -> Optional[str]:
        """Scalar application (the refimpl path). Returns the replacement, or
        the original value for passthrough / reject-miss / null."""
        if value is None or self.mode is None:
            return value
        if self.mode == "fixed":
            return self.fixed
        if self.mode == "tokenize":
            return tokenize_value(self.token_prefix, self.field_salt, default_salt, value)
        # map mode
        hit = self.map.get(value)
        if hit is not None:
            return hit
        if self.fallback == "fixed":
            return self.fixed
        if self.fallback == "reject":
            return value
        return tokenize_value(self.token_prefix, self.field_salt, default_salt, value)


@dataclass
class CompiledAnonymizer:
    default_salt: str
    default_mode: Optional[str]
    default_fixed: str
    default_prefix: str
    field_plans: Dict[str, FieldPlan]

    def plan_for(self, field_name: str) -> FieldPlan:
        """Resolve the plan for any field (configured or default-governed)."""
        fp = self.field_plans.get(field_name)
        if fp is not None:
            return fp
        # No field rule: defaults govern; tokenize cfg = defaults wholesale,
        # so the defaults salt acts as BOTH override and base (table.rs:24-26).
        return FieldPlan(
            field_name=field_name,
            mode=self.default_mode,
            fixed=self.default_fixed,
            token_prefix=self.default_prefix,
            field_salt=self.default_salt,
        )

    def active_fields(self, candidates) -> Dict[str, FieldPlan]:
        """Plans that actually transform something, for the given field names."""
        out = {}
        for name in candidates:
            plan = self.plan_for(name)
            if plan.mode is not None:
                out[name] = plan
        return out

    def anonymize_record(self, record: Dict[str, Optional[str]]) -> Dict[str, Optional[str]]:
        return {
            k: self.plan_for(k).apply_one(v, self.default_salt)
            for k, v in record.items()
        }


def compile_anonymizer(doc: dict) -> CompiledAnonymizer:
    version = doc.get("version")
    if version is not None and version != 1:
        raise ValueError(f"Unsupported anonymizer config version: {version}")
    defaults = doc.get("defaults", {}) or {}
    d_tok = defaults.get("tokenize", {}) or {}
    default_salt = d_tok.get("salt") or ""
    default_mode = defaults.get("mode")
    if default_mode is not None and default_mode not in _VALID_MODES:
        raise ValueError(f"Unknown anonymizer mode: {default_mode}")
    default_fixed = defaults.get("fixed") or "REDACTED"
    default_prefix = d_tok.get("prefix") or "T_"

    plans: Dict[str, FieldPlan] = {}
    for name, rule in (doc.get("fields", {}) or {}).items():
        rule = rule or {}
        mode = rule.get("mode") or default_mode
        if mode is not None and mode not in _VALID_MODES:
            raise ValueError(f"Unknown anonymizer mode for {name}: {mode}")
        fallback = rule.get("fallback") or "tokenize"
        if fallback not in _VALID_FALLBACKS:
            raise ValueError(f"Unknown fallback for {name}: {fallback}")
        tok = rule.get("tokenize", {}) or {}
        plans[name] = FieldPlan(
            field_name=name,
            mode=mode,
            fixed=rule.get("fixed") or defaults.get("fixed") or "REDACTED",
            # field rule present -> its tokenize cfg wholesale (table.rs:25)
            token_prefix=tok.get("prefix") or "T_",
            field_salt=tok.get("salt") or "",
            map=dict(rule.get("map", {}) or {}),
            fallback=fallback,
        )
    return CompiledAnonymizer(
        default_salt=default_salt,
        default_mode=default_mode,
        default_fixed=default_fixed,
        default_prefix=default_prefix,
        field_plans=plans,
    )


def load_anonymizer(path: str) -> CompiledAnonymizer:
    with open(path, "r", encoding="utf-8") as f:
        return compile_anonymizer(json.load(f))


def anonymizer_from_json(text: str) -> CompiledAnonymizer:
    return compile_anonymizer(json.loads(text))
