"""Anonymizer semantics tests — port of the reference's Rust unit test
(anonymizer/table.rs:91-138) plus the SURVEY §8.7 resolution edge cases and
FIXTURES.md §4 golden tokens."""

import os

import pytest

from logparse_rs_spark.anonymizer import (
    anonymizer_from_json,
    compile_anonymizer,
    load_anonymizer,
)

HERE = os.path.dirname(__file__)
CONFIGS = os.path.join(HERE, "..", "configs")

UNIT_CFG = os.path.join(CONFIGS, "anonymizer_unit.json")
SAMPLE_CFG = os.path.join(CONFIGS, "anonymizer.sample.json")


@pytest.fixture
def unit():
    return load_anonymizer(UNIT_CFG)


@pytest.fixture
def sample():
    return load_anonymizer(SAMPLE_CFG)


class TestUnitConfigParity:
    # table.rs:91-138
    def test_tokenize_deterministic_with_prefix(self, unit):
        plan = unit.plan_for("ip")
        t1 = plan.apply_one("10.0.0.1", unit.default_salt)
        t2 = plan.apply_one("10.0.0.1", unit.default_salt)
        assert t1 == t2
        assert t1.startswith("T_")

    def test_map_hit(self, unit):
        assert unit.plan_for("username").apply_one("alice", unit.default_salt) == "A"

    def test_map_fallback_tokenize(self, unit):
        t = unit.plan_for("username").apply_one("bob", unit.default_salt)
        assert t.startswith("T_")

    def test_fixed_mode(self, unit):
        assert unit.plan_for("fixed_field").apply_one("anything", unit.default_salt) == "CONST"

    def test_reject_keeps_original(self, unit):
        # anonymize_one returns None; caller keeps original (src/lib.rs:354-359)
        assert unit.plan_for("reject_field").apply_one("x", unit.default_salt) == "x"

    def test_fixed_fallback(self, unit):
        assert unit.plan_for("fixed_fallback").apply_one("y", unit.default_salt) == "REDACTED"

    def test_null_never_anonymized(self, unit):
        assert unit.plan_for("ip").apply_one(None, unit.default_salt) is None


class TestResolutionEdges:
    def test_version_mismatch_rejected(self):
        with pytest.raises(ValueError, match="version"):
            anonymizer_from_json('{"version": 2, "defaults": {}}')

    def test_version_absent_ok(self):
        anonymizer_from_json('{"defaults": {}}')

    def test_no_mode_anywhere_passthrough(self):
        anon = compile_anonymizer({"defaults": {"tokenize": {"salt": "s"}}})
        assert anon.plan_for("anything").apply_one("v", anon.default_salt) == "v"

    def test_field_rule_prefix_not_defaults_prefix(self):
        # field rule present with no prefix -> "T_", NOT defaults' prefix
        anon = compile_anonymizer({
            "defaults": {"tokenize": {"prefix": "DEF_", "salt": "s"}},
            "fields": {"f": {"mode": "tokenize"}},
        })
        assert anon.plan_for("f").apply_one("v", anon.default_salt).startswith("T_")

    def test_no_field_rule_defaults_salt_doubled(self):
        # tk_ref = defaults when no field rule, so defaults salt chains twice
        # (table.rs:24-26,31-36)
        from logparse_rs_spark.kernels import tokenize_value
        anon = compile_anonymizer({
            "defaults": {"mode": "tokenize", "tokenize": {"prefix": "P_", "salt": "ss"}},
        })
        got = anon.plan_for("nofield").apply_one("v", anon.default_salt)
        assert got == tokenize_value("P_", "ss", "ss", "v")

    def test_field_salt_prepended_to_default_salt(self):
        from logparse_rs_spark.kernels import tokenize_value
        anon = compile_anonymizer({
            "defaults": {"tokenize": {"salt": "base"}},
            "fields": {"f": {"mode": "tokenize", "tokenize": {"salt": "fld"}}},
        })
        got = anon.plan_for("f").apply_one("v", anon.default_salt)
        assert got == tokenize_value("T_", "fld", "base", "v")

    def test_fixed_missing_value_redacted(self):
        anon = compile_anonymizer({"fields": {"f": {"mode": "fixed"}}})
        assert anon.plan_for("f").apply_one("v", anon.default_salt) == "REDACTED"

    def test_fixed_falls_back_to_defaults_fixed(self):
        anon = compile_anonymizer({
            "defaults": {"fixed": "DFIX"},
            "fields": {"f": {"mode": "fixed"}},
        })
        assert anon.plan_for("f").apply_one("v", anon.default_salt) == "DFIX"

    def test_field_mode_falls_back_to_defaults_mode(self):
        anon = compile_anonymizer({
            "defaults": {"mode": "fixed", "fixed": "X"},
            "fields": {"f": {"tokenize": {"prefix": "Z_"}}},
        })
        assert anon.plan_for("f").apply_one("v", anon.default_salt) == "X"


class TestSampleConfigGoldens:
    # FIXTURES.md §4
    @pytest.mark.parametrize(
        "field_name,orig,expected",
        [
            ("source_address", "192.168.0.2", "SRC_707b7cbaa5e196f2"),
            ("destination_address", "204.232.231.46", "DST_3f845600c30f93f0"),
            ("rule", "rule1", "R_9f9975d15030369a"),
            ("user", "charlie", "USR_ba8eabbbbef52e7d"),
            ("user", "alice", "user_001"),
            ("user", "bob", "user_002"),
            ("device_name", "b309-fu-fw", "fw_18505487634f546b"),
        ],
    )
    def test_goldens(self, sample, field_name, orig, expected):
        assert sample.plan_for(field_name).apply_one(orig, sample.default_salt) == expected

    def test_unconfigured_field_passthrough(self, sample):
        # sample defaults have no mode -> unconfigured fields pass through
        assert sample.plan_for("application").apply_one("ssl", sample.default_salt) == "ssl"

    def test_active_fields(self, sample):
        active = sample.active_fields(["source_address", "application", "user"])
        assert set(active) == {"source_address", "user"}
