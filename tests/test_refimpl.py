"""Canonical reference-implementation tests: schema-driven parse (port of
parser.rs:26-48), enriched/anonymized record shapes, include_all, duplicate
sanitized-name handling (SURVEY §8.5), and line hygiene."""

import json
import os

import pytest

from logparse_rs_spark.anonymizer import load_anonymizer
from logparse_rs_spark.refimpl import (
    MalformedLine,
    UnknownLogType,
    extract_page_records,
    integrity_entries,
    parse_kv,
    parse_kv_enriched,
    parse_kv_enriched_anon,
    parse_many,
)
from logparse_rs_spark.schema import compile_schema_dict, load_schema

HERE = os.path.dirname(__file__)
ROOT = os.path.join(HERE, "..")

MINI = load_schema(os.path.join(ROOT, "schemas", "schema_mini.json"))
FULL = load_schema(os.path.join(ROOT, "schemas", "schema.json"))
SAMPLE_ANON = load_anonymizer(os.path.join(ROOT, "configs", "anonymizer.sample.json"))

EXEMPLAR = (
    "1,2012/10/30 09:46:12,01606001116,TRAFFIC,start,1,2012/04/10 04:39:58,"
    "192.168.0.2,204.232.231.46,0.0.0.0,0.0.0.0,rule1,crusher,,web-browsing,"
    "vsys1,trust,untrust,ethernet1/2,ethernet1/1,forwardAll,2012/04/10 04:39:59,"
    "11449,1,59324,80,0,0,0x200000,tcp,allow,78,78,0,1,2012/04/10 04:39:59,0,"
    "any,0,0,0x0,192.168.0.0-192.168.255.255,United States,0,1,0"
)


class TestParseKv:
    # parser.rs:26-48 port
    def test_mini_schema_positional(self):
        m = parse_kv("x,y,z,TRAFFIC,sub,foo,bar,baz", MINI)
        assert m == {"f0": "x", "f1": "y", "f2": "z", "f3": "TRAFFIC"}

    def test_missing_trailing_fields_none(self):
        m = parse_kv("x,y,z,TRAFFIC", MINI)
        assert m == {"f0": "x", "f1": "y", "f2": "z", "f3": "TRAFFIC"}
        schema = compile_schema_dict({"log_types": {"T": ["a", "b", "c", "d", "e", "f"]}})
        m2 = parse_kv("1,2,3,T", schema)
        assert m2 == {"a": "1", "b": "2", "c": "3", "d": "T", "e": None, "f": None}

    def test_unknown_type_raises(self):
        with pytest.raises(UnknownLogType):
            parse_kv("x,y,z,NOPE,a", MINI)

    def test_malformed_raises(self):
        with pytest.raises(MalformedLine):
            parse_kv("x,y", MINI)

    def test_include_all_adds_index_keys(self):
        m = parse_kv("x,y,z,TRAFFIC,sub,foo", MINI, include_all=True)
        assert m["f0"] == "x"
        assert m["field_4"] == "sub"
        assert m["field_5"] == "foo"
        # schema keys not overwritten, no field_i duplicate for covered names
        assert "field_0" in m  # f0 is the schema key; field_0 also added
        assert m["field_0"] == "x"

    def test_duplicate_sanitized_name_last_position_wins(self):
        schema = compile_schema_dict(
            {"log_types": {"T": ["dup", "x", "dup", "type", "dup"]}}
        )
        m = parse_kv("a,b,c,T,e", schema)
        # dup appears at positions 0,2,4 -> last wins -> 'e'
        assert m["dup"] == "e"
        assert m["x"] == "b"
        assert m["type"] == "T"

    def test_exemplar_traffic_fields(self):
        m = parse_kv(EXEMPLAR, FULL)
        assert m["type"] == "TRAFFIC"
        assert m["source_address"] == "192.168.0.2"
        assert m["destination_address"] == "204.232.231.46"
        assert m["rule_name"] == "rule1"
        assert m["source_user"] == "crusher"
        assert m["application"] == "web-browsing"
        assert m["action"] == "allow"
        # 46-field line against 117 positions: trailing are None
        assert m["session_end_reason"] is None
        assert m["destination_dynamic_address_group"] is None

    def test_full_schema_field_counts(self):
        assert len(FULL.type_to_fields["TRAFFIC"]) == 117
        assert len(FULL.type_to_fields["THREAT"]) == 121
        assert set(FULL.known_types) == {
            "TRAFFIC", "THREAT", "GLOBALPROTECT", "DECRYPTION", "SCTP",
            "SYSTEM", "CONFIG", "HIPMATCH", "USERID", "IPTAG",
        }

    def test_traffic_duplicate_future_use_positions(self):
        names = FULL.type_to_fields["TRAFFIC"]
        assert names.count("future_use") >= 2  # duplicates preserved positionally
        eff = dict(FULL.effective_positions("TRAFFIC"))
        assert eff["future_use"] == max(
            i for i, n in enumerate(names) if n == "future_use"
        )


class TestEnriched:
    def test_shape_and_goldens(self):
        d = parse_kv_enriched(EXEMPLAR, FULL)
        assert set(d) == {"parsed", "raw_excerpt", "hash64"}
        assert d["raw_excerpt"] == EXEMPLAR[:256]
        assert d["hash64"] == 13818364382168973916

    def test_anon_variant(self):
        d = parse_kv_enriched_anon(EXEMPLAR, FULL, SAMPLE_ANON)
        assert d["_anonymized"] is True
        assert d["parsed"]["source_address"] == "SRC_707b7cbaa5e196f2"
        assert d["parsed"]["destination_address"] == "DST_3f845600c30f93f0"
        # unconfigured fields pass through
        assert d["parsed"]["application"] == "web-browsing"
        # nulls stay null
        assert d["parsed"]["session_end_reason"] is None

    def test_parse_many_line_hygiene(self):
        lines = ["", "x,y,z,TRAFFIC\n", None, "x,y,z,TRAFFIC"]
        out = list(parse_many([l for l in lines], MINI))
        assert len(out) == 2
        assert out[0]["parsed"]["f3"] == "TRAFFIC"
        assert out[0] == out[1]  # rstrip('\n') only


class TestIntegrityEntries:
    def test_entries_recorded(self):
        parsed = {"source_address": "1.2.3.4", "application": "ssl",
                  "user": "alice", "missing": None}
        entries = integrity_entries(parsed, SAMPLE_ANON)
        d = {(f, o): r for f, o, r in entries}
        assert ("user", "alice") in d and d[("user", "alice")] == "user_001"
        assert ("source_address", "1.2.3.4") in d
        # passthrough + nulls not recorded
        assert not any(f == "application" for f, _, _ in entries)
        assert not any(f == "missing" for f, _, _ in entries)

    def test_reject_miss_not_recorded(self):
        anon = load_anonymizer(os.path.join(ROOT, "configs", "anonymizer_unit.json"))
        entries = integrity_entries({"reject_field": "zzz"}, anon)
        assert entries == []


class TestExtractPageRecords:
    def test_statuses_and_ordinals(self):
        text = "\n".join([
            "Oct 30 09:46:12 host " + EXEMPLAR,  # syslog prefix -> ok
            "",                                   # empty
            "a,b",                                # malformed (no field 3)
            "a,b,c,NOPETYPE,x",                   # unknown_type
            EXEMPLAR,                             # ok
        ])
        recs = extract_page_records("https://d/p", text, FULL)
        assert [r["status"] for r in recs] == [
            "ok", "empty", "malformed", "unknown_type", "ok"]
        assert [r["line_ordinal"] for r in recs] == [0, 1, 2, 3, 4]
        assert recs[0]["line"] == EXEMPLAR  # byte-identical after strip
        assert recs[0]["hash64"] == recs[4]["hash64"] == 13818364382168973916
        assert recs[3]["log_type"] == "NOPETYPE"

    def test_anonymized_pipeline(self):
        recs = extract_page_records("u", EXEMPLAR, FULL, SAMPLE_ANON)
        assert recs[0]["parsed"]["source_address"] == "SRC_707b7cbaa5e196f2"
