"""Parity tests for the pure kernels — 1:1 ports of the reference's Rust unit
tests (tokenizer.rs:129-178, schema.rs:117-128) plus the pinned golden values
from FIXTURES.md §2/§4 and vectorized/scalar agreement checks."""

import numpy as np
import pandas as pd
import pytest

from logparse_rs_spark.kernels import (
    extract_field,
    fnv1a_hash64,
    fnv1a_series,
    sanitize_identifier,
    split_csv,
    split_csv_series,
    strip_syslog_prefix,
    strip_syslog_prefix_series,
    tokenize_series,
    tokenize_value,
)

EXEMPLAR = (
    "1,2012/10/30 09:46:12,01606001116,TRAFFIC,start,1,2012/04/10 04:39:58,"
    "192.168.0.2,204.232.231.46,0.0.0.0,0.0.0.0,rule1,crusher,,web-browsing,"
    "vsys1,trust,untrust,ethernet1/2,ethernet1/1,forwardAll,2012/04/10 04:39:59,"
    "11449,1,59324,80,0,0,0x200000,tcp,allow,78,78,0,1,2012/04/10 04:39:59,0,"
    "any,0,0,0x0,192.168.0.0-192.168.255.255,United States,0,1,0"
)


class TestSplitCsv:
    # port of tokenizer.rs test_split_csv_internal_basic_and_quotes
    def test_basic(self):
        assert split_csv("a,b,c") == ["a", "b", "c"]

    def test_quoted_with_comma_and_escaped_quotes(self):
        assert split_csv('"a,b","c""d""e",f') == ["a,b", 'c"d"e', "f"]

    def test_trailing_empty_field(self):
        assert split_csv("a,b,") == ["a", "b", ""]

    def test_empty_line_zero_fields(self):
        assert split_csv("") == []

    # FIXTURES.md §2 edge lines
    def test_post_quote_junk_discarded(self):
        assert split_csv('"ab"junk,c') == ["ab", "c"]

    def test_leading_comma(self):
        assert split_csv(",leading,comma") == ["", "leading", "comma"]

    def test_quoted_mixed(self):
        assert split_csv('"a,b","c""d",x') == ["a,b", 'c"d', "x"]

    def test_exemplar_field_count(self):
        assert len(split_csv(EXEMPLAR)) == 46
        assert split_csv(EXEMPLAR)[3] == "TRAFFIC"


class TestExtractField:
    # port of tokenizer.rs test_extract_field_internal
    CASES = [
        "a,b,c",
        'a,"b,c",d,,e',
        ",leading,comma",
        "trailing,comma,",
        'quoted,"""q"""',
    ]

    def test_consistency_with_split(self):
        for line in self.CASES:
            fields = split_csv(line)
            for idx in range(len(fields)):
                assert extract_field(line, idx) == fields[idx], (line, idx)

    def test_edge_idx_eq_len(self):
        for line in self.CASES:
            fields = split_csv(line)
            expected = None if line.endswith(",") else ""
            assert extract_field(line, len(fields)) == expected, line

    def test_out_of_range(self):
        for line in self.CASES:
            fields = split_csv(line)
            assert extract_field(line, len(fields) + 1) is None, line

    def test_embedded_quotes(self):
        assert extract_field('quoted,"""q"""', 1) == '"q"'


class TestFnv1a:
    def test_hello_golden(self):
        assert fnv1a_hash64("hello") == 0xA430D84680AABD0B

    def test_empty(self):
        assert fnv1a_hash64("") == 0xCBF29CE484222325

    def test_exemplar_golden(self):
        # FIXTURES.md §4
        assert fnv1a_hash64(EXEMPLAR) == 13818364382168973916

    def test_bytes_and_str_agree(self):
        assert fnv1a_hash64(b"hello") == fnv1a_hash64("hello")

    def test_vectorized_agrees_with_scalar(self):
        lines = pd.Series(["hello", "", EXEMPLAR, "a,b,c", None, "x" * 1000])
        got = fnv1a_series(lines)
        want = [fnv1a_hash64(s if s is not None else "") for s in lines]
        assert [int(g) for g in got] == want

    def test_vectorized_with_prefix(self):
        lines = pd.Series(["value1", "value2"])
        got = fnv1a_series(lines, prefix=b"salt")
        want = [fnv1a_hash64("saltvalue1"), fnv1a_hash64("saltvalue2")]
        assert [int(g) for g in got] == want

    def test_length_bucketing_many_rows(self):
        rng = np.random.default_rng(42)
        lens = rng.integers(0, 300, size=500)
        lines = pd.Series(["y" * int(n) for n in lens])
        got = fnv1a_series(lines)
        want = [fnv1a_hash64(s) for s in lines]
        assert [int(g) for g in got] == want


class TestSanitizeIdentifier:
    # port of schema.rs test_sanitize_identifier
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("Src IP", "src_ip"),
            ("src-ip", "src_ip"),
            ("9bad", "_9bad"),
            ("", "_"),
            ("a/b", "a_b"),
            ("  Pad  ", "pad"),
            ("weird!name", "weird_name"),
            ("_ok", "_ok"),
        ],
    )
    def test_cases(self, raw, expected):
        assert sanitize_identifier(raw) == expected


class TestTokenize:
    # FIXTURES.md §4 golden tokens under anonymizer.sample.json
    SALT = "demo-salt-change-me"

    @pytest.mark.parametrize(
        "prefix,value,expected",
        [
            ("SRC_", "192.168.0.2", "SRC_707b7cbaa5e196f2"),
            ("DST_", "204.232.231.46", "DST_3f845600c30f93f0"),
            ("R_", "rule1", "R_9f9975d15030369a"),
            ("USR_", "charlie", "USR_ba8eabbbbef52e7d"),
            ("fw_", "b309-fu-fw", "fw_18505487634f546b"),
        ],
    )
    def test_goldens(self, prefix, value, expected):
        assert tokenize_value(prefix, "", self.SALT, value) == expected

    def test_field_salt_prepended(self):
        # field salt prepends; equivalent to hashing the concatenation
        t = tokenize_value("T_", "fieldsalt", "base", "v")
        h = fnv1a_hash64("fieldsaltbasev")
        assert t == f"T_{h:016x}"

    def test_vectorized_agrees(self):
        vals = pd.Series(["192.168.0.2", None, "rule1", ""])
        got = tokenize_series(vals, "X_", "", self.SALT)
        assert got[0] == "X_" + tokenize_value("", "", self.SALT, "192.168.0.2")
        assert got[1] is None
        assert got[2] == "X_" + tokenize_value("", "", self.SALT, "rule1")
        assert got[3] == "X_" + tokenize_value("", "", self.SALT, "")


class TestSyslogPrefixStrip:
    def test_with_prefix(self):
        line = "Oct 30 09:46:12 host 1,2012/10/30,abc,TRAFFIC"
        assert strip_syslog_prefix(line) == "1,2012/10/30,abc,TRAFFIC"

    def test_without_prefix(self):
        assert strip_syslog_prefix("  1,a,b,TRAFFIC  ") == "1,a,b,TRAFFIC"

    def test_no_marker(self):
        assert strip_syslog_prefix("plain,line") == "plain,line"

    def test_first_occurrence_wins(self):
        line = "x 1,a 1,b"
        assert strip_syslog_prefix(line) == "1,a 1,b"

    def test_vectorized_agrees(self):
        lines = pd.Series(
            ["Oct 30 09:46:12 host 1,a,b,TRAFFIC", "  padded  ", "", None, "x 1,a 1,b"]
        )
        got = strip_syslog_prefix_series(lines)
        want = [strip_syslog_prefix(s if s is not None else "") for s in lines]
        assert list(got) == want


class TestSplitCsvSeries:
    def test_agrees_with_scalar(self):
        lines = pd.Series(
            ["a,b,c", "a,b,", "", '"a,b","c""d",x', '"ab"junk,c', ",leading,comma",
             EXEMPLAR, None, 'quoted,"""q"""']
        )
        got = split_csv_series(lines)
        want = [split_csv(s if s is not None else "") for s in lines]
        assert [list(g) for g in got] == want

    def test_all_quote_free_fast_path(self):
        lines = pd.Series(["a,b", "c,d,", ""])
        got = split_csv_series(lines)
        assert [list(g) for g in got] == [["a", "b"], ["c", "d", ""], []]
