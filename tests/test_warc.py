"""WARC source: record framing, HTTP unwrap, text extraction, and the
end-to-end WARC -> pages -> parse pipeline hop."""

import pytest

from logparse_rs_spark.sources.warc import (extract_text, iter_warc_records,
                                            read_warc_pages, write_warc)


@pytest.fixture()
def warc_file(tmp_path):
    p = tmp_path / "pages.warc"
    html1 = (b"<html><head><script>var x=1;</script>"
             b"<style>p{}</style></head>"
             b"<body><p>Hello &amp; welcome</p>\n<div>to the  page</div>"
             b"</body></html>")
    html2 = b"<html><body>1,2021/01/01 00:00:00,01606001116,SYSTEM,x</body></html>"
    write_warc(str(p), [
        ("https://a.example/x", "2021-06-01T12:00:00Z", html1),
        ("https://b.example/y", "2021-06-02T00:30:15Z", html2),
    ])
    return str(p)


class TestFraming:
    def test_iter_records_exact_lengths(self, warc_file):
        data = open(warc_file, "rb").read()
        recs = list(iter_warc_records(data))
        assert len(recs) == 2
        for headers, payload in recs:
            assert headers["warc-type"] == "response"
            assert len(payload) == int(headers["content-length"])

    def test_binary_payload_with_crlf_inside(self, tmp_path):
        # Content-Length framing must survive CRLFCRLF bytes INSIDE a body
        p = tmp_path / "t.warc"
        tricky = b"abc\r\n\r\ndef"
        write_warc(str(p), [("u:1", "2021-01-01T00:00:00Z", tricky)])
        (headers, payload), = iter_warc_records(open(p, "rb").read())
        assert payload.endswith(tricky)


class TestTextExtraction:
    def test_strip_tags_scripts_entities(self):
        html = (b"<html><script>no()</script><b>A &lt;tag&gt; &amp; more"
                b"</b>  <i>words</i></html>")
        assert extract_text(html) == "A <tag> & more words"

    def test_blocks_and_newlines_become_lines(self):
        html = (b"<html><body>line one<br>line  two</p>\n"
                b"<div>line three</div></body></html>")
        assert extract_text(html) == "line one\nline two\nline three"


class TestReadWarcPages:
    def test_pages_schema_and_values(self, spark, warc_file):
        df = read_warc_pages(spark, warc_file)
        rows = {r["url"]: r for r in df.collect()}
        assert set(rows) == {"https://a.example/x", "https://b.example/y"}
        a = rows["https://a.example/x"]
        assert a["text"] == "Hello & welcome\nto the page"
        assert bytes(a["html"]).startswith(b"<html>")
        assert str(a["warc_ts"]).startswith("2021-06-01 12:00:00")

    def test_warc_feeds_parse_pipeline(self, spark, warc_file):
        import os
        from logparse_rs_spark.operators.parse import parse_pages
        from logparse_rs_spark.schema import load_schema
        ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
        schema = load_schema(os.path.join(ROOT, "schemas", "schema.json"))
        pages = read_warc_pages(spark, warc_file)
        parsed = parse_pages(pages, schema)
        ok = parsed.filter("status = 'ok'").select("url", "log_type").collect()
        assert [(r["url"], r["log_type"]) for r in ok] == \
            [("https://b.example/y", "SYSTEM")]


class TestGzippedWarc:
    def test_multi_member_gzip(self, spark, tmp_path):
        import gzip
        raw1, raw2 = tmp_path / "a.warc", tmp_path / "b.warc"
        write_warc(str(raw1), [("u:1", "2021-01-01T00:00:00Z", b"<p>one</p>")])
        write_warc(str(raw2), [("u:2", "2021-01-02T00:00:00Z", b"<p>two</p>")])
        gz = tmp_path / "pages.warc.gz"
        # two independent gzip MEMBERS concatenated (the Common-Crawl shape)
        with open(gz, "wb") as f:
            f.write(gzip.compress(open(raw1, "rb").read()))
            f.write(gzip.compress(open(raw2, "rb").read()))
        df = read_warc_pages(spark, str(gz))
        got = {r["url"]: r["text"] for r in df.collect()}
        assert got == {"u:1": "one", "u:2": "two"}


class TestWarcPipeline:
    def test_full_pipeline_from_warc(self, spark, tmp_path):
        """North-rule shape from the web-native format: WARC pages ->
        parse -> anonymize -> route -> aggregate, counts intact."""
        import os
        from logparse_rs_spark.plans.pipeline import (PipelineConfig,
                                                      default_sinks,
                                                      run_pipeline)
        from logparse_rs_spark.schema import load_schema
        ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
        line_t = ("1,2021/01/01 00:00:00,01606001116,TRAFFIC,start,1,"
                  "2021/01/01 00:00:00,10.0.0.%d,10.0.1.%d,0.0.0.0,0.0.0.0,"
                  "r1,u1,,web-browsing,vsys1")
        line_s = "x,y,z,SYSTEM,sub,evt"
        recs = []
        for i in range(12):
            body = "<html><body>{}\n{}</body></html>".format(
                line_t % (i, i), line_s).encode()
            recs.append((f"https://w.example/p{i}",
                         "2021-06-01T00:00:00Z", body))
        warc = tmp_path / "in.warc"
        write_warc(str(warc), recs)

        pages = read_warc_pages(spark, str(warc))
        schema = load_schema(os.path.join(ROOT, "schemas", "schema.json"))
        cfg = PipelineConfig(
            schema_path=os.path.join(ROOT, "schemas", "schema.json"),
            anonymizer_path=os.path.join(ROOT, "configs",
                                         "anonymizer.sample.json"),
            out_root=str(tmp_path / "out"),
            sinks=default_sinks(schema),
            n_buckets=4)
        res = run_pipeline(spark, pages, cfg, resume=False)
        assert res.docs_in == 12
        assert res.per_sink_rows.get("sink_traffic") == 12
        assert res.per_sink_rows.get("sink_other/log_type=SYSTEM") == 12
