"""Link extraction + host graph over the pages html bytes (operators/links)."""

import pytest


@pytest.fixture()
def pages(spark):
    rows = [
        ("https://a.example.com/p1",
         b'<html><body><a href="https://b.example.com/x">l</a>'
         b'<a href="https://b.example.com/y">l</a>'
         b'<a href="/relative/path">l</a><pre>t</pre></body></html>'),
        ("https://b.example.com/p2",
         b'<html><body><a href="https://a.example.com/z">l</a>'
         b'<pre>t</pre></body></html>'),
        ("https://c.example.com/p3", b"<html><body><pre>no links</pre></body></html>"),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


class TestExtractLinks:
    def test_all_hrefs_extracted(self, spark, pages):
        from logparse_rs_spark.operators.links import extract_links
        got = sorted((r["src_url"], r["href"])
                     for r in extract_links(pages).collect())
        assert got == [
            ("https://a.example.com/p1", "/relative/path"),
            ("https://a.example.com/p1", "https://b.example.com/x"),
            ("https://a.example.com/p1", "https://b.example.com/y"),
            ("https://b.example.com/p2", "https://a.example.com/z"),
        ]


class TestHostEdges:
    def test_host_graph_counts_and_relative_dropped(self, spark, pages):
        from logparse_rs_spark.operators.links import host_edges
        got = {(r["src_host"], r["dst_host"]): r["n_links"]
               for r in host_edges(pages).collect()}
        # relative href has no parseable host -> dropped
        assert got == {("a.example.com", "b.example.com"): 2,
                       ("b.example.com", "a.example.com"): 1}

    def test_scan_side_no_python(self, spark, pages):
        from logparse_rs_spark.operators.links import host_edges
        plan = (host_edges(pages)
                ._jdf.queryExecution().executedPlan().toString())
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "Join" not in plan


class TestFixtureLinks:
    def test_fixture_pages_carry_deterministic_anchors(self, spark):
        from logparse_rs_spark.fixtures import make_page, _idx_map
        idx = _idx_map()
        a, b = make_page(7, idx), make_page(7, idx)
        assert a["html"] == b["html"]
        # text payload is byte-identical to what the parser consumes —
        # anchors live OUTSIDE the <pre> block
        assert a["text"].encode("utf-8") in a["html"]
        # across a window of pages, at least one page links out
        htmls = [make_page(s, idx)["html"] for s in range(20)]
        assert any(b"<a href=" in h for h in htmls)
