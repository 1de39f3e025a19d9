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


class TestExtractAnchors:
    def test_href_and_visible_text(self, spark):
        from logparse_rs_spark.operators.links import extract_anchors
        rows = [
            ("https://a.example.com/p1",
             b'<html><body><a href="https://b.example.com/x">Big News</a>'
             b'<a href="https://c.example.com/y"></a>'
             b'<pre>t</pre></body></html>'),
        ]
        pages = spark.createDataFrame(rows, "url string, html binary")
        got = sorted((r["href"], r["anchor_text"])
                     for r in extract_anchors(pages).collect())
        assert got == [("https://b.example.com/x", "Big News"),
                       ("https://c.example.com/y", "")]

    def test_anchor_terms_profile(self, spark):
        from logparse_rs_spark.operators.links import anchor_text_terms
        rows = [
            ("https://a.example.com/p1",
             b'<a href="https://b.example.com/x">Hot News</a>'
             b'<a href="https://b.example.com/y">news today</a>'
             b'<a href="/rel">dropped host</a>'),
            ("https://c.example.com/p2",
             b'<a href="https://b.example.com/z">NEWS</a>'),
        ]
        pages = spark.createDataFrame(rows, "url string, html binary")
        got = {(r["dst_host"], r["term"]): r["n_anchors"]
               for r in anchor_text_terms(pages).collect()}
        assert got == {("b.example.com", "news"): 3,
                       ("b.example.com", "hot"): 1,
                       ("b.example.com", "today"): 1}

    def test_scan_side_no_python_no_join(self, spark, pages):
        from logparse_rs_spark.operators.links import anchor_text_terms
        plan = (anchor_text_terms(pages)
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

    def test_fixture_anchor_text_from_vocab(self, spark):
        # v3: anchor inner text is a pure function of the target id,
        # drawn from ANCHOR_VOCAB — deterministic and rng-stream-free
        import re
        from logparse_rs_spark.fixtures import (make_page, _idx_map,
                                                ANCHOR_VOCAB)
        idx = _idx_map()
        texts = []
        for s in range(40):
            h = make_page(s, idx)["html"].decode("utf-8")
            texts += re.findall(r'">([^<]*)</a>', h)
        assert texts, "expected at least one anchor in 40 pages"
        for t in texts:
            w = t.split(" ")
            assert len(w) == 2 and all(x in ANCHOR_VOCAB for x in w)


class TestHostProfile:
    def test_hand_case(self, spark):
        from logparse_rs_spark.operators.links import host_profile
        rows = [
            ("https://a.example.com/p1",
             b'<a href="https://b.example.com/x">n</a>12345'),
            ("https://a.example.com/p2", b'no links here'),
            ("https://b.example.com/p1",
             b'<a href="https://a.example.com/">x</a>'
             b'<a href="/rel">y</a>'),
            ("not-a-url", b'dropped'),
        ]
        pages = spark.createDataFrame(rows, "url string, html binary")
        got = {r["host"]: (r["n_pages"], r["total_bytes"], r["n_links"],
                           r["links_per_page_ppm"])
               for r in host_profile(pages).collect()}
        assert got == {
            "a.example.com": (2, len(rows[0][1]) + len(rows[1][1]), 1,
                              500000),
            "b.example.com": (1, len(rows[2][1]), 2, 2000000),
        }

    def test_scan_side_jvm_only(self, spark, pages):
        from logparse_rs_spark.operators.links import host_profile
        plan = (host_profile(pages)
                ._jdf.queryExecution().executedPlan().toString())
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "Join" not in plan
