"""WARC source: Common-Crawl's native page format -> the pages schema
(url, warc_ts, html, text, lang).

Spark-first shape: `spark.read.format("binaryFile")` turns each WARC file
into one row (path, content); an Arrow-batched mapInPandas generator parses
the records and emits page rows. File = split granularity, which matches how
Common-Crawl ships WARCs (~1 GB members); at 10^12 docs the parallelism is
the file count (hundreds of thousands), not intra-file splits. The parser
here handles uncompressed WARC/1.0 response/resource records with exact
Content-Length framing — the container has no warcio/gzip-member tooling,
and the framing logic (not codec plumbing) is the part worth pinning.

Text extraction is a deterministic tag-strip heuristic (script/style blocks
dropped, tags removed, entities for &amp;/&lt;/&gt;/&quot;/&#39; decoded,
whitespace collapsed) — the place a production pipeline plugs its real
extractor; byte-identical behavior is pinned by tests so the parse ->
anonymize pipeline downstream sees stable text.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

_CRLF = b"\r\n"
_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_BLOCK_RE = re.compile(
    r"(?i)<(?:br\s*/?|/(?:p|div|tr|li|h[1-6]|table|ul|ol|pre|blockquote))\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_HWS_RE = re.compile(r"[ \t\f\v]+")
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]


def iter_warc_records(data: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC/1.0 record in an uncompressed WARC
    byte string. Framing: header block ends at CRLFCRLF; payload is exactly
    Content-Length bytes; records are separated by CRLFCRLF."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body_start = head_end + 4
        yield headers, data[body_start:body_start + length]
        pos = body_start + length


def _http_body(payload: bytes) -> bytes:
    """response records wrap the page in an HTTP message; resource records
    carry it bare."""
    if payload.startswith(b"HTTP/"):
        sep = payload.find(_CRLF + _CRLF)
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def extract_text(html: bytes) -> str:
    """Deterministic tag-strip text extraction, LINE-PRESERVING: block-level
    boundaries (<br>, </p>, </div>, ...) and raw newlines become line breaks
    so the downstream line-oriented parse sees one record per source line;
    horizontal whitespace collapses within a line; empty lines drop."""
    s = html.decode("utf-8", "replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    lines = (_HWS_RE.sub(" ", ln).strip() for ln in re.split(r"[\r\n]+", s))
    return "\n".join(ln for ln in lines if ln)


def _parse_ts(v: Optional[str]):
    if not v:
        return None
    try:
        return pd.Timestamp(v).tz_localize(None) \
            if pd.Timestamp(v).tzinfo is None else \
            pd.Timestamp(v).tz_convert("UTC").tz_localize(None)
    except Exception:
        return None


def read_warc_pages(spark: SparkSession, path: str,
                    lang_default: str = "und") -> DataFrame:
    """WARC files -> pages DataFrame. Only response/resource records with a
    WARC-Target-URI become rows; metadata/request records are skipped."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [],
                    "lang": []}
            for content in pdf["content"]:
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    # Common-Crawl ships multi-member gzip; gzip.decompress
                    # concatenates members
                    data = gzip.decompress(data)
                for headers, payload in iter_warc_records(data):
                    if headers.get("warc-type") not in ("response",
                                                        "resource"):
                        continue
                    url = headers.get("warc-target-uri")
                    if not url:
                        continue
                    body = _http_body(payload)
                    rows["url"].append(url)
                    rows["warc_ts"].append(_parse_ts(headers.get("warc-date")))
                    rows["html"].append(body)
                    rows["text"].append(extract_text(body))
                    rows["lang"].append(lang_default)
            yield pd.DataFrame(rows)

    return files.mapInPandas(parse, schema=PAGES_SCHEMA)


def write_warc(path: str, records) -> None:
    """Test/fixture helper: write (url, iso_ts, html_bytes) triples as an
    uncompressed WARC/1.0 file of response records."""
    with open(path, "wb") as f:
        for url, ts, html in records:
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + html)
            head = (f"WARC/1.0\r\n"
                    f"WARC-Type: response\r\n"
                    f"WARC-Target-URI: {url}\r\n"
                    f"WARC-Date: {ts}\r\n"
                    f"Content-Length: {len(http)}\r\n"
                    f"\r\n").encode()
            f.write(head + http + _CRLF + _CRLF)
