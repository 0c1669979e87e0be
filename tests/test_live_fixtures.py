"""Recorded-transcript integration fixtures for the live HTTP paths
(round-5 mandate #7): a loopback http.server replays canned CDX API and
redirect-chain transcripts, driving the REAL requests stack through the
real DataSource partition planner (page-count probe -> page partitions
-> per-page streaming) and the real head_probe default fetcher — no
external network, no fake fetcher injection.

Parity: the rows the DataSource yields must equal parse_cdx_lines run
on the same raw bytes (modulo the source's per-page seq namespace).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

requests = pytest.importorskip("requests")

# FIXTURES.md §2-style CDX lines, two pages of a paginated pull
PAGE0 = [
    "20200101010000 301 AAAA1111X",
    "20200101020000 200 BBBB2222Y",
    "20200102030000 - BBBB2222Y",
]
PAGE1 = [
    "20200103000000 200 CCCC3333Z",
    "20200104000000 503 DDDD4444W",
]
PAGES = {0: PAGE0, 1: PAGE1}
REPORTED_PAGES = 5  # server claims 5; the source's max_pages caps at 2


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # keep pytest output clean
        pass

    def _send(self, status: int, body: bytes = b"",
              headers: dict | None = None):
        self.send_response(status)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD" and body:
            self.wfile.write(body)

    def do_GET(self):
        q = parse_qs(urlparse(self.path).query)
        if q.get("showNumPages") == ["true"]:
            self._send(200, f"{REPORTED_PAGES}\n".encode())
            return
        assert q.get("fl") == ["timestamp,statuscode,digest"], (
            "fl= projection pushdown missing from the page request"
        )
        page = int(q["page"][0])
        body = ("\n".join(PAGES.get(page, [])) + "\n").encode()
        self._send(200, body)

    def do_HEAD(self):
        path = urlparse(self.path).path
        if path == "/old":
            self._send(301, headers={"Location": "/new",
                                     "X-Hop": "first"})
        elif path == "/new":
            self._send(200, headers={"Content-Type": "text/html",
                                     "X-Hop": "second"})
        else:
            self._send(404)


@pytest.fixture(scope="module")
def http_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_cdx_datasource_replays_paginated_transcript(spark, http_server):
    from trendmachine_spark.sources.captures import parse_cdx_lines
    from trendmachine_spark.sources.cdx_live import CdxDataSource

    spark.dataSource.register(CdxDataSource)
    df = (
        spark.read.format("cdx")
        .option("url", "https://example.com/")
        .option("max_pages", "2")       # page cap (O2): server claims 5
        .option("api", http_server + "/cdx")
        .load()
    )
    rows = sorted(map(tuple, df.collect()), key=lambda r: r[1])

    # page cap honored: exactly pages 0-1, in their per-page namespaces
    assert [r[1] for r in rows] == [0, 1, 2, 10_000_000, 10_000_001]

    # parity with parse_cdx_lines on the same raw bytes, page by page
    for page, lines in PAGES.items():
        want = parse_cdx_lines(
            spark.createDataFrame([(l,) for l in lines], "value string"),
            url="https://example.com/",
        ).collect()
        got = [r for r in rows if r[1] // 10_000_000 == page]
        assert [(r[2], r[3], r[4]) for r in got] == \
            [(w["ts"], w["status"], w["digest"]) for w in want]
        assert all(r[0] == "https://example.com/" for r in got)


def test_head_probe_follows_recorded_redirect_chain(spark, http_server):
    from trendmachine_spark.sources.head_probe import CRLF, head_probe

    urls = spark.createDataFrame(
        [(http_server + "/old",), (http_server + "/new",)], "url string"
    )
    got = {r["url"]: r for r in head_probe(urls).collect()}

    chain = got[http_server + "/old"]
    assert chain["n_hops"] == 2 and chain["final_status"] == 200
    assert chain["header_blocks"][0].startswith(f"HTTP/1.1 301 Moved Permanently{CRLF}")
    assert f"X-Hop: first{CRLF}" in chain["header_blocks"][0] + CRLF
    assert chain["header_blocks"][1].startswith(f"HTTP/1.1 200 OK{CRLF}")
    assert "X-Hop: second" in chain["header_blocks"][1]

    direct = got[http_server + "/new"]
    assert direct["n_hops"] == 1 and direct["final_status"] == 200
