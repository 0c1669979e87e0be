"""Live CDX API source — a PySpark Python DataSource (O1/O2).

Batch ingestion at scale reads captured CDX dumps from parquet/text
(sources/captures.py); this source is the thin live-pull twin of the
reference's ``load_cdx_pages`` (main.py:112-126): page-count probe,
then per-page streaming of ``timestamp,statuscode,digest`` lines, hard
page cap MAXCDXPAGES (O2). The field list (``fl=``) is projection
pushdown into the HTTP API — the same 3 columns the reference requests.

Register and use:

    from trendmachine_spark.sources.cdx_live import CdxDataSource
    spark.dataSource.register(CdxDataSource)
    df = (spark.read.format("cdx")
          .option("url", "https://example.com/")
          .option("max_pages", "16")
          .load())

Network access is exercised only when actually loaded; construction and
page-partition planning are pure (unit-testable offline). Pages map to
input partitions, so a 2000-page pull fans out across executors instead
of streaming through one driver loop like the reference.
"""

from __future__ import annotations

from urllib.parse import quote_plus

from trendmachine_spark.params import CDXAPI, MAXCDXPAGES

try:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
    _HAVE_DATASOURCE_API = True
except ImportError:  # pyspark < 4
    DataSource = object
    DataSourceReader = object
    InputPartition = object
    _HAVE_DATASOURCE_API = False

CDX_SCHEMA = "url string, seq bigint, ts string, status string, digest string"


def cdx_page_url(url: str, page: int | None = None, count_pages: bool = False,
                 api: str = CDXAPI) -> str:
    """URL construction mirroring main.py:115-118 (pure, testable).
    ``api`` overrides the endpoint — a private mirror, or the
    loopback transcript server of tests/test_live_fixtures.py."""
    base = f"{api}?url={quote_plus(url)}"
    if count_pages:
        return f"{base}&showNumPages=true"
    return f"{base}&fl=timestamp,statuscode,digest&page={page}"


class CdxPagePartition(InputPartition):
    def __init__(self, url: str, page: int, api: str = CDXAPI):
        self.url = url
        self.page = page
        self.api = api


class CdxReader(DataSourceReader):
    def __init__(self, options):
        self.url = options.get("url")
        if not self.url:
            raise ValueError("cdx source requires option 'url'")
        self.max_pages = int(options.get("max_pages", MAXCDXPAGES))
        # endpoint override: partitions carry it so executor-side reads
        # (fresh worker processes — module state does NOT propagate)
        # hit the same server the planner probed
        self.api = options.get("api", CDXAPI)

    def _num_pages(self) -> int:
        import requests  # gated: only needed on an actual load

        text = requests.get(
            cdx_page_url(self.url, count_pages=True, api=self.api), timeout=60
        ).text
        return min(int(text), self.max_pages)

    def partitions(self):
        return [
            CdxPagePartition(self.url, p, self.api)
            for p in range(self._num_pages())
        ]

    def read(self, partition):
        import requests

        r = requests.get(
            cdx_page_url(partition.url, page=partition.page,
                         api=getattr(partition, "api", CDXAPI)),
            stream=True, timeout=300,
        )
        if not r.ok:
            raise ValueError(
                f"CDX API returned {r.status_code} for {partition.url!r} page {partition.page}"
            )
        base = partition.page * 10_000_000  # per-page seq namespace
        for i, line in enumerate(r.iter_lines()):
            parts = line.decode().split()
            if len(parts) >= 3:
                yield (partition.url, base + i, parts[0], parts[1], parts[2])


class CdxDataSource(DataSource):
    @classmethod
    def name(cls):
        return "cdx"

    def schema(self):
        return CDX_SCHEMA

    def reader(self, schema):
        return CdxReader(self.options)
