"""O4 — live HTTP HEAD probe (reference main.py:105-109).

The reference issues one ``requests.head(url, allow_redirects=True)``
per page and renders the redirect chain as raw header blocks. The Spark
analog probes a *column of urls*: ``mapInPandas`` over (deduplicated)
urls, one HEAD per row inside the Arrow batch iterator, emitting the
same ``HTTP/1.1 <code> <reason>`` header-block strings per hop.

Network access is environment-dependent, so the prober is injectable:
pass ``fetcher(url) -> [(status:int, reason:str, headers:dict)]`` (one
tuple per redirect hop) for tests/offline use; the default fetcher
imports ``requests`` lazily and raises with instructions when the
library (or the network) is unavailable — the Spark-side plumbing
(schema, batching, closure shipping) is real and tested either way.

Scale: probing is I/O-bound, not CPU-bound — ``repartition(n)`` the url
frame first to set the fleet-wide concurrency (n partitions = n
concurrent probe loops), and dedupe urls upstream so each target is hit
once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

CRLF = "\r\n"

HEAD_PROBE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("n_hops", T.IntegerType()),
    T.StructField("final_status", T.IntegerType()),
    T.StructField("header_blocks", T.ArrayType(T.StringType())),
])


def head_probe(urls: DataFrame, url_col: str = "url", fetcher=None) -> DataFrame:
    """(url) -> (url, n_hops, final_status, header_blocks).

    ``header_blocks`` holds one reference-format block per redirect hop:
    ``HTTP/1.1 <status> <reason>\\r\\n<Header: value>...\\r\\n`` —
    byte-identical to main.py:109's rendering.
    """

    def run(iterator):
        import pandas as pd

        def default_fetcher(url):
            try:
                import requests  # gated: not guaranteed in this container
            except ImportError as e:  # pragma: no cover - env dependent
                raise NotImplementedError(
                    "head_probe needs the 'requests' library (and network "
                    "access); install requests or pass fetcher=..."
                ) from e
            res = requests.head(url, allow_redirects=True)
            return [
                (r.status_code, r.reason, dict(r.headers))
                for r in (list(res.history) + [res])
            ]

        fetch = fetcher or default_fetcher
        for pdf in iterator:
            out = []
            for url in pdf[url_col]:
                hops = fetch(url)
                blocks = [
                    f"HTTP/1.1 {code} {reason}{CRLF}"
                    + CRLF.join(": ".join(i) for i in headers.items())
                    + CRLF
                    for code, reason, headers in hops
                ]
                out.append(
                    (url, len(hops), hops[-1][0] if hops else None, blocks)
                )
            yield pd.DataFrame(
                out, columns=["url", "n_hops", "final_status", "header_blocks"]
            )

    return urls.select(url_col).mapInPandas(run, schema=HEAD_PROBE_SCHEMA)
