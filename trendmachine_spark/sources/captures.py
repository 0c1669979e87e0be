"""Capture-log sources.

The engine's core source table is ``captures``:

    url: string        -- page identity; THE partition key at scale
    seq: long          -- arrival order within url (tie-break for equal ts)
    ts: string(14)     -- YYYYMMDDhhmmss capture time
    status: string     -- raw HTTP status token ('-' = revisit record)
    digest: string     -- content digest

The reference consumes one URL per session from the Wayback CDX API
(main.py:112-126, ``fl=timestamp,statuscode,digest``); at 100 TB we read
captured CDX dumps from parquet/text, partitioned by url. Sortedness is
never assumed: every downstream window orders by (ts, seq) explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CAPTURES_SCHEMA = "url string, seq bigint, ts string, status string, digest string"


#: per-file seq namespace width: up to 2^40 (~1.1e12) lines per file,
#: up to 2^23 (~8.3M) files before the long seq overflows
_SEQ_FILE_STRIDE = 1 << 40


def _file_uri(path: str) -> str:
    """Normalize a local path to the file: URI form input_file_name()
    reports; full URIs (hdfs://, s3a://, file:) pass through."""
    if "://" in path or path.startswith("file:"):
        return path
    from pathlib import Path

    return Path(path).absolute().as_uri()


def parse_cdx_lines(lines: DataFrame, url: str | None = None,
                    file_order: list[str] | None = None) -> DataFrame:
    """Tokenize raw CDX text lines into the captures schema (main.py:144-145).

    ``lines`` is a DataFrame with a ``value`` string column (e.g. from
    ``spark.read.text``) holding ``"<ts> <status> <digest>"`` rows, and
    optionally a ``url`` column; a constant ``url`` may be supplied instead.

    ``file_order`` (multi-file reads) closes the cross-file tie-break
    gap: pass the source files in ARRIVAL order (their URIs or local
    paths) and seq becomes ``file_rank * 2^40 + line_rank_within_file``
    — a total order that follows the declared file order regardless of
    Spark's file-enumeration or split-packing order, so equal-ts
    tie-breaks (revisit resolution, specimen first-wins) across file
    boundaries reproduce the original stream. Costs one bounded
    exchange (hash by source file). An input file missing from
    ``file_order`` fails the job loudly rather than silently
    misordering.

    Without ``file_order``, seq is a plain monotonically increasing id:
    exact in-file order for single-file reads (and per-partition dumps
    where a url never spans files); cdx_live.py namespaces seq per page
    and is immune either way.
    """
    parts = F.split(F.trim(F.col("value")), r"\s+")
    if file_order is None:
        out = lines.withColumn("seq", F.monotonically_increasing_id())
    else:
        from pyspark.sql import Window

        uris = [_file_uri(p) for p in file_order]
        rank_map = F.create_map(
            *[x for i, f in enumerate(uris) for x in (F.lit(f), F.lit(i))]
        )
        out = (
            lines.withColumn("_file", F.input_file_name())
            .withColumn("_rank", rank_map[F.col("_file")])
            .withColumn(
                "_line",
                F.row_number().over(
                    Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
                ),
            )
            # the unmatched-file check lives INSIDE the kept seq column
            # (a standalone assert column would be pruned unevaluated)
            .withColumn(
                "seq",
                F.coalesce(
                    F.col("_rank").cast("long") * F.lit(_SEQ_FILE_STRIDE) + F.col("_line"),
                    F.raise_error(
                        F.concat(F.lit("input file not in file_order: "), F.col("_file"))
                    ).cast("long"),
                ),
            )
        )
    if "url" not in lines.columns:
        out = out.withColumn("url", F.lit(url if url is not None else "~"))
    return out.select(
        "url",
        "seq",
        parts.getItem(0).alias("ts"),
        parts.getItem(1).alias("status"),
        parts.getItem(2).alias("digest"),
    )


def read_cdx_text(spark: SparkSession, paths: str | list[str],
                  url: str | None = None) -> DataFrame:
    """Read CDX dump file(s) with a file-order-exact seq.

    Arrival order across files is their SORTED path order (CDX dumps
    are conventionally date/page-stamped so lexicographic order is
    fetch order); pass ``parse_cdx_lines(..., file_order=...)`` your
    own list when it isn't. The file list is known driver-side from
    the paths argument — no data scan is spent discovering it.
    """
    if isinstance(paths, str):
        paths = [paths]
    return parse_cdx_lines(
        spark.read.text(list(paths)), url=url,
        file_order=sorted(_file_uri(p) for p in paths),
    )


def read_captures_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a pre-tokenized captures parquet dataset."""
    df = spark.read.parquet(path)
    missing = {"url", "ts", "status", "digest"} - set(df.columns)
    if missing:
        raise ValueError(f"captures parquet missing columns: {sorted(missing)}")
    if "seq" not in df.columns:
        df = df.withColumn("seq", F.monotonically_increasing_id())
    return df.select("url", "seq", "ts", "status", "digest")


def captures_from_fixture(spark: SparkSession, lines: list[str], url: str = "u") -> DataFrame:
    """Build a captures DataFrame from FIXTURES.md-style text lines (tests)."""
    rows = []
    for i, line in enumerate(lines):
        ts, status, digest = line.split()[:3]
        rows.append((url, i, ts, status, digest))
    return spark.createDataFrame(rows, CAPTURES_SCHEMA)


#: event_type -> raw status token mapping used to treat the driver's
#: ``events`` table as a captures analog (FIXTURES.md §1.3): statuses span
#: all four classes plus the '-' revisit marker so every capture operator
#: is exercised. 'signup' maps to '-' so revisit resolution has work to do.
EVENT_STATUS = {
    "click": "200",
    "view": "302",
    "purchase": "404",
    "error": "503",
    "signup": "-",
}


def events_as_captures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``events`` table to the captures schema.

    user_id -> url, ts -> 14-digit string, event_type -> status token,
    props' numeric payload -> digest (heavily reused across rows, which
    drives content-change + revisit semantics). Mirrored exactly by
    :func:`events_as_captures_sql` for the DuckDB oracle.
    """
    from trendmachine_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    status = F.lit(None).cast("string")
    for k, v in EVENT_STATUS.items():
        status = F.when(F.col("event_type") == k, F.lit(v)).otherwise(status)
    return e.select(
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("url"),
        F.col("event_id").alias("seq"),
        F.date_format("ts", "yyyyMMddHHmmss").alias("ts"),
        F.coalesce(status, F.col("event_type")).alias("status"),
        F.concat(F.lit("DG"), F.regexp_extract("props", "[0-9]+", 0), F.lit("000000")).alias("digest"),
    )


def events_as_captures_sql() -> str:
    """DuckDB CTE body equivalent to :func:`events_as_captures`."""
    cases = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in EVENT_STATUS.items())
    return f"""
    SELECT concat('user-', CAST(user_id AS VARCHAR)) AS url,
           event_id AS seq,
           strftime(ts, '%Y%m%d%H%M%S') AS ts,
           CASE event_type {cases} ELSE event_type END AS status,
           concat('DG', regexp_extract(props, '[0-9]+'), '000000') AS digest
    FROM events
    """
