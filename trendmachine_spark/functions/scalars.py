"""Scalar column expression builders (reference parity: SURVEY.md §2.2).

All pure Catalyst expressions — no UDFs — so they stay inside
whole-stage codegen and push down to the scan where possible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from trendmachine_spark.params import WBM


def status_class(status: Column) -> Column:
    """Normalize a raw HTTP status token to its class ('2xx'..'5xx').

    Bug-compatible with the reference (main.py:147): the range test is a
    *lexicographic string* comparison between "200" and "599", so e.g.
    "3abc" classifies as "3xx" while "1999" or "0" pass through raw.
    """
    return F.when(
        status.between("200", "599"),
        F.concat(F.substring(status, 1, 1), F.lit("xx")),
    ).otherwise(status)


def day_string(ts: Column) -> Column:
    """14-digit timestamp string -> ISO day string 'YYYY-MM-DD' (main.py:146)."""
    return F.concat_ws(
        "-",
        F.substring(ts, 1, 4),
        F.substring(ts, 5, 2),
        F.substring(ts, 7, 2),
    )


def day_date(ts: Column) -> Column:
    """14-digit timestamp string -> DateType day."""
    return F.to_date(F.substring(ts, 1, 8), "yyyyMMdd")


def digest8(digest: Column) -> Column:
    """Truncate a content digest to 8 chars (main.py:152)."""
    return F.substring(digest, 1, 8)


def urim(datetime_col: Column, url: Column) -> Column:
    """Wayback replay URL for an observed day, '#' otherwise (main.py:231)."""
    return F.when(
        datetime_col != "~",
        F.concat_ws("/", F.lit(WBM), datetime_col, url),
    ).otherwise("#")


def ensure_scheme(url: Column) -> Column:
    """Prepend https:// unless the URL already has an http(s) scheme (main.py:588)."""
    return F.when(
        url.startswith("http://") | url.startswith("https://"), url
    ).otherwise(F.concat(F.lit("https://"), url))


def ymd(days: Column) -> Column:
    """Humanize a day count as '{y}y{m}m{d}d' (main.py:31-42).

    Bug-compatible quirks (goldens in FIXTURES.md §3.5): 365/30 arithmetic;
    once a year is present or months exceed 6, months round up when the
    day remainder > 15 and days are dropped; 12 months carry into a year.
    Examples: 45 -> '1m15d', 380 -> '1y', 395 -> '1y1m', 1000 -> '2y9m'.
    """
    d0 = days.cast("long")
    y = F.floor(d0 / 365)
    rem = d0 % 365
    m = F.floor(rem / 30)
    d = rem % 30
    round_up = (y > 0) | (m > 6)
    m2 = F.when(round_up & (d > 15), m + 1).otherwise(m)
    d2 = F.when(round_up, F.lit(0)).otherwise(d)
    y3 = F.when(m2 == 12, y + 1).otherwise(y)
    m3 = F.when(m2 == 12, F.lit(0)).otherwise(m2)
    return F.concat(
        F.when(y3 > 0, F.concat(y3.cast("string"), F.lit("y"))).otherwise(""),
        F.when(m3 > 0, F.concat(m3.cast("string"), F.lit("m"))).otherwise(""),
        F.when(d2 > 0, F.concat(d2.cast("string"), F.lit("d"))).otherwise(""),
    )


def ymd_py(days: int) -> str:
    """Driver-side twin of :func:`ymd` for metric formatting."""
    y, d = divmod(int(days), 365)
    m, d = divmod(d, 30)
    if y or m > 6:
        if d > 15:
            m += 1
        d = 0
    if m == 12:
        y += 1
        m = 0
    return "".join(f"{v}{k}" for k, v in (("y", y), ("m", m), ("d", d)) if v)


def ymd_sql(expr: str) -> str:
    """ANSI-SQL (DuckDB-compatible) rendering of :func:`ymd` over ``expr``.

    Used by oracle queries so the DuckDB side computes the identical
    humanized-duration string.
    """
    d0 = f"CAST({expr} AS BIGINT)"
    y = f"({d0} // 365)"
    rem = f"({d0} % 365)"
    m = f"({rem} // 30)"
    d = f"({rem} % 30)"
    round_up = f"(({y}) > 0 OR ({m}) > 6)"
    m2 = f"(CASE WHEN {round_up} AND {d} > 15 THEN {m} + 1 ELSE {m} END)"
    d2 = f"(CASE WHEN {round_up} THEN 0 ELSE {d} END)"
    y3 = f"(CASE WHEN {m2} = 12 THEN {y} + 1 ELSE {y} END)"
    m3 = f"(CASE WHEN {m2} = 12 THEN 0 ELSE {m2} END)"
    return (
        "concat("
        f"CASE WHEN {y3} > 0 THEN concat(CAST({y3} AS VARCHAR), 'y') ELSE '' END, "
        f"CASE WHEN {m3} > 0 THEN concat(CAST({m3} AS VARCHAR), 'm') ELSE '' END, "
        f"CASE WHEN {d2} > 0 THEN concat(CAST({d2} AS VARCHAR), 'd') ELSE '' END)"
    )
