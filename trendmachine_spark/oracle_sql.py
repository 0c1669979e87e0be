"""Shared DuckDB-SQL building blocks for the oracle queries.

Every SQL fragment here mirrors a Spark operator 1:1 (same window
specs, same tie-breaks, same arithmetic shapes) so the driver's
order-insensitive value-hash matches bit-for-bit. Float outputs are
restricted to IEEE operations on exactly-representable inputs (integer
counts/ratios, decimal-exact sums) — never engine-internal float
accumulation, whose ordering differs between engines.
"""

from __future__ import annotations

from trendmachine_spark.sources.captures import events_as_captures_sql

#: captures analog of the driver's events table (see sources/captures.py)
CAPTURES = events_as_captures_sql()

#: O3/O7/O8/O10 — tokenized + classified captures
CLASSED = f"""
captures AS ({CAPTURES}),
classed AS (
  SELECT url, seq, ts,
         concat(substr(ts, 1, 4), '-', substr(ts, 5, 2), '-', substr(ts, 7, 2)) AS day,
         CASE WHEN status BETWEEN '200' AND '599'
              THEN concat(substr(status, 1, 1), 'xx') ELSE status END AS cls_raw,
         digest
  FROM captures
)"""

#: O9 — revisit resolution via running last-non-revisit class per digest
NORM = f"""{CLASSED},
norm AS (
  SELECT url, seq, ts, day,
         CASE WHEN cls_raw = '-'
              THEN coalesce(
                last_value(CASE WHEN cls_raw <> '-' THEN cls_raw END IGNORE NULLS)
                  OVER (PARTITION BY url, digest ORDER BY ts, seq
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                '~')
              ELSE cls_raw END AS cls,
         substr(digest, 1, 8) AS digest8
  FROM classed
)"""

#: O20/O21 prep — priorities, run-change flags, running transition sums
FLAGS = f"""{NORM},
flags AS (
  SELECT *,
         CASE WHEN cls <> coalesce(lag(cls) OVER w, '~') THEN 1 ELSE 0 END AS chg,
         row_number() OVER w AS rn,
         CASE cls WHEN '2xx' THEN 4 WHEN '4xx' THEN 3 WHEN '5xx' THEN 2
                  WHEN '3xx' THEN 1 ELSE 0 END AS pr
  FROM norm
  WINDOW w AS (PARTITION BY url ORDER BY ts, seq)
),
flags2 AS (
  SELECT *,
         SUM(chg) OVER (PARTITION BY url ORDER BY ts, seq
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS us,
         -- 998 PRECEDING: the 1000-row window holds 999 internal
         -- boundaries (ring-buffer eviction off-by-one; rollup.py)
         SUM(chg) OVER (PARTITION BY url ORDER BY ts, seq
                        ROWS BETWEEN 998 PRECEDING AND CURRENT ROW) AS uw
  FROM flags
)"""

#: O17/O19/O20/O21/O22 — the per-(url, day) rollup
DAILY = f"""{FLAGS},
counts AS (
  SELECT url, day,
         CAST(SUM(CASE WHEN cls = '2xx' THEN 1 ELSE 0 END) AS BIGINT) AS c2xx,
         CAST(SUM(CASE WHEN cls = '3xx' THEN 1 ELSE 0 END) AS BIGINT) AS c3xx,
         CAST(SUM(CASE WHEN cls = '4xx' THEN 1 ELSE 0 END) AS BIGINT) AS c4xx,
         CAST(SUM(CASE WHEN cls = '5xx' THEN 1 ELSE 0 END) AS BIGINT) AS c5xx
  FROM norm GROUP BY url, day
),
spec AS (
  SELECT url, day, cls AS specimen, ts AS datetime, digest8 AS digest
  FROM flags
  QUALIFY row_number() OVER (PARTITION BY url, day ORDER BY pr DESC, ts, seq) = 1
),
closing AS (
  SELECT url, day,
         CAST(us AS DOUBLE) / rn AS chaos,
         CAST(uw AS DOUBLE) / least(1000, rn) AS chaosn
  FROM flags2
  QUALIFY row_number() OVER (PARTITION BY url, day ORDER BY ts DESC, seq DESC) = 1
),
daily AS (
  SELECT url, day, c2xx, c3xx, c4xx, c5xx,
         c2xx + c3xx + c4xx + c5xx AS all_cnt,
         specimen, datetime, digest, chaos, chaosn
  FROM counts
  JOIN spec USING (url, day)
  JOIN closing USING (url, day)
),
daily2 AS (
  SELECT *,
         CASE WHEN digest = coalesce(lag(digest)
                OVER (PARTITION BY url ORDER BY day), '~')
              THEN 'Unchanged' ELSE 'Changed' END AS content
  FROM daily
)"""

#: O31 — per-url date spine from first observed day to the global max day
SPINE = f"""{DAILY},
bounds AS (SELECT url, min(day) AS first_day FROM daily GROUP BY url),
maxd AS (SELECT max(day) AS last_day FROM daily),
spine AS (
  SELECT url, strftime(d, '%Y-%m-%d') AS day
  FROM bounds, maxd,
       unnest(generate_series(CAST(first_day AS DATE), CAST(last_day AS DATE),
                              INTERVAL 1 DAY)) AS t(d)
)"""


def gap_pairs_sql(fill: int) -> str:
    """O32 prep — consecutive observed-day pairs with qualifying gaps."""
    threshold = "" if fill == -1 else f" AND gap <= {fill}"
    return f"""{DAILY},
pairs AS (
  SELECT url, day, specimen,
         lead(day) OVER w AS next_day,
         lead(specimen) OVER w AS next_specimen
  FROM daily
  WINDOW w AS (PARTITION BY url ORDER BY day)
),
gaps AS (
  SELECT * FROM (
    SELECT *, datediff('day', CAST(day AS DATE), CAST(next_day AS DATE)) - 1 AS gap
    FROM pairs
  ) WHERE gap >= 1{threshold}
),
interior AS (
  SELECT url, specimen, next_specimen, gap,
         strftime(d, '%Y-%m-%d') AS fill_day,
         datediff('day', CAST(day AS DATE), d) - 1 AS i
  FROM gaps,
       unnest(generate_series(CAST(day AS DATE) + 1, CAST(next_day AS DATE) - 1,
                              INTERVAL 1 DAY)) AS t(d)
)"""
