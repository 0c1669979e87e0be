"""Streaming scored daily series: resilience + fixity at each day close.

Extends streaming/capture_stream.resilience_scores_stream with the
fixity recurrence (O35): state additionally tracks the open day's
winning digest and the previous observed day's closing digest, so the
day's content state ('Unchanged' if the specimen digest repeats, else
'Changed'; synthesized missing days are 'Unknown' — main.py:155/:168 +
archive.py:17 semantics) drives the second recurrence. The batch-
equivalence test pins both scores to 1e-12 on every closed day.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCORED_STATE_SCHEMA = (
    "digests map<string,string>, cur_day string, cur_pr int, cur_spec string, "
    "cur_digest string, prev_close_digest string, "
    "base double, scale double, h double, x bigint, prev string, "
    "basec double, scalec double, hc double, xc bigint, prevc string, "
    "closed boolean"
)
SCORED_OUT_SCHEMA = (
    "url string, day string, specimen string, content string, "
    "resilience double, fixity double"
)


def scored_daily_stream(stream: DataFrame, sigparams=None,
                        digest_cap: int | None = None,
                        watermark: str = "1 day",
                        state_ttl_sec: int | None = None) -> DataFrame:
    """stream(url, event_time, status, digest) -> closed-day scores.

    ``digest_cap`` (default capture_stream.DIGEST_CAP): LRU bound on
    the per-url digest map — see chaos_scores_stream for the eviction
    rule and the documented divergence on evicted revisits.

    Like resilience_scores_stream, the open day closes by event-time
    timeout once the watermark passes its end, so a quiet url still
    emits its final day (both scores + the fixity digest carry-over are
    applied at flush, exactly as a capture-driven close would), and
    ``state_ttl_sec`` arms a post-flush GC timer that removes the
    state of urls quiet a full TTL past their flush (None = keep
    forever; a revival after GC restarts both recurrences at priors).
    """
    from trendmachine_spark.params import DEFAULT_SIGPARAMS, SigmoidParam
    from trendmachine_spark.streaming.capture_stream import DIGEST_CAP

    if digest_cap is None:
        digest_cap = DIGEST_CAP

    params = {}
    for k, v in (sigparams or DEFAULT_SIGPARAMS).items():
        params[k] = v.as_tuple() if isinstance(v, SigmoidParam) else tuple(v)
    priority = {"2xx": 4, "4xx": 3, "5xx": 2, "3xx": 1}

    def state_fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math
        from datetime import date, timedelta

        if state.exists:
            (digests, cur_day, cur_pr, cur_spec, cur_digest, prev_close_digest,
             base, scale, h, x, prev, basec, scalec, hc, xc, prevc,
             closed) = state.get
            digests = dict(digests)
        else:
            digests, cur_day, cur_spec, cur_digest = {}, None, "~", "~"
            prev_close_digest = "~"
            cur_pr = -1
            base = scale = h = basec = scalec = hc = 0.5
            x = xc = 0
            prev = "~"
            prevc = "Unknown"
            closed = False

        out_rows = []

        def recur(spec, content):
            nonlocal base, scale, h, x, prev, basec, scalec, hc, xc, prevc
            p = params.get(spec) or params["~"]
            if spec != prev:
                base = h
                scale = base if p[2] < 0 else 1.0 - base
                prev = spec
                x = 0
            x += 1
            h = base + scale * (p[2] / (1.0 + math.exp(p[0] - x / p[1])))
            cp = params.get(content) or params["Unknown"]
            if content != prevc:
                basec = hc
                scalec = basec if cp[2] < 0 else 1.0 - basec
                prevc = content
                xc = 0
            xc += 1
            hc = basec + scalec * (cp[2] / (1.0 + math.exp(cp[0] - xc / cp[1])))
            return h, hc

        def close_day():
            # score + emit the open day and roll the fixity digest
            nonlocal prev_close_digest, closed
            spec = cur_spec if cur_spec in params else "~"
            content = "Unchanged" if cur_digest == prev_close_digest else "Changed"
            r, f = recur(spec, content)
            out_rows.append((key[0], cur_day, spec, content, r, f))
            prev_close_digest = cur_digest
            closed = True

        def finish():
            state.update((
                digests, cur_day, cur_pr, cur_spec, cur_digest, prev_close_digest,
                base, scale, h, x, prev, basec, scalec, hc, xc, prevc, closed,
            ))
            if cur_day is not None and not closed:
                from datetime import datetime, time, timezone

                nxt = date.fromisoformat(cur_day) + timedelta(days=1)
                end_ms = int(datetime.combine(
                    nxt, time.min, tzinfo=timezone.utc).timestamp() * 1000)
                state.setTimeoutTimestamp(
                    max(end_ms, state.getCurrentWatermarkMs() + 1))
            elif closed and state_ttl_sec is not None:
                # idle-key GC (see resilience_scores_stream)
                state.setTimeoutTimestamp(
                    state.getCurrentWatermarkMs() + state_ttl_sec * 1000)
            if out_rows:
                yield pd.DataFrame(
                    out_rows,
                    columns=["url", "day", "specimen", "content",
                             "resilience", "fixity"],
                )

        if state.hasTimedOut:
            if cur_day is not None and not closed:
                close_day()
                yield from finish()
            else:
                state.remove()  # GC timer: quiet a full TTL past flush
            return

        def close_through(next_day_str):
            nonlocal cur_day, cur_pr, cur_spec, cur_digest, closed
            if cur_day is None:
                cur_day = next_day_str
                cur_pr = -1
                cur_spec = "~"
                cur_digest = "~"
                closed = False
                return
            if next_day_str == cur_day:
                return
            if not closed:
                close_day()
            d = date.fromisoformat(cur_day) + timedelta(days=1)
            end = date.fromisoformat(next_day_str)
            while d < end:
                r, f = recur("~", "Unknown")
                out_rows.append((key[0], d.isoformat(), "~", "Unknown", r, f))
                d += timedelta(days=1)
            cur_day = next_day_str
            cur_pr = -1
            cur_spec = "~"
            cur_digest = "~"
            closed = False

        for pdf in pdfs:
            pdf = pdf.sort_values("event_time", kind="mergesort")
            for s, dg, ts in zip(pdf["status"], pdf["digest"], pdf["event_time"]):
                s = s[:1] + "xx" if "200" <= s <= "599" else s
                if s == "-":
                    if dg in digests:
                        s = digests.pop(dg)  # pop+reinsert = LRU touch
                        digests[dg] = s
                    else:
                        s = "~"
                else:
                    digests.pop(dg, None)
                    digests[dg] = s
                    if len(digests) > digest_cap:
                        digests.pop(next(iter(digests)))
                close_through(ts.strftime("%Y-%m-%d"))
                pr = priority.get(s, 0)
                if pr > cur_pr:
                    cur_spec = s
                    cur_digest = dg[:8]
                    cur_pr = pr

        yield from finish()

    return stream.withWatermark("event_time", watermark).groupBy("url").applyInPandasWithState(
        state_fn,
        outputStructType=SCORED_OUT_SCHEMA,
        stateStructType=SCORED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
