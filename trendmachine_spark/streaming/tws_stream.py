"""Streaming O34 on the Spark 4.x transformWithState runtime.

``resilience_scores_tws`` is the forward-looking twin of
``capture_stream.resilience_scores_stream``: identical day-close
semantics (revisit digest map, O20 specimen arg-max, lazy '~' spine,
sigmoid recurrence — /root/reference/main.py:133-183), re-hosted on
``transformWithStateInPandas`` (Spark 4.x's successor to
``applyInPandasWithState``, SPARK-49488). What the new runtime buys at
scale:

* first-class per-key TIMERS (``registerTimer``/``handleExpiredTimer``)
  instead of the single implicit timeout slot — the day-close flush is
  a real timer here, and stale timers from a superseded open day are
  detected by comparing the expiry against the CURRENT open day's end;
* state schema evolution + independently scoped state variables
  (RocksDB-backed column families per variable on a cluster);
* the same cloudpickled-closure discipline as the old operator: the
  processor class is defined inside the builder so workers never need
  the package importable.

The equivalence test runs BOTH implementations on the same input and
asserts identical (url, day) -> (specimen, resilience) output.

Runtime requirement: transformWithState's state server speaks protobuf
(``pyspark/sql/streaming/proto``), so a ``google.protobuf`` runtime
must be importable on the driver AND in the Python workers — probe
with :func:`tws_available` before building. Where the pip
distribution is absent, :func:`ensure_protobuf_runtime` wires up a
runtime vendored elsewhere on the machine (sys.path + PYTHONPATH so
workers inherit it); it must run BEFORE the SparkSession exists, since
workers snapshot the driver's environment at JVM launch.

State layout note: the digest map rides in the ValueState row as two
parallel arrays (keys, values) rather than a MapState because the LRU
eviction order IS part of the semantics — MapState iteration order is
storage-defined, while the array pair preserves insertion order
exactly like the batch engine's dict.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame

TWS_STATE_SCHEMA = (
    "dkeys array<string>, dvals array<string>, cur_day string, cur_pr int, "
    "cur_spec string, base double, scale double, h double, x bigint, "
    "prev string, closed boolean"
)
TWS_OUT_SCHEMA = "url string, day string, specimen string, resilience double"

#: Directories where a usable pure-Python ``google.protobuf`` runtime
#: may already sit on THIS machine without the pip distribution being
#: installed (SDK platform bundles vendor one; ``google`` is a
#: namespace package in those bundles, so appending the directory
#: merges cleanly with any other installed ``google.*``).
VENDORED_PROTOBUF_PATHS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf_runtime() -> bool:
    """Make the protobuf runtime that transformWithState's state-server
    protocol needs importable, returning True when the full stack (the
    runtime AND pyspark's generated message classes) is usable.

    When the ``protobuf`` distribution is absent, probes
    :data:`VENDORED_PROTOBUF_PATHS` for a bundled runtime and wires it
    up via BOTH ``sys.path`` (this process) and ``PYTHONPATH`` (so
    Python workers — forked from the JVM, which snapshots the driver's
    environment at launch — inherit it; call this BEFORE building the
    SparkSession). A vendored runtime may trail pyspark's gencode by a
    minor version; the wire format is stable within a major version,
    so protobuf's own escape hatch
    (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) bridges exactly
    that gap — it is set only on the vendored path, never for a real
    installation, and (round-6 ADVICE) only KEPT once the runtime
    passes a functional probe: pyspark's generated ``StateMessage``
    classes must import AND round-trip (build → serialize → reparse →
    compare) through the vendored runtime. A runtime old enough to
    misparse fails the round-trip, and the wiring — env var, sys.path
    entry, PYTHONPATH entry, partially-imported ``google.protobuf``
    modules — is rolled back so other protobuf consumers in the
    process never see a version-unchecked stale runtime.
    """
    vendored = None
    had_env = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK" in os.environ
    old_pp = os.environ.get("PYTHONPATH")
    # rollback must evict only modules THIS function caused to import:
    # blanket-deleting google.* would orphan pre-existing unrelated
    # namespace-package members (e.g. google.auth) whose holders keep
    # stale module objects (round-8 ADVICE)
    mods_before = frozenset(sys.modules)

    def _rollback() -> bool:
        if vendored is not None:
            if not had_env:
                os.environ.pop("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None)
            if vendored in sys.path:
                sys.path.remove(vendored)
            if old_pp is None:
                os.environ.pop("PYTHONPATH", None)
            else:
                os.environ["PYTHONPATH"] = old_pp
            for mod in [m for m in sys.modules
                        if m not in mods_before
                        and (m == "google" or m.startswith("google.")
                             or m.startswith("pyspark.sql.streaming.proto"))]:
                del sys.modules[mod]
        return False

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        vendored = next(
            (p for p in VENDORED_PROTOBUF_PATHS
             if os.path.isfile(os.path.join(p, "google", "protobuf", "descriptor.py"))),
            None,
        )
        if vendored is None:
            return False
        # workers import the generated classes too (the state-server
        # client runs inside the worker) — same gencode, same check
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        if vendored not in sys.path:
            sys.path.append(vendored)
        pp = os.environ.get("PYTHONPATH", "")
        if vendored not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (pp + os.pathsep + vendored) if pp else vendored
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            return _rollback()
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2 as _sm
    except Exception:
        # e.g. an installed-but-older runtime failing the version gate
        return _rollback()
    try:
        # functional probe: the version-check override is only safe if
        # the runtime actually parses pyspark's gencode faithfully
        msg = _sm.StateRequest(version=7)
        if _sm.StateRequest.FromString(msg.SerializeToString()).version != 7:
            raise ValueError("StateRequest round-trip mismatch")
    except Exception:
        return _rollback()
    return True


def tws_available() -> bool:
    """True if the transformWithState Python runtime can start here
    (its state-server protocol — driver and worker side — imports
    protobuf-generated message classes). Vendors a bundled runtime
    when possible; see :func:`ensure_protobuf_runtime`."""
    return ensure_protobuf_runtime()


def make_resilience_processor(sigparams=None, digest_cap: int | None = None):
    """Build the StatefulProcessor class (defined inside this factory so
    cloudpickle ships it by value — workers never import the package).
    Exposed separately from :func:`resilience_scores_tws` so the state
    machine is unit-testable with fake handle/timer objects where the
    TWS runtime itself can't start (no protobuf)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from trendmachine_spark.params import DEFAULT_SIGPARAMS, SigmoidParam
    from trendmachine_spark.streaming.capture_stream import DIGEST_CAP

    cap = DIGEST_CAP if digest_cap is None else digest_cap
    params = {}
    for k, v in (sigparams or DEFAULT_SIGPARAMS).items():
        params[k] = v.as_tuple() if isinstance(v, SigmoidParam) else tuple(v)
    priority = {"2xx": 4, "4xx": 3, "5xx": 2, "3xx": 1}
    state_schema = TWS_STATE_SCHEMA
    out_columns = ["url", "day", "specimen", "resilience"]

    class ResilienceProcessor(StatefulProcessor):
        def init(self, handle):
            self._handle = handle
            self._state = handle.getValueState("regs", state_schema)

        def close(self):
            pass

        # -- shared helpers over a mutable dict of registers ------------
        def _load(self):
            row = self._state.get() if self._state.exists() else None
            if row is not None:
                dk, dv, cur_day, cur_pr, cur_spec, base, scale, h, x, prev, closed = row
                digests = dict(zip(dk, dv))
            else:
                digests, cur_day, cur_spec = {}, None, "~"
                cur_pr = -1
                base = scale = h = 0.5
                x = 0
                prev = "~"
                closed = False
            return dict(digests=digests, cur_day=cur_day, cur_pr=cur_pr,
                        cur_spec=cur_spec, base=base, scale=scale, h=h, x=x,
                        prev=prev, closed=closed)

        def _save_and_arm(self, s, timerValues):
            d = s["digests"]
            self._state.update((
                list(d.keys()), list(d.values()), s["cur_day"], s["cur_pr"],
                s["cur_spec"], s["base"], s["scale"], s["h"], s["x"],
                s["prev"], s["closed"],
            ))
            if s["cur_day"] is not None and not s["closed"]:
                self._handle.registerTimer(
                    max(self._day_end_ms(s["cur_day"]),
                        timerValues.getCurrentWatermarkInMs() + 1))

        @staticmethod
        def _day_end_ms(day_str):
            from datetime import date, datetime, time, timedelta, timezone

            nxt = date.fromisoformat(day_str) + timedelta(days=1)
            return int(datetime.combine(
                nxt, time.min, tzinfo=timezone.utc).timestamp() * 1000)

        @staticmethod
        def _score_day(s, out_rows, url, day_str, spec):
            import math

            p = params.get(spec) or params["~"]
            if spec != s["prev"]:
                s["base"] = s["h"]
                s["scale"] = s["base"] if p[2] < 0 else 1.0 - s["base"]
                s["prev"] = spec
                s["x"] = 0
            s["x"] += 1
            s["h"] = s["base"] + s["scale"] * (
                p[2] / (1.0 + math.exp(p[0] - s["x"] / p[1])))
            out_rows.append((url, day_str, spec, s["h"]))

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd
            from datetime import date, timedelta

            s = self._load()
            out_rows = []
            url = key[0]

            def close_through(next_day_str):
                if s["cur_day"] is None:
                    s.update(cur_day=next_day_str, cur_pr=-1, cur_spec="~",
                             closed=False)
                    return
                if next_day_str == s["cur_day"]:
                    return
                if not s["closed"]:
                    spec = s["cur_spec"] if s["cur_spec"] in params else "~"
                    self._score_day(s, out_rows, url, s["cur_day"], spec)
                d = date.fromisoformat(s["cur_day"]) + timedelta(days=1)
                end = date.fromisoformat(next_day_str)
                while d < end:
                    self._score_day(s, out_rows, url, d.isoformat(), "~")
                    d += timedelta(days=1)
                s.update(cur_day=next_day_str, cur_pr=-1, cur_spec="~",
                         closed=False)

            digests = s["digests"]
            for pdf in rows:
                pdf = pdf.sort_values("event_time", kind="mergesort")
                for st, dg, ts in zip(pdf["status"], pdf["digest"],
                                      pdf["event_time"]):
                    st = st[:1] + "xx" if "200" <= st <= "599" else st
                    if st == "-":
                        if dg in digests:
                            st = digests.pop(dg)  # pop+reinsert = LRU touch
                            digests[dg] = st
                        else:
                            st = "~"
                    else:
                        digests.pop(dg, None)
                        digests[dg] = st
                        if len(digests) > cap:
                            digests.pop(next(iter(digests)))
                    close_through(ts.strftime("%Y-%m-%d"))
                    pr = priority.get(st, 0)
                    if pr > s["cur_pr"]:
                        s["cur_spec"] = st
                        s["cur_pr"] = pr

            self._save_and_arm(s, timerValues)
            if out_rows:
                yield pd.DataFrame(out_rows, columns=out_columns)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            s = self._load()
            # a timer armed for a since-superseded open day must NOT
            # close the current one early: only flush when the expiry
            # covers the CURRENT open day's end
            if (s["cur_day"] is None or s["closed"]
                    or expiredTimerInfo.getExpiryTimeInMs()
                    < self._day_end_ms(s["cur_day"])):
                return
            out_rows = []
            spec = s["cur_spec"] if s["cur_spec"] in params else "~"
            self._score_day(s, out_rows, key[0], s["cur_day"], spec)
            s["closed"] = True
            self._save_and_arm(s, timerValues)
            yield pd.DataFrame(out_rows, columns=out_columns)

    return ResilienceProcessor


def resilience_scores_tws(stream: DataFrame, sigparams=None,
                          digest_cap: int | None = None,
                          watermark: str = "1 day") -> DataFrame:
    """stream(url, event_time, status, digest) -> closed-day resilience,
    semantically identical to resilience_scores_stream (see module doc).
    """
    proc_cls = make_resilience_processor(sigparams, digest_cap)
    return (
        stream.withWatermark("event_time", watermark)
        .groupBy("url")
        .transformWithStateInPandas(
            proc_cls(),
            outputStructType=TWS_OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
