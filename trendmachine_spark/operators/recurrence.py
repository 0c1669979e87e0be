"""Resilience / Fixity recurrences — the engine's one sequential operator.

Covers SURVEY.md §2 operators O34/O35 (reference main.py:194-227).

The score is a run-based recurrence over the dense per-url daily series:
whenever the driving key (specimen for Resilience, content for Fixity)
changes, the current score becomes the new run's ``base`` and the run's
``scale`` is ``base`` (decay, spread < 0) or ``1 - base`` (growth); each
day advances ``x`` and sets ``h = base + scale * sigmoid(x)`` with the
key's (shift, slope, spread). Each run's base depends on the previous
run's *final* value, so the dependency chain is sequential per url —
not window-expressible — but urls are independent, so the engine runs it
as a grouped-map ``applyInPandas`` keyed by url: O(1) state per group,
embarrassingly parallel across urls, Arrow-batched transport.

Within a run the curve is vectorized with numpy (the reference loops
day-at-a-time in Python; we only pay Python per *run*).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from trendmachine_spark.params import DEFAULT_SIGPARAMS, SigmoidParam


def _param_table(sigparams) -> dict[str, tuple[float, float, float]]:
    out = {}
    for k, v in (sigparams or DEFAULT_SIGPARAMS).items():
        out[k] = v.as_tuple() if isinstance(v, SigmoidParam) else tuple(v)
    return out


def _url_bucket(nb: int):
    """Deterministic url -> bucket grouping key expression (r14): the
    grouped-map recurrence groups by ``pmod(xxhash64(url), nb)`` instead
    of by raw url, so one Python grouped-map call scores a whole BUCKET
    of urls (sorted once, run-vectorized across url boundaries) instead
    of paying the per-group pandas/IPC constant once per url. Measured
    x10 (448k rows, 15k urls): grouped-map stage 2.08 s (per-url groups)
    -> 1.36 s (64 buckets); whole query 2.90 -> 1.83 s."""
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(F.col("url")), F.lit(nb))


def _bucket_count(df: DataFrame) -> int:
    """Scale-adaptive bucket count: 8x the session's shuffle parallelism
    (enough distinct keys that the hash spreads evenly — guide §2.5 —
    while keeping the per-group constant negligible); floor of 64 so a
    small-parallelism session still bounds the per-bucket pandas frame."""
    try:
        target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # absent/non-integer setting or Connect quirk
        target = 8
    return max(8 * target, 64)


def score_daily_series(dense: DataFrame, sigparams=None,
                       slim_arrow: bool = False,
                       url_buckets: int | None = None) -> DataFrame:
    """Add ``resilience`` and ``fixity`` columns to the dense daily series.

    ``dense`` must contain url, day, specimen, content (one row per
    calendar day per url). Both recurrences run in a single grouped scan.

    The grouped map is keyed on a deterministic url BUCKET
    (``pmod(xxhash64(url), url_buckets)``), not the raw url (r14): urls
    are independent, so any grouping that keeps a url's rows together is
    correct, and bucketing turns ~n_urls tiny pandas groups into
    ~url_buckets batch-sized ones — one pandas sort + two run-vectorized
    recurrences per bucket, with ``h`` reset to 0.5 at every url
    boundary (bit-identical to the per-url form; cross-checked
    row-for-row at sf0.1 and pinned by tests). ``url_buckets`` defaults
    to 8x the session's shuffle parallelism (scale-adaptive: enough
    distinct keys to spread evenly over any partition count, guide
    §2.5, while the per-bucket constant stays negligible).

    ``slim_arrow=False`` (the r14 default) routes the WHOLE dense row
    through the bucketed Arrow map and returns the scored rows directly
    — no join-back, and the ``dense`` subtree appears exactly once in
    the plan. Before bucketing, the slim form won because the per-url
    grouped map paid pandas overhead per column per GROUP; with
    batch-sized buckets the extra columns ride the same Arrow batches
    almost free, while the slim form still pays a second dense scan
    plus an (url, day) join. Measured x10, same run, value-identical:
    slim 2.74 s vs full 1.71 s best-of-8 (per-url slim form: 3.01 s).
    ``slim_arrow=True`` keeps the historical shape: only (url, day,
    specimen, content) cross the Python boundary and the two score
    columns hash-join back on (url, day).

    The grouped-map function and its helper are deliberately *nested* so
    cloudpickle serializes them by value — workers never need the
    trendmachine_spark package importable (the driver harness may run us
    from an arbitrary cwd without PYTHONPATH).
    """
    params = _param_table(sigparams)
    known = list(params)
    nb = url_buckets if url_buckets is not None else _bucket_count(dense)

    src = dense.select("url", "day", "specimen", "content") if slim_arrow else dense
    in_cols = [f.name for f in src.schema.fields]
    if slim_arrow:
        out_fields = [src.schema["url"], src.schema["day"]]
    else:
        out_fields = list(src.schema.fields)
    out_schema = T.StructType(
        out_fields
        + [T.StructField("resilience", T.DoubleType()), T.StructField("fixity", T.DoubleType())]
    )
    out_cols = [f.name for f in out_schema.fields]

    def run_recurrence(keys, urls, default_key):
        """Sequential run-based recurrence over (url, day)-sorted rows;
        a url boundary is a run boundary with ``h`` reset to 0.5
        (main.py:197 — each url's series starts fresh)."""
        n = len(keys)
        out = np.empty(n, dtype=np.float64)
        if n == 0:
            return out
        change = np.ones(n, dtype=bool)
        change[1:] = (keys[1:] != keys[:-1]) | (urls[1:] != urls[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        h = 0.5  # initial base/scale/h (main.py:197)
        for s0, e0 in zip(starts, ends):
            if s0 > 0 and urls[s0] != urls[s0 - 1]:
                h = 0.5  # new url: fresh series
            p = params.get(keys[s0])
            if p is None:
                # Documented divergence (SURVEY.md §2.5 end): the
                # reference raises TypeError on unknown keys; we score
                # them as the unobserved/unknown class instead.
                p = params[default_key]
            shift, slope, spread = p
            base = h
            scale = base if spread < 0 else 1.0 - base
            x = np.arange(1, e0 - s0 + 1, dtype=np.float64)
            seg = base + scale * (spread / (1.0 + np.exp(shift - x / slope)))
            out[s0:e0] = seg
            h = seg[-1]
        return out

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[in_cols].sort_values(["url", "day"], kind="mergesort")
        urls = pdf["url"].to_numpy(dtype=object)
        spec = pdf["specimen"].to_numpy(dtype=object)
        spec = np.where(np.isin(spec, known), spec, "~")
        pdf["resilience"] = run_recurrence(spec, urls, "~")
        content = pdf["content"].to_numpy(dtype=object)
        pdf["fixity"] = run_recurrence(content, urls, "Unknown")
        return pdf[out_cols]

    scored = (
        src.withColumn("_b", _url_bucket(nb))
        .groupBy("_b").applyInPandas(score, schema=out_schema)
    )
    if slim_arrow:
        return dense.join(
            scored.select("url", "day", "resilience", "fixity"), ["url", "day"]
        )
    return scored


def score_daily_series_multi(dense: DataFrame, param_sets: dict,
                             slim_arrow: bool = True,
                             url_buckets: int | None = None) -> DataFrame:
    """Score the same dense series under several sigmoid-parameter sets
    in ONE grouped scan (reference entry point 2 — slider re-tuning —
    generalized: the expensive upstream rollup/spine is reused, and a
    whole parameter sweep costs one pass; output gains a ``param_set``
    key column). ``slim_arrow`` as in score_daily_series — here the win
    is larger still, since the pandas function materializes the input
    columns once PER PARAMETER SET on the way out. Grouped by url
    BUCKET like score_daily_series (r14): one pandas call scores a
    whole bucket of urls per parameter set, resetting ``h`` at url
    boundaries.
    """
    tables = {name: _param_table(p) for name, p in param_sets.items()}
    known = {name: list(t) for name, t in tables.items()}
    nb = url_buckets if url_buckets is not None else _bucket_count(dense)

    src = dense.select("url", "day", "specimen", "content") if slim_arrow else dense
    out_schema = T.StructType(
        [T.StructField("param_set", T.StringType())]
        + list(src.schema.fields)
        + [T.StructField("resilience", T.DoubleType()), T.StructField("fixity", T.DoubleType())]
    )
    base_cols = [f.name for f in src.schema.fields]

    def run_recurrence(keys, urls, params, default_key):
        n = len(keys)
        out = np.empty(n, dtype=np.float64)
        if n == 0:
            return out
        change = np.ones(n, dtype=bool)
        change[1:] = (keys[1:] != keys[:-1]) | (urls[1:] != urls[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        h = 0.5
        for s0, e0 in zip(starts, ends):
            if s0 > 0 and urls[s0] != urls[s0 - 1]:
                h = 0.5  # new url: fresh series
            p = params.get(keys[s0]) or params[default_key]
            shift, slope, spread = p
            base = h
            scale = base if spread < 0 else 1.0 - base
            x = np.arange(1, e0 - s0 + 1, dtype=np.float64)
            seg = base + scale * (spread / (1.0 + np.exp(shift - x / slope)))
            out[s0:e0] = seg
            h = seg[-1]
        return out

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[base_cols].sort_values(["url", "day"], kind="mergesort")
        urls = pdf["url"].to_numpy(dtype=object)
        outs = []
        for name, params in tables.items():
            spec = pdf["specimen"].to_numpy(dtype=object)
            spec = np.where(np.isin(spec, known[name]), spec, "~")
            part = pdf[base_cols].copy()
            part.insert(0, "param_set", name)
            part["resilience"] = run_recurrence(spec, urls, params, "~")
            part["fixity"] = run_recurrence(
                pdf["content"].to_numpy(dtype=object), urls, params, "Unknown"
            )
            outs.append(part)
        return pd.concat(outs, ignore_index=True)

    scored = (
        src.withColumn("_b", _url_bucket(nb))
        .groupBy("_b").applyInPandas(score, schema=out_schema)
    )
    if slim_arrow:
        return dense.join(
            scored.select("url", "day", "param_set", "resilience", "fixity"),
            ["url", "day"],
        ).select(
            "param_set",
            *[f.name for f in dense.schema.fields],
            "resilience",
            "fixity",
        )
    return scored
