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


def score_daily_series(dense: DataFrame, sigparams=None,
                       slim_arrow: bool = True) -> DataFrame:
    """Add ``resilience`` and ``fixity`` columns to the dense daily series.

    ``dense`` must contain url, day, specimen, content (one row per
    calendar day per url). Both recurrences run in a single grouped scan.

    ``slim_arrow=True`` routes only (url, day, specimen, content)
    through the Arrow/pandas recurrence and hash-joins the two score
    columns back on (url, day): the Arrow transfer shrinks ~4x (the
    recurrence reads exactly those four columns), and the grouped-map
    shuffle moves 4 slim columns instead of the whole report row. The
    cost is that the ``dense`` subtree appears twice in the plan (score
    side + join side) — free when dense is persisted (the registry
    cache / warmed bench engine, mirroring the reference's cache
    layers); for a one-shot uncached pipeline where recomputing dense
    outweighs the wider transfer, pass ``slim_arrow=False``.

    The grouped-map function and its helper are deliberately *nested* so
    cloudpickle serializes them by value — workers never need the
    trendmachine_spark package importable (the driver harness may run us
    from an arbitrary cwd without PYTHONPATH).
    """
    params = _param_table(sigparams)
    known = list(params)

    src = dense.select("url", "day", "specimen", "content") if slim_arrow else dense
    out_schema = T.StructType(
        list(src.schema.fields)
        + [T.StructField("resilience", T.DoubleType()), T.StructField("fixity", T.DoubleType())]
    )
    out_cols = [f.name for f in out_schema.fields]

    def run_recurrence(keys, default_key):
        """Sequential run-based recurrence; keys must be in day order."""
        n = len(keys)
        out = np.empty(n, dtype=np.float64)
        if n == 0:
            return out
        change = np.ones(n, dtype=bool)
        change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        h = 0.5  # initial base/scale/h (main.py:197)
        for s0, e0 in zip(starts, ends):
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
        pdf = pdf.sort_values("day", kind="mergesort")
        spec = pdf["specimen"].to_numpy(dtype=object)
        spec = np.where(np.isin(spec, known), spec, "~")
        pdf["resilience"] = run_recurrence(spec, "~")
        content = pdf["content"].to_numpy(dtype=object)
        pdf["fixity"] = run_recurrence(content, "Unknown")
        return pdf[out_cols]

    scored = src.groupBy("url").applyInPandas(score, schema=out_schema)
    if slim_arrow:
        return dense.join(
            scored.select("url", "day", "resilience", "fixity"), ["url", "day"]
        )
    return scored


def score_daily_series_multi(dense: DataFrame, param_sets: dict,
                             slim_arrow: bool = True) -> DataFrame:
    """Score the same dense series under several sigmoid-parameter sets
    in ONE grouped scan (reference entry point 2 — slider re-tuning —
    generalized: the expensive upstream rollup/spine is reused, and a
    whole parameter sweep costs one pass; output gains a ``param_set``
    key column). ``slim_arrow`` as in score_daily_series — here the win
    is larger still, since the pandas function materializes the input
    columns once PER PARAMETER SET on the way out.
    """
    tables = {name: _param_table(p) for name, p in param_sets.items()}
    known = {name: list(t) for name, t in tables.items()}

    src = dense.select("url", "day", "specimen", "content") if slim_arrow else dense
    out_schema = T.StructType(
        [T.StructField("param_set", T.StringType())]
        + list(src.schema.fields)
        + [T.StructField("resilience", T.DoubleType()), T.StructField("fixity", T.DoubleType())]
    )
    base_cols = [f.name for f in src.schema.fields]

    def run_recurrence(keys, params, default_key):
        n = len(keys)
        out = np.empty(n, dtype=np.float64)
        if n == 0:
            return out
        change = np.ones(n, dtype=bool)
        change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        h = 0.5
        for s0, e0 in zip(starts, ends):
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
        pdf = pdf.sort_values("day", kind="mergesort")
        outs = []
        for name, params in tables.items():
            spec = pdf["specimen"].to_numpy(dtype=object)
            spec = np.where(np.isin(spec, known[name]), spec, "~")
            part = pdf[base_cols].copy()
            part.insert(0, "param_set", name)
            part["resilience"] = run_recurrence(spec, params, "~")
            part["fixity"] = run_recurrence(
                pdf["content"].to_numpy(dtype=object), params, "Unknown"
            )
            outs.append(part)
        return pd.concat(outs, ignore_index=True)

    scored = src.groupBy("url").applyInPandas(score, schema=out_schema)
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
