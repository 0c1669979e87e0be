"""Cross-round bench-drift gate (round-6 VERDICT #7): an unexplained
per-query regression must fail CI, not wait for the judge.

Compares the working sf0.1 bench artifact (``BENCH_DETAIL_sf0.1.json``)
against the newest prior-round snapshot in ``tools/bench_history/``
(``rNN_sf0.1.json`` — copied there when a round closes). A query whose
best-of-4 wall grew by BOTH >30% and >0.15 s absolute (the double
guard keeps sub-0.2 s floor-bound queries from tripping on host noise)
must either be reversed or explicitly attributed: add it to
``EXPLAINED_REGRESSIONS`` with the SCALE.md anchor that documents it,
and the test verifies the anchor actually exists there — an entry
pointing at nothing is itself a failure. Seeded with the round-7
similarity_topk attribution as the worked example.

Pure-file test, no Spark.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
CURRENT = ROOT / "BENCH_DETAIL_sf0.1.json"
HISTORY = ROOT / "tools" / "bench_history"

#: query -> an exact substring that must appear in SCALE.md, anchoring
#: the written attribution for an accepted >30% regression.
EXPLAINED_REGRESSIONS: dict[str, str] = {
    # r6 regressed this by moving its then-collect-based builder inside
    # the timed window; r7 reversed it (driver-side probe matrix) and
    # wrote the attribution — kept as the worked example of the format.
    "similarity_topk": "similarity_topk sf0.1 regression attribution",
    # r9: untouched floor-trio query, +0.22 s on a ~0.46 s action-floor
    # wall — host variance, attributed with the git-diff evidence
    "pricing_summary": "pricing_summary r9 drift attribution",
    # r12: the DRIVER's post-close bench (2 of 4 Spark passes
    # self-flagged noisy) overwrote the builder's clean close artifact
    # and the stale-history diff read +33% on untouched code; the
    # recovered clean snapshot clears the gate on real numbers, the
    # anchor documents the process fix (see _run_is_noisy below)
    "resilience_daily_series":
        "resilience_daily_series r12 driver-run drift attribution",
}

REL_THRESHOLD = 1.30
ABS_THRESHOLD_S = 0.15

#: a current artifact whose own calibration telemetry flags this many
#: (or more) of its 4 Spark passes as noisy is load-polluted: its
#: best-of-4 may not contain a single quiet measurement pair, so a
#: regression read from it is not attributable to code. The gate skips
#: (visibly) instead of demanding written attribution for co-tenancy —
#: the r12 lesson (SCALE.md "resilience_daily_series r12 driver-run
#: drift attribution"). Quiet-run semantics are unchanged: <= 1 noisy
#: pass still demands attribution for every offender.
NOISY_PASS_LIMIT = 2


def _run_is_noisy(artifact: dict) -> bool:
    tel = artifact.get("load_telemetry") or {}
    return len(tel.get("noisy_spark_passes", [])) >= NOISY_PASS_LIMIT


def _latest_snapshot() -> Path | None:
    snaps = sorted(HISTORY.glob("r*_sf0.1.json"),
                   key=lambda p: int(re.match(r"r(\d+)_", p.name).group(1)))
    return snaps[-1] if snaps else None


def test_no_unexplained_bench_regressions():
    prev_path = _latest_snapshot()
    if prev_path is None or not CURRENT.exists():
        pytest.skip("no bench history/current artifact to diff")
    prev = json.loads(prev_path.read_text())["queries_best"]
    cur_artifact = json.loads(CURRENT.read_text())
    cur = cur_artifact["queries_best"]
    scale_md = (ROOT / "SCALE.md").read_text()

    offenders = []
    for name, cur_best in cur.items():
        if name.startswith("_") or name not in prev:
            continue
        prev_best = prev[name]
        if (cur_best > prev_best * REL_THRESHOLD
                and cur_best - prev_best > ABS_THRESHOLD_S):
            anchor = EXPLAINED_REGRESSIONS.get(name)
            if anchor is None:
                offenders.append(
                    f"{name}: {prev_best:.3f}s -> {cur_best:.3f}s "
                    f"(+{(cur_best / prev_best - 1) * 100:.0f}%) vs "
                    f"{prev_path.name} — attribute it in SCALE.md and "
                    f"register the anchor in EXPLAINED_REGRESSIONS")
            elif anchor not in scale_md:
                offenders.append(
                    f"{name}: registered anchor {anchor!r} not found in "
                    f"SCALE.md — the attribution must actually be written")
    if offenders and _run_is_noisy(cur_artifact):
        tel = cur_artifact["load_telemetry"]
        pytest.skip(
            f"current artifact self-flags noisy Spark passes "
            f"{tel['noisy_spark_passes']} (calib vs floor "
            f"{tel['calib_floor']}): regressions read from a "
            f"load-polluted run are not attributable to code — "
            f"re-run bench.py on a quiet box; would-be offenders: "
            + "; ".join(offenders))
    assert not offenders, "\n".join(offenders)


def test_noisy_run_detection_logic():
    """The telemetry gate itself: exactly the artifact shapes it must
    distinguish (r12's noisy driver run vs the clean close run vs a
    pre-telemetry artifact)."""
    assert _run_is_noisy({"load_telemetry": {"noisy_spark_passes": [2, 3]}})
    assert not _run_is_noisy({"load_telemetry": {"noisy_spark_passes": [1]}})
    assert not _run_is_noisy({"load_telemetry": {"noisy_spark_passes": []}})
    assert not _run_is_noisy({})          # pre-telemetry artifact: quiet
    assert not _run_is_noisy({"load_telemetry": {}})


def test_explained_regression_anchors_exist():
    """Every registered anchor must point at real SCALE.md text even
    when the query is not currently regressed — a dangling entry would
    silently pre-excuse a future regression."""
    scale_md = (ROOT / "SCALE.md").read_text()
    for name, anchor in EXPLAINED_REGRESSIONS.items():
        assert anchor in scale_md, (name, anchor)


def test_round_close_snapshot_not_stale():
    """The drift gate is only as good as its history: if a round closes
    without `tools/round_close.py` (the r7 process bug), the newest
    snapshot silently goes stale and every later diff compares against
    the wrong baseline. The newest snapshot must be from the previous
    round or this one (this round's appears when round_close runs at
    round end)."""
    from trendmachine_spark.registry import _ROUND

    snap = _latest_snapshot()
    assert snap is not None, "tools/bench_history/ has no snapshots"
    newest = int(re.match(r"r(\d+)_", snap.name).group(1))
    assert newest >= _ROUND - 1, (
        f"newest bench-history snapshot is r{newest:02d} but the round "
        f"is r{_ROUND:02d}: a round closed without tools/round_close.py"
    )
