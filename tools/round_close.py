"""One-command round-close checklist (r8 verdict item #7).

The round-close bookkeeping — final sf0.1 bench, bench-history
snapshot, scaled x10/x20 re-measurement, oracle-parity CI — was
skipped in round 7 and performed by hand in round 8; each step that
depends on a human remembering it is a process bug waiting to recur
(the r7 red CI came from exactly this class). This tool is the whole
checklist, sequential (never two JVMs on this box — bench timings are
garbage under contention):

  1. `python bench.py` at sf0.1 -> refreshes BENCH_DETAIL_sf0.1.json
  2. snapshot it to tools/bench_history/r{NN}_sf0.1.json (the
     cross-round drift gate diffs adjacent rounds' snapshots; CI
     asserts the newest snapshot is no older than the previous round)
  3. `python bench.py --sf-multiple 10` and `20` -> stdout lines saved
     as BENCH_SCALED_x10.json / BENCH_SCALED_x20.json (per-query
     detail lands in BENCH_DETAIL_sf0.1x{10,20}.json as side effects)
  4. `pytest tests/test_oracle_parity.py tests/test_bench_drift.py`
     — the correctness + drift gates over the fresh artifacts

  5. `python tools/gram_skew_stress.py` -> SKEW_STRESS.json — the
     planted-skew guard re-run on final code (r10: part of the close so
     mark-join regressions can't ship unmeasured)

Usage:
  python tools/round_close.py [--skip-scaled] [--skip-tests] [--skip-skew]

--skip-scaled leaves the x10/x20 artifacts alone (e.g. when they were
re-measured earlier the same day on identical code); --skip-skew
likewise for the skew guard; the snapshot and gates always run. Commit
the refreshed artifacts + snapshot as the round's final commit.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(cmd: list[str], capture: bool = False) -> str:
    print(f"[round_close] $ {' '.join(cmd)}", flush=True)
    if capture:
        out = subprocess.run(cmd, cwd=ROOT, check=True,
                             capture_output=True, text=True).stdout
        print(out, flush=True)
        return out
    subprocess.run(cmd, cwd=ROOT, check=True)
    return ""


#: 1-min loadavg above which a timed run would start visibly co-tenant
#: polluted (r10 verdict: the x20 medians were unusable; r11 telemetry
#: made the pollution visible, this gate avoids creating it)
QUIET_LOAD = 4.0


def _wait_quiet(label: str, max_wait_s: int = 600) -> None:
    """Block until 1-min loadavg drops under QUIET_LOAD (or max_wait_s
    elapses — then proceed loudly; the in-artifact telemetry still
    records whatever pressure remains)."""
    import time

    waited = 0
    while waited <= max_wait_s:
        with open("/proc/loadavg") as fh:
            la1 = float(fh.read().split()[0])
        if la1 < QUIET_LOAD:
            if waited:
                print(f"[round_close] box quiet (load {la1}) after "
                      f"{waited}s — starting {label}", flush=True)
            return
        print(f"[round_close] loadavg {la1} >= {QUIET_LOAD}, waiting "
              f"before {label} ({waited}/{max_wait_s}s)", flush=True)
        time.sleep(30)
        waited += 30
    print(f"[round_close] WARNING: box never went quiet; {label} will "
          "be measured under load (telemetry will show it)", flush=True)


def main() -> None:
    skip_scaled = "--skip-scaled" in sys.argv
    skip_tests = "--skip-tests" in sys.argv
    sys.path.insert(0, str(ROOT))
    from trendmachine_spark.registry import _ROUND

    # 1. final sf0.1 bench (refreshes BENCH_DETAIL_sf0.1.json). A run
    # whose own calibration telemetry flags >= 2 of 4 Spark passes
    # noisy is load-polluted and must NOT become the drift-gate
    # baseline (the r12 hole: a noisy driver run diffed against a
    # stale snapshot fired the gate on untouched code) — re-run after
    # a quiet wait, up to 3 attempts, then refuse to snapshot.
    for attempt in range(3):
        _wait_quiet("sf0.1 bench")
        _run([sys.executable, "bench.py"], capture=True)
        detail = json.loads((ROOT / "BENCH_DETAIL_sf0.1.json").read_text())
        noisy = (detail.get("load_telemetry") or {}).get(
            "noisy_spark_passes", [])
        if len(noisy) < 2:
            break
        print(f"[round_close] bench self-flags noisy Spark passes "
              f"{noisy} (attempt {attempt + 1}/3) — re-running",
              flush=True)
    else:
        raise SystemExit(
            "[round_close] 3 consecutive load-polluted bench runs — "
            "refusing to snapshot a noisy baseline; close the round "
            "when the box is quiet")

    # 2. the correctness + drift gates — BEFORE the snapshot, so the
    # drift test diffs this round's final numbers against the PREVIOUS
    # round's snapshot (snapshotting first would make it a self-diff —
    # the bug this comment is the fix for)
    if not skip_tests:
        _run([sys.executable, "-m", "pytest",
              "tests/test_oracle_parity.py", "tests/test_bench_drift.py",
              "-q"])

    # 3. snapshot into the drift gate's history
    snap = ROOT / "tools" / "bench_history" / f"r{_ROUND:02d}_sf0.1.json"
    shutil.copy(ROOT / "BENCH_DETAIL_sf0.1.json", snap)
    print(f"[round_close] snapshot -> {snap.relative_to(ROOT)}", flush=True)

    # 4. scaled set (x10, x20) — the r8 lesson: ALWAYS scale-measure in
    # the round the code changed; stdout line IS the artifact
    if not skip_scaled:
        for mult in (10, 20):
            _wait_quiet(f"x{mult} bench")
            out = _run([sys.executable, "bench.py", "--sf-multiple",
                        str(mult)], capture=True)
            line = out.strip().splitlines()[-1]
            json.loads(line)  # refuse to write a non-JSON artifact
            (ROOT / f"BENCH_SCALED_x{mult}.json").write_text(line + "\n")

    # 5. planted-skew guard on final code (SKEW_STRESS.json)
    if "--skip-skew" not in sys.argv:
        _run([sys.executable, "tools/gram_skew_stress.py"], capture=True)

    print(f"[round_close] round {_ROUND} close complete — commit "
          "BENCH_DETAIL_*, BENCH_SCALED_*, SKEW_STRESS.json, and the "
          "history snapshot.", flush=True)


if __name__ == "__main__":
    main()
