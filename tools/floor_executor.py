"""Floor-class measurement under REAL executors (local-cluster).

The r13 verdict (Missing #2): the 9 weak floor-class rows —
``pricing_summary``, ``event_sessionization``, ``top_revenue_customers``,
``dedup_exact``, ``similarity_topk`` at sf0.1 and ``training_splits``,
``corpus_stats``, ``event_attribution``, ``split_leakage_report`` at
x10 — are *attributed* to the local-mode ~0.46 s/action submission
floor (FLOOR_DECOMP / FLOOR_BATCH), with "closes with executors"
asserted but never measured. This tool measures it: the same queries,
same noop-sink best-of-N methodology, under

  local[32]                (control: the bench's own mode)
  local-cluster[4,8,4096]  (4 separate executor JVMs x 8 cores x 4 GiB
                            — real RPC scheduling, real serialized task
                            dispatch, real shuffle over netty)

run SEQUENTIALLY in separate subprocesses (one Spark runtime at a time
— never two JVM worlds concurrently while timing; the memory-file rule).

Per master it also measures two synthetic probes that decompose the
floor directly:

  * ``action_floor_1task_s``  — noop save of ``spark.range(1)``: one
    job, one stage, one task; pure submission floor, no data work.
  * ``action_floor_32task_s`` — noop save of a pre-built 32-partition
    range: one stage, 32 tasks; adds per-task dispatch cost.

Interpretation contract (recorded in SCALE.md): the floor attribution
HOLDS if the per-action floor is a scale-independent constant in BOTH
modes — cluster mode may even pay MORE per action (executor RPC adds
latency vs in-process local mode), which still retires the weak rows,
because a fixed constant amortizes into the minutes-scale actions of a
100 TB run either way. The attribution would be FALSIFIED only if
cluster-mode walls grew with data volume where local-mode walls did
not, i.e. if what looked like a fixed floor were actually a cost that
scales with executor count x data.

Also folds in verdict #5: ``event_session_windows`` (the native
``session_window`` shape) is timed alongside ``event_sessionization``
(the lag/cumsum shape) under both masters, so the recommended form is
adjudicated on executor-mode evidence, not local-mode only.

Run solo:
  python tools/floor_executor.py            # both masters, sf0.1 + x10
  python tools/floor_executor.py --leg local sf01      # internal
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: sf0.1 floor rows (bench.py's FLOOR_BOUND_QUERIES) + the session
#: shape-pair for verdict #5.
SF01_QUERIES = (
    "pricing_summary",
    "event_sessionization",
    "event_session_windows",
    "top_revenue_customers",
    "dedup_exact",
    "similarity_topk",
)
#: x10 extension floor rows (CORPUS_OPS_SCALED weak list).
X10_QUERIES = (
    "training_splits",
    "corpus_stats",
    "event_attribution",
    "split_leakage_report",
)
PASSES = 6

MASTERS = {
    "local": "local[32]",
    "cluster": "local-cluster[4,8,4096]",
}


def _run_leg(mode: str, scale: str) -> None:
    """One (master, dataset) leg; prints one JSON line on stdout."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bench import CALIB_SQL, _loadavg
    from tools.scale_testdata import scale_dir, split_confs

    import duckdb

    calib_con = duckdb.connect()
    calib_con.execute("SET threads=1")

    def calib() -> float:
        t0 = time.perf_counter()
        calib_con.execute(CALIB_SQL).fetchall()
        return round(time.perf_counter() - t0, 4)

    if scale == "sf01":
        sf_dir, queries, scaled_confs = "/root/testdata/sf0.1", SF01_QUERIES, {}
        shuffle_parts = "8"  # bench.py's data-sized width at 5 MB
    else:
        sf_dir = scale_dir("/root/testdata/sf0.1", "/tmp/trendmachine_scaled_x10", 10)
        queries, scaled_confs = X10_QUERIES, split_confs(32)
        shuffle_parts = "32"

    load_pre = _loadavg()
    t0 = time.perf_counter()
    builder = (
        SparkSession.builder.master(MASTERS[mode])
        .appName(f"floor-executor-{mode}-{scale}")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if mode == "cluster":
        builder = (builder
                   .config("spark.executor.memory", "3g")
                   .config("spark.driver.memory", "8g")
                   # local-cluster executors are SEPARATE JVMs whose
                   # python workers don't inherit the driver's
                   # sys.path; shipping the package (what a real
                   # deployment does via pip/--py-files) is one env
                   # var here. local mode needs nothing — workers fork
                   # from the driver.
                   .config("spark.executorEnv.PYTHONPATH", REPO))
    else:
        builder = builder.config("spark.driver.memory", "48g")
    for key, val in scaled_confs.items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    session_up = round(time.perf_counter() - t0, 3)

    from trendmachine_spark.registry import QUERIES, _daily, _docs, _embeddings
    from trendmachine_spark.suite import FLOOR_BOUND_QUERIES, suite_frame

    # warm shared-plan caches + OS page cache, as bench.py does
    for fname in sorted(os.listdir(sf_dir)):
        if fname.endswith(".parquet"):
            with open(os.path.join(sf_dir, fname), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    _daily(spark, sf_dir).count()
    _docs(spark, sf_dir).count()
    _embeddings(spark, sf_dir).count()

    # synthetic floor probes (pre-built once; pure lazy)
    one_task = spark.range(1).select(F.lit(1).alias("x"))
    many_task = spark.range(1 << 14, numPartitions=32).select(F.col("id"))

    batched_members = [n for n in (FLOOR_BOUND_QUERIES if scale == "sf01"
                                   else X10_QUERIES) if n in queries]
    suite_df = suite_frame(spark, sf_dir, batched_members)
    dfs = {n: QUERIES[n].builder(spark, sf_dir) for n in queries}

    # warm pass (plan compilation, executor python-worker spin-up)
    for df in dfs.values():
        df.write.format("noop").mode("overwrite").save()
    suite_df.write.format("noop").mode("overwrite").save()
    one_task.write.format("noop").mode("overwrite").save()
    many_task.write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in queries}
    floor1: list[float] = []
    floor32: list[float] = []
    batched: list[float] = []
    pass_calib: list[float] = []
    for _ in range(PASSES):
        pass_calib.append(calib())
        t0 = time.perf_counter()
        one_task.write.format("noop").mode("overwrite").save()
        floor1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        many_task.write.format("noop").mode("overwrite").save()
        floor32.append(time.perf_counter() - t0)
        for n in queries:
            t0 = time.perf_counter()
            dfs[n].write.format("noop").mode("overwrite").save()
            samples[n].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        suite_df.write.format("noop").mode("overwrite").save()
        batched.append(time.perf_counter() - t0)

    def best(xs):
        return round(min(xs), 3)

    def med(xs):
        return round(statistics.median(xs), 3)

    out = {
        "mode": mode,
        "master": MASTERS[mode],
        "scale": scale,
        "sf_dir": sf_dir,
        "session_up_s": session_up,
        "action_floor_1task_s": {"best": best(floor1), "median": med(floor1)},
        "action_floor_32task_s": {"best": best(floor32), "median": med(floor32)},
        "queries_best": {n: best(s) for n, s in samples.items()},
        "queries_median": {n: med(s) for n, s in samples.items()},
        "batched_one_action": {"members": batched_members,
                               "best": best(batched), "median": med(batched)},
        "load_telemetry": {"loadavg_pre": load_pre, "loadavg_post": _loadavg(),
                           "pass_calib": pass_calib},
    }
    print("LEGJSON:" + json.dumps(out, separators=(",", ":")))
    spark.stop()


def main() -> None:
    # --x10-queries a,b,c : override the x10 query set (e.g. the
    # sessionization shape pair); with --merge the new legs are merged
    # into an existing FLOOR_EXECUTOR.json under their own leg keys.
    if "--x10-queries" in sys.argv:
        i = sys.argv.index("--x10-queries")
        global X10_QUERIES
        X10_QUERIES = tuple(sys.argv[i + 1].split(","))
    if "--leg" in sys.argv:
        i = sys.argv.index("--leg")
        _run_leg(sys.argv[i + 1], sys.argv[i + 2])
        return
    scales = ("sf01", "x10")
    if "--scales" in sys.argv:
        scales = tuple(sys.argv[sys.argv.index("--scales") + 1].split(","))

    legs = {}
    for scale in scales:
        for mode in ("local", "cluster"):
            extra = (["--x10-queries", ",".join(X10_QUERIES)]
                     if "--x10-queries" in sys.argv else [])
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", mode, scale]
                + extra,
                capture_output=True, text=True, cwd=REPO, timeout=1800,
            )
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("LEGJSON:")]
            if not line:
                sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
                raise RuntimeError(f"leg {mode}/{scale} produced no result")
            legs[f"{mode}_{scale}"] = json.loads(line[-1][len("LEGJSON:"):])
            print(f"done: {mode}/{scale}", file=sys.stderr)

    # verdict summary: is the per-action floor a scale-independent
    # constant in both modes, and where do the weak rows land under
    # real executors?
    summary = {}
    for scale in scales:
        loc, clu = legs[f"local_{scale}"], legs[f"cluster_{scale}"]
        summary[scale] = {
            "action_floor_1task_local_s": loc["action_floor_1task_s"]["best"],
            "action_floor_1task_cluster_s": clu["action_floor_1task_s"]["best"],
            "per_query_cluster_over_local": {
                n: (round(clu["queries_best"][n] / loc["queries_best"][n], 2)
                    if loc["queries_best"][n] else None)
                for n in loc["queries_best"]
            },
            "batched_local_s": loc["batched_one_action"]["best"],
            "batched_cluster_s": clu["batched_one_action"]["best"],
        }
    out = {
        "note": (
            "r14 verdict #2: the floor-class weak rows measured under real "
            "multi-executor scheduling (local-cluster[4,8,4096] = 4 executor "
            "JVMs x 8 cores) vs the bench's local[32], sequential subprocess "
            "legs, best-of-%d noop-sink passes after a warm pass. "
            "action_floor_1task is the pure submission floor (one job, one "
            "task, no data); see SCALE.md 'Executor-mode floor' for the "
            "verdict." % PASSES
        ),
        "legs": legs,
        "summary": summary,
    }
    path = os.path.join(REPO, "FLOOR_EXECUTOR.json")
    if "--merge" in sys.argv and os.path.exists(path):
        with open(path) as fh:
            prior = json.load(fh)
        if "--tag" in sys.argv:
            tag = sys.argv[sys.argv.index("--tag") + 1]
        elif "--x10-queries" in sys.argv:
            tag = "_".join(sorted(set(
                q.split("_")[0] for q in X10_QUERIES)))
        else:
            tag = "extra"
        prior["legs"].update({f"{k}__{tag}": v for k, v in legs.items()})
        prior["summary"].update({f"{k}__{tag}": v for k, v in summary.items()})
        out = prior
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"summary": summary}, indent=1))


if __name__ == "__main__":
    main()
