"""Round-14 optimization probe: time / explain registry queries under
the EXACT bench session (same confs, same warmed caches) without the
full bench harness.

Usage:
  python tools/opt_r14_probe.py time NAME [NAME...] [--passes 4]
  python tools/opt_r14_probe.py explain NAME [NAME...] [--out DIR]
  python tools/opt_r14_probe.py exec SCRIPT.py   # script sees spark, sf_dir, T()

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), OPT_SF_MULTIPLE=K re-uses tools/scale_testdata like
bench.py --sf-multiple.

Timing method is bench.py's: build the DataFrame (queries listed in
bench.MATERIALIZING are rebuilt inside the window), save to the noop
sink, best over N interleaved passes. Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MATERIALIZING = {"dedup_minhash_lsh", "dedup_ngram_jaccard"}


def build_session(sf_dir: str, cpus: str, extra_conf: dict | None = None):
    from pyspark.sql import SparkSession

    total_mb = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet")
    ) / (1 << 20)
    shuffle_parts = str(max(8, min(int(cpus), int(total_mb))))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("opt-r14-probe")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def warm(spark, sf_dir: str) -> None:
    from trendmachine_spark.registry import _daily, _dense, _docs, _embeddings

    for fname in sorted(os.listdir(sf_dir)):
        if fname.endswith(".parquet"):
            with open(os.path.join(sf_dir, fname), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    _daily(spark, sf_dir).count()
    _dense(spark, sf_dir).count()
    _dense(spark, sf_dir, fill=2, policy="closest").count()
    _docs(spark, sf_dir).count()
    _embeddings(spark, sf_dir).count()


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_queries(spark, sf_dir: str, names: list[str], passes: int) -> dict:
    from trendmachine_spark.registry import QUERIES

    samples: dict[str, list[float]] = {n: [] for n in names}
    dfs = {n: QUERIES[n].builder(spark, sf_dir)
           for n in names if n not in MATERIALIZING}
    for _ in range(passes):
        for n in names:
            t0 = time.perf_counter()
            df = dfs[n] if n in dfs else QUERIES[n].builder(spark, sf_dir)
            noop(df)
            samples[n].append(time.perf_counter() - t0)
        spark.sparkContext._jvm.System.gc()
    return {n: {"best": round(min(s), 3), "all": [round(x, 3) for x in s]}
            for n, s in samples.items()}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    extra_conf: dict = {}
    mult = os.environ.get("OPT_SF_MULTIPLE")
    if mult:
        from tools.scale_testdata import scale_dir, split_confs

        sf_dir = scale_dir(sf_dir, f"/tmp/trendmachine_scaled_x{int(mult)}", int(mult))
        extra_conf = split_confs(int(cpus))

    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return
    cmd, args = args[0], args[1:]
    passes = 4
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    out_dir = None
    if "--out" in args:
        i = args.index("--out")
        out_dir = args[i + 1]
        args = args[:i] + args[i + 2:]

    if cmd == "exec":
        spark = build_session(sf_dir, cpus, extra_conf)
        warm(spark, sf_dir)
        glb = {"spark": spark, "sf_dir": sf_dir, "noop": noop,
               "time_queries": time_queries, "__name__": "__probe__"}
        with open(args[0]) as fh:
            code = fh.read()
        exec(compile(code, args[0], "exec"), glb)
        spark.stop()
        return

    from trendmachine_spark.registry import QUERIES

    names = args
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = build_session(sf_dir, cpus, extra_conf)
    if cmd == "explain":
        # plans don't need warmed caches, but the registry _CACHE layers
        # (persisted daily/dense) alter plan shape (InMemoryTableScan),
        # so warm anyway for bench-true shapes
        warm(spark, sf_dir)
        for n in names:
            df = QUERIES[n].builder(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
                with open(os.path.join(out_dir, f"{n}.txt"), "w") as fh:
                    fh.write(txt)
                print(f"wrote {out_dir}/{n}.txt")
            else:
                print(f"===== {n}\n{txt}")
    elif cmd == "time":
        warm(spark, sf_dir)
        res = time_queries(spark, sf_dir, names, passes)
        print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "passes": passes,
                          "results": res}, separators=(",", ":")))
    else:
        raise SystemExit(f"unknown cmd {cmd}")
    spark.stop()


if __name__ == "__main__":
    main()
