"""Substring-dedup window sensitivity sweep (round-5 mandate #5;
round 6 adds the NATURAL-text corpus the round-5 verdict asked for).

``duplicated_spans``/``strip_duplicated_spans`` detect only spans >=
``win`` tokens (the bounded-window form of Lee et al.'s suffix-array
exact-substring dedup): a duplicated span of win-1 tokens is invisible.
The replica sweep quantifies the recall/cost curve at win ∈ {5, 10, 20}
on the ×10 corpus; because that corpus is replica-heavy (win=5 marks
95% of tokens by construction), round 6 adds a seeded NATURAL-text
mixed corpus — Zipf vocabulary, four disjoint families: unique,
quote-embedding (planted exact spans of 3..40 tokens), shared
boilerplate (6..30-token headers/footers), and paraphrase (every k-th
token rewritten, k ∈ {4,6,8}, leaving exact k-1-token fragments) —
with per-family attribution, so the win floor is measured on text
whose duplication structure resembles a web corpus instead of pure
replicas. The unique family measures CHANCE collisions (marked tokens
in docs that share no planted span = false-positive mass of a small
win); the paraphrase family measures what a win misses (its exact
fragments sit below win=10 by construction). Results land in
SUBSTRING_WIN_SWEEP.json and the SCALE.md narrative.

Run solo (never alongside another Spark JVM):
  python tools/substring_win_sweep.py [x_multiple]       # replica sweep
  python tools/substring_win_sweep.py --natural [n_docs] # natural sweep
  python tools/substring_win_sweep.py --both [x_multiple]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINS = (5, 10, 20)
NATURAL_WINS = (3, 5, 10, 20)


def natural_corpus(n_docs: int = 30000, seed: int = 61) -> list[tuple]:
    """(doc_id, text, family) rows: a seeded pseudo-natural mix.

    ~70% unique, ~10% quote (each embeds an exact span of a unique doc,
    span length cycling over 3..40), ~10% boilerplate (one of five
    shared 6..30-token blocks prepended/appended), ~10% paraphrase
    (another doc's tokens with every k-th replaced). Unique docs that
    serve as quote/paraphrase SOURCES are labeled 'source' so the
    'unique' family stays a pure chance-collision control.
    """
    rng = random.Random(seed)
    # Zipf-ish vocabulary: 50 stopwords cover ~45% of tokens, 2000
    # content words cover the rest with 1/r weights
    stop = [f"s{i}" for i in range(50)]
    content = [f"w{i}" for i in range(2000)]
    cweights = [1.0 / (r + 1) for r in range(len(content))]

    def sentence_tokens(n: int) -> list[str]:
        toks = []
        for _ in range(n):
            if rng.random() < 0.45:
                toks.append(rng.choice(stop))
            else:
                toks.append(rng.choices(content, cweights)[0])
        return toks

    n_uniq = int(n_docs * 0.7)
    docs: list[list[str]] = [
        sentence_tokens(rng.randrange(80, 200)) for _ in range(n_uniq)
    ]
    family = ["unique"] * n_uniq

    quote_lens = [3, 4, 5, 6, 8, 10, 12, 16, 24, 40]
    n_quote = int(n_docs * 0.1)
    for i in range(n_quote):
        src = rng.randrange(n_uniq)
        family[src] = "source"
        qlen = quote_lens[i % len(quote_lens)]
        start = rng.randrange(0, max(len(docs[src]) - qlen, 1))
        quote = docs[src][start:start + qlen]
        body = sentence_tokens(rng.randrange(60, 150))
        at = rng.randrange(0, len(body))
        docs.append(body[:at] + quote + body[at:])
        family.append(f"quote_{qlen}")

    boiler = [sentence_tokens(n) for n in (6, 9, 12, 18, 30)]
    n_boil = int(n_docs * 0.1)
    for i in range(n_boil):
        b = boiler[i % len(boiler)]
        body = sentence_tokens(rng.randrange(60, 150))
        docs.append(b + body if i % 2 else body + b)
        family.append(f"boiler_{len(b)}")

    n_para = n_docs - len(docs)
    for i in range(n_para):
        src = rng.randrange(n_uniq)
        family[src] = "source"
        k = (4, 6, 8)[i % 3]
        toks = list(docs[src])
        for p in range(k - 1, len(toks), k):
            toks[p] = rng.choices(content, cweights)[0]
        docs.append(toks)
        family.append(f"para_k{k}")

    return [(i, " ".join(t), family[i]) for i, t in enumerate(docs)]


def natural_sweep(spark, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from trendmachine_spark.extensions.dedup import duplicated_spans

    rows = natural_corpus(n_docs)
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string")
    docs = docs.repartition(32).persist()
    docs.count()
    fam = {i: f for i, _, f in rows}
    fam_group = {i: (f.split("_")[0] if f != "source" else "source")
                 for i, f in fam.items()}

    out = {"n_docs": len(rows), "seed": 61,
           "families": {g: sum(1 for v in fam_group.values() if v == g)
                        for g in sorted(set(fam_group.values()))},
           "wins": {}}
    for win in NATURAL_WINS:
        t0 = time.perf_counter()
        rep = duplicated_spans(docs.select("doc_id", "text"), win=win).collect()
        wall = round(time.perf_counter() - t0, 3)
        tot: dict[str, list[int]] = {}
        for r in rep:
            g = fam_group[r["doc_id"]]
            agg = tot.setdefault(g, [0, 0, 0])
            agg[0] += r["dup_tokens"]
            agg[1] += r["n_tokens"]
            agg[2] += 1 if r["dup_tokens"] > 0 else 0
        per_family = {
            g: {"dup_token_fraction": round(a[0] / a[1], 5),
                "docs_hit_fraction": round(a[2] / out["families"][g], 4)}
            for g, a in sorted(tot.items())
        }
        # per planted quote length: detected iff the quoting doc marks
        # >= that many tokens (the span itself plus any chance mass)
        qdet = {}
        for qlen in (3, 4, 5, 6, 8, 10, 12, 16, 24, 40):
            ids = [i for i, f in fam.items() if f == f"quote_{qlen}"]
            hits = sum(1 for r in rep
                       if r["doc_id"] in set(ids) and r["dup_tokens"] >= qlen)
            qdet[qlen] = round(hits / len(ids), 3) if ids else None
        out["wins"][win] = {
            "per_family": per_family,
            "quote_detection_by_len": qdet,
            "report_wall_s": wall,
        }
    docs.unpersist()
    return out


def replica_sweep(spark, mult: int) -> dict:
    from pyspark.sql import functions as F

    from tools.scale_testdata import scale_dir, split_confs
    from trendmachine_spark.extensions.dedup import (
        duplicated_spans,
        strip_duplicated_spans,
    )
    from trendmachine_spark.sources.tables import load_table

    sf_dir = scale_dir("/root/testdata/sf0.1", f"/tmp/trendmachine_scaled_x{mult}", mult)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.persist().count()

    out = {"sf": f"0.1x{mult}", "n_docs": docs.count(), "wins": {}}
    for win in WINS:
        walls_r, walls_s = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            rep = duplicated_spans(docs, win=win).agg(
                F.sum("dup_tokens").alias("dup"),
                F.sum("n_tokens").alias("tot"),
                F.sum((F.col("dup_tokens") > 0).cast("long")).alias("docs_hit"),
                F.sum("n_islands").alias("islands"),
            ).first()
            walls_r.append(round(time.perf_counter() - t0, 3))
        for _ in range(2):
            t0 = time.perf_counter()
            stripped = strip_duplicated_spans(docs, win=win).agg(
                F.sum("n_removed_tokens").alias("removed"),
                F.sum("n_tokens").alias("tot"),
            ).first()
            walls_s.append(round(time.perf_counter() - t0, 3))
        out["wins"][win] = {
            "dup_token_fraction": round(rep["dup"] / rep["tot"], 5),
            "docs_with_dups": rep["docs_hit"],
            "n_islands": rep["islands"],
            "strip_removed_fraction": round(stripped["removed"] / stripped["tot"], 5),
            "report_wall_best_s": min(walls_r),
            "strip_wall_best_s": min(walls_s),
        }
    docs.unpersist()
    return out


def main() -> None:
    args = sys.argv[1:]
    mode = "replica"
    if args and args[0] in ("--natural", "--both"):
        mode = args[0][2:]
        args = args[1:]
    arg = int(args[0]) if args else (30000 if mode == "natural" else 10)

    from pyspark.sql import SparkSession

    from tools.scale_testdata import split_confs

    _builder = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # scaled corpora are multi-row-group since r11 (scale_testdata)
    for _k, _v in split_confs(32).items():
        _builder = _builder.config(_k, _v)
    spark = _builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SUBSTRING_WIN_SWEEP.json",
    )
    out: dict = {}
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
        # round-5 files were the bare replica dict; fold them in
        out = prev if "replica" in prev or "natural" in prev else {"replica": prev}
    if mode in ("replica", "both"):
        out["replica"] = replica_sweep(spark, arg if mode == "replica" else 10)
    if mode in ("natural", "both"):
        out["natural"] = natural_sweep(
            spark, arg if mode == "natural" else 30000)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
