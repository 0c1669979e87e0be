"""ANN recall artifact (round-4 mandate): recall@k of the approximate
similarity paths vs the exact brute-force ranking, on the ×10 corpus.

Round 11: the eval corpus is PERTURBED — deterministic per-(vec_id,
dim) noise (see EPS) makes replica family members near- rather than
exact-copies. On the raw scaled corpus every config saturated to
recall 1.0 at x20 (>= 19 exact copies fill the exact top-10), so the
artifact stopped measuring the index; with the perturbation, family
members scatter across adjacent SRP buckets / IVF cells and the
configs separate again. The raw-corpus saturation number is still
recorded for the record (saturation_raw_corpus_recall_at_10).

Both ANN paths are value-hash-exact against their own DEFINITIONS (the
driver oracles pin that); this artifact tracks the other axis —
approximation QUALITY — round-over-round:

* SRP-LSH (ann_topk) at n_planes ∈ {4, 8}: fewer planes = bigger
  buckets = higher recall, more compute.
* IVF (ivf_topk) at n_probe ∈ {1, 2, 4}: more probed cells = higher
  recall, proportionally more of the corpus touched (n_probe/n_cells).

recall@k = |approx top-k ∩ exact top-k| / k, averaged over the query
set. Writes ANN_RECALL.json at the repo root.

Usage: python tools/ann_recall.py [x_multiple] (default 10)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 32
K = 10

#: perturbation amplitude for the r11 discriminating eval: each
#: element of each corpus vector gets deterministic uniform noise in
#: [-EPS, EPS] (hash of (vec_id, dim) — reproducible, seedless). On
#: the ~unit-norm 64-dim corpus this is a ~0.09 rad rotation per
#: replica (replica cosine ~0.996), small enough that family members
#: remain the true top-k but large enough that they scatter across
#: nearby SRP buckets / IVF cells — so recall once again MEASURES the
#: index instead of the replica ceiling (the r10 verdict: every config
#: read 1.0 at x20 because >= 19 EXACT copies saturated top-10).
EPS = 0.02


def _perturb(emb, eps: float = EPS):
    """Deterministic per-(vec_id, dim) noise on the embedding column."""
    from pyspark.sql import functions as F

    noisy = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x.cast("double")
            + F.lit(eps)
            * ((F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(2001))
                .cast("double") - 1000.0) / 1000.0)
        ).cast("float"),
    )
    return emb.select("vec_id", noisy.alias("embedding"))


def _topk_sets(rows):
    by_q: dict[int, set[int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return by_q


def _recall(approx_rows, exact_sets) -> float:
    approx = _topk_sets(approx_rows)
    recalls = [
        len(approx.get(q, set()) & exact_sets[q]) / len(exact_sets[q])
        for q in exact_sets
    ]
    return round(sum(recalls) / len(recalls), 4)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import SparkSession

    from tools.scale_testdata import scale_dir, split_confs
    from trendmachine_spark.extensions.similarity import (
        ann_topk,
        brute_force_topk,
        ivf_topk,
    )
    from trendmachine_spark.sources.tables import load_table

    builder = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # scaled corpora are multi-row-group since r11 (scale_testdata)
    for key, val in split_confs(32).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = scale_dir("/root/testdata/sf0.1", f"/tmp/trendmachine_scaled_x{mult}", mult)
    emb_raw = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb_raw.count()

    # r11: the eval corpus is PERTURBED (see EPS) — localCheckpoint so
    # every consumer (exact baseline, SRP, IVF, bucket stats) scores
    # the same materialized vectors instead of re-deriving the noise
    # map per plan subtree
    emb = _perturb(emb_raw).localCheckpoint()

    exact_sets = _topk_sets(brute_force_topk(emb, N_QUERIES, K).collect())

    # the r10 saturation number, kept as documentation: on the RAW
    # replica corpus every config reads ~1.0 at x20 because >= 19 exact
    # copies fill the exact top-10 — a data property, not index quality
    saturation_raw = _recall(
        ann_topk(emb_raw, N_QUERIES, K, n_planes=8, n_flip=0).collect(),
        _topk_sets(brute_force_topk(emb_raw, N_QUERIES, K).collect()))

    # SRP sweep over (planes, flips). candidates = avg per-query scored
    # pair count (the cost axis the round-5 recall mandate budgets:
    # multi-probe must beat single-probe recall at <= 1.2x the
    # n_planes=8 single-probe candidate volume).
    from trendmachine_spark.extensions.similarity import (
        quantize_embeddings,
        srp_buckets,
        srp_probe_buckets,
    )
    from pyspark.sql import functions as F

    def _srp_candidates(p: int, n_flip: int) -> float:
        qv = quantize_embeddings(emb)
        sizes = srp_buckets(qv, p).groupBy("bucket").count()
        probes = srp_probe_buckets(
            qv.filter(F.col("vid") < N_QUERIES), p, n_flip)
        total = (
            probes.join(sizes, "bucket", "left")
            .agg(F.sum(F.coalesce("count", F.lit(0))))
            .first()[0]
        )
        # own vector matches itself in its home bucket -> subtract
        return round((int(total or 0) - N_QUERIES) / N_QUERIES, 1)

    srp = {}
    for p, nf in ((4, 0), (8, 0), (8, 2), (10, 3), (10, 4), (12, 6), (12, 8)):
        key = f"n_planes={p},n_flip={nf}"
        srp[key] = {
            "recall": _recall(
                ann_topk(emb, N_QUERIES, K, n_planes=p, n_flip=nf).collect(),
                exact_sets),
            "candidates_per_query": _srp_candidates(p, nf),
        }
    ivf = {
        f"n_probe={np_}": _recall(
            ivf_topk(emb, N_QUERIES, K, n_cells=16, n_probe=np_).collect(),
            exact_sets)
        for np_ in (1, 2, 4)
    }
    # untrained-seed twins (refine=0) + cell-balance stats for both
    # centroid sets: the round-6 Lloyd refinement should give >= recall
    # and flatter cells (balance = max cell size / mean cell size)
    ivf["n_probe=2,refine=0"] = _recall(
        ivf_topk(emb, N_QUERIES, K, n_cells=16, n_probe=2, refine=0).collect(),
        exact_sets)

    from pyspark.sql import functions as F

    from trendmachine_spark.extensions.similarity import (
        ivf_assign,
        quantize_embeddings,
    )

    qv = quantize_embeddings(emb)
    balance = {}
    for refine in (0, 1):
        sizes = [
            r["n"] for r in ivf_assign(qv, 16, refine=refine)
            .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        mean = sum(sizes) / len(sizes) if sizes else 0
        balance[f"refine={refine}"] = {
            "n_nonempty_cells": len(sizes),
            "max_cell": max(sizes, default=0),
            "min_cell": min(sizes, default=0),
            "max_over_mean": round(max(sizes, default=0) / mean, 3) if mean else None,
        }
    ivf["cell_balance"] = balance

    # PQ/ADC (round 11): full-corpus compressed scan, so recall here is
    # purely quantization quality (no candidate restriction axis like
    # SRP/IVF). Sweep subspace count / code count / Lloyd refinement —
    # more subspaces or codes = finer reconstruction = higher recall;
    # refine=0 is the untrained-seed twin.
    from trendmachine_spark.extensions.similarity import pq_topk

    pq = {}
    for n_sub, n_codes, refine in (
        (8, 16, 1), (8, 16, 0), (8, 8, 1), (4, 16, 1), (16, 16, 1),
    ):
        key = f"n_sub={n_sub},n_codes={n_codes},refine={refine}"
        pq[key] = _recall(
            pq_topk(emb, N_QUERIES, K,
                    n_sub=n_sub, n_codes=n_codes, refine=refine).collect(),
            exact_sets)

    # SQ8 (round 12): per-dimension int8 scalar quantization — 8x
    # memory collapse at much higher precision than PQ's 64x; the
    # row pair (sq8 vs pq at equal corpus) measures the
    # precision-per-byte trade the FAISS family offers.
    from trendmachine_spark.extensions.similarity import sq8_topk

    pq["sq8"] = _recall(sq8_topk(emb, N_QUERIES, K).collect(), exact_sets)

    # IVF+SQ8 (r12): cell pruning x scalar quantizer — near-exact
    # per-candidate precision means the recall axis collapses to the
    # IVF probe choice (compare against the plain ivf rows above)
    from trendmachine_spark.extensions.similarity import ivfsq8_topk

    for np_ in (1, 2, 4):
        pq[f"ivfsq8,n_probe={np_}"] = _recall(
            ivfsq8_topk(emb, N_QUERIES, K, n_cells=16,
                        n_probe=np_).collect(), exact_sets)

    # two-stage: ADC candidates + exact re-rank — the production shape
    # that closes the compressed scan's quantization-error ceiling
    from pyspark.sql.functions import broadcast  # noqa: F401 (doc anchor)
    from trendmachine_spark.extensions.similarity import (pq_rerank_topk,
                                                          sq8_rerank_topk)

    for expand in (2, 4):
        pq[f"rerank,expand={expand}"] = _recall(
            pq_rerank_topk(emb, N_QUERIES, K, expand=expand).collect(),
            exact_sets)

    # density-ADAPTIVE rerank (r14 verdict #3): the widen-only plateau
    # rule at its pinned defaults (min_expand=4, max_expand=8). The
    # rule's contract is recall >= the fixed min_expand floor at EVERY
    # density — asserted here so a regression fails the artifact run
    # loudly instead of shipping a quietly weaker row.
    from trendmachine_spark.extensions.similarity import pq_rerank_auto_topk

    pq["rerank,expand=auto"] = _recall(
        pq_rerank_auto_topk(emb, N_QUERIES, K).collect(), exact_sets)
    if pq["rerank,expand=auto"] < pq["rerank,expand=4"]:
        raise RuntimeError(
            f"density-adaptive rerank recall {pq['rerank,expand=auto']} "
            f"fell below its min_expand floor {pq['rerank,expand=4']} — "
            "the widen-only contract is broken")

    # two-stage over SQ8 (r13): stage-1 recall is ~0.95 where PQ-ADC
    # reads ~0.54 at x20, so the expand needed for exact recall should
    # be structurally smaller — measured at expand 1 and 2 (expand=1
    # IS plain sq8 re-ordered exactly: any gain over the sq8 row is
    # pure ordering repair within the same candidate set)
    for expand in (1, 2):
        pq[f"sq8_rerank,expand={expand}"] = _recall(
            sq8_rerank_topk(emb, N_QUERIES, K, expand=expand).collect(),
            exact_sets)

    # density-adaptive SQ8 two-stage (r14): widen-only over the
    # min_expand=2 floor — same floor contract as the PQ auto row
    from trendmachine_spark.extensions.similarity import sq8_rerank_auto_topk

    pq["sq8_rerank,expand=auto"] = _recall(
        sq8_rerank_auto_topk(emb, N_QUERIES, K).collect(), exact_sets)
    if pq["sq8_rerank,expand=auto"] < pq["sq8_rerank,expand=2"]:
        raise RuntimeError(
            f"density-adaptive sq8 rerank recall "
            f"{pq['sq8_rerank,expand=auto']} fell below its min_expand "
            f"floor {pq['sq8_rerank,expand=2']} — widen-only contract broken")

    # IVF+PQ: both reductions composed — cell pruning (recall axis =
    # n_probe, as plain IVF) x compressed scoring (the ADC ceiling)
    from trendmachine_spark.extensions.similarity import ivfpq_topk

    for np_ in (1, 2, 4):
        pq[f"ivfpq,n_probe={np_}"] = _recall(
            ivfpq_topk(emb, N_QUERIES, K, n_cells=16, n_probe=np_).collect(),
            exact_sets)

    # density-adaptive IVF+PQ two-stage (r14): exact re-rank of a
    # SUPERSET of stage-1's top-k can never evict a true top-k member
    # stage 1 surfaced, so recall(auto) >= recall(plain ivfpq at the
    # same n_probe) is a hard guarantee — asserted per run.
    from trendmachine_spark.extensions.similarity import ivfpq_rerank_auto_topk

    pq["ivfpq_rerank,expand=auto,n_probe=2"] = _recall(
        ivfpq_rerank_auto_topk(emb, N_QUERIES, K, n_cells=16,
                               n_probe=2).collect(), exact_sets)
    if pq["ivfpq_rerank,expand=auto,n_probe=2"] < pq["ivfpq,n_probe=2"]:
        raise RuntimeError(
            f"ivfpq auto rerank recall "
            f"{pq['ivfpq_rerank,expand=auto,n_probe=2']} fell below its "
            f"stage-1 floor {pq['ivfpq,n_probe=2']} — the superset-rerank "
            "guarantee is broken")

    # frozen-structure STALENESS (r14): the incremental-append
    # lifecycle trains centroids+codebooks on the base 80% only, then
    # serves every vector (base + appended delta) from the combined
    # at-rest index. The recall delta vs the fully-trained
    # ivfpq,n_probe=2 row at the same density IS the staleness cost of
    # frozen structures — the number that decides the retrain cadence.
    import shutil
    import tempfile

    from trendmachine_spark.extensions.similarity import (
        ivfpq_index_append,
        ivfpq_index_write,
        ivfpq_topk_from_index,
        probe_from_vectors,
    )

    n_emb = emb.count()
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    probe = probe_from_vectors(
        [r["vec_id"] for r in qrows], [r["embedding"] for r in qrows])
    probe.bound = N_QUERIES
    srows = emb.filter(F.col("vec_id") < 16).collect()
    seeds = probe_from_vectors(
        [r["vec_id"] for r in srows], [r["embedding"] for r in srows])
    seeds.bound = 16
    # swept over base fraction (r14 second pass): the cadence curve —
    # how stale can the frozen structures get before recall moves
    for num, den, tag in ((1, 2, "base50"), (4, 5, "base80"),
                          (19, 20, "base95")):
        base_n = n_emb * num // den
        tmpd = tempfile.mkdtemp(prefix="ann_recall_append_")
        try:
            trained = ivfpq_index_write(
                emb.filter(F.col("vec_id") < base_n), tmpd,
                seed_probe=seeds)
            ivfpq_index_append(
                emb.filter(F.col("vec_id") >= base_n), tmpd, trained)
            pq[f"ivfpq,n_probe=2,train={tag}"] = _recall(
                ivfpq_topk_from_index(spark, tmpd, trained, N_QUERIES, K,
                                      n_probe=2, probe=probe).collect(),
                exact_sets)
        finally:
            shutil.rmtree(tmpd, ignore_errors=True)

    # FILTERED serving (r14): predicate x vector search. Ground truth
    # is the exact quantized-cosine top-k among label-matching rows
    # only (computed driver-side over probe_from_vectors-quantized
    # ints — bit-identical quantization, same (cosine DESC, id) tie
    # order). Pre (selector) recall isolates quantizer loss under the
    # predicate; post (k*expand then filter) shows the starvation.
    from trendmachine_spark.extensions.similarity import sq8_topk_filtered

    FILTER_LABEL = 3
    emb_l = emb.join(emb_raw.select("vec_id", "label"), "vec_id")
    frows = (emb_l.filter(F.col("label") == FILTER_LABEL)
             .select("vec_id", "embedding").collect())
    import numpy as np

    cf = probe_from_vectors(
        [r["vec_id"] for r in frows], [r["embedding"] for r in frows])
    cids, Cq, cn2 = (np.asarray(cf[0]), np.asarray(cf[1]),
                     np.asarray(cf[2], dtype=np.float64))
    qids_, Qq, qn2 = (np.asarray(probe[0]), np.asarray(probe[1]),
                      np.asarray(probe[2], dtype=np.float64))
    cos = (Qq @ Cq.T) / (np.sqrt(qn2)[:, None] * np.sqrt(cn2)[None, :])
    exact_flt = {}
    for j, qid in enumerate(qids_):
        keep = cids != qid
        key = np.where(np.isnan(cos[j, keep]), np.inf, -cos[j, keep])
        order = np.lexsort((cids[keep], key))[:K]
        exact_flt[int(qid)] = set(int(i) for i in cids[keep][order])
    pq["sq8_filtered,mode=pre"] = _recall(
        sq8_topk_filtered(emb_l, N_QUERIES, K, label_value=FILTER_LABEL,
                          mode="pre", probe=probe).collect(), exact_flt)
    pq["sq8_filtered,mode=post,expand=4"] = _recall(
        sq8_topk_filtered(emb_l, N_QUERIES, K, label_value=FILTER_LABEL,
                          mode="post", expand=4,
                          probe=probe).collect(), exact_flt)
    # the 1/selectivity point: at ~10% selectivity the naive pipeline
    # needs expand ~= 40 (k*expand = 400 stage-1 rows) for its
    # stage-1 top-list to contain the filter's true top-k — the
    # quantitative form of "post-filter expand scales as
    # 1/selectivity", vs the selector path paying selectivity x scan
    pq["sq8_filtered,mode=post,expand=40"] = _recall(
        sq8_topk_filtered(emb_l, N_QUERIES, K, label_value=FILTER_LABEL,
                          mode="post", expand=40,
                          probe=probe).collect(), exact_flt)

    # RESIDUAL encoding (round 12): same cells, same code budget
    # (8 subspaces x 16 codes), but the fine quantizer codes
    # v − centroid(cell(v)) — the FAISS default. Residuals concentrate
    # the quantizer's dynamic range, so at equal bytes the row pair
    # (ivfpq vs ivfpq_residual at each n_probe) shows what the default
    # buys; the r11 raw-encoding divergence is now a measured choice.
    from trendmachine_spark.extensions.similarity import ivfpq_residual_topk

    for np_ in (1, 2, 4):
        pq[f"ivfpq_residual,n_probe={np_}"] = _recall(
            ivfpq_residual_topk(
                emb, N_QUERIES, K, n_cells=16, n_probe=np_).collect(),
            exact_sets)

    # EQUAL-BYTE-BUDGET quantizer matrix (r12 verdict #4): the r12
    # headline contrast (PQ 0.54 vs SQ8 0.95 recall@10 at x20) mixed
    # code budget with method — the default PQ rows carry 8 codes x
    # 4 bits = 4 B/vector while SQ8 spends dim = 64 B. Hold
    # bytes/vector fixed and the method question separates:
    #   4 B:  pq n_sub=8,K=16 (the default, repeated here for the row)
    #   8 B:  pq n_sub=8,K=256 | ivfpq/ivfpq_residual n_sub=8,K=256
    #   16 B: pq n_sub=16,K=256
    #   64 B: pq n_sub=64,K=256 (per-dim learned scalar codebook) |
    #         sq8 (per-dim linear int8 — the fixed-scale twin)
    # K=256 stays exact-integer-trainable (same Lloyd machinery, seeds
    # = lowest 256 ids); bytes = n_sub * ceil(log2 K) / 8.
    import math

    ebb = {}

    def _code_bytes(n_sub, n_codes):
        return n_sub * max(1, math.ceil(math.log2(n_codes))) / 8

    for n_sub, n_codes in ((8, 16), (8, 256), (16, 256), (64, 256)):
        ebb[f"pq,n_sub={n_sub},K={n_codes}"] = {
            "bytes_per_vector": _code_bytes(n_sub, n_codes),
            "recall": _recall(
                pq_topk(emb, N_QUERIES, K, n_sub=n_sub,
                        n_codes=n_codes).collect(), exact_sets),
        }
    # sq8 spends exactly one byte per dimension — derive from a probe
    # row, not a literal (r13 ADVICE: a hardcoded 64.0 would silently
    # misreport bytes if the corpus dim ever changed while the pq rows
    # stayed self-consistent via _code_bytes)
    emb_dim = len(emb.select("embedding").head()[0])
    ebb["sq8"] = {"bytes_per_vector": float(emb_dim), "recall": pq["sq8"]}
    for label, fn in (("ivfpq", ivfpq_topk),
                      ("ivfpq_residual", ivfpq_residual_topk)):
        ebb[f"{label},n_sub=8,K=256,n_probe=4"] = {
            "bytes_per_vector": _code_bytes(8, 256),
            "recall": _recall(
                fn(emb, N_QUERIES, K, n_cells=16, n_probe=4,
                   n_sub=8, n_codes=256).collect(), exact_sets),
        }

    # Recall CEILING evidence (round 5): the scaled corpus replicates
    # each base vector, so a query has exactly |family|-1 true
    # neighbors; the k-th exact "neighbor" beyond that is isotropic
    # noise whose bucket is uncorrelated with the query's — no LSH
    # config can (or should) retrieve it. Record the per-rank cosine
    # medians and recall at k=family-1 so the ~0.90 recall@10 reads as
    # the data property it is.
    import statistics

    exact_rows = brute_force_topk(emb, N_QUERIES, K).collect()
    by_rank: dict[int, list[float]] = {}
    for r in exact_rows:
        by_rank.setdefault(r["rank"], []).append(r["cosine"])
    rank_medians = {
        rk: round(statistics.median(cs), 4) for rk, cs in sorted(by_rank.items())
    }
    fam = max(
        (rk for rk, med in rank_medians.items() if med > 0.9), default=K - 1
    )
    exact_fam = {
        q: {i for i, _ in sorted(
            ((r["neighbor_id"], r["rank"]) for r in exact_rows
             if r["query_id"] == q and r["rank"] <= fam),
            key=lambda t: t[1])}
        for q in {r["query_id"] for r in exact_rows}
    }
    recall_fam = _recall(
        ann_topk(emb, N_QUERIES, fam, n_planes=8, n_flip=0).collect(), exact_fam)

    out = {
        "metric": ("ANN recall@k vs exact brute-force cosine top-k on the "
                   "PERTURBED replica corpus (r11: deterministic per-"
                   "(vec_id,dim) noise, eps in docstring — replicas are "
                   "near- not exact-copies, so configs separate again)"),
        "sf": f"0.1x{mult}",
        "n_corpus_vectors": n_corpus,
        "n_queries": N_QUERIES,
        "k": K,
        "perturb_eps": EPS,
        "saturation_raw_corpus_recall_at_10": saturation_raw,
        "srp_lsh": srp,
        "ivf": ivf,
        "pq_adc": pq,
        "equal_byte_budget": ebb,
        "ceiling": {
            "exact_rank_cosine_medians": rank_medians,
            "in_family_k": fam,
            "srp_recall_at_family_k": recall_fam,
            "note": (
                "rank medians on the PERTURBED corpus: in-family ranks sit "
                "near cos~0.996 (the eps rotation), the cliff past "
                "in_family_k is isotropic noise. With replicas perturbed, "
                "recall@10 varies by config again (the r11 point); recall "
                "at family k remains the family-coverage number."
            ),
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ANN_RECALL.json"
    )
    # r10: keep one artifact per measured corpus multiple side by side
    # (the r9 verdict wants x10 AND x20 on record) — merge under
    # "scales" while keeping the top-level fields as the latest run
    # for artifact back-compat
    prior = {}
    try:
        with open(path) as fh:
            prior = json.load(fh).get("scales", {})
    except FileNotFoundError:
        pass  # first run: nothing to merge
    except (OSError, json.JSONDecodeError, KeyError, AttributeError) as exc:
        # r10 advice: a corrupt/unreadable prior artifact must not
        # SILENTLY drop the recorded x10/x20 scale entries
        print(f"WARNING: prior {path} unreadable ({exc!r}); "
              "previously recorded scale entries will be dropped",
              file=sys.stderr)
    prior[f"x{mult}"] = out
    out_full = dict(out)
    out_full["scales"] = prior
    with open(path, "w") as fh:
        json.dump(out_full, fh, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
