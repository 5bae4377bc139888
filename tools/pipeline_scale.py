"""Scale certification for the LLM-data-pipeline operators.

The cascade suites certify the JOIN engine at 100M rows; this tool does
the same for the pipeline surface — the operators a training-data run
lives on — at sizes where a wrong shape (all-pairs join, per-row
Python, driver loop) would be minutes-to-hours instead of seconds:

- dedup leg, 2M synthetic documents (1/3 exact dups, 1/3 near-dups):
  exact content dedup (one hash aggregate) and MinHash+LSH banding
  (32 minhashes folded JVM-side in ONE projection, 8-band bucket join).
  The certification asserts the candidate join is banded — pair count
  within a constant factor of the true near-dup count, against the
  ~2e12 all-pairs a naive shape would score.
- ANN leg, 1M x 64-dim vectors, 50 queries: exact brute-force top-10
  (broadcast queries x one corpus pass) as baseline; hyperplane-LSH and
  IVF(nprobe) as the scale paths, each timed and recall@10-scored
  against the exact result.

Everything is deterministic (hash-derived text and vectors) and
DataFrame-only — zero Python UDFs, zero collect loops.

Run: python -u tools/pipeline_scale.py [--docs N] [--vecs N]
Emits one JSON line; artifact committed as PIPELINE_SCALE_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 2_000_000
N_VECS = 1_000_000
DIM = 64
N_QUERIES = 50


def main() -> int:
    argv = sys.argv[1:]
    n_docs, n_vecs = N_DOCS, N_VECS
    i = 0
    while i < len(argv):
        if argv[i] == "--docs":
            n_docs = int(argv[i + 1]); i += 2
        elif argv[i] == "--vecs":
            n_vecs = int(argv[i + 1]); i += 2
        else:
            i += 1

    from pyspark.sql import functions as F

    from duckdb_robust_predicate_transfer_spark.operators import (dedup,
                                                                  similarity)
    from duckdb_robust_predicate_transfer_spark.session import get_spark

    spark = get_spark(app_name="drpt-pipeline-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"suite": "pipeline-scale"}

    # ---- dedup leg ---------------------------------------------------
    # 3 variants per base text: v0 original, v1 EXACT copy, v2 near-dup
    # (one word appended). 12 hash-drawn words from a 50k vocabulary.
    base = "(id div 3)"
    words = (f"transform(sequence(0, 11),"
             f" i -> concat('w', pmod(xxhash64({base}, i), 50000)))")
    docs = (spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.expr("pmod(id, 3)") < 2,
               F.expr(f"concat_ws(' ', {words})"))
        .otherwise(F.expr(f"concat_ws(' ', {words}, "
                          f"concat('v', pmod(id, 3)))"))
        .alias("text")))
    docs_dir = f"/tmp/drpt_pipescale_docs_{n_docs}"
    if not os.path.exists(os.path.join(docs_dir, "_SUCCESS")):
        docs.write.mode("overwrite").parquet(docs_dir)
    docs = spark.read.parquet(docs_dir)

    t0 = time.time()
    kept = dedup.exact_dedup(docs, "doc_id").count()
    t_exact = time.time() - t0
    # v1 duplicates v0 -> keep 2 of each complete 3-group; a trailing
    # partial group (1 or 2 ids) keeps exactly 1 either way
    expect_kept = (n_docs // 3) * 2 + (1 if n_docs % 3 else 0)
    out["dedup"] = {
        "n_docs": n_docs,
        "exact_sec": round(t_exact, 2),
        "exact_kept": kept,
        "exact_kept_expected": expect_kept,
    }

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", k=32, bands=8,
                                    min_est_jaccard=0.5).count()
    t_lsh = time.time() - t0
    # per base group: (v0,v1) identical + (v0,v2),(v1,v2) near -> <= 3
    # candidate pairs x n_docs/3 groups; anything near all-pairs
    # (~n_docs^2/2) means the banding broke
    groups = n_docs // 3
    out["dedup"].update({
        "lsh_sec": round(t_lsh, 2),
        "lsh_pairs": pairs,
        "lsh_pairs_bound": 3 * groups,
        "all_pairs_avoided": round((n_docs * (n_docs - 1) / 2) / max(pairs, 1)),
    })

    # ---- ANN leg -----------------------------------------------------
    # clustered, not uniform: 200 hash-derived centers + 15% noise.
    # Uniform random vectors have no neighbor structure in 64-dim (every
    # pair is near-orthogonal), which makes recall@10 a coin flip for
    # ANY index; real embedding corpora are clustered, and this is the
    # regime LSH/IVF recall is defined over.
    center = "pmod(xxhash64(id), 200)"
    vec = (f"transform(sequence(0, {DIM - 1}),"
           f" j -> cast((pmod(xxhash64({center}, j), 2001) / 1000.0 - 1.0)"
           f" + (pmod(xxhash64(id, j), 2001) / 1000.0 - 1.0) * 0.15"
           f" as float))")
    corpus = (spark.range(n_vecs)
              .select(F.col("id").alias("vec_id"),
                      F.expr(vec).alias("embedding")))
    vec_dir = f"/tmp/drpt_pipescale_vecs_c_{n_vecs}"
    if not os.path.exists(os.path.join(vec_dir, "_SUCCESS")):
        corpus.write.mode("overwrite").parquet(vec_dir)
    corpus = spark.read.parquet(vec_dir)
    step = n_vecs // N_QUERIES
    queries = (corpus.filter(F.expr(f"pmod(vec_id, {step})") == 0)
               .select(F.col("vec_id").alias("qid"),
                       F.col("embedding").alias("qv")))

    t0 = time.time()
    exact = similarity.brute_force_topk_batch(corpus, queries, k=10)
    exact.cache().count()
    t_brute = time.time() - t0

    # 8 planes/band: a random pair shares a band with p ~ 4 * 2^-8
    # (~1.6% of the corpus as candidates) while same-cluster pairs
    # (cos ~ 0.95+) pass with near-certainty — the selectivity that
    # makes the bucket join beat the broadcast cross product
    t0 = time.time()
    lsh = similarity.lsh_topk_batch(corpus, queries, k=10,
                                    n_planes=32, n_bands=4)
    lsh.cache().count()
    t_lshann = time.time() - t0
    lsh_recall = similarity.ann_recall(exact, lsh).collect()[0]["mean_recall"]

    # IVF is index-once / query-many: the corpus x K assignment argmax
    # is K times one brute batch's flops and is paid per (re)index, not
    # per query — time it separately or the comparison is meaningless
    t0 = time.time()
    cents, assigned = similarity.ivf_build(corpus, n_centroids=256)
    assigned = assigned.persist()
    assigned.count()
    t_ivf_build = time.time() - t0
    t0 = time.time()
    ivf = similarity.ivf_topk_batch(corpus, queries, k=10, nprobe=16,
                                    index=(cents, assigned))
    ivf.cache().count()
    t_ivf = time.time() - t0
    ivf_recall = similarity.ann_recall(exact, ivf).collect()[0]["mean_recall"]

    out["ann"] = {
        "n_vectors": n_vecs, "dim": DIM, "n_queries": N_QUERIES, "k": 10,
        "brute_sec": round(t_brute, 2),
        "lsh_sec": round(t_lshann, 2),
        "lsh_recall_at_10": round(float(lsh_recall), 4),
        "lsh_speedup": round(t_brute / max(t_lshann, 1e-3), 2),
        "ivf_build_sec": round(t_ivf_build, 2),
        "ivf_query_sec": round(t_ivf, 2),
        "ivf_recall_at_10": round(float(ivf_recall), 4),
        "ivf_query_speedup": round(t_brute / max(t_ivf, 1e-3), 2),
    }

    ok = (out["dedup"]["exact_kept"] == expect_kept
          and pairs <= out["dedup"]["lsh_pairs_bound"]
          and out["ann"]["lsh_recall_at_10"] >= 0.85)
    out["ok"] = bool(ok)
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
