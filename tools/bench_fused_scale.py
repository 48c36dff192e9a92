"""Fused-signature A/B at scaled corpus size (round 6).

The small-corpus A/B (BENCH/BASELINE.md round-6 section) showed the fused
minhash+simhash doc-signature aggregation wins only in a CPU-saturated
regime — at sf0.1 (5k docs) the local[32] box is task-overhead bound and
the duplicated signature passes ride free parallelism. This tool makes the
saturated regime out of DATA instead of core-count: a K× copy-scaled
documents corpus (each copy's tokens suffixed `_<k>` so copies share NO
shingles — per-copy dup structure identical to the original, corpus-wide
edge count exactly K× the original, no cross-copy pair explosion), then an
interleaved in-session A/B of the candidate-pair materialization:

* unfused — r5 shape: minhash_signatures(sh) and simhash(sh) aggregated
  separately per self-join side (4 signature passes over the shingle
  cache);
* fused   — HEAD shape: fused_doc_signatures(sh) persisted, bands/chunks
  as projections of the n_docs-row cache.

Both run in ONE session at the bench conf with the round-6 session
defaults (cached-plan AQE on), alternating, pair counts asserted equal.

Usage: python tools/bench_fused_scale.py [K] [rounds]   (default K=20, 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FIXTURE_BASE = os.path.join(REPO, ".fixtures")


def scaled_corpus_dir(spark, k: int) -> str:
    """documents.parquet = K token-disjoint copies of SF_DIR's table."""
    out = os.path.join(FIXTURE_BASE, f"docscale_{k}x")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        from pyspark.sql import functions as F

        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        copies = spark.range(k).select(F.col("id").alias("copy"))
        scaled = (
            docs.crossJoin(F.broadcast(copies))
            .select(
                (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.concat(t, F.lit("_"),
                                           F.col("copy").cast("string"))),
                    " ").alias("text"),
            )
        )
        scaled.repartition(64).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet"))
        with open(marker, "w") as f:
            f.write(str(k))
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from ch_pdf_parse_spark.operators.cluster import candidate_pairs_union
    from ch_pdf_parse_spark.operators.dedup import (
        fused_doc_signatures, lsh_candidate_pairs, minhash_signatures,
        ngram_jaccard_pairs, portable_hash, shingles, simhash, simhash_pairs,
        with_dup_corpus)
    from ch_pdf_parse_spark.session import get_spark

    spark = get_spark("bench-fused-scale", cores=32, shuffle_partitions=128)
    sf_dir = scaled_corpus_dir(spark, k)
    corpus = with_dup_corpus(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")))

    def run_unfused() -> tuple[float, int]:
        sh = (shingles(corpus)
              .withColumn("h", portable_hash(F.col("shingle"))).persist())
        t0 = time.time()
        pairs = (lsh_candidate_pairs(minhash_signatures(sh))
                 .unionByName(simhash_pairs(simhash(sh))
                              .select("doc_a", "doc_b"))
                 .unionByName(ngram_jaccard_pairs(sh)
                              .select("doc_a", "doc_b")))
        n = pairs.count()
        wall = time.time() - t0
        sh.unpersist()
        return round(wall, 2), n

    def run_fused() -> tuple[float, int]:
        # r7: candidate_pairs_union now takes the int64 shingle-hash table
        # plus the Python-kernel minhash signatures (feed split)
        from ch_pdf_parse_spark.operators.dedup import (
            minhash_from_text, shingle_hashes)

        shd = shingle_hashes(corpus).persist()
        t0 = time.time()
        n = candidate_pairs_union(shd, minhash_from_text(corpus)).count()
        wall = time.time() - t0
        shd.unpersist()
        return round(wall, 2), n

    res = {"k": k, "unfused": [], "fused": []}
    n_ref = None
    for r in range(rounds):
        order = [("unfused", run_unfused), ("fused", run_fused)]
        if r % 2 == 1:
            order.reverse()
        for tag, fn in order:
            wall, n = fn()
            if n_ref is None:
                n_ref = n
            assert n == n_ref, (tag, n, n_ref)
            res[tag].append(wall)
            print(f"round {r} {tag:8s}: {wall}s  pairs={n}", flush=True)
    res["n_pairs"] = n_ref
    res["min_unfused"] = min(res["unfused"])
    res["min_fused"] = min(res["fused"])
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
