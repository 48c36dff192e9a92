"""Attribution + A/B for dedup_clusters' detector stage (round-4 verdict #6).

Measures, on the driver documents corpus (default /root/testdata/sf0.1, the
same input BENCH_r{N}'s q_dedup_clusters uses):

1. per-detector cost from the shared persisted shingle table (attribution:
   which of the three detectors dominates the 3-detector union);
2. simhash OLD (recompute md5 per cached shingle) vs NEW (consume the
   persisted ``h`` column) — INTERLEAVED samples in one session, per the
   repo's measurement protocol (a single quiet-window A/B is not evidence on
   this box; BENCH/BASELINE.md honesty note);
3. the SIMHASH_CHUNKS knob: candidate volume + wall at n_chunks 4 (default,
   pigeonhole radius 3) vs 2 (30-bit chunks, radius 1) — REPORTED ONLY, the
   registered queries keep the default (output would change).

Prints one JSON line. Also asserts simhash(sh with h) ≡ simhash(sh plain).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import CPUS  # noqa: E402
from ch_pdf_parse_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.1", reps: int = 6) -> None:
    from ch_pdf_parse_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures, ngram_jaccard_pairs,
        portable_hash, shingles, simhash, simhash_pairs, with_dup_corpus)

    spark = get_spark("bench-detectors", cores=CPUS, shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    corpus = with_dup_corpus(docs)

    sh_plain = shingles(corpus).persist()
    n_shingles = sh_plain.count()
    sh_h = (shingles(corpus)
            .withColumn("h", portable_hash(F.col("shingle"))).persist())
    sh_h.count()

    # value-identity guard: the h column must change nothing
    a, b = simhash(sh_plain), simhash(sh_h)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), \
        "simhash(h column) diverged from recomputed simhash"

    def t(fn) -> float:
        t0 = time.time()
        fn()
        return round(time.time() - t0, 3)

    # 1. attribution: one timed pass per detector over the shared cache
    detectors = {
        "minhash_lsh": lambda: lsh_candidate_pairs(
            minhash_signatures(sh_h)).count(),
        "simhash": lambda: simhash_pairs(simhash(sh_h)).count(),
        "ngram_jaccard": lambda: ngram_jaccard_pairs(sh_h).count(),
    }
    attribution = {k: t(fn) for k, fn in detectors.items()}

    # 2. interleaved old-vs-new for the simhash md5 pass
    samples: dict[str, list[float]] = {"simhash_md5_recompute": [],
                                       "simhash_h_column": []}
    for _ in range(reps):
        samples["simhash_md5_recompute"].append(
            t(lambda: simhash_pairs(simhash(sh_plain)).count()))
        samples["simhash_h_column"].append(
            t(lambda: simhash_pairs(simhash(sh_h)).count()))

    # 3. chunk-count knob (reported only)
    knob = {}
    for n_chunks in (4, 2):
        sim = simhash(sh_h)
        t0 = time.time()
        n_pairs = simhash_pairs(sim, n_chunks=n_chunks).count()
        knob[f"chunks_{n_chunks}"] = {
            "wall_s": round(time.time() - t0, 3), "pairs": n_pairs}

    sh_plain.unpersist()
    sh_h.unpersist()
    spark.stop()
    print(json.dumps({
        "sf_dir": sf_dir, "n_shingle_rows": n_shingles,
        "detector_attribution_s": attribution,
        "interleaved_simhash_samples_s": samples,
        "min_old": min(samples["simhash_md5_recompute"]),
        "min_new": min(samples["simhash_h_column"]),
        "chunk_knob": knob,
    }))


if __name__ == "__main__":
    main(*sys.argv[1:2], **({"reps": int(sys.argv[2])} if len(sys.argv) > 2 else {}))
