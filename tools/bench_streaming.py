"""Bench the stateful page→document assembler (streaming/stateful.py).

Correctness of cross-batch assembly is pytest-pinned; this measures THROUGHPUT
and STATE GROWTH (round-3 verdict item #5): a paged bench corpus is split
into interleaved arrival drops (each drop carries a slice of every document's
pages, so most documents stay incomplete across triggers — the worst case for
state size), then drained drop by drop with availableNow triggers. Per
trigger we record wall, pages ingested, documents emitted, and the state
store's own counters (numRowsTotal / numRowsUpdated / stateMemory from the
query's progress events — the store's truth, not an estimate).

Usage: python tools/bench_streaming.py [n_docs] [n_drops]   # default 40000 4
Prints one JSON line (same contract style as bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, bench_corpus_dir  # noqa: E402
from ch_pdf_parse_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    n_drops = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    corpus_path, n_docs = bench_corpus_dir(0.1, n_docs=n_docs)

    from pyspark.sql import functions as F

    from ch_pdf_parse_spark.streaming.stateful import (
        PAGE_ROW_SCHEMA, assemble_documents, pages_of)

    work = "/tmp/ch_pdf_parse_stream_bench"
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "arrivals")
    out = os.path.join(work, "assembled")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    spark = get_spark("bench-streaming", cores=CPUS, shuffle_partitions=CPUS)
    try:
        docs = spark.read.parquet(
            os.path.join(corpus_path, "documents.parquet"))
        pages = pages_of(docs)
        # interleave arrivals by page index, NOT by doc: every multi-page doc
        # spans drops, maximizing resident partial state between triggers
        staged = os.path.join(work, "staged")
        pages.withColumn("drop", F.col("page") % n_drops) \
            .write.partitionBy("drop").mode("overwrite").parquet(staged)

        n_pages = pages.count()
        triggers = []
        for d in range(n_drops):
            shutil.copytree(os.path.join(staged, f"drop={d}"),
                            os.path.join(src, f"drop{d}"))
            t0 = time.time()
            q = (
                assemble_documents(
                    spark.readStream.schema(PAGE_ROW_SCHEMA)
                    .parquet(src + "/*"))
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.time() - t0
            state = {}
            for p in reversed(q.recentProgress):
                ops = p.get("stateOperators") or []
                if ops:
                    state = {k: ops[0].get(k) for k in
                             ("numRowsTotal", "numRowsUpdated",
                              "memoryUsedBytes")}
                    state["stateSizeBytes"] = (ops[0].get("customMetrics") or
                                               {}).get(
                        "stateOnCurrentVersionSizeBytes")
                    break
            triggers.append({
                "trigger": d,
                "wall_sec": round(wall, 3),
                "docs_emitted_total": spark.read.parquet(out).count(),
                **state,
            })

        total_wall = sum(t["wall_sec"] for t in triggers)
        assert triggers[-1]["docs_emitted_total"] == n_docs, triggers
        print(json.dumps({
            "metric": "streaming_assembly_pages_per_sec",
            "value": round(n_pages / total_wall, 1),
            "unit": "pages/sec",
            "n_docs": n_docs,
            "n_pages": n_pages,
            "docs_per_sec": round(n_docs / total_wall, 1),
            "total_wall_sec": round(total_wall, 3),
            "triggers": triggers,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
