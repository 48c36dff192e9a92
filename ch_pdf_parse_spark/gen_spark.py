"""Spark-parallel fixture-corpus generation (for bench-scale corpora).

The pure-Python generator (fixtures.py) is fine for test-sized corpora but
single-threaded; bench corpora (10^4-10^5 docs) are generated distributed:
``spark.range(n_docs)`` → ``mapInPandas`` building each document with the
same seeded per-index generator — content is a pure function of (index,
seed), independent of partitioning. This mirrors how the 10^12-doc corpus
would be materialized on a cluster in the first place.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import SparkSession, types as T

from . import fixtures
from .pipeline import SPAN_STRUCT

GEN_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    T.StructField("n_spans", T.IntegerType()),
])


def _gen_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for idx in pdf["id"]:
            oversized = idx > 0 and idx % 500 == 0
            b = fixtures.generate_document(int(idx), 42, oversized=oversized)
            spans = [{"kind": k, "text": t, "media_ref": m, "offset": o}
                     for k, t, m, o in b.spans]
            rows.append({"doc_id": b.doc_id, "spans": spans, "n_spans": len(spans)})
        yield pd.DataFrame(rows)


def write_corpus_spark(spark: SparkSession, n_docs: int, out_dir: str,
                       n_files: int = 128) -> None:
    from .packaging import ensure_on_executors

    ensure_on_executors(spark)
    (
        # RANGE-partitioned and sorted by id (round 7, guide §6 "sort order
        # on write"): each part-file then holds one contiguous doc_id range,
        # so parquet min/max statistics prune doc_id-bounded readers (the
        # relational twin's 2k-doc slice read all 128 files under the old
        # round-robin layout — every file spanned the whole id range). Same
        # rows, same schema: content is a pure function of (index, seed),
        # independent of partitioning.
        spark.range(n_docs).repartitionByRange(n_files, "id")
        .sortWithinPartitions("id")
        .mapInPandas(_gen_batches, GEN_SCHEMA)
        .write.mode("overwrite").parquet(out_dir)
    )
