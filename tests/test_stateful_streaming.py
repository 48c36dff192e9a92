"""Stateful streaming assembly: pages arrive across separate triggered runs;
each document's extraction is emitted exactly once, when complete, and
matches the batch pipeline's markdown bit-for-bit."""

import os

from pyspark.sql import functions as F

from ch_pdf_parse_spark.pipeline import extract_documents
from ch_pdf_parse_spark.streaming.stateful import (
    PAGE_ROW_SCHEMA,
    assemble_documents,
    pages_of,
)


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(PAGE_ROW_SCHEMA).parquet(src)
    (
        assemble_documents(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def test_pages_assemble_across_runs(spark, corpus_dir, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "assembled")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    pages = pages_of(docs).cache()

    # drop 1: even pages only — multi-page docs stay incomplete in state
    pages.where(F.col("page") % 2 == 0).write.mode("overwrite") \
        .parquet(os.path.join(src, "drop1"))
    _drain(spark, src + "/*", out, ckpt)
    got1 = spark.read.parquet(out)
    single_page = pages.groupBy("doc_id").count().where("count = 1")
    complete1 = pages.where(F.col("page") % 2 == 0) \
        .join(single_page, "doc_id").select("doc_id").distinct().count()
    assert got1.count() == complete1  # only fully-arrived docs emitted

    # drop 2: the odd pages — every doc completes, none emitted twice
    pages.where(F.col("page") % 2 == 1).write.mode("overwrite") \
        .parquet(os.path.join(src, "drop2"))
    _drain(spark, src + "/*", out, ckpt)
    got = {(r["doc_id"], r["markdown"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["doc_id"], r["markdown"])
            for r in extract_documents(docs).select("doc_id", "markdown").collect()}
    assert got == want

    # rerun with nothing new: a no-op
    _drain(spark, src + "/*", out, ckpt)
    assert spark.read.parquet(out).count() == docs.count()
