"""Corpus-mixing operators: source rebalancing and sequence packing.

The two dataset-assembly steps between "filtered corpus" and "training
shards" that every pretraining pipeline runs:

* ``pipeline_source_mix`` — per-source sampling to a target share
  (downweight the over-represented crawl, keep the small curated sources
  whole). Selection is a deterministic salted-hash Bernoulli per document
  against an integer threshold derived from the source's count, so the
  sample is reproducible across runs/engines and independent of row order.
  Plan shape at 100 TB: one map-side count agg (tiny: one row per source),
  the per-source thresholds broadcast back onto the corpus, selection and
  the kept-count agg both map-side partial — the corpus text never shuffles.

* ``pipeline_pack_sequences`` — greedy sequential packing of documents into
  fixed token-budget training sequences (concat-and-chunk): documents are
  deterministically shuffled by salted hash into ``N_PACK_BUCKETS``
  independent buckets, and within a bucket a running token prefix-sum
  assigns ``pack_id = cum_before div BUDGET`` and ``offset_in_pack``.
  Packing is embarrassingly parallel per bucket (the window partitions by
  bucket), which is the whole scale story: 10^12 documents pack as 64-way —
  or 64k-way — independent streams, no global order anywhere. The window
  ORDER BY is a total order (hash, doc_id, n_tokens, text md5) so the
  prefix-sum is engine- and shuffle-layout-deterministic.

Cross-engine notes: thresholds are integers (``floor(10000*t/n)``) and the
cumsum/div/mod stay in exact int64 arithmetic end-to-end — no float path
anywhere. NULL doc_ids hash to NULL and fail the threshold comparison on
both engines (dropped from the mix); in packing they sort into the NULL
bucket deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import q_sql, quantize, register, _t
from .dedup import _sql_hash, portable_hash

MIX_SALT = "mix-v1"
MIX_TARGET_PER_SOURCE = 20  # docs to keep per source (uniform rebalance)

PACK_SALT = "pack-v1"
PACK_BUDGET = 8192  # tokens per training sequence
N_PACK_BUCKETS = 64


@register(
    "pipeline_source_mix",
    f"""
    WITH d AS (SELECT doc_id, coalesce(source, '') AS source FROM documents),
         c AS (SELECT source, count(*) AS n_in FROM d GROUP BY source),
         t AS (SELECT source, n_in,
                      least(CAST(floor(10000.0 * {MIX_TARGET_PER_SOURCE} / n_in)
                                 AS BIGINT), 10000) AS thr
               FROM c),
         k AS (SELECT d.source, count(*) AS n_kept
               FROM d JOIN t ON t.source = d.source
               WHERE {_sql_hash("CAST(doc_id AS VARCHAR)", MIX_SALT)} % 10000
                     < t.thr
               GROUP BY d.source)
    SELECT t.source, t.n_in,
           coalesce(k.n_kept, 0) AS n_kept,
           {q_sql("t.thr / 10000.0")} AS rate
    FROM t LEFT JOIN k ON k.source = t.source
    """,
)
def pipeline_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source rebalancing: keep ~MIX_TARGET_PER_SOURCE docs per source via a
    salted-hash Bernoulli with an integer threshold floor(10000·t/n) — small
    curated sources keep everything (thr=10000), the over-represented ones
    are sampled down, and membership is a pure function of doc_id."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("source", F.lit("")).alias("source"))
    counts = d.groupBy("source").agg(F.count("*").alias("n_in"))
    thr = counts.select(
        "source", "n_in",
        F.least(
            F.floor(10000.0 * MIX_TARGET_PER_SOURCE / F.col("n_in"))
            .cast("long"),
            F.lit(10000).cast("long")).alias("thr"),
    )
    kept = (
        d.join(F.broadcast(thr.select("source", "thr")), "source")
        .where(portable_hash(F.col("doc_id").cast("string"), MIX_SALT) % 10000
               < F.col("thr"))
        .groupBy("source").agg(F.count("*").alias("n_kept"))
    )
    return (
        thr.join(kept, "source", "left")
        .select(
            "source", "n_in",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            quantize(F.col("thr") / 10000.0, 4).alias("rate"),
        )
    )


@register(
    "pipeline_pack_sequences",
    f"""
    WITH d AS (
      SELECT doc_id,
             len(string_split(coalesce(text, ''), ' ')) AS n_tokens,
             md5(coalesce(text, '')) AS tmd5,
             {_sql_hash("CAST(doc_id AS VARCHAR)", PACK_SALT)} AS h
      FROM documents),
    b AS (SELECT doc_id, n_tokens, tmd5, h,
                 h % {N_PACK_BUCKETS} AS bucket FROM d),
    c AS (SELECT doc_id, bucket, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                        PARTITION BY bucket
                        ORDER BY h NULLS FIRST, doc_id NULLS FIRST,
                                 n_tokens NULLS FIRST, tmd5 NULLS FIRST
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS cum_before
          FROM b)
    SELECT doc_id, bucket, n_tokens,
           CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS offset_in_pack
    FROM c
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing into PACK_BUDGET-token training sequences,
    parallel per hash bucket (concat-and-chunk: a document may straddle two
    packs; offset_in_pack says where it starts). Exact int64 arithmetic
    end-to-end; the window's ORDER BY is a total order so the prefix-sum is
    deterministic under any shuffle layout."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.coalesce("text", F.lit("")), " ")).alias("n_tokens"),
        F.md5(F.coalesce("text", F.lit(""))).alias("tmd5"),
        portable_hash(F.col("doc_id").cast("string"), PACK_SALT).alias("h"),
    )
    b = d.withColumn("bucket", F.col("h") % N_PACK_BUCKETS)
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.asc_nulls_first("h"), F.asc_nulls_first("doc_id"),
                 F.asc_nulls_first("n_tokens"), F.asc_nulls_first("tmd5"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = b.select(
        "doc_id", "bucket", "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
        .alias("cum_before"),
    )
    return c.select(
        "doc_id", "bucket", "n_tokens",
        F.expr(f"cum_before div {PACK_BUDGET}").cast("long").alias("pack_id"),
        (F.col("cum_before") % PACK_BUDGET).cast("long")
        .alias("offset_in_pack"),
    )
