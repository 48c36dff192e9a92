"""Cross-document exact-substring deduplication (Lee et al. style).

The canonical training-data dedup mode the whole/near-document detectors
(minhash, simhash, n-gram Jaccard, embedding cosine) cannot catch: a
verbatim >= k-token span — boilerplate navigation, license paragraphs,
syndicated ledes — recurring across otherwise-unique documents. Lee et
al., "Deduplicating Training Data Makes Language Models Better" (2022),
find such spans with a corpus-wide suffix array; the Spark-native analog
here is the repo's positional shingle machinery: the sorted k-token
shingle-hash stream IS a distributed suffix ordering at k-gram
granularity, so "span recurs verbatim corpus-wide" reduces to "every
k-gram inside it has corpus frequency >= 2 across >= 2 docs", and maximal
duplicated spans fall out of a per-document gaps-and-islands merge over
the flagged anchors.

Reference parity: the reference has no corpus-level dedup at all (it is a
per-document serving app — predict/pdf2markdown.py processes one PDF per
request); this operator is part of the beyond-reference training-data
surface SURVEY.md §2.12 commits to.

Scale shape (the whole point):

* anchors are (doc_id, off, h) int64 triples — the shingle STRING is
  hashed map-side (`portable_hash`) and never shuffles;
* corpus-frequency filtering is one hash exchange on h with map-side
  partial aggregation — no self-join, no pair explosion (unlike the
  similarity detectors, nothing here is quadratic in duplicate count:
  a boilerplate string present in EVERY document costs one hot agg group
  and a linear-size flagged-anchor set, which AQE splits fine);
* the flag join is a broadcast-or-shuffle semi-join of anchors against
  the (much smaller) duplicated-hash set, output <= input;
* span assembly is one window + one agg per doc_id — offsets only.

Total: two shuffles of int64 triples + one of the dup-hash set. At
10^12 docs every stage is partial-agg-friendly and text-free.

k = 8 word tokens: small enough to catch a one-sentence boilerplate in
the sandbox's short synthetic docs, large enough that natural 8-gram
collisions are rare; production would raise it (Lee et al. use 50 BPE
tokens) — a single constant, semantics unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import register, _t
from .dedup import portable_hash, _sql_hash

SUBSTR_K = 8  # tokens per anchor shingle == minimum duplicated-span length

# deliberately disjoint from the synthetic corpus vocabulary so the planted
# spans are exactly the cross-document duplicates at sf scale
BOILERPLATE = ("all rights reserved subscribe to our newsletter "
               "for weekly updates terms and conditions apply")


def positional_shingles(corpus: DataFrame, k: int = SUBSTR_K) -> DataFrame:
    """(doc_id, off, h): every k-token window of each doc, 1-based token
    offset, shingle hashed to int64 map-side. Unlike ``dedup.shingles``
    this keeps POSITIONS and does not per-doc-distinct — a span repeated
    inside one doc yields multiple anchors, as the frequency count needs."""
    toks = corpus.select("doc_id", F.split("text", " ").alias("l"))
    grams = ", ".join(f"element_at(l, i + {j})" for j in range(k))
    sh = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"if(size(l) >= {k}, transform(sequence(1, size(l) - {k - 1}), "
                f"i -> concat_ws(' ', {grams})), array())"
            )
        ).alias("pos", "shingle"),
    )
    return sh.select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("off"),
        portable_hash(F.col("shingle")).alias("h"),
    )


def duplicate_spans(corpus: DataFrame, k: int = SUBSTR_K,
                    min_docs: int = 2) -> DataFrame:
    """Maximal verbatim spans of >= k tokens occurring in >= ``min_docs``
    distinct documents: (doc_id, span_start, span_end, n_tokens), token
    offsets 1-based inclusive. Excising them (or dropping the docs) is the
    caller's policy, as in Lee et al."""
    occ = positional_shingles(corpus, k)
    dup_h = (
        occ.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("h")
    )
    hits = occ.join(dup_h, "h").select("doc_id", "off")
    # gaps-and-islands: anchors at consecutive offsets belong to one
    # maximal duplicated span (off unique per doc — one anchor per window)
    isl = hits.withColumn(
        "grp", F.col("off") - F.row_number().over(
            Window.partitionBy("doc_id").orderBy("off")))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(F.min("off").alias("span_start"),
             (F.max("off") + (k - 1)).alias("span_end"))
        .select("doc_id", "span_start", "span_end",
                (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"))
    )


def scrub_spans(corpus: DataFrame, spans: DataFrame) -> DataFrame:
    """Excise flagged duplicated spans from document text — the second half
    of the Lee et al. loop (duplicate_spans finds, this removes): every
    token whose 1-based position falls inside any of the doc's
    (span_start, span_end) ranges is dropped and the remainder re-joined
    with single spaces. Docs with no flagged span pass through unchanged.

    Keep-one-copy policies are the caller's: pre-filter ``spans`` (e.g.
    anti-join the per-duplicate keeper docs) before passing it here —
    this function removes exactly what it is given.

    Scale shape: spans collapse to one array per doc_id (tiny — bounded by
    flagged docs, not corpus), the join against the corpus broadcasts that
    side under AQE so document text never shuffles, and the excision is a
    per-row higher-order filter (no Python). Note scrubbing can in
    principle splice previously-separated tokens into NEW cross-document
    k-grams; Lee et al. iterate to a fixpoint — so can callers, re-running
    duplicate_spans on this function's output."""
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"))
    joined = corpus.join(per_doc, "doc_id", "left")
    kept = F.filter(
        F.split("text", " "),
        lambda t, i: ~F.exists(
            "_spans",
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"])),
    )
    scrubbed = (F.when(F.col("_spans").isNull(), F.col("text"))
                .otherwise(F.array_join(kept, " ")).alias("text"))
    # preserve the caller's column ORDER (not just the set): callers writing
    # back over the original table rely on positional schema
    return joined.select(
        *[scrubbed if c == "text" else c for c in corpus.columns])


def _boiler_corpus(docs: DataFrame) -> DataFrame:
    """documents with the boilerplate paragraph appended to every 11th doc —
    planted cross-document duplicated spans the driver query must recover.
    SQL twin: ``_BOILER_SQL``."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(F.col("text"), F.lit(" " + BOILERPLATE)))
        .otherwise(F.col("text")).alias("text"),
    )


_BOILER_SQL = f"""
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' {BOILERPLATE}'
              ELSE text END AS text
  FROM documents
"""


def _substring_sql(k: int = SUBSTR_K, min_docs: int = 2) -> str:
    # DuckDB zipped-unnest: parallel unnest of two equal-length lists pairs
    # elements positionally, giving (shingle, off) without a lateral join
    return f"""
    WITH corpus AS ({_BOILER_SQL}),
         toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM corpus),
         occ AS (
           SELECT doc_id,
                  CAST(unnest([i for i in range(1, greatest(len(l) - {k - 2}, 1))]) AS BIGINT) AS off,
                  {_sql_hash(f"unnest([array_to_string(l[i:i+{k - 1}], ' ') for i in range(1, greatest(len(l) - {k - 2}, 1))])")} AS h
           FROM toks),
         dup_h AS (SELECT h FROM occ GROUP BY h
                   HAVING count(DISTINCT doc_id) >= {min_docs}),
         hits AS (SELECT o.doc_id, o.off FROM occ o JOIN dup_h d ON o.h = d.h),
         isl AS (SELECT doc_id, off,
                        off - ROW_NUMBER() OVER (PARTITION BY doc_id
                                                 ORDER BY off) AS grp
                 FROM hits)
    SELECT doc_id, min(off) AS span_start,
           max(off) + {k - 1} AS span_end,
           max(off) + {k} - min(off) AS n_tokens
    FROM isl GROUP BY doc_id, grp
    """


@register("dedup_substring", None)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: recover the planted boilerplate spans (plus any natural
    verbatim 8-gram repeats) from the documents table. The corpus feed is
    spread across cores first (registry.spread_scan): the sf tables are one
    unsplittable row group, which serialized the k-gram explode + md5
    anchor pass; no-op on any splittable source."""
    from ..registry import spread_scan

    docs = spread_scan(_t(spark, sf_dir, "documents")
                       .select("doc_id", "text"))
    return duplicate_spans(_boiler_corpus(docs))


from ..registry import SQL  # noqa: E402

SQL["dedup_substring"] = _substring_sql()
