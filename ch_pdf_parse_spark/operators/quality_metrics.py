"""Classification-quality metrics: per-kind accuracy/precision/recall/F1 for
the segment-type classifier and exact-span P/R/F for citation extraction —
the engine-side mirror of the reference's eval intent, which imports
sklearn accuracy/F1/precision/recall and a seqeval IOB2 classification
report (/root/reference/train/train_main.py:34-37; its ``eval_model`` module
is absent upstream, so the metric DEFINITIONS here are the public sklearn /
seqeval ones, not a port).

A real user validates the M1/M4 surrogates against labeled data with exactly
this query: golden labels vs a (deterministically perturbed) classifier →
confusion-matrix aggregation. Everything is plain SQL semantics, so the
DuckDB oracle hash-checks every cell.

Scale: two map-side-combined groupBys over label-cardinality keys (≤ 5
labels) plus one (doc_id, citation)-keyed outer join — at 10^12 documents the
shuffled payload is counts, never text; the label-keyed aggregates collapse
map-side to ≤ |labels| rows per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import constants as C
from ..registry import q_sql, quantize, register, _t

# gold segment-kind ladder — exactly m_when_ladder's (gate-green) expression
_GOLD_DUCK = """CASE WHEN text LIKE 'key %' THEN 'keyword'
                WHEN text LIKE '%spark%' THEN 'spark'
                WHEN n_chars < 120 THEN 'short'
                WHEN n_chars > 320 THEN 'long'
                ELSE 'text' END"""

# deterministic "model under eval": agrees with gold except two error modes
_PRED_DUCK = """CASE WHEN doc_id % 11 = 0 THEN 'text'
                WHEN doc_id % 17 = 0 THEN 'short'
                ELSE gold END"""

# the citation body injection — exactly m4_citations' (gate-green) expression
_BODY_DUCK = """coalesce(text, '') || ' 引文[' || (doc_id % 9 + 1) || ']' ||
             CASE WHEN doc_id % 4 = 0 THEN ' [2,3] [2,3]' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0 THEN ' [10-12] not[a]' ELSE '' END"""

# the "model under eval" extractor: same alphabet minus '-', so it misses
# range citations like [10-12] (false negatives); hallucinated [99] spans are
# injected for doc_id % 19 = 0 (false positives)
PRED_CITATION_REGEX = "\\[[0-9][0-9, \\t\\n\\f\\r]*\\]"


def _prf_sql(inner: str) -> str:
    return f"""
    SELECT task, label, tp, fp, fn, support,
           {q_sql('tp * 1.0 / NULLIF(tp + fp, 0)')} AS precision,
           {q_sql('tp * 1.0 / NULLIF(tp + fn, 0)')} AS recall,
           {q_sql('2.0 * tp / NULLIF(2 * tp + fp + fn, 0)')} AS f1
    FROM ({inner})
    """


_QUALITY_SQL = _prf_sql(f"""
    WITH tp0 AS (
      SELECT doc_id, gold,
             {_PRED_DUCK} AS pred
      FROM (SELECT doc_id, text, n_chars, {_GOLD_DUCK} AS gold FROM documents)),
    g AS (SELECT gold AS label, count(*) AS support,
                 CAST(sum(CASE WHEN pred = gold THEN 1 ELSE 0 END) AS BIGINT) AS tp
          FROM tp0 GROUP BY gold),
    p AS (SELECT pred AS label, count(*) AS n_pred FROM tp0 GROUP BY pred),
    seg AS (
      SELECT 'segment_kind' AS task, label,
             COALESCE(tp, 0) AS tp,
             COALESCE(n_pred, 0) - COALESCE(tp, 0) AS fp,
             COALESCE(support, 0) - COALESCE(tp, 0) AS fn,
             COALESCE(support, 0) AS support
      FROM g FULL JOIN p USING (label)),
    micro AS (
      SELECT 'segment_kind' AS task, '__micro__' AS label,
             CAST(COALESCE(sum(CASE WHEN pred = gold THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
             CAST(COALESCE(sum(CASE WHEN pred = gold THEN 0 ELSE 1 END), 0) AS BIGINT) AS fp,
             CAST(COALESCE(sum(CASE WHEN pred = gold THEN 0 ELSE 1 END), 0) AS BIGINT) AS fn,
             count(*) AS support
      FROM tp0),
    cited AS (SELECT doc_id, {_BODY_DUCK} AS body FROM documents),
    gold_c AS (SELECT doc_id, citation, count(*) AS n_gold FROM (
        SELECT doc_id, unnest(regexp_extract_all(body, '{C.CITATION_REGEX}')) AS citation
        FROM cited)
      GROUP BY doc_id, citation),
    pred_c AS (SELECT doc_id, citation, count(*) AS n_pred FROM (
        SELECT doc_id, unnest(regexp_extract_all(body, '{PRED_CITATION_REGEX}')) AS citation
        FROM cited
        UNION ALL
        SELECT doc_id, '[99]' AS citation FROM documents WHERE doc_id % 19 = 0)
      GROUP BY doc_id, citation),
    cit AS (
      SELECT 'citation_span' AS task, 'CIT' AS label,
             CAST(COALESCE(sum(least(COALESCE(n_gold, 0), COALESCE(n_pred, 0))), 0) AS BIGINT) AS tp,
             CAST(COALESCE(sum(COALESCE(n_pred, 0) - least(COALESCE(n_gold, 0), COALESCE(n_pred, 0))), 0) AS BIGINT) AS fp,
             CAST(COALESCE(sum(COALESCE(n_gold, 0) - least(COALESCE(n_gold, 0), COALESCE(n_pred, 0))), 0) AS BIGINT) AS fn,
             CAST(COALESCE(sum(COALESCE(n_gold, 0)), 0) AS BIGINT) AS support
      FROM gold_c FULL JOIN pred_c USING (doc_id, citation))
    SELECT * FROM seg UNION ALL SELECT * FROM micro UNION ALL SELECT * FROM cit
""")


def _gold_expr():
    return (F.when(F.col("text").like("key %"), "keyword")
            .when(F.col("text").like("%spark%"), "spark")
            .when(F.col("n_chars") < 120, "short")
            .when(F.col("n_chars") > 320, "long")
            .otherwise("text"))


def _body_expr():
    return F.concat(
        F.coalesce(F.col("text"), F.lit("")), F.lit(" 引文["),
        (F.col("doc_id") % 9 + 1).cast("string"), F.lit("]"),
        F.when(F.col("doc_id") % 4 == 0, " [2,3] [2,3]").otherwise(""),
        F.when(F.col("doc_id") % 7 == 0, " [10-12] not[a]").otherwise(""),
    )


def _with_prf(df: DataFrame) -> DataFrame:
    two_tp = F.col("tp") * 2 + F.col("fp") + F.col("fn")
    return df.select(
        "task", "label", "tp", "fp", "fn", "support",
        quantize(F.try_divide(F.col("tp") * 1.0, F.col("tp") + F.col("fp")), 4)
        .alias("precision"),
        quantize(F.try_divide(F.col("tp") * 1.0, F.col("tp") + F.col("fn")), 4)
        .alias("recall"),
        quantize(F.try_divide(F.col("tp") * 2.0, two_tp), 4).alias("f1"),
    )


@register("quality_metrics", _QUALITY_SQL)
def quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format eval report: one row per segment kind (tp/fp/fn/support +
    P/R/F1), a '__micro__' accuracy row (precision = recall = f1 = accuracy
    by construction), and one exact-span row for citation extraction (the
    span-level analog of a seqeval IOB2 report: tp = multiset intersection
    of predicted and gold spans per document)."""
    d = _t(spark, sf_dir, "documents")
    tp0 = d.select(
        "doc_id", _gold_expr().alias("gold"),
    ).select(
        "doc_id", "gold",
        F.when(F.col("doc_id") % 11 == 0, "text")
        .when(F.col("doc_id") % 17 == 0, "short")
        .otherwise(F.col("gold")).alias("pred"),
    )
    hit = F.when(F.col("pred") == F.col("gold"), 1).otherwise(0)
    g = tp0.groupBy(F.col("gold").alias("label")).agg(
        F.count("*").alias("support"), F.sum(hit).alias("tp"))
    p = tp0.groupBy(F.col("pred").alias("label")).agg(
        F.count("*").alias("n_pred"))
    seg = g.join(p, "label", "full").select(
        F.lit("segment_kind").alias("task"), "label",
        F.coalesce("tp", F.lit(0)).alias("tp"),
        (F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp", F.lit(0))).alias("fp"),
        (F.coalesce("support", F.lit(0)) - F.coalesce("tp", F.lit(0))).alias("fn"),
        F.coalesce("support", F.lit(0)).alias("support"),
    )
    micro = tp0.agg(
        F.coalesce(F.sum(hit), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(1 - hit), F.lit(0)).alias("fp"),
        F.coalesce(F.sum(1 - hit), F.lit(0)).alias("fn"),
        F.count("*").alias("support"),
    ).select(F.lit("segment_kind").alias("task"),
             F.lit("__micro__").alias("label"), "tp", "fp", "fn", "support")

    cited = d.select("doc_id", _body_expr().alias("body"))
    gold_c = (
        cited.select("doc_id", F.explode(
            F.regexp_extract_all("body", F.lit(C.CITATION_REGEX), F.lit(0))
        ).alias("citation"))
        .groupBy("doc_id", "citation").agg(F.count("*").alias("n_gold")))
    pred_c = (
        cited.select("doc_id", F.explode(
            # DataFrame fn, never F.expr: SQL literal parsing mangles \[ \-
            F.regexp_extract_all("body", F.lit(PRED_CITATION_REGEX), F.lit(0))
        ).alias("citation"))
        .unionByName(d.where(F.col("doc_id") % 19 == 0)
                     .select("doc_id", F.lit("[99]").alias("citation")))
        .groupBy("doc_id", "citation").agg(F.count("*").alias("n_pred")))
    ng = F.coalesce("n_gold", F.lit(0))
    np_ = F.coalesce("n_pred", F.lit(0))
    m = F.least(ng, np_)
    cit = (
        gold_c.join(pred_c, ["doc_id", "citation"], "full")
        .agg(F.coalesce(F.sum(m), F.lit(0)).alias("tp"),
             F.coalesce(F.sum(np_ - m), F.lit(0)).alias("fp"),
             F.coalesce(F.sum(ng - m), F.lit(0)).alias("fn"),
             F.coalesce(F.sum(ng), F.lit(0)).alias("support"))
        .select(F.lit("citation_span").alias("task"), F.lit("CIT").alias("label"),
                "tp", "fp", "fn", "support"))
    return _with_prf(seg.unionByName(micro).unionByName(cit))
