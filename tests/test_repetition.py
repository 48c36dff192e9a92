"""Gopher repetition metrics: exact values on constructed documents."""

from pyspark.sql import functions as F

from ch_pdf_parse_spark.operators.text_analysis import (
    _REP_LINE_W,
    _bigrams_spark,
    _chunks_spark,
    _dup_frac_spark,
    _top_bigram_count_spark,
)


def _metrics(spark, text):
    df = spark.createDataFrame([(text,)], "text: string")
    l = "split(text, ' ')"
    row = df.select(
        F.expr(_dup_frac_spark(_chunks_spark(l, _REP_LINE_W)))
        .alias("dup_line_frac"),
        (F.expr(_top_bigram_count_spark(_bigrams_spark(l)))
         / F.greatest(F.expr(f"size({_bigrams_spark(l)})"), F.lit(1)))
        .alias("top_bigram_share"),
    ).collect()[0]
    return row.dup_line_frac, row.top_bigram_share


def test_fully_repetitive_doc(spark):
    # 16 identical words → two identical 8-token lines (dup 1/2); all 15
    # bigrams are 'x x' → share 1.0
    dup, share = _metrics(spark, " ".join(["x"] * 16))
    assert dup == 0.5
    assert share == 1.0


def test_all_distinct_doc(spark):
    dup, share = _metrics(spark, " ".join(f"w{i}" for i in range(16)))
    assert dup == 0.0
    assert share == 1.0 / 15  # every bigram unique


def test_short_and_empty_docs(spark):
    assert _metrics(spark, "one") == (0.0, 0.0)  # no bigrams → share 0
    assert _metrics(spark, "") == (0.0, 0.0)


def test_partial_repetition_exact_fraction(spark):
    # 3 lines: A A B → 1 duplicate of 3 chunks
    a = " ".join(["a"] * 8)
    b = " ".join(f"u{i}" for i in range(8))
    dup, _ = _metrics(spark, f"{a} {a} {b}")
    assert abs(dup - 1.0 / 3.0) < 1e-12
