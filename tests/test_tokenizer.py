"""BPE tokenizer training: hand-computed merges, cap determinism, and the
histogram's scale-shape plan (TakeOrderedAndProject top-V, map-side partial
count — never a full global sort)."""

import os
import re

from ch_pdf_parse_spark.operators.tokenizer import (
    bpe_merges, tokenizer_bpe_train, word_histogram, word_histogram_df)

# the classic BPE textbook corpus (Sennrich et al. 2016 example shape)
_CORPUS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_bpe_merges_hand_computed():
    merges = bpe_merges(sorted(_CORPUS.items()), k=4)
    # e-s, s-t, t-</w> all have count 9 (newest 6 + widest 3): tie broken
    # lexicographically, then the merged symbol cascades
    assert merges == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "est", "</w>", 9),
        (3, "l", "o", 7),
    ]


def test_bpe_empty_histogram():
    assert bpe_merges([], k=5) == []


def _write_docs(spark, tmp):
    text = " ".join(w for w, n in sorted(_CORPUS.items()) for w in [w] * n)
    rows = [("d1", text), ("d2", None), ("d3", "")]
    (spark.createDataFrame(rows, "doc_id string, text string")
     .write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet")))


def test_operator_end_to_end_with_nulls(spark, tmp_path):
    tmp = str(tmp_path)
    _write_docs(spark, tmp)
    got = [(r.merge_rank, r.lhs, r.rhs, r.pair_count)
           for r in tokenizer_bpe_train(spark, tmp)
           .orderBy("merge_rank").limit(4).collect()]
    assert got == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "est", "</w>", 9),
        (3, "l", "o", 7),
    ]


def test_histogram_cap_is_deterministic(spark, tmp_path):
    tmp = str(tmp_path)
    _write_docs(spark, tmp)
    docs = spark.read.parquet(os.path.join(tmp, "documents.parquet"))
    # top-2 by (count DESC, word ASC): newest 6, low 5
    assert word_histogram(docs.select("text"), top=2) == [
        ("newest", 6), ("low", 5)]


def test_histogram_plan_is_topk_not_global_sort(spark):
    """The cap must plan as TakeOrderedAndProject (per-partition partial
    top-V, no full global sort of the word space) with partial_count before
    the exchange — the property that keeps the driver collect bounded and
    the shuffle narrow at 100 TB."""
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("text"))
    capped = word_histogram_df(docs, top=100)
    jvm = spark._jvm
    plan = capped._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan, plan
    assert not re.search(r"\(\d+\) Sort\b", plan), plan
