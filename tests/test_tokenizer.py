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


def _sequential_encode(word, merges_by_rank):
    """Independent reference: apply trained merges strictly in rank order,
    each merging ALL its adjacent occurrences left-to-right — the textbook
    'apply merges sequentially' formulation, distinct from the operator's
    lowest-rank-first fixpoint."""
    sym = list(word) + ["</w>"]
    for _, a, b, _c in merges_by_rank:
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i:i + 2] = [a + b]
            else:
                i += 1
    return sym


def test_bpe_encode_matches_sequential_reference(spark, tmp_path):
    """bpe_encode (distributed apply) vs the sequential formulation on the
    corpus the merges were trained on: token streams identical per doc,
    every doc round-trips (concatenating its tokens and splitting on the
    </w> marker reproduces the words)."""
    from ch_pdf_parse_spark.operators.tokenizer import (
        bpe_encode, bpe_merges, word_histogram)

    tmp = str(tmp_path)
    _write_docs(spark, tmp)
    docs = spark.read.parquet(os.path.join(tmp, "documents.parquet"))
    merges = bpe_merges(word_histogram(docs))
    got = {r.doc_id: list(r.bpe_tokens)
           for r in bpe_encode(docs, [(m[0], m[1], m[2], m[3])
                                      for m in merges]).collect()}
    for row in docs.collect():
        want = []
        for w in (row.text or "").split(" "):
            if w:
                want.extend(_sequential_encode(w, merges))
        assert got[row.doc_id] == want, row.doc_id
        # round-trip: tokens spell the original words exactly
        joined = "".join(want)
        assert joined == "".join(
            w + "</w>" for w in (row.text or "").split(" ") if w)


def test_bpe_encode_zero_shuffle_plan(spark, tmp_path):
    """The encode chains onto the scan: zero Exchange nodes (merges ship in
    the closure, no join) and the output carries ArrowEvalPython, i.e. the
    Python is Arrow-batched, not row-at-a-time."""
    from ch_pdf_parse_spark.operators.tokenizer import (
        bpe_encode, bpe_merges, word_histogram)

    tmp = str(tmp_path)
    _write_docs(spark, tmp)
    docs = spark.read.parquet(os.path.join(tmp, "documents.parquet"))
    merges = bpe_merges(word_histogram(docs))
    plan = bpe_encode(docs, [tuple(m) for m in merges])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan
