"""Independent pure-Python verification of the quality_metrics operator: the
confusion matrix, P/R/F1 identities, and the exact-span citation counts are
recomputed from the raw parquet with plain ``re``/dict arithmetic (sklearn /
seqeval definitions) and compared cell-for-cell with the Spark result. The
DuckDB oracle (tools/check_queries.py) covers cross-engine equality; this
covers "the metrics mean what they claim"."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _gold(text: str | None, n_chars: int | None) -> str:
    if text is not None and text.startswith("key "):
        return "keyword"
    if text is not None and "spark" in text:
        return "spark"
    if n_chars is not None and n_chars < 120:
        return "short"
    if n_chars is not None and n_chars > 320:
        return "long"
    return "text"


def _pred(doc_id: int, gold: str) -> str:
    if doc_id % 11 == 0:
        return "text"
    if doc_id % 17 == 0:
        return "short"
    return gold


def _body(doc_id: int, text: str | None) -> str:
    b = (text or "") + f" 引文[{doc_id % 9 + 1}]"
    if doc_id % 4 == 0:
        b += " [2,3] [2,3]"
    if doc_id % 7 == 0:
        b += " [10-12] not[a]"
    return b


@pytest.fixture(scope="module")
def result(spark):
    from ch_pdf_parse_spark.operators.quality_metrics import quality_metrics

    rows = quality_metrics(spark, SF_DIR).collect()
    return {(r["task"], r["label"]): r for r in rows}


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    return list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist(),
                    t.column("n_chars").to_pylist()))


def test_segment_confusion_matrix(result, docs):
    pairs = [(_gold(t, n), _pred(d, _gold(t, n))) for d, t, n in docs]
    labels = {g for g, _ in pairs} | {p for _, p in pairs}
    for lab in labels:
        r = result[("segment_kind", lab)]
        tp = sum(1 for g, p in pairs if g == lab and p == lab)
        fp = sum(1 for g, p in pairs if p == lab and g != lab)
        fn = sum(1 for g, p in pairs if g == lab and p != lab)
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn), lab
        assert r["support"] == sum(1 for g, _ in pairs if g == lab)
        if tp + fp:
            assert r["precision"] == pytest.approx(tp / (tp + fp), abs=5e-5)
        if tp + fn:
            assert r["recall"] == pytest.approx(tp / (tp + fn), abs=5e-5)
    # the perturbation must generate real errors (or the metrics verify
    # nothing): some label with fp > 0 and some with fn > 0
    assert any(result[("segment_kind", lab)]["fp"] > 0 for lab in labels)
    assert any(result[("segment_kind", lab)]["fn"] > 0 for lab in labels)


def test_micro_row_is_accuracy(result, docs):
    r = result[("segment_kind", "__micro__")]
    correct = sum(1 for d, t, n in docs
                  if _pred(d, _gold(t, n)) == _gold(t, n))
    acc = correct / len(docs)
    assert r["tp"] == correct and r["support"] == len(docs)
    assert r["fp"] == r["fn"] == len(docs) - correct
    assert r["precision"] == r["recall"] == r["f1"]
    assert r["precision"] == pytest.approx(acc, abs=5e-5)
    assert 0 < acc < 1  # perturbed, but not degenerate


def test_citation_span_prf(result, docs):
    gold_re = re.compile(r"\[[0-9][0-9,\- \t\n\f\r]*\]")
    pred_re = re.compile(r"\[[0-9][0-9, \t\n\f\r]*\]")
    tp = fp = fn = support = 0
    for d, t, _n in docs:
        body = _body(d, t)
        g = Counter(gold_re.findall(body))
        p = Counter(pred_re.findall(body))
        if d % 19 == 0:
            p["[99]"] += 1
        inter = sum((g & p).values())
        tp += inter
        fp += sum(p.values()) - inter
        fn += sum(g.values()) - inter
        support += sum(g.values())
    r = result[("citation_span", "CIT")]
    assert (r["tp"], r["fp"], r["fn"], r["support"]) == (tp, fp, fn, support)
    # range citations [10-12] are designed misses; [99] designed hallucinations
    assert fn > 0 and fp > 0 and tp > 0
    assert r["f1"] == pytest.approx(2 * tp / (2 * tp + fp + fn), abs=5e-5)
