"""Spark pipeline vs golden oracle: span-sequence equality (kind, text,
media_ref, order) per document — the BASELINE.json invariant."""

import pytest

from ch_pdf_parse_spark import core, fixtures
from ch_pdf_parse_spark.pipeline import extract_documents


def _oracle_results(n_docs):
    out = {}
    for b in fixtures.generate_corpus(n_docs):
        recs, md = core.extract_document(b.spans)
        out[b.doc_id] = (recs, md)
    return out


def _collect(df):
    return {
        r["doc_id"]: (
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]],
            r["markdown"],
        )
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def oracle(corpus_dir):
    from tests.conftest import TEST_SF

    return _oracle_results(fixtures.n_docs_for_sf(TEST_SF))


def test_flagship_matches_oracle(docs_df, oracle):
    got = _collect(extract_documents(docs_df))
    assert set(got) == set(oracle)
    for doc_id, (recs, md) in oracle.items():
        assert got[doc_id][0] == recs, f"span mismatch in {doc_id}"
        assert got[doc_id][1] == md, f"markdown mismatch in {doc_id}"


def test_salted_path_matches_unsalted(docs_df, oracle):
    """Force every doc through the page-salted path; results must be identical
    (order keys survive the split — SURVEY.md §7.3 skew property test)."""
    got = _collect(extract_documents(docs_df, salt_threshold=0))
    for doc_id, (recs, md) in oracle.items():
        assert got[doc_id][0] == recs, f"salted span mismatch in {doc_id}"
        assert got[doc_id][1] == md, f"salted markdown mismatch in {doc_id}"


def test_salted_path_cross_page_caption_boundary(spark):
    """A page opening as the continuation of a page that ended in a caption
    (or equation) inherits that kind across the page boundary; the salted
    path must reproduce the oracle's fold exactly — including the faithful
    orphan-caption drop (a caption continuation on a media-less page is
    discarded, reference predict/pdf2markdown.py:64-150 surplus groups)."""
    from pyspark.sql import types as T

    from ch_pdf_parse_spark import core
    from ch_pdf_parse_spark.pipeline import SPAN_STRUCT, extract_documents

    P = core.pack_offset
    schema = T.StructType([T.StructField("doc_id", T.StringType()),
                           T.StructField("spans", T.ArrayType(SPAN_STRUCT))])
    rows = [
        # page 0 ends with a figure caption; page 1 opens as a continuation
        ("cap_boundary", [("text", "正文内容正文内容", "", P(0, 300, 62)),
                          ("unlabeled", "图1 题注", "", P(0, 620, 62)),
                          ("figure", "", "f1", P(0, 400, 100)),
                          ("text", "次页正文", "", P(1, 300, 62))]),
        # page 0 ends with an equation; page 1 opens as a continuation
        ("eq_boundary", [("equation", "x", "", P(0, 500, 62)),
                         ("text", "续行", "", P(1, 300, 62))]),
    ]
    df = spark.createDataFrame(rows, schema)
    # salt_threshold=1 forces the page-salted path for every doc
    got = {r["doc_id"]: ([tuple(s) for s in r["spans"]], r["markdown"])
           for r in extract_documents(df, salt_threshold=1).collect()}
    want = {d: (list(core.extract_document(s)[0]),
                core.extract_document(s)[1]) for d, s in rows}
    assert got == want


def test_column_projection_matches_full_output(spark, docs_df):
    """columns= pushdown must be a pure projection: spans-only and
    markdown-only outputs equal the full run's corresponding columns, on
    both the zero-shuffle branch and the salted path."""
    from ch_pdf_parse_spark.pipeline import extract_documents

    for thr in (None, 1):  # default routing and forced-salted
        kw = {} if thr is None else {"salt_threshold": thr}
        full = {r["doc_id"]: ([tuple(s) for s in r["spans"]], r["markdown"])
                for r in extract_documents(docs_df, **kw).collect()}
        sp = {r["doc_id"]: [tuple(s) for s in r["spans"]]
              for r in extract_documents(docs_df, columns=("spans",),
                                         **kw).collect()}
        md = {r["doc_id"]: r["markdown"]
              for r in extract_documents(docs_df, columns=("markdown",),
                                         **kw).collect()}
        assert sp == {d: s for d, (s, _) in full.items()}
        assert md == {d: m for d, (_, m) in full.items()}


def test_column_projection_rejects_bad_columns(docs_df):
    import pytest as _pytest

    from ch_pdf_parse_spark.pipeline import extract_documents

    for bad in ((), ("spans", "nope"), ("doc_id",)):
        with _pytest.raises(ValueError):
            extract_documents(docs_df, columns=bad)
