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
