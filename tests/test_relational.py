"""Differential test: relational (pure-DataFrame) pipeline == golden oracle ==
grouped zero-shuffle pipeline, per document (spans AND markdown)."""

from ch_pdf_parse_spark import core, fixtures
from ch_pdf_parse_spark.relational import extract_documents_relational
from tests.conftest import TEST_SF
from tests.test_pipeline import _collect


def test_relational_matches_oracle(docs_df):
    got = _collect(extract_documents_relational(docs_df))
    for b in fixtures.generate_corpus(fixtures.n_docs_for_sf(TEST_SF)):
        recs, md = core.extract_document(b.spans)
        assert got[b.doc_id][0] == recs, f"relational span mismatch in {b.doc_id}"
        assert got[b.doc_id][1] == md, f"relational markdown mismatch in {b.doc_id}"


def test_relational_handles_empty_and_media_only(spark):
    from pyspark.sql import Row

    from ch_pdf_parse_spark.core import pack_offset
    from ch_pdf_parse_spark.pipeline import extract_documents

    docs = spark.createDataFrame(
        [
            Row(doc_id="m", spans=[
                Row(kind="text", text="正文行一二三四五", media_ref="",
                    offset=pack_offset(0, 100, 86)),
                Row(kind="figure", text="", media_ref="f.png",
                    offset=pack_offset(1, 300, 62)),
            ]),
            Row(doc_id="e", spans=[]),
        ]
    )
    rel = _collect(extract_documents_relational(docs))
    grp = _collect(extract_documents(docs))
    assert rel == grp
    assert rel["e"] == ([], "")
    assert rel["m"][0][-1] == ("figure_caption", "未找到题注", "f.png", 1)


def test_degenerate_inputs_agree_across_all_paths(spark):
    """Null spans array, empty array, all-null span fields, and unknown kinds
    must produce identical output from the grouped path, the relational
    path, and the golden oracle (null normalization: strings ≡ '',
    offset ≡ 0; unknown kinds take the body branch)."""
    from pyspark.sql import types as T

    from ch_pdf_parse_spark import core
    from ch_pdf_parse_spark.pipeline import SPAN_STRUCT, extract_documents
    from ch_pdf_parse_spark.relational import extract_documents_relational

    schema = T.StructType([T.StructField("doc_id", T.StringType()),
                           T.StructField("spans", T.ArrayType(SPAN_STRUCT))])
    rows = [("d1", None), ("d2", []),
            ("d3", [("text", "正文内容正文内容", "", 3000062)]),
            ("d4", [(None, None, None, None)]),
            ("d5", [("banana", "奇异种类", "", 5000100)])]
    df = spark.createDataFrame(rows, schema)

    def norm(fn):
        return {r["doc_id"]: ([tuple(s) for s in r["spans"]], r["markdown"])
                for r in fn(df).collect()}

    want = {d: (list(core.extract_document(spans or [])[0]),
                core.extract_document(spans or [])[1])
            for d, spans in rows}
    assert norm(extract_documents) == want
    assert norm(extract_documents_relational) == want
