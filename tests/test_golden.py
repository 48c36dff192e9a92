"""Golden-parquet oracle materialization (golden.py): determinism, cache
discipline, and agreement with the pure-Python oracle it wraps."""

import hashlib
import os

import duckdb
import pyarrow.parquet as pq
import pytest

from ch_pdf_parse_spark import core, golden

TEST_SF = 0.003


@pytest.fixture(scope="module")
def golden_dir(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("golden"))
    return golden.write_golden(TEST_SF, base=base)


def test_all_golden_tables_written(golden_dir):
    for name in (golden.SPANS, golden.MARKDOWN, golden.MEDIA_FEATURES,
                 golden.FRAME_SAMPLE):
        assert os.path.exists(os.path.join(golden_dir, name)), name
    with open(os.path.join(golden_dir, "_GOLDEN_SUCCESS")) as f:
        assert f.read() == golden.GOLDEN_VERSION


def test_golden_is_deterministic(golden_dir, tmp_path_factory):
    """Two independent materializations are byte-identical — the property the
    driver's hash check rests on."""
    other = golden.write_golden(TEST_SF, base=str(tmp_path_factory.mktemp("g2")))
    for name in (golden.SPANS, golden.MARKDOWN, golden.MEDIA_FEATURES,
                 golden.FRAME_SAMPLE):
        a = open(os.path.join(golden_dir, name), "rb").read()
        b = open(os.path.join(other, name), "rb").read()
        assert hashlib.md5(a).digest() == hashlib.md5(b).digest(), name


def test_golden_spans_match_core_oracle(golden_dir):
    docs = pq.read_table(os.path.join(golden_dir, "documents.parquet"),
                         columns=["doc_id", "spans"])
    want = {}
    for doc_id, spans in zip(docs.column("doc_id").to_pylist(),
                             docs.column("spans").to_pylist()):
        recs, md = core.extract_document(
            [(s["kind"], s["text"], s["media_ref"], s["offset"])
             for s in spans])
        want[doc_id] = (recs, hashlib.md5(md.encode()).hexdigest(), len(md))

    con = duckdb.connect()
    got_spans = con.execute(
        f"SELECT doc_id, kind, text, media_ref, ord FROM "
        f"read_parquet('{os.path.join(golden_dir, golden.SPANS)}') "
        f"ORDER BY doc_id, ord").fetchall()
    by_doc = {}
    for d, k, t, m, o in got_spans:
        by_doc.setdefault(d, []).append((k, t, m, o))
    assert by_doc == {d: recs for d, (recs, _, _) in want.items() if recs}

    got_md = con.execute(
        f"SELECT doc_id, md_hash, md_len FROM "
        f"read_parquet('{os.path.join(golden_dir, golden.MARKDOWN)}')").fetchall()
    assert {d: (h, n) for d, h, n in got_md} == \
        {d: (h, n) for d, (_, h, n) in want.items()}


def test_golden_sql_covers_all_rows_only_queries(golden_dir):
    sqls = golden.golden_sql(TEST_SF, base=os.path.dirname(golden_dir))
    assert set(sqls) == {"extract_spans", "extract_spans_relational",
                        "extract_markdown", "multimodal_features",
                        "multimodal_frame_sample", "multimodal_phash_dedup",
                        "multimodal_phash_neardup"}
    con = duckdb.connect()
    for name, sql in sqls.items():
        assert con.execute(sql).fetch_arrow_table().num_rows > 0, name


def test_version_bump_regenerates(golden_dir):
    marker = os.path.join(golden_dir, "_GOLDEN_SUCCESS")
    with open(marker, "w") as f:
        f.write("stale-version")
    spans_mtime = os.path.getmtime(os.path.join(golden_dir, golden.SPANS))
    golden.write_golden(TEST_SF, base=os.path.dirname(golden_dir))
    assert open(marker).read() == golden.GOLDEN_VERSION
    assert os.path.getmtime(os.path.join(golden_dir, golden.SPANS)) >= spans_mtime
