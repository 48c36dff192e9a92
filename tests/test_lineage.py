"""Kill/resume property test: a killed run resumes without recomputing
completed partitions and produces the identical output table (SURVEY.md §5)."""

import os

import pytest

from ch_pdf_parse_spark.sources import lineage as L
from tests.test_pipeline import _collect
from ch_pdf_parse_spark.pipeline import extract_documents


def test_resume_without_recompute(spark, docs_df, tmp_path):
    out = str(tmp_path / "out")

    with pytest.raises(RuntimeError, match="injected failure"):
        L.run_with_lineage(spark, docs_df, out, n_buckets=6, fail_after=3)

    done1 = {r["bucket"] for r in L.read_lineage(spark, out).collect()}
    assert len(done1) == 3
    mtimes = {b: os.path.getmtime(os.path.join(out, f"bucket={b}", "_SUCCESS"))
              for b in done1}

    computed = L.run_with_lineage(spark, docs_df, out, n_buckets=6)
    assert set(computed).isdisjoint(done1), "resume recomputed a completed bucket"

    for b in done1:  # completed partitions untouched on disk
        assert os.path.getmtime(os.path.join(out, f"bucket={b}", "_SUCCESS")) == mtimes[b]

    got = _collect(L.read_output(spark, out))
    want = _collect(extract_documents(docs_df))
    assert got == want

    lin = L.read_lineage(spark, out)
    rows = lin.collect()
    assert all(r["status"] == "done" for r in rows)
    assert sum(r["doc_count"] for r in rows) == docs_df.count()


def test_rerun_is_noop(spark, docs_df, tmp_path):
    out = str(tmp_path / "out2")
    L.run_with_lineage(spark, docs_df, out, n_buckets=4)
    assert L.run_with_lineage(spark, docs_df, out, n_buckets=4) == []


def test_mismatched_input_or_buckets_raises(spark, docs_df, tmp_path):
    """Resuming into an out_dir staged for a different input or bucketing
    must fail loudly, never silently extract against the stale snapshot."""
    out = str(tmp_path / "out_mismatch")
    L.run_with_lineage(spark, docs_df, out, n_buckets=4)

    with pytest.raises(ValueError, match="different input or"):
        L.run_with_lineage(spark, docs_df, out, n_buckets=8)

    other = docs_df.limit(3)
    other_path = str(tmp_path / "other_docs")
    other.write.parquet(other_path)
    other_df = spark.read.parquet(other_path)
    with pytest.raises(ValueError, match="different input or"):
        L.run_with_lineage(spark, other_df, out, n_buckets=4)


def test_parallel_buckets_match_serial(spark, docs_df, tmp_path):
    """Concurrent bucket submission produces the identical output table and
    a complete lineage manifest."""
    out_s = str(tmp_path / "out_serial")
    out_p = str(tmp_path / "out_parallel")
    L.run_with_lineage(spark, docs_df, out_s, n_buckets=6)
    L.run_with_lineage(spark, docs_df, out_p, n_buckets=6, parallelism=3)
    assert _collect(L.read_output(spark, out_p)) == _collect(L.read_output(spark, out_s))
    lin = L.read_lineage(spark, out_p).collect()
    assert {r["bucket"] for r in lin} == set(range(6))
    assert sum(r["doc_count"] for r in lin) == docs_df.count()


def test_old_manifest_version_rejected_clearly(spark, docs_df, tmp_path):
    """An out_dir checkpointed by the v1 signature (bare file names) must be
    rejected as a VERSION mismatch, not misdiagnosed as 'different input'."""
    import json

    out = str(tmp_path / "out_oldver")
    os.makedirs(out)
    with open(os.path.join(out, "_manifest.json"), "w") as f:
        json.dump({"sig": "deadbeefdeadbeef", "n_buckets": 4}, f)  # no sig_version
    with pytest.raises(ValueError, match="older engine version"):
        L.run_with_lineage(spark, docs_df, out, n_buckets=4)


def test_inplace_overwrite_detected_via_stat(spark, tmp_path):
    """Input files rewritten IN PLACE under the same names (size/mtime
    change) must flip the manifest signature — with a percent-encoded local
    path (space in the directory), exercising the URI decode."""
    src = str(tmp_path / "my corpus")
    docs = spark.createDataFrame(
        [(f"d{i}", None) for i in range(8)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")
    docs.coalesce(1).write.parquet(src)
    out = str(tmp_path / "out_inplace")

    L.run_with_lineage(spark, spark.read.parquet(src), out, n_buckets=2)
    # same names, new content: rewrite via a temp dir, then swap part files
    import shutil

    tmp2 = str(tmp_path / "regen")
    spark.createDataFrame(
        [(f"e{i}", None) for i in range(8)], docs.schema
    ).coalesce(1).write.parquet(tmp2)
    old_parts = sorted(p for p in os.listdir(src) if p.endswith(".parquet"))
    new_parts = sorted(p for p in os.listdir(tmp2) if p.endswith(".parquet"))
    shutil.copyfile(os.path.join(tmp2, new_parts[0]),
                    os.path.join(src, old_parts[0]))
    for crc in os.listdir(src):  # stale Hadoop checksums of the old bytes
        if crc.endswith(".crc"):
            os.remove(os.path.join(src, crc))
    spark.catalog.refreshByPath(src)  # drop the cached file index/footers
    with pytest.raises(ValueError, match="different input"):
        L.run_with_lineage(spark, spark.read.parquet(src), out, n_buckets=2)


def test_job_rejects_wrong_schema_before_staging(spark, tmp_path, monkeypatch):
    """job.py must fail fast with a readable message when the input lacks the
    interleaved-corpus columns — BEFORE the staging copy wastes a full input
    pass (found driving the spark-submit surface against a text corpus)."""
    import sys

    import job

    bad = str(tmp_path / "bad_in")
    spark.createDataFrame([(1, "just text")], "doc_id long, text string") \
        .write.parquet(bad)
    out = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv",
                        ["job.py", "--input", bad, "--output", out])
    # job.main() would spark.stop() our session fixture via sys.exit paths
    # only AFTER the guard; the guard raises SystemExit first
    with pytest.raises(SystemExit) as e:
        job.main()
    assert "spans" in str(e.value) and "expected the interleaved" in str(e.value)
    assert not os.path.exists(os.path.join(out, "_staged"))
