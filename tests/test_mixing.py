"""Corpus-mixing operators (operators/mixing.py): invariant pins."""

from pyspark.sql import functions as F

from ch_pdf_parse_spark.operators.mixing import (
    MIX_TARGET_PER_SOURCE,
    N_PACK_BUCKETS,
    PACK_BUDGET,
    pipeline_pack_sequences,
    pipeline_source_mix,
)

SF = "/root/testdata/sf0.01"


def test_source_mix_rates_and_counts(spark):
    rows = {r.source: r for r in pipeline_source_mix(spark, SF).collect()}
    docs = spark.read.parquet(SF + "/documents.parquet")
    want_counts = {r.source: r.n for r in
                   docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(rows) == set(want_counts)
    for s, r in rows.items():
        assert r.n_in == want_counts[s]
        assert 0 <= r.n_kept <= r.n_in
        if r.n_in <= MIX_TARGET_PER_SOURCE:
            # small sources keep everything
            assert r.rate == 1.0 and r.n_kept == r.n_in
        else:
            assert r.rate < 1.0
    # the rebalance must actually bite on this corpus
    assert any(r.rate < 1.0 for r in rows.values())
    # selection is a pure function of doc_id: second run identical
    again = {r.source: r.n_kept
             for r in pipeline_source_mix(spark, SF).collect()}
    assert again == {s: r.n_kept for s, r in rows.items()}


def test_pack_sequences_invariants(spark):
    rows = pipeline_pack_sequences(spark, SF).collect()
    docs_n = spark.read.parquet(SF + "/documents.parquet").count()
    assert len(rows) == docs_n  # every doc packed exactly once
    by_bucket = {}
    for r in rows:
        assert 0 <= r.bucket < N_PACK_BUCKETS
        assert 0 <= r.offset_in_pack < PACK_BUDGET
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, members in by_bucket.items():
        # within a bucket, (pack_id, offset) positions tile the token stream:
        # sorting by position must give back a contiguous prefix-sum
        members.sort(key=lambda r: (r.pack_id, r.offset_in_pack))
        cum = 0
        for r in members:
            assert r.pack_id * PACK_BUDGET + r.offset_in_pack == cum, (
                bucket, r)
            cum += r.n_tokens
