"""Similarity-operator semantics tests.

The LSH-bucketed near-dup operator must return EXACTLY the pairs the
all-pairs brute-force twin returns on the test corpora — total recall at
these scales is the contract the driver's all-pairs DuckDB oracle enforces
(the brute-force Spark twin here is the second, engine-internal oracle; it
is O(n²) and exists only for tests)."""

from ch_pdf_parse_spark.operators.similarity import (
    dedup_embedding_cosine,
    dedup_embedding_cosine_bruteforce,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.vec_a, r.vec_b, r.cos) for r in df.collect()}


def test_lsh_dedup_equals_bruteforce(spark):
    got = _pairs(dedup_embedding_cosine(spark, SF_DIR))
    want = _pairs(dedup_embedding_cosine_bruteforce(spark, SF_DIR))
    assert len(want) > 0
    assert got == want
