"""Registry contract tests (no SparkSession required).

The driver may enumerate ``queries()``/``oracle_sql()`` before any session
exists, so importing every operator module must be session-free (regression:
a ``pandas_udf`` with a DDL-string return type parses the string through the
active session at decoration time and crashes the bare import).
"""

import __spark_entry__ as entry


def test_queries_enumerable_without_session():
    qs = entry.queries()
    sqls = entry.oracle_sql()
    assert len(qs) >= 36
    # every oracle belongs to a registered query
    assert set(sqls) <= set(qs)
    # flagship + §2.12 coverage spot checks
    for key in ("extract_spans", "extract_spans_relational", "extract_markdown",
                "dedup_minhash_lsh", "sim_ann_methods", "j_positional_join",
                "a_group_concat_empty_sep", "text_profile",
                "quality_metrics", "multimodal_phash_neardup"):
        assert key in qs, key
    # non-SQL-expressible ops are the only ones allowed to omit an oracle
    rows_only = set(qs) - set(sqls)
    assert rows_only <= {
        "extract_spans", "extract_spans_relational", "extract_markdown",
        "m4_citations", "multimodal_features", "multimodal_frame_sample",
        "multimodal_phash_neardup",
    }
    # the driver's correctness roster covers the first 50 registered queries
    # (round-4 verdict #1: entries 51+ silently got no row) — the registry
    # must stay at or under the cap so EVERY query gets a driver row
    assert len(qs) <= 50, f"{len(qs)} queries registered; driver roster caps at 50"


def test_entry_module_exposes_driver_contract():
    assert callable(entry.entry)
    assert callable(entry.queries)
    assert callable(entry.oracle_sql)


def test_quantize_repr_tie_double_matches_oracle(spark):
    """The adversarial-gate seed-31 class pinned as a unit test: a double
    whose shortest repr is a tie at the quantize scale (2970.77545 -> s=4).
    Spark's double->decimal cast rounds the repr HALF_UP; DuckDB's
    double->decimal cast rounds the BINARY value (just below the tie), so
    q_sql must hop through VARCHAR. Column data, not literals — Spark
    constant-folds literals through a different path."""
    import duckdb

    from ch_pdf_parse_spark.registry import q_sql, quantize

    vals = [2970.77545, 135.795, -0.0, 0.30000000000000004, 1e-7]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got_spark = sorted(
        r["q"] for r in df.select(quantize("x", 4).alias("q")).collect())
    got_duck = sorted(
        r[0] for r in duckdb.connect().execute(
            f"SELECT {q_sql('x', 4)} FROM (SELECT unnest({vals}) AS x)"
        ).fetchall())
    assert [repr(a) for a in got_spark] == [repr(b) for b in got_duck]
    assert 2970.7755 in got_spark  # HALF_UP on the repr, not the binary
