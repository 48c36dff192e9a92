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
                "dedup_minhash_lsh", "sim_ann_lsh", "j_positional_join",
                "a_group_concat_empty_sep", "text_fingerprint"):
        assert key in qs, key
    # non-SQL-expressible ops are the only ones allowed to omit an oracle
    rows_only = set(qs) - set(sqls)
    assert rows_only <= {
        "extract_spans", "extract_spans_relational", "extract_markdown",
        "m4_citations", "multimodal_features", "multimodal_frame_sample",
    }


def test_entry_module_exposes_driver_contract():
    assert callable(entry.entry)
    assert callable(entry.queries)
    assert callable(entry.oracle_sql)
