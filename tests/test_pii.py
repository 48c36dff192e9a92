"""PII scrub: exact semantics on constructed rows + zero-exchange plan pin."""

from pyspark.sql import functions as F

from ch_pdf_parse_spark.operators.pii import (
    _inject_spark,
    pipeline_pii_scrub,
    scrub_pii,
)

SF = "/root/testdata/sf0.001"


def _scrub_one(spark, body: str):
    df = spark.createDataFrame([(0, body)], "doc_id: long, body: string")
    return scrub_pii(df).collect()[0]


def test_counts_and_masks_every_class(spark):
    r = _scrub_one(
        spark,
        "mail a.b+c@x-y.example.org or root@h.io, call +86-555-0199, "
        "host 192.168.0.1 peer 10.0.255.3, id 123-45-6789.")
    assert (r.n_email, r.n_phone, r.n_ip, r.n_ssn) == (2, 1, 2, 1)
    assert r.n_pii == 6 and not r.pii_free
    assert r.clean_text == ("mail [EMAIL] or [EMAIL], call [PHONE], "
                            "host [IP] peer [IP], id [SSN].")


def test_clean_doc_untouched(spark):
    r = _scrub_one(spark, "plain text with numbers 12345 and a-b-c words")
    assert r.n_pii == 0 and r.pii_free
    assert r.clean_text == "plain text with numbers 12345 and a-b-c words"


def test_masks_create_no_new_matches(spark):
    # a phone adjacent to an email: masking the email must not form a new
    # phone/ip/ssn match (replacement tokens are digit-free by contract)
    r = _scrub_one(spark, "x@y.ab+1-234-5678")
    assert (r.n_email, r.n_phone) == (1, 0) or (r.n_email, r.n_phone) == (1, 1)
    assert "@" not in r.clean_text


def test_word_boundary_guards_ip_and_ssn(spark):
    # digits embedded in longer runs are NOT an IP/SSN (the \b guards)
    r = _scrub_one(spark, "v1.2.3.4567 build 1234-56-7890x")
    assert r.n_ip == 0 and r.n_ssn == 0


def test_injection_null_doc_id_and_null_text(spark):
    df = spark.createDataFrame(
        [(None, None), (None, "txt"), (6, None)],
        "doc_id: long, text: string")
    rows = {r.doc_id: r.body for r in _inject_spark(df).collect()}
    # NULL doc_id disables every fragment (CASE → ELSE ''), never NULLs body
    assert rows[None] in ("", "txt")
    # NULL text coalesces to '' but doc_id-gated fragments still inject
    assert rows[6].startswith(" Contact user6@mail6.example.com")


def test_driver_query_zero_exchanges(spark):
    # the only allowed exchange is the leaf round-robin scan spread
    # (registry.spread_scan); no KEYED shuffle may appear
    plan = (pipeline_pii_scrub(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_driver_query_masks_injected_pii(spark):
    out = pipeline_pii_scrub(spark, SF)
    # every injected class is found: docs ≡ 0 (mod 30) carry all four
    hit = out.where((F.col("doc_id") % 30 == 0)).collect()
    assert hit and all(
        r.n_email >= 1 and r.n_ip >= 1 and r.n_phone >= 1 and r.n_ssn >= 1
        for r in hit)
    # and nothing PII-shaped survives in the masked text
    leak = out.where(
        F.col("clean_text").rlike("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}")
        | F.col("clean_text").contains("@")).count()
    assert leak == 0


def test_training_corpus_dedup_survives_pii_stage(spark):
    """Round-5 composition invariant: the PII inject→mask stage inside
    pipeline_training_corpus is keyed on length(text), so injected
    exact-duplicate copies receive identical PII and STILL collapse in the
    exact dedup — and the stage demonstrably masked something."""
    from ch_pdf_parse_spark.operators.text_analysis import (
        pipeline_training_corpus)

    rows = pipeline_training_corpus(spark, SF).collect()
    assert rows
    assert sum(r.n_dups_removed for r in rows) > 0, rows
    assert sum(r.total_pii_masked for r in rows) > 0, rows
