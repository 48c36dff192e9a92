"""DOM-heuristic main-content extraction: exact semantics + NULL shape."""

from pyspark.sql import functions as F

from ch_pdf_parse_spark.operators.text_analysis import (
    _DOM_KEEP_SPARK,
    _dom_html_spark,
    dom_main_content_cols,
    text_profile,
)

SF = "/root/testdata/sf0.001"


def _dom(spark, doc_id, text):
    df = spark.createDataFrame([(doc_id, text)], "doc_id: long, text: string")
    base = dom_main_content_cols(df.withColumn("dhtml", _dom_html_spark()))
    dkeep = F.expr(f"filter({_DOM_KEEP_SPARK}, e -> e IS NOT NULL)")
    return base.select(
        F.array_join(dkeep, " ").alias("main"),
        F.size(dkeep).alias("n_kept"),
        F.size("dtags").alias("n_elems"),
    ).collect()[0]


def test_keeps_article_text_drops_chrome(spark):
    r = _dom(spark, 7, "real body words")
    assert r.main == "Heading 7 real body words Second paragraph body 7"
    # nav / ad div / aside / footer / title / script all dropped
    assert (r.n_kept, r.n_elems) == (3, 10)
    for chrome in ("Advertisement", "Copyright", "Related links",
                   "var a=1", "Home"):
        assert chrome not in r.main


def test_empty_text_drops_empty_paragraph(spark):
    # the <p> holding the doc text is empty -> under the min-length bar
    r = _dom(spark, 0, "")
    assert r.n_kept == 2 and "Heading 0" in r.main


def test_null_doc_id_degrades_not_nulls(spark):
    # doc_id-derived fragments coalesce to '' — the DOM (and the parse)
    # survives instead of NULL-propagating through concat
    r = _dom(spark, None, None)
    assert r.n_elems == 10 and r.main is not None


def test_text_containing_angle_bracket_truncates_deterministically(spark):
    # '<' inside the document text ends the element's immediate text — the
    # heuristic degrades (keeps the prefix) rather than leaking chrome
    r = _dom(spark, 3, "prefix <b>bold</b> suffix")
    assert "prefix" in r.main and "suffix" not in r.main


def test_profile_dom_columns_zero_extra_exchanges(spark):
    # the profile's single exchange pair is the fingerprint groupBy+join;
    # the DOM columns must add none
    plan = (text_profile(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") <= 4, plan
