"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting, citation extraction.

All pure column expressions (JVM-side, whole-stage codegen — no Python in the
hot path), each with an exactly-matching DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import constants as C
from ..registry import q_sql, quantize, register, _t
from .dedup import portable_hash
from .pii import (count_col, count_sql, inject_textkeyed_spark,
                  inject_textkeyed_sql, mask_col, mask_sql)

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_CJK = r"[\x{4e00}-\x{9fff}]"
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# ---- shared classifier expressions (one definition per engine: the same
# thresholds feed text_lang_id, text_quality_score AND the composed
# pipeline_training_corpus — a drifted copy would silently desync the
# composed query from its building blocks) -------------------------------


def _lang_expr(text="text"):
    """Spark column: 'zh' | 'en' | 'und' by character-class ratio."""
    cjk = F.size(F.regexp_extract_all(text, F.lit(_CJK), F.lit(0)))
    lat = F.size(F.regexp_extract_all(text, F.lit("[A-Za-z]"), F.lit(0)))
    tot = F.greatest(F.length(text), F.lit(1))
    return (F.when(cjk * 1.0 / tot > 0.3, "zh")
            .when(lat * 1.0 / tot > 0.5, "en")
            .otherwise("und"))


def _lang_sql(text="text"):
    return (f"CASE WHEN len(regexp_extract_all({text}, '{_CJK}')) * 1.0"
            f" / greatest(length({text}), 1) > 0.3 THEN 'zh'"
            f" WHEN len(regexp_extract_all({text}, '[A-Za-z]')) * 1.0"
            f" / greatest(length({text}), 1) > 0.5 THEN 'en'"
            f" ELSE 'und' END")


def _stop_ratio_expr(lcol="l"):
    """Spark column: stopword fraction of a token-array SQL expression
    (``lcol`` may be a column name or any array-typed SQL expression)."""
    stop_in = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return (F.size(F.expr(f"filter({lcol}, x -> x IN ({stop_in}))")) * 1.0
            / F.greatest(F.size(F.expr(lcol)), F.lit(1)))


def _stop_ratio_sql(lcol="l"):
    return (f"len(list_filter({lcol}, x -> x IN {_STOPWORDS})) * 1.0"
            f" / greatest(len({lcol}), 1)")


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by character-class n-gram heuristic (CJK vs latin ratio).

    Driver surface: folded into ``text_profile`` (round 5 — the driver's
    correctness roster caps at 50 entries, so the five per-document text
    scalars share one multi-column registration; the hash check still covers
    every column)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", _lang_expr("text").alias("lang_pred"))


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: length, token count, mean token length, stopword and
    punctuation ratios (the usual pre-training quality filters). Driver
    surface: folded into ``text_profile`` (see text_lang_id)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.split("text", " ").alias("l"))
    ntok = F.greatest(F.size("l"), F.lit(1))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars2"),
        F.size("l").alias("n_tokens"),
        quantize(F.length("text") * 1.0 / ntok, 4).alias("avg_tok_len"),
        quantize(_stop_ratio_expr("l"), 4).alias("stopword_ratio"),
        quantize(
            F.size(F.expr("regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)")) * 1.0
            / F.greatest(F.length("text"), F.lit(1)), 4,
        ).alias("punct_ratio"),
    )


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer. Driver
    surface: folded into ``text_profile`` (see text_lang_id)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)")).alias("bpe_tokens"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact content hash + bottom-1 shingle sketch
    (the building block of winnowing/rolling-hash fingerprints). Driver
    surface: folded into ``text_profile`` (see text_lang_id)."""
    from .dedup import shingles

    d = _t(spark, sf_dir, "documents")
    fp = shingles(d.select("doc_id", "text")).groupBy("doc_id").agg(
        F.min(portable_hash(F.col("shingle"))).alias("fp_min"))
    return (
        d.select("doc_id", F.md5("text").alias("content_hash"))
        .join(fp, "doc_id", "left")
        .select("doc_id", "content_hash", "fp_min")
    )


@register(
    "m4_citations",
    f"""
    WITH cited AS (
      SELECT doc_id,
             coalesce(text, '') || ' 引文[' || (doc_id % 9 + 1) || ']' ||
             CASE WHEN doc_id % 4 = 0 THEN ' [2,3] [2,3]' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0 THEN ' [10-12] not[a]' ELSE '' END
               AS body
      FROM documents),
    c AS (SELECT doc_id,
                 unnest(regexp_extract_all(body, '{C.CITATION_REGEX}'))
                   AS citation
          FROM cited)
    SELECT doc_id, citation, count(*) AS n
    FROM c GROUP BY doc_id, citation
    """,
)
def m4_citations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4/CE surrogate: citation-span extraction over body text (regex over
    `[n]`/`[n,m]`/`[n-m]` markers, constants.CITATION_REGEX — ASCII-only
    classes, so Java regex and DuckDB's RE2 agree). The reference computes
    token_type and never consumes it (predict/pdf2markdown.py:364); exposed
    as a derived table, excluded from the span-equality invariant.

    Deterministic citation markers are injected around the documents text
    (same pattern as text_main_content's boilerplate injection — the driver
    corpus has no organic `[n]` markers), so the DuckDB oracle hash-checks
    real extraction work: per-doc marker, duplicated `[2,3]` (count 2),
    range `[10-12]`, and a `[a]` negative. Round 2: was rows-only on the
    fixture corpus."""
    d = _t(spark, sf_dir, "documents")
    body = F.concat(
        F.coalesce(F.col("text"), F.lit("")), F.lit(" 引文["),
        (F.col("doc_id") % 9 + 1).cast("string"), F.lit("]"),
        F.when(F.col("doc_id") % 4 == 0, " [2,3] [2,3]").otherwise(""),
        F.when(F.col("doc_id") % 7 == 0, " [10-12] not[a]").otherwise(""),
    )
    cited = d.select("doc_id", body.alias("body"))
    return (
        cited.select(
            "doc_id",
            # the DataFrame function, NOT F.expr with an f-string: Spark's
            # SQL literal parser treats backslashes as escapes, silently
            # mangling the pattern's \[ \- \s (the old rows-only fixture
            # variant of this query had exactly that latent bug — caught
            # the moment the query gained a DuckDB oracle)
            F.explode(
                F.regexp_extract_all("body", F.lit(C.CITATION_REGEX), F.lit(0))
            ).alias("citation"),
        )
        .groupBy("doc_id", "citation")
        .agg(F.count("*").alias("n"))
    )


# boilerplate line predicate, textually parallel in both engines: nav/footer
# chrome is short, link-dense ('|' separators), or legal-footer prefixed
_BP_SPARK = ("contains(line, '|') OR startswith(line, 'Copyright') "
             "OR length(line) < 20")
_BP_DUCK = ("contains(x, '|') OR starts_with(x, 'Copyright') "
            "OR length(x) < 20")


# injected page chrome, one definition per engine (text_main_content and the
# consolidated text_profile share it). '||' not concat() for the footer:
# DuckDB concat() skips NULL args, Spark's propagates — on NULL doc_id the
# line must vanish on BOTH engines (concat_ws skips the NULL element
# identically).
_HTML_DUCK = """concat_ws(chr(10),
               'Home | About | Login | Search',
               'Advertisement',
               text,
               'Related articles | More from this site',
               ('Copyright 2026 site ' || (doc_id % 10) ||
                '. All rights reserved.'))"""


def text_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction / boilerplate strip (north_rule: 'HTML
    boilerplate strip ... DOM heuristics'): deterministic nav/ad/footer
    chrome is injected around each document's text, then stripped back out
    by line-level heuristics — the jusText/readability shape: split lines ->
    classify per line -> keep content lines in order.

    Scale notes: a document's lines already live in one row, so the whole
    strip is a per-row higher-order ``filter`` — ZERO shuffles, fully inside
    whole-stage codegen. (An earlier explode→groupBy re-nest formulation
    paid a shuffle AND merged every NULL-doc_id document into one group —
    per-record semantics, like the oracle's per-row list_filter, have no
    such key dependence; tools/adversarial_gate.py seed 31.) Boilerplate
    never reaches the expensive downstream operators — the same
    work-avoidance rewrite as the reference's whiteout-before-OCR
    (/root/reference/predict/ppocr_server.py:115)."""
    d = _t(spark, sf_dir, "documents")
    page = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("Home | About | Login | Search"),
            F.lit("Advertisement"),
            F.col("text"),
            F.lit("Related articles | More from this site"),
            F.concat(F.lit("Copyright 2026 site "), F.col("doc_id") % 10,
                     F.lit(". All rights reserved.")),
        ).alias("html"),
    )
    t = page.select("doc_id", F.split("html", "\n").alias("l"))
    keep = F.expr(f"filter(l, line -> NOT ({_BP_SPARK}))")
    return t.select(
        "doc_id",
        F.array_join(keep, "\n").alias("main_content"),
        F.size(keep).cast("long").alias("n_kept"),
        (F.size("l") - F.size(keep)).cast("long").alias("n_dropped"),
    )


# ---- DOM-heuristic main-content extraction (round 5) ----------------------
#
# north_rule names "DOM heuristics" alongside the line-level boilerplate
# strip above. This is the tag-aware variant: documents are wrapped in a
# deterministic synthetic DOM (head/script/nav/ad-div/article/aside/footer,
# with the real text inside <article><p>), the DOM is tokenized into
# (opening tag, immediate text) pairs by one regex pass, and only text under
# content tags (<p>, <h1>) of at least _DOM_MIN_LEN chars survives — the
# readability/jusText element-whitelist shape, as pure per-row column
# expressions (zero exchanges; the regex and the higher-order zip/filter run
# inside whole-stage codegen / RE2 identically). doc_id-derived fragments are
# coalesce()d to '' so a NULL doc_id degrades the DOM, never NULLs it (the
# engines' NULL-concat semantics differ; tools/adversarial_gate.py).
_DOM_TAG_RE = "<(p|h1|article|nav|div|aside|footer|title|script)[^>]*>([^<]*)"
_DOM_KEEP_SPARK = ("zip_with(dtags, dtexts, (t, x) -> "
                   "CASE WHEN t IN ('p', 'h1') AND length(x) >= 3 "
                   "THEN x END)")
_DOM_KEEP_DUCK = ("list_transform(generate_series(1, len(dtags)), i -> "
                  "CASE WHEN dtags[i] IN ('p', 'h1') "
                  "AND length(dtexts[i]) >= 3 THEN dtexts[i] END)")

_DOM_HTML_DUCK = """
    '<html><head><title>Doc ' || coalesce((doc_id % 1000)::VARCHAR, '')
    || '</title><script>var a=1;</script></head><body>'
    || '<nav><a href="/">Home</a> <a href="/about">About</a></nav>'
    || '<div>Advertisement - buy now</div>'
    || '<article><h1>Heading ' || coalesce((doc_id % 50)::VARCHAR, '')
    || '</h1><p>' || coalesce(text, '') || '</p>'
    || '<p>Second paragraph body ' || coalesce((doc_id % 17)::VARCHAR, '')
    || '</p></article>'
    || '<aside>Related links</aside>'
    || '<footer>Copyright 2026 example.org</footer></body></html>'
"""


def _dom_html_spark() -> F.Column:
    did = F.col("doc_id")

    def s(x):
        return F.coalesce(x.cast("string"), F.lit(""))

    return F.concat(
        F.lit('<html><head><title>Doc '), s(did % 1000),
        F.lit('</title><script>var a=1;</script></head><body>'),
        F.lit('<nav><a href="/">Home</a> <a href="/about">About</a></nav>'),
        F.lit('<div>Advertisement - buy now</div>'),
        F.lit('<article><h1>Heading '), s(did % 50),
        F.lit('</h1><p>'), F.coalesce(F.col("text"), F.lit("")), F.lit('</p>'),
        F.lit('<p>Second paragraph body '), s(did % 17),
        F.lit('</p></article>'),
        F.lit('<aside>Related links</aside>'),
        F.lit('<footer>Copyright 2026 example.org</footer></body></html>'))


def dom_main_content_cols(df: DataFrame) -> DataFrame:
    """Append (dtags, dtexts) parse columns for a DataFrame that already has
    ``dhtml``; callers project the kept-text/count outputs from them."""
    return df.withColumns({
        "dtags": F.regexp_extract_all("dhtml", F.lit(_DOM_TAG_RE), F.lit(1)),
        "dtexts": F.regexp_extract_all("dhtml", F.lit(_DOM_TAG_RE), F.lit(2)),
    })


@register(
    "text_profile",
    f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split(text, ' ') AS l,
             string_split({_HTML_DUCK}, chr(10)) AS hl
      FROM documents),
    k0 AS (SELECT *, list_filter(hl, x -> NOT ({_BP_DUCK})) AS keep FROM t),
    kd AS (SELECT *, {_DOM_HTML_DUCK} AS dhtml FROM k0),
    kp AS (SELECT *,
           regexp_extract_all(dhtml, '{_DOM_TAG_RE}', 1) AS dtags,
           regexp_extract_all(dhtml, '{_DOM_TAG_RE}', 2) AS dtexts
           FROM kd),
    k AS (SELECT *, list_filter({_DOM_KEEP_DUCK}, x -> x IS NOT NULL) AS dkeep
          FROM kp),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                     for i in range(1, greatest(len(l) - 1, 1))]) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
    m AS (SELECT doc_id,
                 min(CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT)) AS fp_min
          FROM sh GROUP BY doc_id)
    SELECT k.doc_id,
           {_lang_sql("k.text")} AS lang_pred,
           length(k.text) AS n_chars2,
           len(l) AS n_tokens,
           {q_sql('length(k.text) * 1.0 / greatest(len(l), 1)', 4)} AS avg_tok_len,
           CAST(CAST(CAST(CAST(({_stop_ratio_sql("l")}) AS DOUBLE) AS VARCHAR) AS DECIMAL(38,4)) AS DOUBLE) AS stopword_ratio,
           CAST(CAST(CAST(CAST((len(regexp_extract_all(k.text, '[^A-Za-z0-9 ]')) * 1.0
                 / greatest(length(k.text), 1)) AS DOUBLE) AS VARCHAR) AS DECIMAL(38,4)) AS DOUBLE) AS punct_ratio,
           len(regexp_extract_all(k.text, '{_BPE_RE}')) AS bpe_tokens,
           md5(k.text) AS content_hash,
           m.fp_min,
           -- COALESCE: duckdb's array_to_string([]) is NULL, Spark's
           -- array_join([]) is '' (tools/adversarial_gate.py)
           COALESCE(array_to_string(keep, chr(10)), '') AS main_content,
           len(keep) AS n_kept,
           len(hl) - len(keep) AS n_dropped,
           COALESCE(array_to_string(dkeep, ' '), '') AS dom_main_content,
           len(dkeep) AS n_dom_kept,
           len(dtags) - len(dkeep) AS n_dom_dropped
    FROM k LEFT JOIN m ON m.doc_id = k.doc_id
    """,
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated per-document text profile: language ID, quality signals,
    token counts, content fingerprint, main-content boilerplate strip, and
    DOM-heuristic extraction (dom_main_content / n_dom_kept / n_dom_dropped:
    the tag-aware whitelist variant — comment block above _DOM_TAG_RE) — one
    multi-column registration (round 5: the driver's correctness roster caps
    at 50 entries; the standalone builders above keep their own functions
    for pytest/plan pins, and every column here reuses exactly the same
    engine-pinned expressions, so the single hash check covers all six
    operators).

    Scale notes: everything except the fingerprint is a per-row column
    expression (zero exchanges); the bottom-1 shingle sketch adds one
    map-side-combined groupBy on doc_id plus a doc_id-partitioned join —
    the same shape text_fingerprint carried alone."""
    from .dedup import shingles

    d = _t(spark, sf_dir, "documents")
    html = F.concat_ws(
        "\n",
        F.lit("Home | About | Login | Search"),
        F.lit("Advertisement"),
        F.col("text"),
        F.lit("Related articles | More from this site"),
        F.concat(F.lit("Copyright 2026 site "), F.col("doc_id") % 10,
                 F.lit(". All rights reserved.")),
    )
    base = dom_main_content_cols(
        d.select("doc_id", "text", F.split("text", " ").alias("l"),
                 F.split(html, "\n").alias("hl"))
        .withColumn("dhtml", _dom_html_spark()))
    keep = F.expr(f"filter(hl, line -> NOT ({_BP_SPARK}))")
    dkeep = F.expr(f"filter({_DOM_KEEP_SPARK}, e -> e IS NOT NULL)")
    ntok = F.greatest(F.size("l"), F.lit(1))
    prof = base.select(
        "doc_id",
        _lang_expr("text").alias("lang_pred"),
        F.length("text").alias("n_chars2"),
        F.size("l").alias("n_tokens"),
        quantize(F.length("text") * 1.0 / ntok, 4).alias("avg_tok_len"),
        quantize(_stop_ratio_expr("l"), 4).alias("stopword_ratio"),
        quantize(
            F.size(F.expr("regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)")) * 1.0
            / F.greatest(F.length("text"), F.lit(1)), 4,
        ).alias("punct_ratio"),
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)")).alias("bpe_tokens"),
        F.md5("text").alias("content_hash"),
        F.array_join(keep, "\n").alias("main_content"),
        F.size(keep).cast("long").alias("n_kept"),
        (F.size("hl") - F.size(keep)).cast("long").alias("n_dropped"),
        F.array_join(dkeep, " ").alias("dom_main_content"),
        F.size(dkeep).cast("long").alias("n_dom_kept"),
        (F.size("dtags") - F.size(dkeep)).cast("long").alias("n_dom_dropped"),
    )
    fp = shingles(d.select("doc_id", "text")).groupBy("doc_id").agg(
        F.min(portable_hash(F.col("shingle"))).alias("fp_min"))
    return prof.join(fp, "doc_id", "left").select(
        "doc_id", "lang_pred", "n_chars2", "n_tokens", "avg_tok_len",
        "stopword_ratio", "punct_ratio", "bpe_tokens", "content_hash",
        "fp_min", "main_content", "n_kept", "n_dropped",
        "dom_main_content", "n_dom_kept", "n_dom_dropped")


# ---- Gopher-style repetition metrics (round-3 verdict item #7) ------------
#
# Pure higher-order column expressions on the Spark side (zero shuffles, one
# pass inside whole-stage codegen); the DuckDB twins compute the same VALUES
# with the simplest obviously-correct list expressions (the oracle does not
# need the scale path). The corpus has no newlines, so "lines"/"paragraphs"
# are deterministic fixed-width token chunks (8 / 32 tokens) — on real HTML
# text you would split on '\n'/'\n\n' instead; every downstream expression is
# chunk-source-agnostic.

_REP_LINE_W = 8
_REP_PARA_W = 32


def _chunks_spark(lcol: str, w: int) -> str:
    # ceil(size/w) chunks, floor-of-1 so even an empty token list yields one
    # '' chunk (slice past the end is empty, concat_ws of empty is '')
    return (f"transform(sequence(1, greatest(cast(ceil(size({lcol}) / {w}.0) "
            f"as int), 1)), i -> concat_ws(' ', slice({lcol}, (i - 1) * {w} + 1, {w})))")


def _chunks_duck(lcol: str, w: int) -> str:
    # coalesce: DuckDB array_to_string over an empty slice is NULL, Spark's
    # concat_ws is '' (the empty-merge contract, tools/adversarial_gate.py)
    return (f"[coalesce(array_to_string({lcol}[((i - 1) * {w} + 1):(i * {w})], ' '), '') "
            f"for i in range(1, greatest(cast(ceil(len({lcol}) / {w}.0) as int), 1) + 1)]")


def _dup_frac_spark(ccol: str) -> str:
    """Fraction of chunks that are duplicates of an earlier chunk (Gopher
    duplicate-line / duplicate-paragraph fraction). size >= 1 always."""
    return f"(size({ccol}) - size(array_distinct({ccol}))) / size({ccol})"


def _dup_frac_duck(ccol: str) -> str:
    # list_distinct also drops NULLs — safe because the chunk builders above
    # can never emit a NULL element
    return f"(len({ccol}) - len(list_distinct({ccol}))) * 1.0 / len({ccol})"


def _bigrams_spark(lcol: str) -> str:
    return (f"if(size({lcol}) >= 2, transform(sequence(1, size({lcol}) - 1), "
            f"i -> concat_ws(' ', element_at({lcol}, i), element_at({lcol}, i + 1))), "
            "array())")


def _bigrams_duck(lcol: str) -> str:
    return f"[{lcol}[i] || ' ' || {lcol}[i+1] for i in range(1, greatest(len({lcol}), 1))]"


def _top_bigram_count_spark(bcol: str) -> str:
    """Max bigram multiplicity in one sorted pass: fold a run-length counter
    over array_sort — O(n log n) per row, no shuffle, no per-row quadratic
    blowup on long documents (the production shape for Gopher's top-2-gram
    share at 100 TB, where a doc can be 100k tokens)."""
    return (f"aggregate(array_sort({bcol}), "
            "named_struct('prev', cast(null as string), 'run', 0, 'best', 0), "
            "(acc, x) -> named_struct("
            "  'prev', x, "
            "  'run', if(acc.prev <=> x, acc.run + 1, 1), "
            "  'best', greatest(acc.best, if(acc.prev <=> x, acc.run + 1, 1))), "
            "acc -> acc.best)")


def _top_bigram_count_duck(bcol: str) -> str:
    # oracle-side: quadratic distinct×filter count — simple and obviously
    # equal to "max multiplicity"; empty list → list_max([]) NULL → 0,
    # matching the Spark fold's 0 init
    return (f"coalesce(list_max(list_transform(list_distinct({bcol}), "
            f"x -> len(list_filter({bcol}, y -> y = x)))), 0)")


# deterministic repetition injection (same pattern as m4_citations' citation
# markers): the synthetic corpus is random-word text with near-zero organic
# repetition, so without injection every metric would be ~0 and the oracle
# would verify nothing. 24 spams ≥ 7 (worst alignment) + 2 full 8-chunks;
# 96 paras ≥ 31 + 2 full 32-chunks — so the dup fractions are provably > 0
# for the injected rows at ANY chunk alignment.
_REP_BODY_SPARK = (
    "concat(coalesce(text, ''), "
    "if(doc_id % 6 = 0, repeat(' spam', 24), ''), "
    "if(doc_id % 9 = 0, repeat(' para', 96), ''))")
_REP_BODY_DUCK = (
    "coalesce(text, '') || "
    "(CASE WHEN doc_id % 6 = 0 THEN repeat(' spam', 24) ELSE '' END) || "
    "(CASE WHEN doc_id % 9 = 0 THEN repeat(' para', 96) ELSE '' END)")


@register(
    "text_repetition",
    f"""
    WITH body AS (SELECT doc_id, {_REP_BODY_DUCK} AS t FROM documents),
         t AS (SELECT doc_id, string_split(t, ' ') AS l FROM body),
         c AS (SELECT doc_id,
                      {_chunks_duck('l', _REP_LINE_W)} AS c8,
                      {_chunks_duck('l', _REP_PARA_W)} AS c32,
                      {_bigrams_duck('l')} AS bg
               FROM t)
    SELECT doc_id,
           {q_sql(_dup_frac_duck('c8'))} AS dup_line_frac,
           {q_sql(_dup_frac_duck('c32'))} AS dup_para_frac,
           {q_sql(_top_bigram_count_duck('bg') + ' * 1.0 / greatest(len(bg), 1)')}
             AS top_bigram_share
    FROM c
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate-line
    fraction, duplicate-paragraph fraction, top-2-gram share (Rae et al.
    2021 §A1.1 repetition filters). All three are per-row higher-order
    expressions — zero exchanges at any corpus size."""
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id",
                 F.split(F.expr(_REP_BODY_SPARK), " ").alias("l"))
    c = t.select(
        "doc_id",
        F.expr(_chunks_spark("l", _REP_LINE_W)).alias("c8"),
        F.expr(_chunks_spark("l", _REP_PARA_W)).alias("c32"),
        F.expr(_bigrams_spark("l")).alias("bg"),
    )
    return c.select(
        "doc_id",
        quantize(F.expr(_dup_frac_spark("c8")), 4).alias("dup_line_frac"),
        quantize(F.expr(_dup_frac_spark("c32")), 4).alias("dup_para_frac"),
        quantize(F.expr(_top_bigram_count_spark("bg"))
                 / F.greatest(F.expr("size(bg)"), F.lit(1)), 4)
        .alias("top_bigram_share"),
    )


@register(
    "pipeline_training_corpus",
    f"""
    WITH corpus0 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 500000 AS doc_id, text FROM documents
      WHERE doc_id % 13 = 0),
    corpus1 AS (
      -- '||' (propagates NULL like Spark concat), never concat()
      SELECT doc_id,
             text || (CASE WHEN doc_id % 21 = 0
                           THEN repeat(' spam', 40) ELSE '' END) AS text
      FROM corpus0),
    injected AS (
      -- PII keyed on length(text), not doc_id: duplicate copies carry the
      -- same text → same injected PII → masking keeps them byte-identical,
      -- so the downstream exact-dedup still collapses them
      SELECT doc_id, {inject_textkeyed_sql("text")} AS t FROM corpus1),
    corpus AS (
      SELECT doc_id, ({count_sql("t")}) AS n_pii,
             {mask_sql("t")} AS text
      FROM injected),
    scored AS (
      SELECT doc_id, text, n_pii,
             len(string_split(text, ' ')) AS n_tokens,
             {_stop_ratio_sql("string_split(text, ' ')")} AS stop_ratio,
             {_lang_sql("text")} AS lang,
             {_dup_frac_duck(_chunks_duck("string_split(text, ' ')", _REP_LINE_W))}
               AS dup_line_frac,
             {_top_bigram_count_duck(_bigrams_duck("string_split(text, ' ')"))}
               * 1.0 / greatest(len({_bigrams_duck("string_split(text, ' ')")}), 1)
               AS top_bigram_share
      FROM corpus),
    filtered AS (
      SELECT * FROM scored
      WHERE lang <> 'und' AND n_tokens >= 5 AND stop_ratio >= 0.05
        AND dup_line_frac < 0.3 AND top_bigram_share < 0.2),
    deduped AS (
      SELECT md5(text) AS h, min(doc_id) AS keep_id,
             count(*) AS n_copies,
             min(n_tokens) AS n_tokens, min(lang) AS lang,
             min(n_pii) AS n_pii
      FROM filtered GROUP BY md5(text))
    SELECT lang,
           count(*) AS n_docs,
           -- BIGINT casts: DuckDB integer sum() yields HUGEINT → Arrow
           -- decimal128(38,0) → driver hash mismatch vs Spark's long
           CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dups_removed,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_pii) AS BIGINT) AS total_pii_masked,
           {q_sql('sum(n_tokens) * 1.0 / count(*)', 2)} AS avg_tokens
    FROM deduped GROUP BY lang
    """,
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation: ingest (with injected exact
    duplicates) → language ID → quality filter (token count, stopword
    ratio) → exact dedup keeping the lowest doc_id → per-language corpus
    stats. Demonstrates that the §beyond-reference operators COMPOSE as one
    Catalyst plan: every step is a pure column expression, the only
    shuffles are the dedup groupBy(md5) and the final stats agg, and both
    aggregate map-side first (partial agg). At 100 TB the dedup groupBy
    shuffles only (hash, doc_id, n_tokens, lang, n_pii) — never the text.

    Round 4 adds the Gopher repetition stage to the filter (duplicate-line
    fraction < 0.3, top-2-gram share < 0.2 — Rae et al. 2021 §A1.1), with a
    deterministic spam injection (doc_id % 21) so the filter demonstrably
    removes documents on the synthetic corpus. The thresholds compare RAW
    int-ratio doubles — exact on both engines, no quantize hop needed.

    Round 5 composes the PII scrub (operators/pii.py) in as a real pipeline
    stage ahead of scoring: inject → count → mask, keyed on length(text) so
    injected exact-duplicate copies stay byte-identical after masking and
    the dedup invariant survives; `total_pii_masked` in the output proves
    the stage ran on both engines."""
    base = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus0 = base.unionByName(
        base.where(F.col("doc_id") % 13 == 0)
        .select((F.col("doc_id") + 500000).alias("doc_id"), "text"))
    corpus1 = corpus0.select(
        "doc_id",
        F.concat("text",
                 F.when(F.col("doc_id") % 21 == 0,
                        F.expr("repeat(' spam', 40)")).otherwise("")
                 ).alias("text"))
    # PII scrub stage: inject deterministic PII keyed on length(text) —
    # duplicate copies share text → share PII → masked copies stay
    # byte-identical and the exact-dedup below still collapses them — then
    # count (pre-mask) and mask. Pure per-row projections, zero exchanges.
    injected = corpus1.select(
        "doc_id", inject_textkeyed_spark(F.col("text")).alias("t"))
    corpus = injected.select(
        "doc_id", count_col(F.col("t")).alias("n_pii"),
        mask_col(F.col("t")).alias("text"))
    _l = "split(text, ' ')"
    scored = corpus.select(
        "doc_id", "text", "n_pii",
        F.size(F.split("text", " ")).alias("n_tokens"),
        _stop_ratio_expr(_l).alias("stop_ratio"),
        _lang_expr("text").alias("lang"),
        F.expr(_dup_frac_spark(_chunks_spark(_l, _REP_LINE_W)))
        .alias("dup_line_frac"),
        (F.expr(_top_bigram_count_spark(_bigrams_spark(_l)))
         / F.greatest(F.expr(f"size({_bigrams_spark(_l)})"), F.lit(1)))
        .alias("top_bigram_share"),
    )
    filtered = scored.where(
        (F.col("lang") != "und") & (F.col("n_tokens") >= 5)
        & (F.col("stop_ratio") >= 0.05)
        & (F.col("dup_line_frac") < 0.3)
        & (F.col("top_bigram_share") < 0.2))
    deduped = (
        filtered.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"),
             F.count("*").alias("n_copies"),
             F.min("n_tokens").alias("n_tokens"),
             F.min("lang").alias("lang"),
             F.min("n_pii").alias("n_pii"))
    )
    return (
        deduped.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             (F.sum("n_copies") - F.count("*")).alias("n_dups_removed"),
             F.sum("n_tokens").alias("total_tokens"),
             F.sum("n_pii").alias("total_pii_masked"),
             # NOT F.avg: Spark's Average over ints accumulates in double, so
             # round(avg) is partition-order-dependent (round-1 driver flake).
             # Exact long sum / exact long count = one deterministic division.
             quantize(F.sum("n_tokens") / F.count("*"), 2).alias("avg_tokens"))
    )
