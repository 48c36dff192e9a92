"""PII detection + redaction over the documents corpus.

The one classic training-data-pipeline stage the engine did not yet expose
as a driver query (round 5): before text reaches a training corpus, emails /
phone numbers / IP addresses / national-id patterns must be found, counted
(for filtering and reporting), and masked in place. The reference app never
redacts (it extracts from published PDFs), so this is a beyond-reference
operator in the same family as dedup/decontaminate — first-class, with a
DuckDB oracle.

Shape and scale story: pure per-row column expressions (regexp_extract_all
for counts, chained regexp_replace for masking) — zero exchanges, whole-stage
codegen, embarrassingly parallel at 10^12 rows. No UDF: Spark's JVM regex
kernels run at scan speed and the masked text never shuffles.

Cross-engine determinism: the corpus is synthetic word-salad with no organic
PII, so deterministic PII is injected per doc_id on BOTH engines (the
m4_citations / text_main_content injection pattern) and then detected and
stripped back out — the oracle hash therefore checks real detection work.
Patterns are ASCII-only character classes (no \\d, no \\w shorthands beyond
[0-9]; no Unicode classes), the subset where Java regex and DuckDB's RE2
agree exactly; DuckDB regexp_replace needs the explicit 'g' flag to match
Spark's replace-all default. Injected fragments are gated by CASE WHEN
doc_id % k = 0 with an ELSE '' — a NULL doc_id disables every fragment
identically on both engines (NULL % k is NULL, CASE falls to ELSE) instead
of NULL-propagating through concat, whose NULL handling differs between the
engines.

Masking order is pinned (email → phone → ip → ssn) and the replacement
tokens contain no digits or '@', so earlier redactions can never create or
destroy later matches; counts are computed on the pre-redaction body, where
the injected classes never overlap by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register, _t

# ASCII-only, Java-regex/RE2-identical patterns
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
IP_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
SSN_RE = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

# (pattern, mask) in pinned application order
PII_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "[EMAIL]"),
    (PHONE_RE, "[PHONE]"),
    (IP_RE, "[IP]"),
    (SSN_RE, "[SSN]"),
]


def _inject_spark(d: DataFrame) -> DataFrame:
    """documents → (doc_id, body) with deterministic per-doc PII appended."""
    did = F.col("doc_id")

    def frag(mod: int, *parts):
        return F.when(did % mod == 0, F.concat(*parts)).otherwise(F.lit(""))

    s = lambda x: x.cast("string")  # noqa: E731
    body = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        frag(3, F.lit(" Contact user"), s(did % 100), F.lit("@mail"),
             s(did % 7), F.lit(".example.com now.")),
        frag(2, F.lit(" Served from 10."), s(did % 256), F.lit("."),
             s(did % 100), F.lit("."), s(did % 50), F.lit(".")),
        frag(5, F.lit(" Call +1-555-"),
             F.lpad(s(did % 10000), 4, "0"),
             F.lit(" or id "), s(did % 900 + 100), F.lit("-"),
             s(did % 90 + 10), F.lit("-"), s(did % 9000 + 1000), F.lit(".")),
    )
    return d.select("doc_id", body.alias("body"))


# textually-parallel DuckDB injection ('||' would NULL-propagate like Spark's
# concat, but the CASE/ELSE '' gating makes propagation moot on both sides)
_INJECT_DUCK = """
    SELECT doc_id,
           coalesce(text, '')
           || CASE WHEN doc_id % 3 = 0
                   THEN ' Contact user' || (doc_id % 100) || '@mail'
                        || (doc_id % 7) || '.example.com now.'
                   ELSE '' END
           || CASE WHEN doc_id % 2 = 0
                   THEN ' Served from 10.' || (doc_id % 256) || '.'
                        || (doc_id % 100) || '.' || (doc_id % 50) || '.'
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                   THEN ' Call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                        || ' or id ' || (doc_id % 900 + 100) || '-'
                        || (doc_id % 90 + 10) || '-'
                        || (doc_id % 9000 + 1000) || '.'
                   ELSE '' END AS body
    FROM documents
"""


def mask_col(c: F.Column) -> F.Column:
    """Chained regexp_replace over every PII rule, in pinned order."""
    for pat, mask in PII_RULES:
        c = F.regexp_replace(c, F.lit(pat), F.lit(mask))
    return c


def count_col(c: F.Column) -> F.Column:
    """Total PII matches (all classes) in a string column."""
    out = None
    for pat, _ in PII_RULES:
        n = F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        out = n if out is None else out + n
    return out


def mask_sql(expr: str) -> str:
    """DuckDB twin of mask_col ('g' flag: match Spark's replace-all)."""
    for pat, mask in PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{mask}', 'g')"
    return expr


def count_sql(expr: str) -> str:
    """DuckDB twin of count_col (expr should be a plain column reference —
    it is repeated once per rule)."""
    return " + ".join(f"len(regexp_extract_all({expr}, '{pat}'))"
                      for pat, _ in PII_RULES)


def inject_textkeyed_spark(text_col: F.Column) -> F.Column:
    """PII injection keyed on length(text) instead of doc_id — for
    pipelines where injected EXACT-DUPLICATE copies of a document (which get
    new doc_ids) must keep receiving identical PII, so that masking them
    yields identical text and the downstream exact-dedup still collapses
    them (pipeline_training_corpus). NULL text NULL-propagates like the
    surrounding pipeline's concat stages."""
    key = F.length(text_col)

    def s(x):
        return F.coalesce(x.cast("string"), F.lit(""))

    def frag(mod: int, *parts):
        return F.when(key % mod == 0, F.concat(*parts)).otherwise(F.lit(""))

    return F.concat(
        text_col,
        frag(3, F.lit(" Contact user"), s(key % 100), F.lit("@mail"),
             s(key % 7), F.lit(".example.com now.")),
        frag(2, F.lit(" Served from 10."), s(key % 256), F.lit("."),
             s(key % 100), F.lit("."), s(key % 50), F.lit(".")),
        frag(5, F.lit(" Call +1-555-"), F.lpad(s(key % 10000), 4, "0"),
             F.lit(" or id "), s(key % 900 + 100), F.lit("-"),
             s(key % 90 + 10), F.lit("-"), s(key % 9000 + 1000), F.lit(".")),
    )


def inject_textkeyed_sql(expr: str) -> str:
    """DuckDB twin of inject_textkeyed_spark over a text column reference."""
    k = f"length({expr})"
    return f"""{expr}
        || CASE WHEN {k} % 3 = 0
                THEN ' Contact user' || ({k} % 100) || '@mail'
                     || ({k} % 7) || '.example.com now.'
                ELSE '' END
        || CASE WHEN {k} % 2 = 0
                THEN ' Served from 10.' || ({k} % 256) || '.'
                     || ({k} % 100) || '.' || ({k} % 50) || '.'
                ELSE '' END
        || CASE WHEN {k} % 5 = 0
                THEN ' Call +1-555-' || lpad(({k} % 10000)::VARCHAR, 4, '0')
                     || ' or id ' || ({k} % 900 + 100) || '-'
                     || ({k} % 90 + 10) || '-' || ({k} % 9000 + 1000) || '.'
                ELSE '' END"""


def scrub_pii(body: DataFrame) -> DataFrame:
    """(doc_id, body) → counts per PII class + fully masked text."""
    # cast('long'): DuckDB's len() is BIGINT while F.size is INT — same
    # int-width convention as text_profile's token counts
    counts = [
        F.size(F.regexp_extract_all("body", F.lit(pat), F.lit(0)))
        .cast("long").alias(f"n_{name}")
        for pat, name in ((EMAIL_RE, "email"), (PHONE_RE, "phone"),
                          (IP_RE, "ip"), (SSN_RE, "ssn"))
    ]
    out = body.select("doc_id", *counts,
                      mask_col(F.col("body")).alias("clean_text"))
    total = (F.col("n_email") + F.col("n_phone")
             + F.col("n_ip") + F.col("n_ssn"))
    return out.select(
        "doc_id", "n_email", "n_phone", "n_ip", "n_ssn",
        total.alias("n_pii"), (total == 0).alias("pii_free"), "clean_text")


@register(
    "pipeline_pii_scrub",
    f"""
    WITH body AS ({_INJECT_DUCK}),
         scrubbed AS (
           SELECT doc_id,
                  len(regexp_extract_all(body, '{EMAIL_RE}')) AS n_email,
                  len(regexp_extract_all(body, '{PHONE_RE}')) AS n_phone,
                  len(regexp_extract_all(body, '{IP_RE}')) AS n_ip,
                  len(regexp_extract_all(body, '{SSN_RE}')) AS n_ssn,
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(body, '{EMAIL_RE}', '[EMAIL]', 'g'),
                        '{PHONE_RE}', '[PHONE]', 'g'),
                      '{IP_RE}', '[IP]', 'g'),
                    '{SSN_RE}', '[SSN]', 'g') AS clean_text
           FROM body)
    SELECT doc_id, n_email, n_phone, n_ip, n_ssn,
           (n_email + n_phone + n_ip + n_ssn) AS n_pii,
           (n_email + n_phone + n_ip + n_ssn) = 0 AS pii_free,
           clean_text
    FROM scrubbed
    """,
)
def pipeline_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents: inject deterministic PII (module docstring),
    then detect, count, and mask every class. Zero-exchange map plan."""
    from ..registry import spread_scan

    return scrub_pii(_inject_spark(
        spread_scan(_t(spark, sf_dir, "documents").select("doc_id", "text"))))
