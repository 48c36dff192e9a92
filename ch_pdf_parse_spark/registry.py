"""Operator registry: one entry per implemented SURVEY.md §2 operator.

Each entry pairs a PySpark DataFrame query (run on the driver's parquet tables
at ``sf_dir``) with an equivalent ANSI-SQL oracle that DuckDB executes over the
same files. Column names/aliases match exactly on both sides (driver hashes
values after sorting columns by name).

Cross-engine determinism contracts (each one policed by
tools/adversarial_gate.py, which replays every pair over seeded hostile
tables):

* double sums/averages go through ``exact_sum`` (decimal addends — float
  accumulation order is shuffle-dependent);
* quantized double outputs go through ``quantize``/``q_sql`` (double →
  decimal(38,s) → double), never round(): the engines' round() disagree on
  repr-tie doubles and IEEE -0.0;
* every windowed ORDER BY over nullable keys pins null placement on both
  sides (Spark defaults ASC nulls-first, DuckDB nulls-last);
* empty group-merges pin '' (COALESCE over string_agg/array_to_string);
* division guards are explicit (try_divide ↔ NULLIF) — ANSI Spark raises
  on x/0 while DuckDB yields ±inf.

Extraction-pipeline entries run on the deterministic synthetic interleaved
corpus (fixtures.py) — not SQL-*recomputable*, so their oracles are
golden-parquet SELECTs materialized from the pure-Python oracle
(golden.py / core.extract_document): the driver hash-verifies the flagship
against the same expected rows the pytest goldens pin.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import fixtures

Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
SQL: dict[str, str] = {}
# oracles whose SQL depends on the comparison corpus (e.g. a k-means codebook
# trained on a deterministic sample of it): name -> fn(sf_dir) -> SQL string,
# resolved in oracle_sql() with the same CHPDF_ORACLE_SF_DIR the golden
# oracles use
DYNAMIC_SQL: dict[str, Callable[[str], str]] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        Q[name] = fn
        if sql is not None:
            SQL[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread_scan(df: DataFrame, per_part_bytes: int | None = None) -> DataFrame:
    """Round-robin repartition to the session's default parallelism when the
    source yields FEWER scan partitions than cores.

    Why (round 7, guide §2.5 input skew): the driver's sf tables are each
    ONE parquet file with ONE row group, and a row group is unsplittable —
    so every map-side kernel over them (shingle explode, md5 minhash, LSH
    signatures, cosine scoring) was executing on 1-2 tasks while 30 cores
    idled, regardless of maxPartitionBytes. The guard makes this strictly
    scale-adaptive: a production table (or the 128-file bench fixture)
    already splits at least as wide as the core count, the condition is
    false, and the plan is untouched — this is never a local[N] tuning
    constant. Project BEFORE spreading so the exchange carries only the
    columns the caller kept.

    ``per_part_bytes`` picks the fan-out policy. The default (None) spreads
    to FULL core count whatever the input size — right for feeds whose
    per-byte compute dwarfs exchange overhead (the md5 shingling/minhash
    kernels run ~4 s/MB-compressed single-thread: the 0.6 MB sf0.1
    documents table still wants all 32 cores). Overhead-bound consumers
    pass a bytes-per-partition target instead (similarity's ``_emb`` uses
    64 KiB): a sub-MB table fanned to 32 near-empty partitions pays more
    in exchange/stage overhead than cheap numpy scoring returns (measured:
    sim_ann_ivf_kmeans over the 0.8 MB sf0.1 embeddings, 0.7 s → 1.3 s at
    a fixed 32-way spread; byte-sizing recovers it while keeping full
    fan-out on multi-MB inputs)."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    target = n
    if per_part_bytes:
        try:
            size = int(str(df._jdf.queryExecution().optimizedPlan().stats()
                           .sizeInBytes()))
            # floor: an exchange costs a fixed stage round-trip (~0.5 s
            # here); unless the input can feed at least ~16 partitions at
            # the requested density, cheap per-byte compute cannot repay
            # it (measured: ivf over the 0.65 MB sf0.1 table, 0.78 s
            # unspread vs 1.27 s spread; the 4.9 MB sf1.0 twin, 4.97 s
            # unspread vs 2.56 s spread)
            if size < per_part_bytes * 16:
                return df
            target = max(1, min(n, size // per_part_bytes))
        except Exception:  # noqa: BLE001 — no estimate: full fan-out
            pass
    if target <= df.rdd.getNumPartitions():
        return df
    return df.repartition(target)


def exact_sum(col, scale: int = 6):
    """Order-independent sum of a double column: round each addend to a
    decimal once (deterministic per row), sum exactly, cast back.

    ``round(sum(<double>))`` is partition-order-dependent — the accumulation
    order of float64 addition changes with shuffle layout, so borderline
    values flip the last rounded digit between runs and engines (the round-1
    driver flaked exactly this way on a_session_merge). DuckDB twin:
    ``exact_sum_sql`` — the addend cast must hop through VARCHAR, NOT
    ``value::DECIMAL``, for the same repr-tie reason as ``q_sql``.

    Precision 38 (not 18) so the addend ceiling is |v| < 10^32: under ANSI
    mode (Spark 4 default) a double that exceeds the decimal's range raises
    on BOTH engines at the same boundary, and 18 digits made that boundary a
    plausible 10^12. NaN/Inf likewise raise on both engines — loud and
    consistent, never a silent one-engine NULL-skip.
    """
    return F.sum(F.col(col).cast(f"decimal(38,{scale})")).cast("double")


def quantize(col, scale: int = 4):
    """Cross-engine deterministic replacement for ``round(<double>, s)``:
    double → decimal(38,s) → double. SPARK's double→decimal cast rounds the
    value's shortest decimal repr HALF_UP (BigDecimal.valueOf); both engine
    round() functions AND DuckDB's double→decimal cast instead round the
    BINARY value — 135.795 / 2970.77545 (binary just below the tie) come out
    one ulp lower — and DuckDB's round() also preserves IEEE -0.0 where the
    decimal hop normalizes it. So the DuckDB twin ``q_sql`` must hop through
    VARCHAR (its double→VARCHAR emits the same shortest repr, and its
    VARCHAR→decimal parse rounds HALF_UP), which reproduces Spark
    bit-for-bit. Do NOT substitute a decimal→decimal rescale either:
    DuckDB truncates those instead of rounding (tools/adversarial_gate.py)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double").cast(f"decimal(38,{scale})").cast("double")


def _tiny_clamp(expr: str, scale: int, then: str, else_: str) -> str:
    """Guard for a DuckDB VARCHAR→DECIMAL parser defect (gate seed 197):
    exponent-form strings whose VALUE is far below the target scale's tie
    are rounded by the MANTISSA's first digit — '9.9e-9' AS DECIMAL(38,4)
    yields 0.0001 where the correct HALF_UP result is 0.0000 (and Spark's
    BigDecimal correctly gives 0). Every double strictly inside
    (|v| < 0.5·10^-scale) rounds to zero on a correct engine, so that
    region short-circuits to literal zero; everything at or above the tie
    keeps the proven VARCHAR hop (whose shortest-repr HALF_UP behavior
    matches Spark bit-for-bit — see q_sql). NULL/NaN/Inf fall through to
    the hop unchanged (abs(NULL) is NULL → CASE else; NaN/Inf raise on
    both engines as before)."""
    return (f"(CASE WHEN abs(CAST(({expr}) AS DOUBLE)) < 0.5e-{scale} "
            f"THEN {then} ELSE {else_} END)")


def dec_sql(expr: str, scale: int = 6) -> str:
    """DuckDB twin of Spark's ``cast(<double> as decimal(38,s))`` for oracle
    SQL — via VARCHAR for the repr-HALF_UP tie behavior (see quantize),
    with the sub-tie region clamped to zero (_tiny_clamp)."""
    return _tiny_clamp(
        expr, scale,
        f"CAST(0.0 AS DECIMAL(38,{scale}))",
        f"CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,{scale}))")


def exact_sum_sql(expr: str, scale: int = 6) -> str:
    """DuckDB twin of ``exact_sum``: per-addend decimal rounding (VARCHAR
    hop), exact decimal sum, cast back to double."""
    return f"CAST(sum({dec_sql(expr, scale)}) AS DOUBLE)"


def q_sql(expr: str, scale: int = 4) -> str:
    """DuckDB twin of quantize() for oracle SQL strings.

    The hop is double → VARCHAR → decimal → double, NOT double → decimal:
    Spark's double→decimal cast rounds the value's SHORTEST DECIMAL REPR
    HALF_UP (BigDecimal.valueOf), but DuckDB's double→decimal cast rounds the
    BINARY value — on a repr-tie double like 2970.77545 (binary just below
    the tie) they disagree by one ulp at the target scale (found by
    tools/adversarial_gate.py seed 31). DuckDB's double→VARCHAR emits the
    same shortest repr and its VARCHAR→decimal parse rounds HALF_UP, so the
    string hop reproduces Spark bit-for-bit, including -0.0 normalization —
    EXCEPT for exponent-form reprs far below the tie, where DuckDB's parser
    rounds by mantissa digit; that region is clamped to zero by
    _tiny_clamp (gate seed 197)."""
    return _tiny_clamp(
        expr, scale,
        "CAST(0.0 AS DOUBLE)",
        f"CAST(CAST(CAST(CAST(({expr}) AS DOUBLE) AS VARCHAR) "
        f"AS DECIMAL(38,{scale})) AS DOUBLE)")


def _sf_of_dir(sf_dir: str) -> float:
    """Scale factor encoded in a driver dir's basename.

    Only an explicit sf<N> basename selects a scale; anything else (a seed
    dir, a temp path) gets the standard test scale — a bare numeric tag
    once parsed as scale 21 and generated a 1.4 GB fixture corpus."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    if tag.startswith("sf"):
        try:
            return float(tag[2:])
        except ValueError:
            pass
    return 0.01


def fixture_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic interleaved-documents corpus scaled like sf_dir.

    Generated once per scale (cached parquet); content is a pure function of
    (sf, seed=42) — BASELINE.json: 'synthesise it deterministically at small
    scale for tests and benchmarks; no external data'.
    """
    out = fixtures.write_corpus(_sf_of_dir(sf_dir),
                                base="/tmp/ch_pdf_parse_fixtures")
    return spark.read.parquet(os.path.join(out, "documents.parquet"))


# ---------------------------------------------------------------------------
# extraction pipeline (flagship; rows-only driver check, golden-tested in CI)
# ---------------------------------------------------------------------------


@register("extract_spans")
def extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full per-document extraction (SURVEY.md §3.1 lifecycle).

    Output spans reproduce core.extract_document (span-sequence equality
    (kind, text, media_ref, order) — BASELINE.json invariant). Spans-only
    projection pushed through the UDF barrier: markdown strings are never
    built or Arrow-shipped for this consumer (pipeline.extract_documents
    ``columns``)."""
    from .pipeline import extract_documents

    out = extract_documents(fixture_docs(spark, sf_dir), columns=("spans",))
    return out.select(
        "doc_id",
        F.posexplode("spans").alias("pos", "s"),
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("ord"),
    )


@register("extract_spans_relational")
def extract_spans_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship semantics via the pure-relational pipeline (Catalyst-visible
    windows/joins/folds) — differential twin of extract_spans."""
    from .relational import extract_documents_relational

    out = extract_documents_relational(fixture_docs(spark, sf_dir))
    return out.select("doc_id", F.posexplode("spans").alias("pos", "s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("ord"),
    )


@register("extract_markdown")
def extract_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-document markdown fold (A3/A4, predict/pdf2markdown.py:549-683).
    Markdown-only projection through the UDF barrier — span arrays are never
    built or shipped for this consumer."""
    from .pipeline import extract_documents

    return extract_documents(fixture_docs(spark, sf_dir),
                             columns=("markdown",)).select(
        "doc_id", F.md5("markdown").alias("md_hash"), F.length("markdown").alias("md_len")
    )


# ---------------------------------------------------------------------------
# relational operator demos on the driver tables, with DuckDB oracle twins
# ---------------------------------------------------------------------------


@register(
    "p_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount < 0.05
    """,
)
def p_filter_project(spark, sf_dir):
    """P1/P2 + Q2: predicate + projection pushed into the parquet scan
    (SURVEY.md §2.2; reference filters predict/pdf2markdown.py:290-292)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


@register(
    "p_bbox_order",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_extendedprice * (1024.0 / NULLIF(GREATEST(l_quantity, l_tax * 100), 0) - 0.00001)) AS BIGINT) AS norm_px,
           GREATEST(l_quantity, 1.0 + 5.0) AS fixed_x2,
           300 - ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber NULLS FIRST,
                                             l_extendedprice NULLS FIRST,
                                             l_quantity NULLS FIRST,
                                             l_tax NULLS FIRST)
             AS order_score
    FROM lineitem
    """,
)
def p_bbox_order(spark, sf_dir):
    """P5/P6: bbox sanitize + normalize-to-1024 arithmetic
    (predict/ppocr_server.py:98-101; predict/pdf2markdown.py:240-248), plus
    O3's reversed order labels order_id = 300 - i
    (train/preprocess.py:580-581 — why bigger score means earlier in the
    reading-order sort O1) as one multi-column registration over the same
    (l_orderkey, l_linenumber) grain (round-5 roster consolidation).

    A zero page side is NULL on both engines (Spark ``try_divide`` ↔ DuckDB
    ``NULLIF`` divisor): under ANSI Spark raises on x/0 while DuckDB yields
    ±inf — an explicit contract replaces two different failure modes
    (tools/adversarial_gate.py). NULLS FIRST pinned on the window order
    keys: Spark's bare ASC is nulls-first, DuckDB's is nulls-last (gate
    seed 31). The order extends past l_linenumber to (extendedprice,
    quantity, tax): the corpus has duplicate line numbers per order, and
    with norm_px now in the SAME row the tie assignment is output-visible —
    the ordering must be total over every column the row carries (the old
    standalone o_order_reversal could leave ties arbitrary because its tied
    output rows were identical)."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy(
        F.asc_nulls_first("l_linenumber"),
        F.asc_nulls_first("l_extendedprice"),
        F.asc_nulls_first("l_quantity"),
        F.asc_nulls_first("l_tax"))
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(
            F.col("l_extendedprice")
            * (F.try_divide(F.lit(1024.0),
                            F.greatest("l_quantity", F.col("l_tax") * 100))
               - 0.00001)
        ).cast("bigint").alias("norm_px"),
        F.greatest(F.col("l_quantity"), F.lit(1.0) + 5.0).alias("fixed_x2"),
        (F.lit(300) - F.row_number().over(w)).cast("long")
        .alias("order_score"),
    )


@register(
    "p_bucket_coalesce",
    """
    SELECT o_orderkey,
           CASE WHEN o_custkey % 20 = 0 THEN 0
                ELSE (19 * (o_orderkey % 7)) // ((o_custkey % 20)) END AS page_pos,
           COALESCE(NULLIF(o_orderpriority, '1-URGENT'), o_orderstatus) AS effective
    FROM orders
    """,
)
def p_bucket_coalesce(spark, sf_dir):
    """P7 page-position bucketing 19*i // (total-1)
    (predict/pdf2markdown.py:212-215) AND P9 structure_function ←
    region_type defaulting = coalesce (:226-227), as one multi-column
    projection over orders (round-5 roster consolidation, text_profile
    precedent: the hash check covers every column, so both §2 rows keep a
    driver correctness row at the cost of one slot)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 20 == 0, F.lit(0))
        .otherwise(
            F.expr("(19 * (o_orderkey % 7)) div (o_custkey % 20)")
        )
        .cast("long")
        .alias("page_pos"),
        F.coalesce(F.nullif("o_orderpriority", F.lit("1-URGENT")),
                   "o_orderstatus").alias("effective"),
    )


@register(
    "a_window_cumsum",
    f"""
    SELECT event_id, user_id,
           {q_sql(f'''CAST(SUM({dec_sql("value")})
                 OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)''')}
             AS running_value
    FROM events
    """,
)
def a_window_cumsum(spark, sf_dir):
    """A6: running prefix-sum window (the current_position accumulator,
    predict/pdf2markdown.py:259-286).

    NULLS FIRST is pinned on both engines: Spark defaults ASC to nulls-first
    but DuckDB to nulls-last, so an unpinned nullable order key silently
    reorders the prefix between engines (found by tools/adversarial_gate.py).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_first("ts"), F.asc_nulls_first("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # decimal addends: DuckDB evaluates windowed sums with a segment tree, so
    # even an ORDER BY-pinned frame does not pin float accumulation order
    return _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        quantize(F.sum(F.col("value").cast("decimal(38,6)")).over(w)
                 .cast("double"), 4).alias("running_value"),
    )


@register(
    "j_positional_join",
    """
    WITH s AS (SELECT s_nationkey AS nk, s_name,
                      ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn
               FROM supplier),
         c AS (SELECT c_nationkey AS nk, c_name,
                      ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
               FROM customer)
    SELECT s.nk AS nationkey, s.rn AS rn, s.s_name,
           COALESCE(c.c_name, '未找到题注') AS matched
    FROM s LEFT JOIN c ON s.nk = c.nk AND s.rn = c.rn
    """,
)
def j_positional_join(spark, sf_dir):
    """J1/O2: positional (row_number) equi-join with unmatched sentinel — the
    caption↔media greedy-by-index pairing (predict/pdf2markdown.py:64-150;
    the distance ranking at :107-110 is dead code)."""
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk"),
        "s_name",
        F.row_number().over(Window.partitionBy("s_nationkey").orderBy("s_suppkey")).alias("rn"),
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        "c_name",
        F.row_number().over(Window.partitionBy("c_nationkey").orderBy("c_custkey")).alias("rn"),
    )
    return (
        s.join(c, ["nk", "rn"], "left")
        .select(
            F.col("nk").alias("nationkey"),
            "rn",
            "s_name",
            F.coalesce("c_name", F.lit("未找到题注")).alias("matched"),
        )
    )


@register(
    "o_top1_per_group",
    f"""
    SELECT l_orderkey, l_linenumber, {q_sql('l_extendedprice', 2)} AS price
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC NULLS LAST,
                                         l_linenumber NULLS FIRST) AS rk
      FROM lineitem
    ) WHERE rk = 1
    """,
)
def o_top1_per_group(spark, sf_dir):
    """O2: deterministic top-1 per group (caption greedy rank consumes only
    ranklist[0], predict/pdf2markdown.py:111-114).

    Cross-engine pins (tools/adversarial_gate.py): null order is explicit on
    both engines (Spark and DuckDB disagree on ASC defaults); the output
    price is quantized through decimal (see registry.quantize) because the
    two engines' round() disagree on repr-tie doubles and on IEEE -0.0.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc_nulls_last("l_extendedprice"), F.asc_nulls_first("l_linenumber"))
    return (
        _t(spark, sf_dir, "lineitem")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("l_orderkey", "l_linenumber",
                quantize("l_extendedprice", 2).alias("price"))
    )


@register(
    "m_when_ladder",
    """
    SELECT doc_id,
           CASE WHEN text LIKE 'key %' THEN 'keyword'
                WHEN text LIKE '%spark%' THEN 'spark'
                WHEN n_chars < 120 THEN 'short'
                WHEN n_chars > 320 THEN 'long'
                ELSE 'text' END AS kind
    FROM documents
    """,
)
def m_when_ladder(spark, sf_dir):
    """M1 surrogate: segment-type classification as a when() ladder
    (decode ladder predict/pdf2markdown.py:391-505)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("text").like("key %"), "keyword")
        .when(F.col("text").like("%spark%"), "spark")
        .when(F.col("n_chars") < 120, "short")
        .when(F.col("n_chars") > 320, "long")
        .otherwise("text")
        .alias("kind"),
    )


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy keeping the lowest doc_id (training-data
    pipeline op; map-side partial agg, no skew)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_operator_modules()
    return dict(Q)


def oracle_sql() -> dict[str, str]:
    """All oracle SQL, including the golden-parquet oracles for the queries
    whose semantics SQL cannot recompute (XY-cut extraction, decode-stub
    features): those return the expected rows from deterministic parquet
    materialized by the same pure-Python oracles the pytest goldens trust
    (golden.py). The golden scale follows CHPDF_ORACLE_SF_DIR (the driver
    compares at /root/testdata/sf0.01, the default; tools/check_queries.py
    sets it to whatever sf dir it is run against)."""
    _load_operator_modules()
    out = dict(SQL)
    from . import golden

    sf_dir = os.environ.get("CHPDF_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    # golden/dynamic oracles require materialization (fixture corpus, corpus
    # tables for codebook training) — a failure there must cost only those
    # entries (they degrade to the rows-only check), never the whole oracle
    # surface: check_queries explicitly supports partial table dirs
    # Missing/unreadable table FILES (OSError for absent paths, pyarrow
    # ArrowInvalid for truncated/corrupt parquet) = legitimately partial
    # dirs: degrade those entries to rows-only. A LOGIC regression in golden
    # materialization or codebook training must still propagate loudly —
    # silently downgrading would let a real cross-engine divergence ship
    # unverified (round-3 code review, twice).
    import pyarrow as pa

    unavailable = (OSError, pa.lib.ArrowInvalid)
    try:
        out.update(golden.golden_sql(_sf_of_dir(sf_dir),
                                     base="/tmp/ch_pdf_parse_fixtures"))
    except unavailable as e:
        import sys

        print(f"warning: golden oracles unavailable: {e}", file=sys.stderr)
    for name, fn in DYNAMIC_SQL.items():
        try:
            out[name] = fn(sf_dir)
        except unavailable as e:
            import sys

            print(f"warning: dynamic oracle {name} unavailable: {e}",
                  file=sys.stderr)
    return out


def _load_operator_modules() -> None:
    """Import operator modules for their @register side effects (deferred to
    avoid import cycles).

    ORDER MATTERS for the driver: its correctness roster covers the first 50
    registered queries (CORRECTNESS_r04 silently dropped registrations 51-53
    — round-4 verdict #1). The registry now holds exactly 50 entries, and as
    defense-in-depth the newest / regression-history modules import FIRST so
    any future overflow drops the oldest, longest-stable demos instead of the
    current round's deliverables. (A module imported as a dependency of an
    earlier one registers with its dependent — e.g. dedup registers during
    text_analysis's import — which is fine: those are the stable core.)"""
    from .operators import (  # noqa: F401
        substring,
        tokenizer,
        cdc,
        asof,
        pii,
        quality_metrics,
        text_analysis,
        multimodal,
        cluster,
        mixing,
        similarity,
        dedup,
        order_metrics,
        relational_ops,
    )
