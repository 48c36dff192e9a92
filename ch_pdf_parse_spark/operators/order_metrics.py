"""Reading-order quality metrics and the pairwise-ranking order variant.

The reference evaluates its reading-order head with rank-correlation metrics
(Spearman/Kendall-tau imports in /root/reference/train/train_main.py:34-37 —
the eval module itself is absent upstream) and ships a pairwise-comparison
ranking head as an alternative to direct order scores
(/root/reference/train/layoutlmv3_modeling.py:1804-1877). Both are pure
window/join/agg math here:

* ``rank_correlation`` — per-group Spearman rho + Kendall tau between two
  orderings. All intermediates are exact integers (rank differences, pair
  concordance counts); the only floats are two final single divisions, so the
  result is bit-deterministic across engines and shuffle layouts.
* ``m3b_pairwise_rank`` — reading order derived from pairwise wins (item i's
  score = #opponents it precedes), verified against the DIRECT row_number
  ranking: its DuckDB oracle is o_order_reversal's window expression, so the
  driver hash proves the two formulations agree row-for-row.

Scale: both self-joins are within-group (equi-key on the group column) and
group sizes are bounded (segments per page / lineitems per order), so the
O(n²) pair expansion is per-group constant work — the shuffle is one hash
exchange on the group key, same as any groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import q_sql, quantize, register, _t


def rank_correlation(df: DataFrame, group: str, x: str, y: str,
                     tiebreak: str) -> DataFrame:
    """Per-group Spearman rho and Kendall tau between the orderings induced
    by ``x`` and ``y`` (ties broken deterministically by ``tiebreak``, so
    both rankings are strict permutations).

    rho = 1 - 6·Σd²/(n(n²-1)); tau = 2(C-D)/(n(n-1)). Groups with n < 2 get
    NULL metrics (both denominators are 0 — correlation is undefined).

    Determinism under duplicate rows: both rankings tie-break on one shared
    strict row id (``rid``). Breaking each sort's ties independently would
    let two rows tied in x but not y swap (rx, ry) pairings between engines
    and shuffle layouts, silently changing Σd².
    """
    base = df.select(
        F.col(group).alias("g"), F.col(x).alias("x"), F.col(y).alias("y"),
        F.col(tiebreak).alias("tb"),
    ).withColumn("rid", F.row_number().over(
        # nulls-first pinned explicitly on both engines (Spark's ASC default,
        # but DuckDB defaults nulls-last — tools/adversarial_gate.py)
        Window.partitionBy("g").orderBy(F.asc_nulls_first("x"),
                                        F.asc_nulls_first("y"),
                                        F.asc_nulls_first("tb"))))
    wx = Window.partitionBy("g").orderBy(F.asc_nulls_first("x"), "rid")
    wy = Window.partitionBy("g").orderBy(F.asc_nulls_first("y"), "rid")
    r = base.select(
        "g",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    sp = r.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum((F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))).alias("d2"),
    )
    a, b = r.alias("a"), r.alias("b")
    # ordered pairs a.rx < b.rx: concordant iff b.ry > a.ry (no ties — strict
    # permutations), so sum(±1) = C - D in one pass
    kd = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.rx") < F.col("b.rx")))
        .groupBy(F.col("a.g").alias("g"))
        .agg(F.sum(F.when(F.col("b.ry") > F.col("a.ry"), 1).otherwise(-1)).alias("cd"))
    )
    n = F.col("n")
    return (
        sp.join(kd, "g", "left")
        .select(
            F.col("g").alias(group),
            "n",
            # quantize, not round(): engine round()s disagree on repr-tie
            # doubles and IEEE -0.0 (registry.quantize)
            F.when(n >= 2, quantize(
                1.0 - 6.0 * F.col("d2") / (n * (n * n - 1)), 6))
            .alias("spearman_rho"),
            F.when(n >= 2, quantize(
                2.0 * F.col("cd") / (n * (n - 1)), 6))
            .alias("kendall_tau"),
        )
    )


@register(
    "o_rank_correlation",
    f"""
    WITH base AS (
      SELECT l_orderkey AS g, l_extendedprice AS x, l_quantity AS y,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice NULLS FIRST,
                                         l_quantity NULLS FIRST,
                                         l_linenumber NULLS FIRST) AS rid
      FROM lineitem),
    r AS (
      SELECT g,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY x NULLS FIRST, rid) AS rx,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY y NULLS FIRST, rid) AS ry
      FROM base),
    sp AS (SELECT g, count(*) AS n, sum((rx - ry) * (rx - ry)) AS d2
           FROM r GROUP BY g),
    kd AS (SELECT a.g, sum(CASE WHEN b.ry > a.ry THEN 1 ELSE -1 END) AS cd
           FROM r a JOIN r b ON a.g = b.g AND a.rx < b.rx
           GROUP BY a.g),
    d AS (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem),
    pwd AS (SELECT l_orderkey, coalesce(l_linenumber, -1) AS ln,
                   300 - ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                            ORDER BY l_linenumber NULLS FIRST)
                     AS order_score
            FROM d),
    pw AS (SELECT l_orderkey,
                  CAST(sum(order_score * ln) AS BIGINT) AS pw_chk1,
                  CAST(sum(order_score * (ln * ln + 7)) AS BIGINT) AS pw_chk2
           FROM pwd GROUP BY l_orderkey)
    SELECT sp.g AS l_orderkey, sp.n,
           CASE WHEN sp.n >= 2
                THEN {q_sql('1.0 - 6.0 * d2 / (sp.n * (sp.n * sp.n - 1))', 6)}
           END AS spearman_rho,
           CASE WHEN sp.n >= 2
                THEN {q_sql('2.0 * cd / (sp.n * (sp.n - 1))', 6)}
           END AS kendall_tau,
           pw.pw_chk1, pw.pw_chk2
    FROM sp LEFT JOIN kd ON kd.g = sp.g
    LEFT JOIN pw ON pw.l_orderkey = sp.g
    """,
)
def o_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-quality metrics demo: how well does the price ordering agree
    with the quantity ordering within each order — the exact agg the
    reference's eval computes between predicted and gold reading order.

    Round-6 fold (roster slot freed for dedup_substring): the former
    standalone ``m3b_pairwise_rank`` entry rides along as two per-group
    checksum columns — the Spark side computes order_score via the PAIRWISE
    win-count formulation (m3b_pairwise_rank below, unchanged) while the
    oracle computes it via the DIRECT window ranking, so the driver hash
    still proves the two formulations agree (two independent weighted
    moments of the score↔linenumber assignment; any permutation error
    perturbs at least one). Full-grain row-for-row equality stays pinned in
    tests/test_order_metrics.py."""
    rc = rank_correlation(
        _t(spark, sf_dir, "lineitem"),
        "l_orderkey", "l_extendedprice", "l_quantity", "l_linenumber")
    scores = m3b_pairwise_rank(spark, sf_dir)
    ln = F.coalesce(F.col("l_linenumber").cast("long"), F.lit(-1))
    pw = scores.groupBy("l_orderkey").agg(
        F.sum(F.col("order_score") * ln).cast("long").alias("pw_chk1"),
        F.sum(F.col("order_score") * (ln * ln + 7)).cast("long")
        .alias("pw_chk2"))
    # plain-equality left join, matching the oracle's: the NULL-orderkey
    # group keeps NULL checksums on both engines (kd-join precedent above)
    return rc.join(pw, "l_orderkey", "left")


# The DIRECT ranking (o_order_reversal's window expression,
#   300 - ROW_NUMBER() OVER (PARTITION BY l_orderkey
#                            ORDER BY l_linenumber NULLS FIRST)
# over DISTINCT (l_orderkey, l_linenumber)) is this pairwise formulation's
# oracle. Standalone driver entry until round 6; now folded into
# o_rank_correlation's pw_chk columns (aggregated grain, still Spark-pairwise
# vs oracle-direct) — full-grain row-for-row equality stays pinned in
# tests/test_order_metrics.py.
def m3b_pairwise_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3b: the pairwise-comparison ranking variant (SURVEY §2.4;
    layoutlmv3_modeling.py:1804-1877 scores every ordered segment pair and
    ranks by win count). Item i's wins = #j it precedes; rank = n - wins;
    order_score = 300 - rank — computed via within-group self-join + agg
    instead of a direct window, and oracle-checked against the direct form.
    Pairwise win-counting needs a strict comparator, so the demo ranks the
    DISTINCT line numbers of each order (ties would turn wins into rank(),
    not row_number())."""
    base = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber").distinct()
    # A NULL l_linenumber would make both pair predicates three-valued: the
    # null row joins nothing AND every non-null row silently loses its pair
    # against it (one win short per row). Coalesce to a below-range sentinel
    # so the comparator is strict and total, with NULL ranking first — the
    # same order the oracle pins via NULLS FIRST. Output keeps the raw value.
    base = base.withColumn(
        "k", F.coalesce(F.col("l_linenumber").cast("long"), F.lit(-(1 << 62))))
    a, b = base.alias("a"), base.alias("b")
    # eqNullSafe: a NULL l_orderkey is one group to groupBy/window PARTITION
    # BY on both engines, so the pairwise join must also treat it as one
    # group — plain == would leave every NULL-group row pairless (gate seed
    # 31: Spark scored the NULL group n-deep while the oracle ranked it)
    pairs = a.join(
        b, F.col("a.l_orderkey").eqNullSafe(F.col("b.l_orderkey"))
        & (F.col("a.k") != F.col("b.k")), "left")
    wins = pairs.groupBy(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("l_linenumber"),
    ).agg(
        # n==1 groups left-join to null → comparator null → otherwise(0)
        F.sum(F.when(F.col("a.k") < F.col("b.k"), 1)
              .otherwise(0)).alias("wins"))
    n = F.count("*").over(Window.partitionBy("l_orderkey"))
    return wins.select(
        "l_orderkey", "l_linenumber",
        (F.lit(300) - (n - F.col("wins"))).cast("long").alias("order_score"))
