"""Duplicate-cluster resolution: candidate pairs → connected components →
deterministic keeper selection.

Every near-dup detector in this engine (``dedup_minhash_lsh``,
``dedup_simhash``, ``dedup_ngram_jaccard``, ``dedup_embedding_cosine``) emits
candidate PAIRS — but a production dedup must resolve pairs into transitive
CLUSTERS and drop all but one document per cluster (A~B, B~C ⇒ keep one of
three; naïve per-pair dropping over-deletes chains). This module adds that
final stage (round-3 verdict item #1):

* ``resolve_clusters`` — distributed connected components by iterated min-id
  label propagation WITH pointer jumping (label ← label's label each round),
  the hash-to-min family: the pointer-jump doubles the distance a label has
  travelled per round, so convergence is O(log n) rounds for any graph
  (including paths, where plain neighbor-relaxation needs diameter rounds —
  the same reason the alternating large-star/small-star algorithm is
  logarithmic). Each round shuffles only (doc_id, label) int64 pairs plus the
  edge list — document text never enters the loop. Convergence is detected
  by the monotone label-sum invariant (labels only ever decrease, so the
  exact decimal sum strictly decreases until fixpoint), one scalar per round;
  ``max_iters`` (default 48 ≈ doubling headroom for 2^40 nodes) is a loud
  RuntimeError backstop, never a silent truncation. At 100 TB the same loop
  runs with a reliable ``spark.sparkContext.setCheckpointDir`` target instead
  of ``localCheckpoint`` (the lineage-truncation point is identical).

* ``dedup_clusters`` — the driver query: clusters over the UNION of the three
  text detectors' candidate pairs on the shared dup corpus, emitting
  ``(doc_id, cluster_id, is_keeper)`` with the deterministic min-doc_id
  keeper. Oracle: DuckDB recursive CTE (min reachable id per node) over the
  same three detector SQL bodies.

* ``pipeline_neardup_corpus`` — the end-to-end composition: corpus →
  candidate pairs → clusters → keep one doc per cluster → cluster-size
  histogram with kept-token totals (the ``pipeline_training_corpus`` analog
  for NEAR-duplicates; that pipeline's dedup stage is exact-hash only).

Cross-engine determinism is trivial here by design: everything is exact
int64 arithmetic (min over ids), no floats anywhere in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import SQL, register, _t
from .dedup import (
    DUP_CORPUS_SQL,
    _jaccard_sql,
    _minhash_sql,
    _simhash_sql,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_pairs,
    with_dup_corpus,
)

MAX_CC_ITERS = 48


def candidate_pairs_union(corpus: DataFrame,
                          sh: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b) — union of the three text detectors' candidate pairs
    over one shared shingle table (persisted once: Catalyst will not reuse a
    subtree across branches that aggregate it differently, so without the
    persist the scan+explode+distinct would run three times). Pass ``sh`` to
    own the persist/unpersist lifecycle (the registered queries do, so
    repeated bench invocations don't accumulate cached copies)."""
    if sh is None:
        sh = shingles(corpus).persist()
    p_min = lsh_candidate_pairs(minhash_signatures(sh))
    p_sim = simhash_pairs(simhash(sh)).select("doc_a", "doc_b")
    p_jac = ngram_jaccard_pairs(sh).select("doc_a", "doc_b")
    return p_min.unionByName(p_sim).unionByName(p_jac)


def resolve_clusters(nodes: DataFrame, pairs: DataFrame,
                     max_iters: int = MAX_CC_ITERS) -> DataFrame:
    """Connected components over ``pairs`` (doc_a, doc_b) restricted to
    ``nodes`` (doc_id, assumed distinct): returns (doc_id, cluster_id,
    is_keeper) where cluster_id = min doc_id reachable and is_keeper ⇔
    doc_id == cluster_id (deterministic min-id keeper).

    Rounds alternate edge-relaxation (label ← min over neighbors' labels)
    with pointer jumping (label ← label's label); see module docstring for
    the O(log n) convergence argument. Labels are always node ids (induction:
    they start as own id and only ever move to another label), so the
    pointer-jump self-join always finds its parent row. NULL doc_ids can
    never join an edge, keep a NULL label, and emit (NULL, NULL, NULL) —
    identical to the oracle's recursive CTE."""
    # symmetrize in ONE pass over `pairs` (explode of both directions): a
    # union of two selects would plan the candidate-detector subtree TWICE —
    # at sf0.1 that was half of a 54 s edge materialization
    edges = (
        pairs.select(F.explode(F.array(
            F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
            F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
        )).alias("e"))
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    # materialize the edge list ONCE, eagerly: the candidate detectors that
    # produce `pairs` are the expensive part, and a lazy persist would re-run
    # them inside the first loop iteration's (multi-branch) plan
    edges.count()
    labels = nodes.select("doc_id", F.col("doc_id").alias("label"))
    labels = labels.localCheckpoint(eager=False)
    # exact decimal sum: int64 sum could overflow at 10^12 nodes × 10^12 ids.
    # The agg action doubles as the checkpoint materializer — ONE job per
    # round, not checkpoint + agg separately.
    def _sum(df):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _sum(labels)
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .groupBy("dst").agg(F.min("label").alias("nl"))
            .withColumnRenamed("dst", "doc_id")
        )
        relaxed = (
            labels.join(nbr, "doc_id", "left")
            .select("doc_id",
                    F.least("label", F.col("nl")).alias("label"))
        )
        # pointer jump THROUGH THE PREVIOUS labels (already checkpointed):
        # L_new(v) = L_old(relax(v)). If L_old pointers span distance d, relax
        # spans d+1 and the jump composes to 2d+1 — the same doubling
        # recurrence as jumping through relax itself, without planning the
        # relax subtree on both sides of a self-join (which would compute the
        # edge join twice per round unless AQE happened to reuse the stage).
        parent = labels.select(F.col("doc_id").alias("p_id"),
                               F.col("label").alias("p_label"))
        jumped = (
            relaxed.join(parent, relaxed["label"] == parent["p_id"], "left")
            .select("doc_id",
                    F.coalesce("p_label", "label").alias("label"))
        )
        labels = jumped.localCheckpoint(eager=False)
        new_sum = _sum(labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_iters} rounds — "
            "pathological graph or a non-monotone label bug")
    edges.unpersist()
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("is_keeper"),
    )


# F.least skips NULLs like SQL LEAST — but here both operands are only NULL
# together (a NULL doc_id never matches an edge, so nl is NULL too), so the
# semantics are exact. The oracle below mirrors the whole fixpoint with the
# textbook recursive min-reachable-id CTE: walk(id, r) enumerates every
# (node, reachable node) pair with UNION dedup, then min(r) per id — small
# components make this linear-ish; it is an ORACLE, not the scale path.


def _pairs_union_sql() -> str:
    return f"""
      SELECT doc_a, doc_b FROM ({_minhash_sql()})
      UNION
      SELECT doc_a, doc_b FROM ({_simhash_sql()})
      UNION
      SELECT doc_a, doc_b FROM ({_jaccard_sql()})
    """


def _clusters_sql() -> str:
    return f"""
    WITH RECURSIVE
      pairs AS ({_pairs_union_sql()}),
      nodes AS (SELECT DISTINCT doc_id FROM ({DUP_CORPUS_SQL})),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION
                SELECT doc_b AS src, doc_a AS dst FROM pairs),
      walk(id, r) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT e.dst, w.r FROM walk w JOIN edges e ON e.src = w.id
      )
    SELECT id AS doc_id, min(r) AS cluster_id, (id = min(r)) AS is_keeper
    FROM walk GROUP BY id
    """


@register("dedup_clusters", None)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution over the union of the three text
    detectors' candidate pairs (module docstring): (doc_id, cluster_id,
    is_keeper), keeper = min doc_id per connected component."""
    corpus = with_dup_corpus(_t(spark, sf_dir, "documents"))
    nodes = corpus.select("doc_id").distinct()
    sh = shingles(corpus).persist()
    out = resolve_clusters(nodes, candidate_pairs_union(corpus, sh=sh))
    # safe: resolve_clusters returns localCheckpoint-backed labels, which no
    # longer reference the shingle subtree
    sh.unpersist()
    return out


SQL["dedup_clusters"] = _clusters_sql()


@register("pipeline_neardup_corpus", None)
def pipeline_neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup removal: corpus → candidate pairs → connected
    components → keep the min-id doc per cluster → cluster-size histogram
    (n_clusters, docs removed, kept-token totals per cluster size). The
    text column is consumed map-side for token counts and never enters the
    component loop or any exchange wider than (id, count)."""
    corpus = with_dup_corpus(_t(spark, sf_dir, "documents"))
    nodes = corpus.select("doc_id").distinct()
    sh = shingles(corpus).persist()
    clusters = resolve_clusters(nodes, candidate_pairs_union(corpus, sh=sh))
    sh.unpersist()
    tokens = corpus.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    per_cluster = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    keeper_tokens = (
        clusters.where(F.col("is_keeper"))
        .join(tokens, "doc_id")
        .select("cluster_id", "n_tokens")
    )
    return (
        per_cluster.join(keeper_tokens, "cluster_id", "left")
        .groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_clusters"),
            (F.sum("cluster_size") - F.count("*")).cast("long")
            .alias("n_removed"),
            F.sum("n_tokens").cast("long").alias("kept_tokens"),
        )
    )


SQL["pipeline_neardup_corpus"] = f"""
    WITH RECURSIVE
      pairs AS ({_pairs_union_sql()}),
      corpus AS ({DUP_CORPUS_SQL}),
      nodes AS (SELECT DISTINCT doc_id FROM corpus),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION
                SELECT doc_b AS src, doc_a AS dst FROM pairs),
      walk(id, r) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT e.dst, w.r FROM walk w JOIN edges e ON e.src = w.id
      ),
      clusters AS (SELECT id AS doc_id, min(r) AS cluster_id,
                          (id = min(r)) AS is_keeper
                   FROM walk GROUP BY id),
      tokens AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
                 FROM corpus),
      per_cluster AS (SELECT cluster_id, count(*) AS cluster_size
                      FROM clusters GROUP BY cluster_id),
      keeper_tokens AS (SELECT c.cluster_id, t.n_tokens
                        FROM clusters c JOIN tokens t ON t.doc_id = c.doc_id
                        WHERE c.is_keeper)
    SELECT p.cluster_size,
           count(*) AS n_clusters,
           CAST(sum(p.cluster_size) - count(*) AS BIGINT) AS n_removed,
           CAST(sum(k.n_tokens) AS BIGINT) AS kept_tokens
    FROM per_cluster p LEFT JOIN keeper_tokens k
      ON k.cluster_id = p.cluster_id
    GROUP BY p.cluster_size
    """
