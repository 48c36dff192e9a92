"""Distributed BPE tokenizer training — the canonical LLM-pipeline step the
inventory was missing: learn byte-pair-encoding merges from the corpus.

Scale shape (how SentencePiece/HF trainers actually run on big corpora, and
the same split as the IVF k-means codebook): the DATA-SCALE stage is a
distributed word histogram — pre-tokenize on spaces, `groupBy(word).count()`
with map-side partial combine (one shuffle whose volume is bounded by
distinct words per partition, Heaps-law ≪ corpus), then a deterministic
top-V cap (ORDER BY count DESC, word — a total order, so the cap is
reproducible) bounds what reaches the driver. The merge LOOP then runs
driver-side over the capped histogram: each BPE iteration is a pure
function of the (word → count) dict, touching V entries, not the corpus —
at 100 TB the histogram agg is the only part that sees the data, exactly
like a real tokenizer-training job. (A naive per-iteration corpus re-scan
would be K full passes; training on the word histogram is the standard
factorization that makes BPE corpus-size-independent after one pass.)

Determinism: merge selection breaks count ties on the lexicographically
smallest pair; the histogram cap's total order is (count DESC, word ASC);
pre-tokenization is a plain single-space split with empties dropped (NULL
text ≡ ''). Integer counts end-to-end — nothing float touches the result.

Oracle: the merge table cannot be recomputed in SQL (it is an iterative
fixpoint — same class as dedup_clusters' recursive CTE, but state-carrying
across iterations), so the oracle is a DYNAMIC one (registry.DYNAMIC_SQL,
k-means precedent): an INDEPENDENT pure-Python pipeline — pyarrow parquet
read → python split/Counter histogram → the shared merge loop — emits the
expected rows as a VALUES literal. The distributed stage (the histogram,
where cross-engine divergence could live) is therefore derived twice from
the raw parquet by unrelated implementations; the merge loop is shared
single-source pure Python (the dHash64/golden precedent).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import DYNAMIC_SQL, register, _t

BPE_TOP_WORDS = 4000   # histogram cap collected to the driver
BPE_MERGES = 40        # merge iterations
_END = "</w>"          # end-of-word marker symbol


def bpe_merges(hist: list[tuple[str, int]], k: int = BPE_MERGES
               ) -> list[tuple[int, str, str, int]]:
    """Classic BPE over a (word, count) histogram: k rounds of merging the
    most frequent adjacent symbol pair (ties → lexicographically smallest
    pair). Returns (rank, left, right, pair_count) rows. Pure function,
    integer-exact — shared by the Spark operator and the oracle."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, count in hist:
        sym = tuple(word) + (_END,)
        vocab[sym] = vocab.get(sym, 0) + count
    merges = []
    for rank in range(k):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, c))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def word_histogram_df(docs: DataFrame, top: int = BPE_TOP_WORDS
                      ) -> DataFrame:
    """The distributed stage as a DataFrame — ONE map-side-combined shuffle
    over words, then the deterministic (count DESC, word ASC) top-V cap.
    Single source of the query: word_histogram collects it, and the plan
    audit / plan-pin test explain THIS builder (not a hand copy that could
    drift from the operator)."""
    words = (
        docs.select(F.explode(F.split(F.coalesce("text", F.lit("")),
                                      " ")).alias("word"))
        .where(F.col("word") != "")
    )
    return (
        words.groupBy("word").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(top)
    )


def word_histogram(docs: DataFrame, top: int = BPE_TOP_WORDS
                   ) -> list[tuple[str, int]]:
    """Capped histogram, collected (only the top-V rows reach the driver)."""
    return [(r.word, r.n) for r in word_histogram_df(docs, top).collect()]


# lhs/rhs, not left/right: LEFT/RIGHT are SQL keywords in DuckDB and the
# oracle emits these as VALUES column aliases
_MERGE_SCHEMA = "merge_rank int, lhs string, rhs string, pair_count long"


@register("tokenizer_bpe_train", None)
def tokenizer_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver registration: learn BPE_MERGES merges from the documents
    table's text (module docstring has the full design)."""
    docs = _t(spark, sf_dir, "documents").select("text")
    hist = word_histogram(docs)
    merges = [(r, a, b, int(c)) for r, a, b, c in bpe_merges(hist)]
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _bpe_oracle_sql(sf_dir: str) -> str:
    """Independent recomputation of the expected merge table from the raw
    parquet (no Spark, no shared histogram code), emitted as a VALUES
    literal for DuckDB."""
    import pyarrow.dataset as ds

    # stream record batches — pq.read_table would hold the whole text
    # column in driver RAM at once (the same full-table-read shape the
    # round-4 verdict flagged on the k-means codebook; review finding)
    counts: Counter = Counter()
    dataset = ds.dataset(f"{sf_dir}/documents.parquet", format="parquet")
    for batch in dataset.to_batches(columns=["text"]):
        for text in batch.column("text").to_pylist():
            for word in (text or "").split(" "):
                if word:
                    counts[word] += 1
    hist = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    hist = hist[:BPE_TOP_WORDS]
    merges = bpe_merges(hist)
    if not merges:
        return ("SELECT CAST(NULL AS INT) AS merge_rank, "
                "CAST(NULL AS VARCHAR) AS lhs, CAST(NULL AS VARCHAR) AS rhs, "
                "CAST(NULL AS BIGINT) AS pair_count WHERE FALSE")
    rows = ", ".join(
        f"({r}, {_q(a)}, {_q(b)}, {c})" for r, a, b, c in merges)
    return (f"SELECT * FROM (VALUES {rows}) "
            f"t(merge_rank, lhs, rhs, pair_count)")


DYNAMIC_SQL["tokenizer_bpe_train"] = _bpe_oracle_sql


# ------------------------------------------------------------------ apply

def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with trained merges: repeatedly merge the
    lowest-rank adjacent symbol pair present (leftmost on rank ties) until
    none applies. Pure function — the Spark encoder and the tests share
    the ranks dict format, not this implementation (tests re-derive the
    encoding with the sequential apply-merges-in-rank-order formulation
    and assert equality; the two are equivalent because a merge at rank r
    can only create pairs involving its new symbol, whose merges are all
    ranked > r)."""
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(docs: DataFrame, merges, text_col: str = "text") -> DataFrame:
    """Distributed BPE apply — the encode half of the tokenizer loop
    (train learns merges from the histogram; this tokenizes the corpus
    with them): adds ``bpe_tokens array<string>`` and ``n_bpe long`` to
    ``docs``.

    ``merges`` is the trainer's output — either its DataFrame
    (merge_rank, lhs, rhs, ...) or an equivalent list of rows.

    Scale shape: the merge table is tiny (rank-capped) and ships to
    executors inside the UDF closure — no join, no shuffle, the encode
    chains onto the scan (zero Exchange). Python is unavoidable here (an
    iterative per-word fixpoint is not expressible in catalyst
    expressions) so it runs Arrow-batched with a per-batch word→encoding
    cache: under Zipf token frequencies the loop body executes roughly
    once per DISTINCT word per batch, not once per token. NULL text ≡ ''
    (the trainer's convention) → empty token array."""
    from ..packaging import ensure_on_executors

    # the UDF closure references bpe_encode_word from this module — ship
    # the package to Python workers (idempotent; no-op under --py-files)
    ensure_on_executors(docs.sparkSession)
    if isinstance(merges, DataFrame):
        merges = merges.select("merge_rank", "lhs", "rhs").collect()

    def _field(row, name, pos):
        # read by NAME when the row exposes fields (Row / namedtuple /
        # mapping) — a caller passing rows collected with a different
        # column order must not get a silently wrong ranks dict; plain
        # tuples fall back to the documented (merge_rank, lhs, rhs) layout
        try:
            return row[name]
        except (TypeError, KeyError, IndexError):
            pass
        if hasattr(row, name):
            return getattr(row, name)
        return row[pos]

    ranks = {(_field(m, "lhs", 1), _field(m, "rhs", 2)):
             _field(m, "merge_rank", 0) for m in merges}

    @F.pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_text(text) -> list[str]:
            out: list[str] = []
            for word in (text or "").split(" "):
                if not word:
                    continue
                got = cache.get(word)
                if got is None:
                    got = cache[word] = bpe_encode_word(word, ranks)
                out.extend(got)
            return out

        return texts.map(enc_text)

    return docs.withColumn("bpe_tokens", _enc(F.col(text_col))).withColumn(
        "n_bpe", F.size("bpe_tokens").cast("long"))
