"""Adversarial driver gate: replay every Spark↔DuckDB oracle pair on seeded
HOSTILE tables instead of the driver's benign testdata.

The fixed-corpus gate (tools/check_queries.py) proves the two engines agree
on the distribution the driver happens to generate; this tool proves they
agree on the distributions that break engines: NULLs in every nullable
column (including join keys and window order keys), negative and huge
magnitudes, empty/whitespace/unicode text (CJK, emoji, combining marks,
full-width digits, RTL), dangling foreign keys, extreme timestamps, invalid
JSON props, zero-norm and near-threshold embedding vectors.

Same-schema tables are generated deterministically per seed with pyarrow and
written to /tmp/ch_pdf_parse_adv/<seed>/, then tools/check_queries.py runs
its normal comparison over that directory.

Deliberate exclusions (documented engine contracts, not blind spots):

* **No NaN/Inf in double columns** — under ANSI mode (both engines) a
  NaN/Inf addend raises loudly and consistently in the decimal-sum path
  (verified by hand; see registry.exact_sum), so the gate would only be
  timing which engine errors first.
* **|double| < 1e9** — far below the decimal(38) ceiling; both engines
  raise at the same boundary (registry.exact_sum docstring).
* **Embedding sign margins enforced** (|dot(v, plane)| > 1e-3 for all 24
  LSH planes, and IVF rank-1/2, 2/3 dot gaps > 1e-3): the determinism
  contract of operators/similarity.py is a margin argument over the corpus;
  vectors inside float-accumulation distance of a hyperplane are
  nondeterministic BY DESIGN on any engine pair (the production ingest
  analog: re-draw or perturb degenerate vectors). Zero-norm vectors are
  likewise excluded: cosine is undefined there and DuckDB's
  list_cosine_similarity raises while numpy yields NaN.

Usage: python tools/adversarial_gate.py [seed] [query ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

NASTY_TEXT = [
    "", " ", "\t\n  \n", "图1 题注", "表２全角", "[３]引用", "ｆｕｌｌｗｉｄｔｈ",
    "x" * 5, "长" * 2000, "é́combining", "🙂🙂 emoji 🚀",
    "‮RTL‬", "line1\nline2\r\nline3", "tab\tsep", "quote\"'`",
    "NULL", "null", "None", "0", "-1", "1e9", "<p>html</p>", "a,b;c|d",
    "ＡＢＣ ０１２", "ﬁligature", "ß SS", "İstanbul", "𝕞𝕒𝕥𝕙 bold",
    "正文内容" * 50, "References\n[1] x", "参考文献", "###equation",
    # multi-token sentences (>= 5 ws-tokens, stopword-bearing, repeated
    # across docs): without these the shingle-based operators
    # (pipeline_decontaminate, pipeline_training_corpus, dedup_*) return 0
    # rows on every hostile seed and their logic is never exercised
    "the quick 样本 fox jumps over the lazy 数据 dog",
    "shared shingle text of the corpus and the eval set alike",
    "a b c d e f g h a b c d",
    "the the the of of and and in in is is a",
    "tokens with [1] markers and the [2,3] citation of a set",
    # unicode-normalization dimension (round 6): NFC and NFD spellings of
    # the SAME visible string, zero-width/BOM/word-joiner code points inside
    # and between tokens, stacked combining marks, and composed vs
    # decomposed Hangul. Neither engine normalizes (both operate on code
    # points), so shingles/tokens/fingerprints must treat the NFC and NFD
    # twins as DIFFERENT — any divergence means one path (Java regex vs
    # RE2/DuckDB vs Python kernel) normalized or dropped a mark where the
    # others didn't. Multi-token so the shingle operators actually consume
    # them.
    "café au lait the café of the café again",        # NFC
    "café au lait the café of the café again",     # NFD twin
    "zero​width the zero​width split of a token stream",
    "﻿bom led text with the usual stopword filler words here",
    "joined⁠words and ‌non joiner marks in the middle set",
    "á̂̃ stacked marks over the base of the set",
    "한글 composed and the same words repeated here",        # 한글 NFC
    "한글 decomposed and the same "
    "words repeated here",                                           # NFD twin
]

# guard: the NFC/NFD twin pairs above must stay DISTINCT code-point
# sequences (an editor/tool round-trip that re-normalizes source literals
# would silently collapse them and the dimension would test nothing)
import unicodedata as _ud  # noqa: E402

_nfc_cafe = [s for s in NASTY_TEXT if s.startswith("caf")]
assert len(_nfc_cafe) == 2 and _nfc_cafe[0] != _nfc_cafe[1] \
    and _ud.normalize("NFC", _nfc_cafe[1]) == _nfc_cafe[0], \
    "NFD café twin was normalized away"
_hangul = [s for s in NASTY_TEXT if "composed and the same" in s]
assert len(_hangul) == 2 and _hangul[0] != _hangul[1] \
    and _ud.normalize("NFD", _hangul[0]).split()[0] == _hangul[1].split()[0], \
    "NFD Hangul twin was normalized away"
assert any("​" in s for s in NASTY_TEXT), "zero-width literal lost"
assert any("﻿" in s for s in NASTY_TEXT), "BOM literal lost"

LANGS = ["zh", "en", "de", None, "", "zz", "ZH"]
SOURCES = ["crawl", "pdf", "api", None, "", "曝"]
SEGS = ["BUILDING", "AUTOMOBILE", None, "", "房屋", "x"]
STATUS = ["O", "F", "P", None, ""]
FLAGS = ["A", "N", "R", None, ""]
ETYPES = ["click", "view", "purchase", None, "", "点击", "VIEW "]
PROPS = ['{"a": 1}', '{"a": null}', "not json", "", None, "[1,2]", "{}",
         '{"nested": {"k": [1, null, "x"]}}', "{broken", '"str"']


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _pick(rng, pool, n, p_null=0.0):
    idx = rng.integers(0, len(pool), n)
    out = [pool[i] for i in idx]
    if p_null:
        mask = rng.random(n) < p_null
        out = [None if m else v for v, m in zip(out, mask)]
    return out


def _doubles(rng, n, p_null=0.08):
    """Hostile but in-contract doubles: negatives, zeros, tiny, large,
    many-decimal values, and .x5 round-boundary bait."""
    base = rng.choice(
        [0.0, -1.0, 1e-7, -1e-7, 123456789.0, -987654.321, 0.1, 0.30000000000000004],
        size=n,
    )
    noise = rng.normal(0, 1000, n) * (rng.random(n) < 0.5)
    bait = np.round(rng.integers(-10**6, 10**6, n) / 2000.0, 5)  # lots of .xxxx5
    # .xxxxxx5 at 7 decimals: repr-tie at the ADDEND scale (decimal(38,6)) —
    # the class where DuckDB's direct double->decimal cast (binary rounding)
    # diverges from Spark's repr-HALF_UP; exercises exact_sum_sql/dec_sql
    bait6 = np.round(rng.integers(-10**8, 10**8, n) / 2_000_000.0, 7)
    mix = rng.integers(0, 4, n)
    vals = np.where(mix == 0, base,
                    np.where(mix == 1, noise, np.where(mix == 2, bait, bait6)))
    out = [None if x else float(v)
           for v, x in zip(vals, rng.random(n) < p_null)]
    return out


def _ts(rng, n, p_null=0.06):
    """Microsecond timestamps from 1900..2100, plus epoch and exact-second
    values (DuckDB vs Spark sub-second formatting bait)."""
    lo = -2208988800_000_000  # 1900-01-01
    hi = 4102444800_000_000   # 2100-01-01
    us = rng.integers(lo, hi, n)
    us[rng.random(n) < 0.2] //= 1_000_000  # cluster near epoch
    whole = rng.random(n) < 0.33  # whole seconds: sub-second formatting bait
    us = np.where(whole, us // 1_000_000 * 1_000_000, us)
    out = [None if x else int(v) for v, x in zip(us, rng.random(n) < p_null)]
    return pa.array(out, type=pa.timestamp("us"))


def _margin_safe_embeddings(rng, n, dim=64):
    """float32 vectors honoring the similarity determinism contract: non-zero
    norm, |dot| > 1e-3 against all 24 LSH planes, IVF top-3 dot gaps > 1e-3.
    Also injects near-dup pairs (cos ≈ 0.97, away from the 0.95 boundary)."""
    from ch_pdf_parse_spark.operators.similarity import (
        _CENTROIDS_NP, _PLANES_DEDUP_NP)

    out = np.empty((n, dim), dtype=np.float64)
    i = 0
    while i < n:
        v = rng.normal(0, 1, dim)
        v = v / np.linalg.norm(v) * rng.uniform(0.5, 2.0)
        if np.min(np.abs(v @ _PLANES_DEDUP_NP.T)) <= 1e-3:
            continue
        d = np.sort(v @ _CENTROIDS_NP.T)[::-1]
        if d[0] - d[1] <= 1e-3 or d[1] - d[2] <= 1e-3:
            continue
        out[i] = v
        i += 1
    # near-dups: copy + small orthogonal-ish perturbation, re-checked
    for j in range(0, n - 1, 50):
        for _ in range(100):
            v = out[j] + rng.normal(0, 0.08, dim)
            cos = v @ out[j] / (np.linalg.norm(v) * np.linalg.norm(out[j]))
            if (abs(cos - 0.95) > 5e-3
                    and np.min(np.abs(v @ _PLANES_DEDUP_NP.T)) > 1e-3):
                d = np.sort(v @ _CENTROIDS_NP.T)[::-1]
                if d[0] - d[1] > 1e-3 and d[1] - d[2] > 1e-3:
                    out[j + 1] = v
                    break
    return out.astype(np.float32)


def generate(seed: int, out_dir: str) -> None:
    rng = _rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def w(name, **cols):
        pq.write_table(pa.table(cols), os.path.join(out_dir, f"{name}.parquet"))

    w("region", r_regionkey=pa.array(range(5), pa.int32()),
      r_name=_pick(rng, NASTY_TEXT, 5, 0.2))
    w("nation", n_nationkey=pa.array(range(25), pa.int32()),
      n_name=_pick(rng, NASTY_TEXT, 25, 0.1),
      # dangling / null region refs
      n_regionkey=pa.array(
          [None if x < 0.1 else int(v) for v, x in
           zip(rng.integers(-2, 9, 25), rng.random(25))], pa.int32()))
    n = 150
    w("customer", c_custkey=pa.array(range(n), pa.int64()),
      c_name=_pick(rng, NASTY_TEXT, n, 0.05),
      c_nationkey=pa.array(
          [None if x < 0.08 else int(v) for v, x in
           zip(rng.integers(-3, 40, n), rng.random(n))], pa.int32()),
      c_acctbal=pa.array(_doubles(rng, n), pa.float64()),
      c_mktsegment=_pick(rng, SEGS, n))
    w("supplier", s_suppkey=pa.array(range(10), pa.int64()),
      s_name=_pick(rng, NASTY_TEXT, 10, 0.1),
      s_nationkey=pa.array([int(v) for v in rng.integers(-1, 30, 10)], pa.int32()),
      s_acctbal=pa.array(_doubles(rng, 10), pa.float64()))
    n = 200
    w("part", p_partkey=pa.array(range(n), pa.int64()),
      p_name=_pick(rng, NASTY_TEXT, n, 0.05),
      p_brand=_pick(rng, ["Brand#1", "Brand#2", None, "", "牌"], n),
      p_type=_pick(rng, ["STANDARD", "SMALL plated", None, ""], n),
      p_size=pa.array([None if x < 0.06 else int(v) for v, x in
                       zip(rng.integers(-50, 51, n), rng.random(n))], pa.int32()),
      p_retailprice=pa.array(_doubles(rng, n), pa.float64()))
    n = 1500
    w("orders", o_orderkey=pa.array(range(n), pa.int64()),
      o_custkey=pa.array([None if x < 0.04 else int(v) for v, x in
                          zip(rng.integers(-5, 300, n), rng.random(n))], pa.int64()),
      o_orderstatus=_pick(rng, STATUS, n),
      o_totalprice=pa.array(_doubles(rng, n), pa.float64()),
      o_orderdate=_ts(rng, n),
      o_orderpriority=_pick(rng, ["1-URGENT", "5-LOW", None, "", "急"], n))
    n = 6000
    w("lineitem",
      # null JOIN/GROUP keys included (round-3 ADVICE: the m3b NULL-linenumber
      # divergence slipped through precisely because keys were never nulled)
      l_orderkey=pa.array([None if x < 0.03 else int(v) for v, x in
                           zip(rng.integers(0, 1600, n), rng.random(n))],
                          pa.int64()),
      l_partkey=pa.array([int(v) for v in rng.integers(-10, 250, n)], pa.int64()),
      l_suppkey=pa.array([int(v) for v in rng.integers(0, 12, n)], pa.int64()),
      l_linenumber=pa.array([None if x < 0.03 else int(v) for v, x in
                             zip(rng.integers(-1, 8, n), rng.random(n))],
                            pa.int32()),
      l_quantity=pa.array(_doubles(rng, n, p_null=0.05), pa.float64()),
      l_extendedprice=pa.array(_doubles(rng, n, p_null=0.05), pa.float64()),
      l_discount=pa.array(_doubles(rng, n, p_null=0.05), pa.float64()),
      l_tax=pa.array(_doubles(rng, n, p_null=0.05), pa.float64()),
      l_returnflag=_pick(rng, FLAGS, n),
      l_linestatus=_pick(rng, STATUS, n),
      l_shipdate=_ts(rng, n))
    n = 3000
    # signed + NULL event ids (round 5): engines agree on C-style % for
    # negatives, but NULL/negative ids flow through modulo-derived keys
    # (j_interval_overlap % 53, pipeline_cdc_compact % 5003/% 17) and
    # window order keys — nothing policed that before
    eids = [-i if (i % 9 == 0 and i > 0) else i for i in range(n)]
    # duplicate (key, seq) dimension (round 6): every 13th row REUSES a
    # small id pool, so pipeline_cdc_compact sees multiple changes with the
    # IDENTICAL (key=id%5003, seq=id) but DIFFERENT payloads (value,
    # event_type, props are drawn independently below) — the exact case the
    # flag+value ordering struct exists for: the winner must be decided by
    # the payload tie-break, identically in both engines, never by
    # partition order. The pool includes a negative id and 0 so the C-style
    # % path is hit too; duplicate ids also flow into the window/interval
    # queries' order keys (their tie-breaks must likewise be total).
    _dup_pool = [42, -42, 0, 17, 5003]
    eids = [
        _dup_pool[i % len(_dup_pool)] if (i % 13 == 5) else eids[i]
        for i in range(n)
    ]
    w("events", event_id=pa.array(
        [None if x < 0.02 else eids[i]
         for i, x in enumerate(rng.random(n))], pa.int64()),
      ts=_ts(rng, n),
      user_id=pa.array([None if x < 0.05 else int(v) for v, x in
                        # heavy skew: 40% of rows on one user
                        zip(np.where(rng.random(n) < 0.4, 7,
                                     rng.integers(-2, 100, n)),
                            rng.random(n))], pa.int64()),
      event_type=_pick(rng, ETYPES, n),
      value=pa.array(_doubles(rng, n), pa.float64()),
      props=_pick(rng, PROPS, n))
    n = 500
    texts = _pick(rng, NASTY_TEXT, n, 0.06)
    # signed doc ids too (round 5, same rationale as event_id): ids feed
    # modulo-derived injections (% 13 / % 21 / % 5), hash splits, and
    # min()-keeper dedup — C-style % agrees across engines, but nothing
    # verified that until ids could actually be negative
    dids = [-i if (i % 11 == 0 and i > 0) else i for i in range(n)]
    w("documents",
      doc_id=pa.array([None if x < 0.03 else dids[i] for i, x in
                       zip(range(n), rng.random(n))], pa.int64()),
      text=texts, lang=_pick(rng, LANGS, n),
      source=_pick(rng, SOURCES, n),
      n_chars=pa.array([None if t is None else len(t) for t in texts],
                       pa.int64()))
    n = 500
    # sim_ann_ivf_kmeans trains its codebook ON this table, so the static
    # ±1-plane margins above don't cover it: after writing, train the same
    # codebook and verify every vector's rank-1/2 and 2/3 assignment gaps
    # dwarf float-accumulation error; redraw the matrix (rng continues —
    # still deterministic per seed) until clean. Without this, a hostile
    # vector near a learned cell boundary flips cells between numpy and
    # DuckDB dot kernels and the hash diverges by construction.
    from ch_pdf_parse_spark.operators.similarity import _kmeans_codebook

    for _ in range(6):
        emb = _margin_safe_embeddings(rng, n)
        w("embeddings",
          vec_id=pa.array([None if x < 0.03 else i for i, x in
                           zip(range(n), rng.random(n))], pa.int64()),
          embedding=pa.array([list(map(float, r)) for r in emb],
                             pa.list_(pa.float32())),
          label=pa.array([None if x < 0.05 else int(v) for v, x in
                          zip(rng.integers(0, 10, n), rng.random(n))],
                         pa.int32()))
        C = _kmeans_codebook(out_dir)
        scores = emb.astype(np.float64) @ C.T - (C * C).sum(axis=1) / 2.0
        s = np.sort(scores, axis=1)[:, ::-1]
        # every rank boundary any registered IVF query consumes: ranks 1..2
        # for assignment, through 4..5 for sim_ann_ivf_kmeans's nprobe=4
        # operating point (folded from the former _np4 entry in round 5;
        # round-4 review: checking only 1/2 and 2/3 left the nprobe=4
        # oracle comparison unguarded on gate corpora)
        gap = min((s[:, r] - s[:, r + 1]).min() for r in range(5))
        if gap > 1e-6:
            break
    else:
        # proceeding would make a pure float-boundary flip look like an
        # engine divergence in the gate report — fail attributably instead
        raise RuntimeError(
            f"seed {seed}: kmeans assignment margin only {gap:g} after 6 "
            "redraws; pick another seed (margin-unverifiable corpus)")


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--empty":
        # 0-row variant of every table (schemas preserved): empty partitions
        # and empty scan results are a fact of life at 10^12 rows — no query
        # may crash or diverge on them
        src = "/tmp/ch_pdf_parse_adv/seed0"
        out_dir = "/tmp/ch_pdf_parse_adv/empty"
        generate(0, src)
        os.makedirs(out_dir, exist_ok=True)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(src, f))
                pq.write_table(t.slice(0, 0), os.path.join(out_dir, f))
        rest = sys.argv[2:]
    else:
        seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
        # "seed<N>", NOT a bare number: registry.fixture_docs derives the
        # fixture scale from the dir basename (float("21") -> a SCALE-21
        # corpus, gigabytes of fixtures and a >1 GiB driver collect);
        # a non-numeric tag falls back to the standard sf0.01 fixtures
        out_dir = f"/tmp/ch_pdf_parse_adv/seed{seed}"
        generate(seed, out_dir)
        rest = sys.argv[2:]
    print(f"generated adversarial tables -> {out_dir}")
    cmd = [sys.executable, os.path.join(HERE, "check_queries.py"), out_dir,
           *rest]
    return subprocess.call(cmd)


if __name__ == "__main__":
    raise SystemExit(main())
