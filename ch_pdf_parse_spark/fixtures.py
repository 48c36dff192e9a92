"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Generates the engine's primary input table

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int32>>)

plus the ``layout_geom`` intent side-table used only by the golden oracle and
property tests. Seeded and fully self-contained — no external data, no Spark
dependency (pyarrow writer), so the same corpus is reproducible inside tests,
``bench.py``, and the driver's ``__spark_entry__`` queries.

Layout rules mirror the geometry contract in ``constants.py``/``core.py``:
pseudo-Chinese text (seeded CJK codepoints + ASCII tokens) exercises the
reference's Chinese-aware empty-separator line merge
(/root/reference/predict/pdf2markdown.py:116-117,142-143,571-575).
"""

from __future__ import annotations

import os
import random

from . import constants as C
from .core import pack_offset

# CJK range for pseudo-Chinese; first chars that would collide with the
# classification ladder are avoided for plain body text.
_CJK_LO, _CJK_HI = 0x4E00, 0x9FA5
_FORBIDDEN_FIRST = {"图", "表", "[", "摘", "关", "#"}
_ASCII_TOKENS = ("LSTM", "BERT", "2024", "GPU", "F1", "AUC", "CNN", "SVM")


def _cjk(rng: random.Random, n: int) -> str:
    return "".join(chr(rng.randint(_CJK_LO, _CJK_HI)) for _ in range(n))


def _text(rng: random.Random, lo: int = 8, hi: int = 40, citation: bool = False) -> str:
    n = rng.randint(lo, hi)
    s = _cjk(rng, n)
    while s[0] in _FORBIDDEN_FIRST:
        s = chr(rng.randint(_CJK_LO, _CJK_HI)) + s[1:]
    if rng.random() < 0.25:  # mixed ASCII token
        k = rng.randrange(1, len(s))
        s = s[:k] + rng.choice(_ASCII_TOKENS) + s[k:]
    if citation and rng.random() < 0.3 and len(s) > 4:
        k = rng.randrange(2, len(s) - 1)
        cite = f"[{rng.randint(1, 40)}]" if rng.random() < 0.7 else \
            f"[{rng.randint(1, 20)},{rng.randint(21, 40)}]"
        s = s[:k] + cite + s[k:]
    return s


class _DocBuilder:
    def __init__(self, doc_id: str, rng: random.Random):
        self.doc_id = doc_id
        self.rng = rng
        self.spans: list[tuple[str, str, str, int]] = []
        self.geom: list[dict] = []

    def emit(self, kind_true: str, text: str, media_ref: str, page: int, y1: int,
             x1: int, new_line: bool, col_id: int, labelable: bool = True) -> None:
        rng = self.rng
        kind_in = kind_true
        if labelable and kind_true not in ("author", "institution", "figure", "table") \
                and rng.random() < 0.35:
            kind_in = C.UNLABELED  # exercise the M1 surrogate path
        self.spans.append((kind_in, text, media_ref, pack_offset(page, y1, x1)))
        self.geom.append({
            "doc_id": self.doc_id, "span_idx": len(self.spans) - 1, "page_id": page,
            "x1": x1, "y1": y1, "kind_true": kind_true, "new_line": new_line,
            "col_id": col_id,
        })


def _fill_column(b: _DocBuilder, page: int, col_id: int, col_x: int, col_w: int,
                 y0: int, y_max: int, last_was_para: list[bool],
                 is_last_page: bool, media_counter: list[int]) -> None:
    """Fill one column top-to-bottom with blocks. ``last_was_para`` is a 1-cell
    doc-global flag enabling cross-column/page paragraph continuation."""
    rng = b.rng
    y = y0
    max_chars = min(40, col_w // C.CHAR_W)

    # cross-column/page continuation of the open paragraph (reference:
    # parsed_json[-1] append, predict/pdf2markdown.py:571-577)
    if last_was_para[0] and rng.random() < 0.35:
        for _ in range(rng.randint(1, 3)):
            if y + C.LINE_H > y_max:
                return
            b.emit("text", _text(rng, 8, max_chars, citation=True), "", page, y, col_x,
                   new_line=False, col_id=col_id)
            y += C.LINE_PITCH
        y += C.BLOCK_GAP - C.LINE_PITCH

    # guarantee: the first regular block of every column is a multi-line
    # paragraph, so the column region always contains a line at col_x (the
    # paragraph-boundary rule's region_x0 anchor, core.is_new_line).
    first_block = True
    while y + C.LINE_H <= y_max:
        r = rng.random()
        if first_block or r < 0.52:
            nlines = rng.randint(2, 5) if (first_block or rng.random() < 0.7) else 1
            first_block = False
            b.emit("text", _text(rng, 8, max_chars, citation=True), "", page, y,
                   col_x + C.INDENT, new_line=True, col_id=col_id)
            y += C.LINE_PITCH
            for _ in range(nlines - 1):
                if y + C.LINE_H > y_max:
                    break
                b.emit("text", _text(rng, 8, max_chars, citation=True), "", page, y,
                       col_x, new_line=False, col_id=col_id)
                y += C.LINE_PITCH
            y += C.BLOCK_GAP - C.LINE_PITCH
            last_was_para[0] = True
            continue
        last_was_para[0] = False
        if r < 0.60 and y + 240 <= y_max:  # figure (+ caption below, maybe)
            media_counter[0] += 1
            ref = f"{b.doc_id}_p{page}_figure_{media_counter[0]}.png"
            b.emit("figure", "", ref, page, y, col_x, new_line=True, col_id=col_id,
                   labelable=False)
            y += 210
            if rng.random() < 0.8:
                y = _caption(b, page, col_id, col_x, y, y_max, "图", max_chars)
            y += C.BLOCK_GAP - C.LINE_PITCH
        elif r < 0.68 and y + 240 <= y_max:  # table (caption above)
            media_counter[0] += 1
            ref = f"{b.doc_id}_p{page}_table_{media_counter[0]}.png"
            if rng.random() < 0.8:
                y = _caption(b, page, col_id, col_x, y, y_max, "表", max_chars)
                y += C.BLOCK_GAP - C.LINE_PITCH
            b.emit("table", "", ref, page, y, col_x, new_line=True, col_id=col_id,
                   labelable=False)
            y += 210 + (C.BLOCK_GAP - C.LINE_PITCH)
        elif r < 0.74:  # equation
            media_counter[0] += 1
            b.emit("equation", "", f"{b.doc_id}_p{page}_eq_{media_counter[0]}.png",
                   page, y, col_x, new_line=True, col_id=col_id, labelable=False)
            y += C.LINE_H + (C.BLOCK_GAP - C.LINE_H)
        elif r < 0.80:  # orphan caption (no media) — exercises surplus-group drop
            y = _caption(b, page, col_id, col_x, y, y_max, rng.choice("图表"), max_chars)
            y += C.BLOCK_GAP - C.LINE_PITCH
        elif is_last_page and r < 0.95:  # references
            for _ in range(rng.randint(1, 4)):
                if y + C.LINE_H > y_max:
                    break
                n = rng.randint(1, 60)
                b.emit("reference", f"[{n}]" + _text(rng, 8, max_chars - 4), "",
                       page, y, col_x + C.INDENT, new_line=True, col_id=col_id)
                y += C.LINE_PITCH
                if rng.random() < 0.4 and y + C.LINE_H <= y_max:
                    b.emit("reference", _text(rng, 8, max_chars), "", page, y, col_x,
                           new_line=False, col_id=col_id)
                    y += C.LINE_PITCH
                y += C.BLOCK_GAP - C.LINE_PITCH
        else:
            y += C.BLOCK_GAP


def _caption(b: _DocBuilder, page: int, col_id: int, col_x: int, y: int, y_max: int,
             prefix: str, max_chars: int) -> int:
    rng = b.rng
    kind = "figure_caption" if prefix == "图" else "table_caption"
    if y + C.LINE_H > y_max:
        return y
    b.emit(kind, f"{prefix}{rng.randint(1, 9)} " + _text(rng, 8, max_chars - 4), "",
           page, y, col_x, new_line=True, col_id=col_id)
    y += C.LINE_PITCH
    for _ in range(rng.randint(0, 2)):
        if y + C.LINE_H > y_max:
            break
        b.emit(kind, _text(rng, 8, max_chars), "", page, y, col_x,
               new_line=False, col_id=col_id)
        y += C.LINE_PITCH
    return y


def generate_document(doc_index: int, seed: int = 42, oversized: bool = False) -> _DocBuilder:
    rng = random.Random(seed * 1_000_003 + doc_index)
    b = _DocBuilder(f"doc_{doc_index:06d}", rng)
    two_col = rng.random() < 0.6
    n_pages = rng.randint(60, 90) if oversized else rng.randint(1, 8)
    last_was_para = [False]
    media_counter = [0]

    for page in range(n_pages):
        if page > 0 and rng.random() < 0.5:  # running header -> dropped (P3)
            b.emit("header", f"第{page + 1}页" + _cjk(rng, 6), "", page, 8, C.COL1_X,
                   new_line=True, col_id=0)
        y = 40
        if page == 0:
            # front matter, full-width; page 0 body is always single-column
            for _ in range(rng.randint(1, 2)):  # title lines (y < TITLE_Y_MAX)
                b.emit("title", _text(rng, 10, 30), "", 0, y, C.COL1_X,
                       new_line=(y == 40), col_id=0)
                y += C.LINE_PITCH
            y += C.BLOCK_GAP - C.LINE_PITCH
            b.emit("author", _cjk(rng, 3) + ", " + _cjk(rng, 3), "", 0, y, C.COL1_X,
                   new_line=True, col_id=0)
            y += C.BLOCK_GAP
            b.emit("institution", _cjk(rng, 12) + "大学", "", 0, y, C.COL1_X,
                   new_line=True, col_id=0)
            y += C.BLOCK_GAP
            b.emit("abstract", "摘要 " + _text(rng, 8, 36), "", 0, y, C.COL1_X,
                   new_line=True, col_id=0)
            y += C.LINE_PITCH
            for _ in range(rng.randint(1, 4)):
                b.emit("abstract", _text(rng, 8, 40), "", 0, y, C.COL1_X,
                       new_line=False, col_id=0)
                y += C.LINE_PITCH
            y += C.BLOCK_GAP - C.LINE_PITCH
            b.emit("keyword", "关键词 " + _cjk(rng, 4) + ";" + _cjk(rng, 4), "", 0, y,
                   C.COL1_X, new_line=True, col_id=0)
            y += C.BLOCK_GAP
            last_was_para[0] = False
            _fill_column(b, 0, 0, C.COL1_X, C.COL1_W, y, 990,
                         last_was_para, n_pages == 1, media_counter)
        elif two_col:
            _fill_column(b, page, 0, C.COL1_X, C.COL2_W, y, 990,
                         last_was_para, page == n_pages - 1, media_counter)
            _fill_column(b, page, 1, C.COL2_X, C.COL2_W, y, 990,
                         last_was_para, page == n_pages - 1, media_counter)
        else:
            _fill_column(b, page, 0, C.COL1_X, C.COL1_W, y, 990,
                         last_was_para, page == n_pages - 1, media_counter)
    return b


def generate_corpus(n_docs: int, seed: int = 42, oversized_every: int = 200):
    """Yield _DocBuilder per doc; every ``oversized_every``-th doc is a long-tail
    giant (exercises salting, SURVEY.md §2.10 E6)."""
    for i in range(n_docs):
        yield generate_document(i, seed, oversized=(oversized_every > 0
                                                    and i > 0 and i % oversized_every == 0))


def n_docs_for_sf(sf: float) -> int:
    return max(12, int(round(sf * 4000)))


def corpus_dir(sf: float, base: str | None = None) -> str:
    base = base or os.environ.get("SPARK_GRAFT_FIXTURE_DIR", "/root/repo/.fixtures")
    return os.path.join(base, f"sf{sf:g}")


def write_corpus(sf: float, base: str | None = None, seed: int = 42,
                 force: bool = False) -> str:
    """Write documents.parquet + layout_geom.parquet for a scale factor.

    Idempotent (content is a pure function of (sf, seed)); cached on disk so
    tests, bench and the driver's queries share one corpus.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = corpus_dir(sf, base)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return out
    os.makedirs(out, exist_ok=True)

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    doc_ids, spans_col, geom_rows = [], [], []
    for b in generate_corpus(n_docs_for_sf(sf), seed):
        doc_ids.append(b.doc_id)
        spans_col.append([
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for k, t, m, o in b.spans
        ])
        geom_rows.extend(b.geom)

    docs = pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                     "spans": pa.array(spans_col, pa.list_(span_t)),
                     # stored stats column for scan-prunable skew routing
                     "n_spans": pa.array([len(s) for s in spans_col], pa.int32())})
    pq.write_table(docs, os.path.join(out, "documents.parquet"))
    geom = pa.table({k: [r[k] for r in geom_rows]
                     for k in ("doc_id", "span_idx", "page_id", "x1", "y1",
                               "kind_true", "new_line", "col_id")})
    pq.write_table(geom, os.path.join(out, "layout_geom.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out
