"""Optimized per-batch extraction kernel for the flagship mapInArrow path.

Same semantics as ``core.extract_document`` (the readable golden oracle —
see core.py for the reference file:line citations), re-implemented for
throughput over Arrow batches:

* offset decode is vectorized with numpy over the whole batch,
* no per-span object construction (parallel lists + index lists),
* sorts use C-level ``list.__getitem__`` keys / precomputed int composite
  keys instead of per-element lambda tuples.

``tests/test_kernel.py`` differentially tests this module against
``core.extract_document`` on the full fixture corpus (including oversized
docs, shuffled span order, and pathological inputs) — the two
implementations must agree bit-for-bit on (records, markdown).
"""

from __future__ import annotations

import numpy as np

from . import constants as C
from . import native as _native

_GAP_X = C.XY_MIN_GAP_X
_GAP_Y = C.XY_MIN_GAP_Y
_EQ = C.EQUATION_TEXT
_UNLABELED = C.UNLABELED
_IRRELEVANT = C.IRRELEVANT
_HEADER_Y = C.HEADER_Y_MAX
_TITLE_Y = C.TITLE_Y_MAX
_NL_DY = C.NEWLINE_DY
_NL_DX = C.NEWLINE_DX
_CHAR_W = C.CHAR_W
_LINE_H = C.LINE_H
_SEP_TITLE = C.SEP_TITLE
_SEP_PARA = C.SEP_PARA
_SEP_MEDIA = C.SEP_MEDIA
_PAGE_SEP = C.PAGE_SEP
_UNMATCHED = C.UNMATCHED_CAPTION

# composite leaf-sort key multipliers for (y1, x1, idx) lexicographic order.
# Slot widths come from the offset packing bounds (constants.py): any int32
# offset decodes to y1 = (o % 10^7)//10^4 <= 999 and x1 = o % 10^4 <= 9999,
# so the x1 slot must hold 10_000 values — NOT 1024 (an earlier 1024-wide
# slot let x1*KX spill into the y1 slot and inverted reading order whenever
# a leaf mixed x1 >= 1024 with differing y1). The idx slot holds 2^24 spans
# per document, far above the salting threshold.
_KI = 1 << 24         # idx slot (spans per doc)
_KX = _KI             # x1 multiplier
_KY = _KI * 10_000    # y1 multiplier


def _classify(text: str, page: int, y1: int) -> str:
    # mirror of core.classify_kind (kept inline-cheap; first-char dispatch).
    # ASCII digits only — see core.classify_kind for why not str.isdigit()
    if text == _EQ:
        return "equation"
    c0 = text[:1]
    if c0 == "图" and "0" <= text[1:2] <= "9":
        return "figure_caption"
    if c0 == "表" and "0" <= text[1:2] <= "9":
        return "table_caption"
    if c0 == "[":
        i = 1
        n = len(text)
        while i < n and "0" <= text[i] <= "9":
            i += 1
        if i > 1 and i < n and text[i] == "]":
            return "reference"
    if text.startswith("摘要"):
        return "abstract"
    if text.startswith("关键词"):
        return "keyword"
    if y1 < _HEADER_Y:
        return "header"
    if page == 0 and y1 < _TITLE_Y:
        return "title"
    return "text"


def _groups_1d(idxs: list, lo: list, hi: list, min_gap: int) -> list:
    # identical algorithm to core._groups_1d
    groups = []
    it = iter(idxs)
    first = next(it)
    cur = [first]
    cur_hi = hi[first]
    append = cur.append
    for i in it:
        if lo[i] - cur_hi >= min_gap:
            groups.append(cur)
            cur = [i]
            append = cur.append
            cur_hi = hi[i]
        else:
            append(i)
            h = hi[i]
            if h > cur_hi:
                cur_hi = h
    groups.append(cur)
    return groups


def _xy_cut(x1s: list, y1s: list, x2s: list, y2s: list) -> list:
    """core.xy_cut over parallel lists; returns [(local_idx, region_x0), ...].

    Identical recursion/tie-break semantics; sorts use C-level getitem keys
    and a precomputed (y1, x1, idx) integer composite for leaf ordering.
    """
    n = len(x1s)
    order = []
    if not n:
        return order
    xkey = x1s.__getitem__
    ykey = y1s.__getitem__
    leafkey = [y1s[i] * _KY + x1s[i] * _KX + i for i in range(n)].__getitem__
    out = order.append
    # band index per ORIGINAL local span index — a flat list beats a dict
    # rebuilt per recursion (indices are disjoint across sibling subsets,
    # so overwriting is safe)
    band_of = [0] * n

    def leaf(idxs, x0):
        idxs.sort(key=leafkey)
        order.extend([(i, x0) for i in idxs])

    def xgroups(idxs):
        xo = sorted(idxs, key=xkey)
        groups = _groups_1d(xo, x1s, x2s, _GAP_X)
        return groups if len(groups) > 1 else None

    def band_standalone(band, x0):
        if len(band) == 1:
            out((band[0], x0))
            return
        bg = xgroups(band)
        if bg:
            for grp in bg:
                recurse(grp, min(x1s[i] for i in grp))
        else:
            leaf(band, x0)

    def recurse(idxs, region_x0):
        if len(idxs) == 1:
            out((idxs[0], region_x0))
            return
        g = xgroups(idxs)
        if g:
            for grp in g:
                recurse(grp, min(x1s[i] for i in grp))
            return
        yo = sorted(idxs, key=ykey)
        bands = _groups_1d(yo, y1s, y2s, _GAP_Y)
        if len(bands) == 1:
            leaf(bands[0], region_x0)
            return
        xo = sorted(idxs, key=xkey)
        for bi, band in enumerate(bands):
            for i in band:
                band_of[i] = bi
        # Decide the split point BEFORE any nested recursion: band_standalone
        # recursion re-assigns band_of for spans of already-emitted bands (its
        # own frames' y-splits), so a suffix scan interleaved with emission
        # reads corrupted indices and can re-include emitted spans (core.xy_cut
        # is immune — it builds a fresh band_of dict per frame). All reads of
        # band_of happen here, while it still holds THIS frame's assignment.
        x1l, x2l, bol = x1s, x2s, band_of  # locals beat closure lookups in
        split_rest = None                  # the O(bands*n) suffix scan below
        n_standalone = len(bands)
        for bi in range(len(bands) - 1):
            lo = bi + 1
            cur_hi = None
            has_gap = False
            for i in xo:
                if bol[i] < lo:
                    continue
                if cur_hi is not None and x1l[i] - cur_hi >= _GAP_X:
                    has_gap = True
                    break
                x2 = x2l[i]
                if cur_hi is None or x2 > cur_hi:
                    cur_hi = x2
            if has_gap:
                split_rest = [i for i in xo if bol[i] >= lo]
                n_standalone = lo
                break
        for bi in range(n_standalone):
            band_standalone(bands[bi], region_x0)
        if split_rest is not None:
            recurse(split_rest, region_x0)

    recurse(list(range(n)), min(x1s))
    return order


def extract_document(
    kinds: list, texts: list, refs: list, pages, y1s, x1s, lo: int, hi: int,
    want_records: bool = True, want_markdown: bool = True,
):
    """One document over flat batch arrays [lo, hi); mirrors
    core.extract_document + extract_page + finish_document exactly.

    Returns (records [(kind, text, media_ref)], markdown string).

    ``want_records`` / ``want_markdown`` skip CONSTRUCTION of the unneeded
    output (the projection pushdown's kernel half — the classification /
    XY-cut / caption state always runs, but a spans-only consumer skips all
    markdown string formatting and joining, a markdown-only consumer skips
    record-list building). The skipped output returns empty; flagged runs
    are pinned equal to the full run's kept half in tests/test_kernel.py.
    """
    # group span indices by page, input order preserved (dict is insertion-
    # ordered; pages iterate ascending)
    by_page = {}
    for i in range(lo, hi):
        p = pages[i]
        b = by_page.get(p)
        if b is None:
            by_page[p] = [i]
        else:
            b.append(i)

    records = []
    markdown = []
    table_caps = []
    figure_caps = []
    prev_y1 = None
    prev_page = None
    prev_kind = None
    md_append = markdown.append

    for page in sorted(by_page):
        idxs = by_page[page]
        # classification (M1) + equation pseudo-text
        t_kind = []
        t_text = []
        t_ref = []
        t_y1 = []
        t_x1 = []
        media_idx = []
        for i in idxs:
            kind = kinds[i] or ""
            if kind == "figure" or kind == "table":
                media_idx.append(i)
                continue
            text = texts[i] or ""
            y1 = y1s[i]
            if kind == "equation":
                text = _EQ
            elif kind == _UNLABELED:
                kind = _classify(text, page, y1)
                if kind == "equation":
                    text = _EQ
            if kind == _IRRELEVANT:
                continue
            t_kind.append(kind)
            t_text.append(text)
            t_ref.append(refs[i] or "")
            t_y1.append(y1)
            t_x1.append(x1s[i])

        # reading order (M3 surrogate): derive boxes inline (core.derive_box)
        bx2 = []
        by2 = []
        for k in range(len(t_kind)):
            x1 = t_x1[k]
            y1 = t_y1[k]
            # text spans only reach here (media filtered above)
            ln = len(t_text[k])
            bx2.append(x1 + _CHAR_W * (ln if ln > 0 else 1))
            by2.append(y1 + _LINE_H)
        # native (C) XY-cut when the lazily-compiled library is available —
        # bit-identical output (differential-fuzzed in tests/test_kernel);
        # Python twin remains the semantics and the fallback
        ordered = None
        if _native.available():
            ordered = _native.xy_cut(t_x1, t_y1, bx2, by2, _GAP_X, _GAP_Y)
        if ordered is None:
            ordered = _xy_cut(t_x1, t_y1, bx2, by2)

        tab_groups = []
        fig_groups = []

        for k, region_x0 in ordered:
            y1 = t_y1[k]
            x1 = t_x1[k]
            # is_new_line (M2 surrogate), inlined
            if prev_y1 is None:
                new_line = True
            else:
                dy = y1 - prev_y1 if page == prev_page else -1
                new_line = dy > _NL_DY or (dy <= 0 and (x1 - region_x0) > _NL_DX)
            kind = t_kind[k]
            if not new_line and prev_kind is not None:
                kind = prev_kind
            prev_y1 = y1
            prev_page = page
            prev_kind = kind

            text = t_text[k]
            if kind == "equation":
                if want_markdown:
                    md_append(f"![]({text}){_SEP_MEDIA}")
                continue
            if kind == "table_caption":
                if new_line or not tab_groups:
                    tab_groups.append([text])
                else:
                    tab_groups[-1].append(text)
                continue
            if kind == "figure_caption":
                if new_line or not fig_groups:
                    fig_groups.append([text])
                else:
                    fig_groups[-1].append(text)
                continue
            if new_line:
                if want_records:
                    records.append((kind, text, ""))
                if want_markdown:
                    md_append((_SEP_TITLE if kind == "title" else _SEP_PARA) + text)
            else:
                if want_markdown:
                    md_append(text)
                if want_records:
                    if records:
                        k0, t0, m0 = records[-1]
                        records[-1] = (k0, t0 + text, m0)
                    else:
                        records.append((kind, text, ""))

        # caption <-> media positional match (greedy by caption index);
        # page markdown emits all tables (caption-first) then all figures
        # (image-first), each in input order — core.extract_page:362-369
        if want_markdown:
            md_append(_PAGE_SEP)
        ti = fi = 0
        for i in media_idx:
            if kinds[i] == "table":
                ref = refs[i] or ""
                cap = "".join(tab_groups[ti]) if ti < len(tab_groups) else _UNMATCHED
                ti += 1
                table_caps.append((cap, ref))
                if want_markdown:
                    md_append(f"{cap}{_SEP_MEDIA}![]({ref}){_SEP_MEDIA}")
        for i in media_idx:
            if kinds[i] != "table":
                ref = refs[i] or ""
                cap = "".join(fig_groups[fi]) if fi < len(fig_groups) else _UNMATCHED
                fi += 1
                figure_caps.append((cap, ref))
                if want_markdown:
                    md_append(f"![]({ref}){_SEP_MEDIA}{cap}{_SEP_MEDIA}")

    if want_records:
        for cap, ref in table_caps:
            records.append(("table_caption", cap, ref))
        for cap, ref in figure_caps:
            records.append(("figure_caption", cap, ref))
    return records, "".join(markdown) if want_markdown else ""


def decode_offsets(offsets) -> tuple:
    """Vectorized (page, y1, x1) decode of an int array of packed offsets."""
    arr = np.asarray(offsets, dtype=np.int64)
    pages, rem = np.divmod(arr, C.OFFSET_PAGE)
    y1, x1 = np.divmod(rem, C.OFFSET_Y)
    return pages.tolist(), y1.tolist(), x1.tolist()
