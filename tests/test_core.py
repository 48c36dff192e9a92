"""Kernel/oracle unit tests (no Spark). SURVEY.md §5 items 1 and 3."""

import random

from ch_pdf_parse_spark import constants as C, core, fixtures


def test_offset_roundtrip():
    for page, y, x in [(0, 0, 0), (3, 999, 9999), (120, 500, 62)]:
        assert core.unpack_offset(core.pack_offset(page, y, x)) == (page, y, x)


def test_classify_ladder():
    assert core.classify_kind("###equation", 2, 400) == "equation"
    assert core.classify_kind("图3 结果", 1, 500) == "figure_caption"
    assert core.classify_kind("表12 对比", 1, 500) == "table_caption"
    assert core.classify_kind("[17]某某文献", 4, 700) == "reference"
    assert core.classify_kind("摘要 本文提出", 0, 130) == "abstract"
    assert core.classify_kind("关键词 检索", 0, 200) == "keyword"
    assert core.classify_kind("页眉", 3, 8) == "header"
    assert core.classify_kind("论文标题", 0, 45) == "title"
    assert core.classify_kind("正文[3]内容", 0, 300) == "text"
    # '[' without closing bracket of digits is not a reference
    assert core.classify_kind("[abc后续", 2, 300) == "text"


def test_xy_cut_two_columns():
    # full-width band, then two columns; gutter must cut before the shared
    # horizontal gap at y=500 (x-first policy)
    boxes = [
        (62, 40, 900, 52),      # 0 title band
        (62, 100, 292, 112),    # 1 L top
        (62, 600, 292, 612),    # 2 L bottom
        (530, 110, 760, 122),   # 3 R top
        (530, 590, 760, 602),   # 4 R bottom
    ]
    order = [i for i, _ in core.xy_cut(boxes)]
    assert order == [0, 1, 2, 3, 4]
    x0s = {i: x0 for i, x0 in core.xy_cut(boxes)}
    assert x0s[3] == 530 and x0s[1] == 62


def test_oracle_quirks():
    """Pin the reference's faithful quirks (SURVEY.md §7.3)."""
    mk = core.pack_offset
    spans = [
        # page 0: title, body para (2 lines), table caption then table,
        # a figure with NO caption (sentinel), an orphan figure caption later
        ("title", "标题甲", "", mk(0, 40, 62)),
        ("text", "正文第一行内容", "", mk(0, 100, 86)),
        ("text", "正文续行内容啊", "", mk(0, 114, 62)),
        ("table_caption", "表1 对比结果", "", mk(0, 160, 62)),
        ("table", "", "t1.png", mk(0, 190, 62)),
        ("figure", "", "f1.png", mk(0, 430, 62)),
        ("equation", "", "e1.png", mk(0, 700, 62)),
        ("figure_caption", "图9 孤儿题注", "", mk(0, 760, 62)),
    ]
    out, md = core.extract_document(spans)
    kinds = [k for k, *_ in out]
    # captions diverted from body; media records appended at doc end,
    # tables before figures (predict/pdf2markdown.py:675-680)
    assert kinds == ["title", "text", "table_caption", "figure_caption"]
    assert out[1][1] == "正文第一行内容正文续行内容啊"  # empty-separator merge
    assert out[2] == ("table_caption", "表1 对比结果", "t1.png", 2)
    # figure pairs with the FIRST caption group by index — the orphan caption
    # (greedy-by-index, predict/pdf2markdown.py:111,138)
    assert out[3] == ("figure_caption", "图9 孤儿题注", "f1.png", 3)
    assert "![](###equation)  \n\n" in md           # :653-654 (markdown only)
    assert md.startswith("   \n\n # 标题甲")          # :552
    assert "表1 对比结果  \n\n![](t1.png)  \n\n" in md  # :666-667 caption-first
    assert "![](f1.png)  \n\n图9 孤儿题注  \n\n" in md  # :668-670 image-first


def test_oracle_unmatched_sentinel():
    mk = core.pack_offset
    spans = [
        ("text", "正文行一二三四", "", mk(0, 100, 86)),
        ("figure", "", "f1.png", mk(0, 200, 62)),
    ]
    out, _ = core.extract_document(spans)
    assert out[-1] == ("figure_caption", C.UNMATCHED_CAPTION, "f1.png", 1)


def test_generator_intent_consistency():
    """M1/M2/M3 surrogates reproduce the generator's intended labels exactly."""
    for di in range(40):
        b = fixtures.generate_document(di, 42)
        geom = {g["span_idx"]: g for g in b.geom}
        spans = [core.Span.from_raw(k, t, m, o, i) for i, (k, t, m, o) in enumerate(b.spans)]
        by_page: dict[int, list[core.Span]] = {}
        for s in spans:
            by_page.setdefault(s.page, []).append(s)
        prev_y1 = prev_page = prev_kind = None
        for page in sorted(by_page):
            txt = []
            for s in by_page[page]:
                kind, text = s.kind, s.text
                if kind in ("figure", "table"):
                    continue
                if kind == "equation":
                    text = C.EQUATION_TEXT
                elif kind == C.UNLABELED:
                    kind = core.classify_kind(text, s.page, s.y1)
                if kind == C.IRRELEVANT:
                    continue
                txt.append(core.Span(kind, text, s.media_ref, s.page, s.y1, s.x1, s.idx))
            boxes = [core.derive_box(s.kind, s.text, s.x1, s.y1) for s in txt]
            ordered = core.xy_cut(boxes)
            assert [txt[i].idx for i, _ in ordered] == [s.idx for s in txt], \
                f"reading order diverges on {b.doc_id} page {page}"
            for i, x0 in ordered:
                s = txt[i]
                nl = core.is_new_line(s.y1, s.x1, x0, prev_y1, prev_page, page)
                kind = s.kind if (nl or prev_kind is None) else prev_kind
                g = geom[s.idx]
                assert nl == g["new_line"], (b.doc_id, s.idx)
                assert kind == g["kind_true"], (b.doc_id, s.idx, kind, g["kind_true"])
                prev_y1, prev_page, prev_kind = s.y1, page, kind


def test_order_invariance_under_text_shuffle():
    """Output depends on geometry, not input order of text spans (media input
    order IS semantic — reference region order). SURVEY.md §5 property test."""
    b = fixtures.generate_document(7, 42)
    base_out, base_md = core.extract_document(b.spans)
    rng = random.Random(0)
    spans = list(b.spans)
    text_pos = [i for i, s in enumerate(spans) if s[0] not in ("figure", "table")]
    vals = [spans[i] for i in text_pos]
    rng.shuffle(vals)
    for p, v in zip(text_pos, vals):
        spans[p] = v
    out, md = core.extract_document(spans)
    assert out == base_out
    assert md == base_md


def test_generator_deterministic():
    a = fixtures.generate_document(5, 42)
    b = fixtures.generate_document(5, 42)
    assert a.spans == b.spans and a.geom == b.geom
