"""Differential test: the optimized batch kernel (kernel.py, used by the
flagship mapInArrow path) must agree bit-for-bit with the readable golden
oracle (core.extract_document) on (records, markdown) — including oversized
docs, arbitrary input span order, and pathological inputs."""

import random

from ch_pdf_parse_spark import core, fixtures, kernel


def _run_kernel(spans):
    kinds = [s[0] for s in spans]
    texts = [s[1] for s in spans]
    refs = [s[2] for s in spans]
    pages, y1s, x1s = kernel.decode_offsets([s[3] for s in spans])
    return kernel.extract_document(kinds, texts, refs, pages, y1s, x1s, 0, len(spans))


def _run_core(spans):
    recs, md = core.extract_document(spans)
    return [(k, t, m) for k, t, m, _ in recs], md


def test_kernel_matches_oracle_on_corpus():
    rng = random.Random(7)
    docs = [fixtures.generate_document(i) for i in range(300)]
    docs += [fixtures.generate_document(i, oversized=True) for i in range(5)]
    for d in docs:
        spans = list(d.spans)
        assert _run_kernel(spans) == _run_core(spans)
        rng.shuffle(spans)  # output must be order-invariant in both
        assert _run_kernel(spans) == _run_core(spans)


def test_kernel_pathological():
    eq = core.pack_offset(0, 500, 62)
    cases = [
        [],
        [("figure", "", "m1", core.pack_offset(0, 400, 100))],
        [("table", "", "t1", core.pack_offset(0, 400, 100)),
         ("figure", "", "f1", core.pack_offset(0, 700, 100))],
        [("equation", "ignored", "", eq)],
        [("unlabeled", "图1 题注", "", core.pack_offset(0, 620, 62)),
         ("figure", "", "f1", core.pack_offset(0, 400, 62))],
        [("text", "正文", None, core.pack_offset(2000, 300, 62))],  # huge page
        [(None, "x", None, 0)],
    ]
    for spans in cases:
        assert _run_kernel(spans) == _run_core(spans)


def test_leaf_sort_key_wide_x_band():
    """Regression: the composite leaf-sort key must stay lexicographic in
    (y1, x1, idx) for the FULL packed x1 range (0..9999). An earlier
    1024-wide x1 slot let x1*KX spill into the y1 slot, inverting reading
    order in any leaf that mixed x1 >= 1024 with differing y1 — needs a
    band of spans bridging a wide x range so no x-cut separates them."""
    spans = [("text", "桥接桥接桥接桥接桥接", "", core.pack_offset(0, 1, x))
             for x in range(700, 1801, 50)]
    spans.append(("text", "甲先来的先来的先来", "", core.pack_offset(0, 0, 1800)))
    spans.append(("text", "乙后来的后来的后来", "", core.pack_offset(0, 2, 700)))
    assert _run_kernel(spans) == _run_core(spans)
    # the y=0 span must fold first (reading order is y-major inside a leaf)
    recs, _ = _run_core(spans)
    assert recs[0][1].startswith("甲先来的")
