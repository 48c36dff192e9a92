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


def test_band_of_not_corrupted_by_nested_recursion():
    """Regression (confirmed bug): the kernel's shared band_of list was
    re-assigned by nested recursion (band_standalone's own y-splits) while
    the outer frame's suffix scan still read it, re-including an
    already-emitted span — 13 outputs for 12 boxes, duplicated text in
    records and markdown. Layout: two y-bands, no global x-gap; band 0's
    left column has an internal y-gap, band 1 has a column gutter."""
    boxes = ([(0, 100, 50, 112), (0, 140, 50, 152)]
             + [(100, y, 300, y + 12) for y in range(100, 151, 10)]
             + [(40, 300, 95, 312), (40, 320, 95, 332),
                (200, 300, 250, 312), (200, 320, 250, 332)])
    k = kernel._xy_cut([b[0] for b in boxes], [b[1] for b in boxes],
                       [b[2] for b in boxes], [b[3] for b in boxes])
    c = core.xy_cut(boxes)
    assert len(k) == len(boxes)
    assert k == c


def test_xy_cut_randomized_geometry_stress():
    """Dense-coordinate randomized stress: the optimized kernel XY-cut must
    equal core.xy_cut exactly (order AND region_x0) on arbitrary overlapping
    layouts — the geometry class the fixture generator never produces."""
    rng = random.Random(99)
    for _ in range(1500):
        n = rng.randint(1, 18)
        boxes = []
        for _ in range(n):
            x1 = rng.randint(0, 400)
            y1 = rng.randint(0, 400)
            boxes.append((x1, y1, x1 + rng.randint(5, 120),
                          y1 + rng.choice([8, 12, 20, 40])))
        k = kernel._xy_cut([b[0] for b in boxes], [b[1] for b in boxes],
                           [b[2] for b in boxes], [b[3] for b in boxes])
        assert k == core.xy_cut(boxes)


def test_projection_flags_match_full_run():
    """want_records/want_markdown runs must equal the full run's kept half —
    the kernel side of the columns= projection pushdown."""
    docs = [fixtures.generate_document(i) for i in range(120)]
    docs += [fixtures.generate_document(i, oversized=True) for i in range(3)]
    for d in docs:
        spans = list(d.spans)
        kinds = [s[0] for s in spans]
        texts = [s[1] for s in spans]
        refs = [s[2] for s in spans]
        pages, y1s, x1s = kernel.decode_offsets([s[3] for s in spans])
        args = (kinds, texts, refs, pages, y1s, x1s, 0, len(spans))
        recs, md = kernel.extract_document(*args)
        recs_only, md_empty = kernel.extract_document(*args,
                                                      want_markdown=False)
        recs_empty, md_only = kernel.extract_document(*args,
                                                      want_records=False)
        assert recs_only == recs and md_empty == ""
        assert md_only == md and recs_empty == []


def test_native_xy_cut_matches_python_fuzz():
    """The C XY-cut must agree with kernel._xy_cut bit-for-bit on random
    and tie-heavy layouts (stable-sort tie-breaks included). Skipped when
    no C toolchain is available (Python path is then the only path)."""
    import random

    import pytest

    from ch_pdf_parse_spark import kernel, native

    if not native.available():
        pytest.skip("no C toolchain: python XY-cut is used")
    rng = random.Random(20260821)
    for trial in range(1500):
        n = rng.choice([1, 2, 3, 5, 8, 20, 60, 150])
        x1 = [rng.randrange(0, 1000) for _ in range(n)]
        y1 = [rng.randrange(0, 1000) for _ in range(n)]
        x2 = [a + rng.randrange(1, 400) for a in x1]
        y2 = [a + kernel._LINE_H for a in y1]
        assert (native.xy_cut(x1, y1, x2, y2,
                              kernel._GAP_X, kernel._GAP_Y)
                == kernel._xy_cut(x1, y1, x2, y2)), (trial, n)
    for trial in range(1000):  # dense, tie-heavy (stability stress)
        n = rng.choice([10, 40, 80])
        x1 = [rng.randrange(0, 12) * 10 for _ in range(n)]
        y1 = [rng.randrange(0, 15) * 14 for _ in range(n)]
        x2 = [a + rng.choice([4, 40, 120]) for a in x1]
        y2 = [a + kernel._LINE_H for a in y1]
        assert (native.xy_cut(x1, y1, x2, y2,
                              kernel._GAP_X, kernel._GAP_Y)
                == kernel._xy_cut(x1, y1, x2, y2)), (trial, n)


def test_native_disabled_falls_back(monkeypatch):
    """A native-library load failure must leave extraction on the Python
    twin with identical results on the fixture corpus."""
    from ch_pdf_parse_spark import fixtures, kernel, native

    docs = [fixtures.generate_document(i, 42) for i in range(25)]

    def run_all():
        out = []
        for b in docs:
            kinds = [s[0] for s in b.spans]
            texts = [s[1] for s in b.spans]
            refs = [s[2] for s in b.spans]
            pages, y1s, x1s = kernel.decode_offsets(
                [s[3] or 0 for s in b.spans])
            out.append(kernel.extract_document(
                kinds, texts, refs, pages, y1s, x1s, 0, len(b.spans)))
        return out

    a = run_all()
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    assert not native.available()
    assert run_all() == a
