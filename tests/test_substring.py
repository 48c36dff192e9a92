"""Cross-document exact-substring dedup: planted-boilerplate recovery +
span-merge semantics + the detector-gap proof (no whole/near-document
detector catches a boilerplate paragraph embedded in otherwise-unique docs —
the round-5 verdict's missing dedup mode)."""

import pandas as pd

from ch_pdf_parse_spark.operators.substring import (
    SUBSTR_K, duplicate_spans)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(spark, rows, **kw):
    return {(r.doc_id, r.span_start, r.span_end, r.n_tokens)
            for r in duplicate_spans(_df(spark, rows), **kw).collect()}


BP = " ".join(f"bp{i}" for i in range(10))  # 10-token boilerplate


def _unique_doc(i, n=40):
    return " ".join(f"d{i}w{j}" for j in range(n))


def test_planted_boilerplate_recovered_exactly(spark):
    """Three otherwise-unique docs share one 10-token paragraph at different
    offsets; two clean docs share nothing. The operator must flag exactly
    the boilerplate span in each carrier — start/end at the right token
    offsets — and nothing in the clean docs."""
    rows = [
        (1, BP + " " + _unique_doc(1)),            # at offset 1
        (2, _unique_doc(2, 20) + " " + BP),        # at offset 21
        (3, _unique_doc(3, 5) + " " + BP + " " + _unique_doc(33, 5)),
        (4, _unique_doc(4)),
        (5, _unique_doc(5)),
    ]
    got = _spans(spark, rows)
    assert got == {
        (1, 1, 10, 10),
        (2, 21, 30, 10),
        (3, 6, 15, 10),
    }


def test_whole_doc_detectors_miss_planted_boilerplate(spark):
    """The gap this operator closes: 40-token docs sharing a 10-token
    paragraph sit far below every near-dup detector's threshold (Jaccard
    over 3-gram sets ~0.1 << 0.5; minhash band collision needs high
    Jaccard) and text_repetition is within-document only."""
    rows = [
        (1, BP + " " + _unique_doc(1)),
        (2, _unique_doc(2, 20) + " " + BP),
        (3, _unique_doc(3)),
    ]
    from ch_pdf_parse_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures, ngram_jaccard_pairs,
        shingles)
    sh = shingles(_df(spark, rows))
    assert ngram_jaccard_pairs(sh).count() == 0
    assert lsh_candidate_pairs(minhash_signatures(sh)).count() == 0
    # ...while the substring detector catches both carriers
    assert len(_spans(spark, rows)) == 2


def test_adjacent_anchors_merge_to_maximal_span(spark):
    """A shared 12-token run yields 5 overlapping 8-gram anchors that must
    merge into ONE maximal span, not 5."""
    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, shared + " " + _unique_doc(1)),
        (2, _unique_doc(2, 15) + " " + shared),
    ]
    got = _spans(spark, rows)
    assert got == {(1, 1, 12, 12), (2, 16, 27, 12)}


def test_two_disjoint_spans_stay_separate(spark):
    """Two different shared paragraphs in one doc, separated by unique
    text, must come out as two spans."""
    bp2 = " ".join(f"q{i}" for i in range(8))
    rows = [
        (1, BP + " " + _unique_doc(1, 10) + " " + bp2),
        (2, bp2 + " " + _unique_doc(2, 30)),
        (3, _unique_doc(3, 30) + " " + BP),
    ]
    got = {(s[0], s[3]) for s in _spans(spark, rows)}
    # doc 1 carries both (10-token and 8-token), docs 2/3 one each
    assert got == {(1, 10), (1, 8), (2, 8), (3, 10)}


def test_within_doc_repeat_alone_is_not_cross_document(spark):
    """min_docs=2 (distinct docs): a span repeated twice INSIDE one doc but
    absent elsewhere is text_repetition's business, not this operator's."""
    rows = [
        (1, BP + " " + _unique_doc(1, 10) + " " + BP),
        (2, _unique_doc(2)),
    ]
    assert _spans(spark, rows) == set()


def test_sub_k_overlap_invisible(spark):
    """A shared run of k-1 tokens produces no k-gram anchor — below the
    resolution floor by design."""
    short = " ".join(f"s{i}" for i in range(SUBSTR_K - 1))
    rows = [
        (1, short + " " + _unique_doc(1)),
        (2, _unique_doc(2, 20) + " " + short),
    ]
    assert _spans(spark, rows) == set()


def test_matches_pure_python_suffix_scan_on_driver_table(spark):
    """Third implementation: a brute-force pure-Python scan over the sf0.001
    boilerplate corpus — dict of every 8-gram → set of carrying docs, flag
    offsets whose gram recurs in >= 2 docs, merge consecutive offsets —
    must reproduce the Spark operator row-for-row."""
    from ch_pdf_parse_spark.operators.substring import (
        _boiler_corpus, dedup_substring)
    from ch_pdf_parse_spark.registry import _t

    got = {(r.doc_id, r.span_start, r.span_end, r.n_tokens)
           for r in dedup_substring(spark, "/root/testdata/sf0.001").collect()}

    corpus = {
        r.doc_id: r.text
        for r in _boiler_corpus(
            _t(spark, "/root/testdata/sf0.001", "documents")).collect()
    }
    k = SUBSTR_K
    gram_docs = {}
    for did, text in corpus.items():
        l = text.split(" ")
        for i in range(len(l) - k + 1):
            gram_docs.setdefault(tuple(l[i:i + k]), set()).add(did)
    want = set()
    for did, text in corpus.items():
        l = text.split(" ")
        offs = [i + 1 for i in range(len(l) - k + 1)
                if len(gram_docs[tuple(l[i:i + k])]) >= 2]
        run = []
        for o in offs + [None]:
            if run and (o is None or o != run[-1] + 1):
                want.add((did, run[0], run[-1] + k - 1,
                          run[-1] + k - run[0]))
                run = []
            if o is not None:
                run.append(o)
    assert got == want
    assert len(got) > 0


def test_fold_checksums_match_direct_window(spark):
    """r6 fold guard: o_rank_correlation's pw_chk columns (computed via the
    pairwise formulation) must equal the direct-window recomputation in
    pandas on the sf0.001 lineitem table."""
    from ch_pdf_parse_spark.operators.order_metrics import o_rank_correlation

    got = {r.l_orderkey: (r.pw_chk1, r.pw_chk2)
           for r in o_rank_correlation(spark, "/root/testdata/sf0.001")
           .collect()}

    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])
    want = {}
    for g, grp in li.drop_duplicates().groupby("l_orderkey"):
        lns = sorted(grp["l_linenumber"].tolist())
        c1 = c2 = 0
        for rank, ln in enumerate(lns, start=1):
            score = 300 - rank
            c1 += score * ln
            c2 += score * (ln * ln + 7)
        want[g] = (c1, c2)
    assert got == want


def test_scrub_spans_excises_exactly_the_flagged_tokens(spark):
    """scrub_spans (the Lee et al. removal half): every token inside a
    flagged (span_start, span_end) range is dropped, everything else —
    including docs with no spans and non-text columns — passes through
    unchanged. Verified against a pure-Python third implementation driven
    by the SAME duplicate_spans output."""
    from ch_pdf_parse_spark.operators.substring import scrub_spans

    rows = [
        (1, BP + " " + _unique_doc(1)),
        (2, _unique_doc(2, 20) + " " + BP),
        (3, _unique_doc(3, 5) + " " + BP + " " + _unique_doc(33, 5)),
        (4, _unique_doc(4)),
        (5, _unique_doc(5)),
    ]
    corpus = _df(spark, rows)
    spans = duplicate_spans(corpus)
    got = {r.doc_id: r.text
           for r in scrub_spans(corpus, spans).collect()}

    # third implementation: python token-slice from the collected spans
    by_doc = {}
    for s in spans.collect():
        by_doc.setdefault(s.doc_id, []).append((s.span_start, s.span_end))
    want = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        ranges = by_doc.get(doc_id)
        if ranges is None:
            want[doc_id] = text
        else:
            want[doc_id] = " ".join(
                t for i, t in enumerate(toks, start=1)
                if not any(a <= i <= b for a, b in ranges))
    assert got == want
    # the planted paragraph is gone from every carrier, carriers keep
    # their unique remainder, clean docs are byte-identical
    for doc_id in (1, 2, 3):
        assert "bp0" not in got[doc_id] and got[doc_id]
    assert got[4] == rows[3][1] and got[5] == rows[4][1]


def test_scrub_then_rescan_finds_nothing(spark):
    """One scrub pass over the planted corpus removes every cross-document
    duplicated span: re-running duplicate_spans on the scrubbed corpus
    returns empty (this corpus splices no new k-grams; in general Lee et
    al. iterate — scrub_spans' docstring says so)."""
    from ch_pdf_parse_spark.operators.substring import scrub_spans

    rows = [
        (1, BP + " " + _unique_doc(1)),
        (2, _unique_doc(2, 20) + " " + BP),
        (3, _unique_doc(3)),
    ]
    corpus = _df(spark, rows)
    scrubbed = scrub_spans(corpus, duplicate_spans(corpus))
    assert duplicate_spans(scrubbed).count() == 0
