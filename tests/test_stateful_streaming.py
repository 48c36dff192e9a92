"""Stateful streaming assembly: pages arrive across separate triggered runs;
each document's extraction is emitted exactly once, when complete, and
matches the batch pipeline's markdown bit-for-bit."""

import os

from pyspark.sql import functions as F

from ch_pdf_parse_spark.pipeline import extract_documents
from ch_pdf_parse_spark.streaming.stateful import (
    PAGE_ROW_SCHEMA,
    assemble_documents,
    pages_of,
)


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(PAGE_ROW_SCHEMA).parquet(src)
    (
        assemble_documents(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def test_pages_assemble_across_runs(spark, corpus_dir, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "assembled")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    pages = pages_of(docs).cache()

    # drop 1: even pages only — multi-page docs stay incomplete in state
    pages.where(F.col("page") % 2 == 0).write.mode("overwrite") \
        .parquet(os.path.join(src, "drop1"))
    _drain(spark, src + "/*", out, ckpt)
    got1 = spark.read.parquet(out)
    single_page = pages.groupBy("doc_id").count().where("count = 1")
    complete1 = pages.where(F.col("page") % 2 == 0) \
        .join(single_page, "doc_id").select("doc_id").distinct().count()
    assert got1.count() == complete1  # only fully-arrived docs emitted

    # drop 2: the odd pages — every doc completes, none emitted twice
    pages.where(F.col("page") % 2 == 1).write.mode("overwrite") \
        .parquet(os.path.join(src, "drop2"))
    _drain(spark, src + "/*", out, ckpt)
    got = {(r["doc_id"], r["markdown"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["doc_id"], r["markdown"])
            for r in extract_documents(docs).select("doc_id", "markdown").collect()}
    assert got == want

    # rerun with nothing new: a no-op
    _drain(spark, src + "/*", out, ckpt)
    assert spark.read.parquet(out).count() == docs.count()


def test_duplicate_page_delivery_is_ignored(spark, corpus_dir, tmp_path):
    """At-least-once upstreams may redeliver a page row: completion must
    count distinct pages, first delivery wins, output unchanged."""
    src = str(tmp_path / "pages_dup")
    out = str(tmp_path / "assembled_dup")
    ckpt = str(tmp_path / "ckpt_dup")
    os.makedirs(src)

    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet")) \
        .where("size(spans) > 0")
    pages = pages_of(docs).cache()
    multi = pages.groupBy("doc_id").count().where("count >= 2") \
        .select("doc_id").limit(1)
    victim = [r["doc_id"] for r in multi.collect()]
    assert victim, "fixture corpus should contain a multi-page doc"

    # drop 1: page 0 of the victim doc, delivered TWICE (two files)
    p0 = pages.join(multi, "doc_id").where("page = 0")
    p0.write.mode("overwrite").parquet(os.path.join(src, "drop1"))
    p0.write.mode("overwrite").parquet(os.path.join(src, "drop1b"))
    _drain(spark, src + "/*", out, ckpt)
    # duplicate rows must NOT count as completion
    assert not os.path.exists(os.path.join(out, "_SUCCESS")) or \
        spark.read.parquet(out).where(
            F.col("doc_id").isin(victim)).count() == 0

    # drop 2: the rest of the corpus's pages → everything completes once
    pages.write.mode("overwrite").parquet(os.path.join(src, "drop2"))
    _drain(spark, src + "/*", out, ckpt)
    got = {(r["doc_id"], r["markdown"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["doc_id"], r["markdown"])
            for r in extract_documents(docs).select("doc_id", "markdown").collect()}
    assert got == want


def test_empty_and_null_span_docs_assemble_like_batch(spark, corpus_dir,
                                                      tmp_path):
    """Docs with empty or null spans arrays must flow through pages_of →
    assemble with the same coverage as the batch pipeline (they used to
    vanish: posexplode emits no rows, so no page ever arrived)."""
    src = str(tmp_path / "pages_empty")
    out = str(tmp_path / "assembled_empty")
    ckpt = str(tmp_path / "ckpt_empty")
    os.makedirs(src)

    base = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet")) \
        .select("doc_id", "spans").limit(2)
    extra = spark.createDataFrame(
        [("doc_empty", []), ("doc_null", None)], base.schema)
    docs = base.unionByName(extra)

    pages_of(docs).write.mode("overwrite").parquet(os.path.join(src, "d1"))
    _drain(spark, src + "/*", out, ckpt)
    got = {(r["doc_id"], r["n_spans"], r["markdown"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["doc_id"], len(r["spans"] or []), r["markdown"])
            for r in extract_documents(docs)
            .select("doc_id", "spans", "markdown").collect()}
    assert {d for d, _, _ in got} == {d for d, _, _ in want}
    assert ("doc_empty", 0, "") in got and ("doc_null", 0, "") in got


def test_assemble_tolerates_null_total_pages():
    """A feed that only knows total_pages on the final page sends NULL until
    then — int(None) used to crash the task; 'not yet known' must behave
    like _PENDING."""
    import json

    import pandas as pd

    from ch_pdf_parse_spark import core, fixtures
    from ch_pdf_parse_spark.streaming.stateful import _assemble

    doc = fixtures.generate_document(5)
    by_page = {}
    for k, t, m, o in doc.spans:
        by_page.setdefault(o // core.C.OFFSET_PAGE, []).append(
            {"kind": k, "text": t, "media_ref": m, "offset": o})
    want_recs, want_md = core.extract_document(list(doc.spans))
    pages = sorted(by_page)
    assert len(pages) >= 2, "fixture doc 5 should be multi-page"

    state = _FakeState()
    emitted = []
    for i, pg in enumerate(pages):
        tp = len(by_page) if i == len(pages) - 1 else None  # NULL until last
        pdf = pd.DataFrame(
            [(pg, tp, json.dumps(by_page[pg], ensure_ascii=False))],
            columns=["page", "total_pages", "spans_json"])
        # nullable int column arrives as float NaN through Arrow — mimic it
        pdf["total_pages"] = pdf["total_pages"].astype("float64")
        emitted.extend(_assemble((doc.doc_id,), iter([pdf]), state))
    assert len(emitted) == 1
    assert emitted[0].iloc[0]["markdown"] == want_md


class _FakeState:
    """Minimal GroupState stand-in for driving _assemble as a pure function."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None


def test_assemble_kernel_property_random_delivery():
    """Pure-Python property: for random docs, ANY delivery schedule of page
    rows (random batch partitioning, random order, random duplicates) emits
    the document exactly once, with output equal to the batch oracle."""
    import json
    import random

    import pandas as pd

    from ch_pdf_parse_spark import core, fixtures
    from ch_pdf_parse_spark.streaming.stateful import _assemble

    rng = random.Random(7)
    for di in range(25):
        doc = fixtures.generate_document(di)
        spans = list(doc.spans)
        want_recs, want_md = core.extract_document(spans)

        by_page = {}
        for k, t, m, o in spans:
            by_page.setdefault(o // core.C.OFFSET_PAGE, []).append(
                {"kind": k, "text": t, "media_ref": m, "offset": o})
        rows = [(pg, len(by_page), json.dumps(chunk, ensure_ascii=False))
                for pg, chunk in by_page.items()]
        # duplicates + shuffle + random batch partitioning
        rows += [rng.choice(rows) for _ in range(rng.randint(0, 3))]
        rng.shuffle(rows)
        batches = []
        i = 0
        while i < len(rows):
            j = i + rng.randint(1, max(1, len(rows) - i))
            batches.append(rows[i:j])
            i = j

        state = _FakeState()
        emitted = []
        for batch in batches:
            pdf = pd.DataFrame(batch, columns=["page", "total_pages",
                                               "spans_json"])
            emitted.extend(_assemble((doc.doc_id,), iter([pdf]), state))
        assert len(emitted) == 1, f"doc {di}: emitted {len(emitted)} times"
        out = emitted[0].iloc[0]
        assert out["markdown"] == want_md
        assert out["n_spans"] == len(want_recs)
        # completion leaves only the tombstone (no zombie page payloads even
        # when a duplicate row arrived after the doc emitted)
        assert state.get[0] == -2 and state.get[1] == ""


def test_done_ttl_expiry_removes_tombstone():
    """With done_ttl set, completion schedules a timeout and the timed-out
    callback clears the tombstone (bounded state on unbounded corpora)."""
    import json

    import pandas as pd

    from ch_pdf_parse_spark import core, fixtures
    from ch_pdf_parse_spark.streaming.stateful import _assemble

    doc = fixtures.generate_document(3)
    by_page = {}
    for k, t, m, o in doc.spans:
        by_page.setdefault(o // core.C.OFFSET_PAGE, []).append(
            {"kind": k, "text": t, "media_ref": m, "offset": o})
    rows = [(pg, len(by_page), json.dumps(chunk, ensure_ascii=False))
            for pg, chunk in by_page.items()]

    class _TtlState(_FakeState):
        def __init__(self):
            super().__init__()
            self.ttl = None
            self.hasTimedOut = False

        def setTimeoutDuration(self, d):
            self.ttl = d

    state = _TtlState()
    pdf = pd.DataFrame(rows, columns=["page", "total_pages", "spans_json"])
    emitted = list(_assemble((doc.doc_id,), iter([pdf]), state, "30 minutes"))
    assert len(emitted) == 1
    # setTimeoutDuration must receive int MILLISECONDS (the pyspark API
    # rejects duration strings — masked here until the real-stream test)
    assert state.get == (-2, "") and state.ttl == 30 * 60 * 1000

    # the timeout fires: Spark invokes the function with no data rows
    state.hasTimedOut = True
    assert list(_assemble((doc.doc_id,), iter([]), state, "30 minutes")) == []
    assert not state.exists


def test_done_ttl_expires_in_real_stream(spark, corpus_dir, tmp_path):
    """End-to-end tombstone expiry through a REAL streaming query (the unit
    test above drives a fake state — which masked that setTimeoutDuration
    needs int milliseconds): after all docs complete, the store holds one
    tombstone per doc; once the ttl passes, a subsequent micro-batch fires
    the processing-time timeouts and the store drains. NB: a query with
    processing-time timeouts never self-terminates under availableNow (Spark
    keeps scheduling empty batches to service future timeouts — verified),
    so this runs a continuous micro-batch trigger and stops explicitly."""
    import time

    src = str(tmp_path / "pages_ttl")
    out = str(tmp_path / "assembled_ttl")
    ckpt = str(tmp_path / "ckpt_ttl")
    os.makedirs(src)

    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    n_docs = docs.count()
    pages_of(docs).write.mode("overwrite").parquet(os.path.join(src, "d1"))

    q = (
        assemble_documents(
            spark.readStream.schema(PAGE_ROW_SCHEMA).parquet(src + "/*"),
            done_ttl="1 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def state_op():
            for p in reversed(q.recentProgress):
                ops = p.get("stateOperators") or []
                if ops:
                    return ops[0]
            return {}

        deadline = time.time() + 120
        # phase 1: every doc emitted, tombstones resident
        while time.time() < deadline:
            s1 = state_op()
            if s1.get("numRowsTotal") == n_docs:
                break
            time.sleep(0.5)
        else:
            raise AssertionError(f"tombstones never reached {n_docs}: {state_op()}")
        # phase 2: ttl passes -> a later empty batch removes them all
        while time.time() < deadline:
            s2 = state_op()
            if s2.get("numRowsTotal") == 0:
                break
            time.sleep(0.5)
        else:
            raise AssertionError(f"tombstones never expired: {state_op()}")
        assert spark.read.parquet(out).count() == n_docs
    finally:
        q.stop()
