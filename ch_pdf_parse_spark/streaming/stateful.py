"""Custom stateful streaming operator: cross-batch document assembly.

At crawler/OCR fan-in scale there is no upstream guarantee that one
document's pages land in one file or one micro-batch — pages arrive
independently, out of order, across triggers. ``assemble_documents`` is the
``applyInPandasWithState`` operator for that shape: per-doc state in the
streaming state store accumulates page payloads; the moment a document's
page set is complete its extraction (core.extract_document — same golden
semantics as the batch pipeline) is emitted exactly once and the page
payloads are replaced by a few-byte completion tombstone (which absorbs
late redeliveries; expirable via ``done_ttl``). Incomplete documents
survive restarts via the checkpoint.

This is the beyond-reference streaming story (the reference itself is
strictly request/response batch, SURVEY.md §2.11): the batch job covers the
corpus, ``incremental.py`` covers file-grained arrival, and this operator
covers page-grained arrival with cross-batch state.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import constants as C
from .. import core

PAGE_ROW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("page", T.IntegerType()),
    T.StructField("total_pages", T.IntegerType()),
    # JSON [{"kind":..,"text":..,"media_ref":..,"offset":..}, ...] in span
    # arrival order (within-page order is semantic: media pairing is
    # positional, SURVEY.md §2 J1/O2)
    T.StructField("spans_json", T.StringType()),
])

ASSEMBLED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_spans", T.IntegerType()),
    T.StructField("markdown", T.StringType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("total_pages", T.IntegerType()),
    # JSON {page: "<page's spans_json chunk>"} — chunks stay opaque strings
    # in state, so a trigger re-serializes only string references, never the
    # accumulated spans themselves (single-value state is rewritten per
    # commit regardless; this bounds the CPU, not the bytes)
    T.StructField("page_chunks", T.StringType()),
])


def _span_tuple(d: dict) -> tuple:
    return (d.get("kind"), d.get("text"), d.get("media_ref"),
            int(d.get("offset", 0)))


_PENDING = -1   # total_pages not yet known
_DONE = -2      # tombstone: document already emitted

_TTL_UNIT_MS = {"millisecond": 1, "milliseconds": 1,
                "second": 1000, "seconds": 1000,
                "minute": 60_000, "minutes": 60_000,
                "hour": 3_600_000, "hours": 3_600_000}


def _ttl_ms(ttl: str | int) -> int:
    """Duration string ('30 minutes') or raw ms → milliseconds.
    PySpark's GroupState.setTimeoutDuration accepts ONLY an int of ms —
    passing the human-readable string crashed every real done_ttl stream
    (found by the round-4 end-to-end expiry test; the fake-state unit test
    recorded whatever object it was handed and masked it)."""
    if isinstance(ttl, int):
        return ttl
    n, unit = ttl.split()
    return int(n) * _TTL_UNIT_MS[unit]


def _assemble(key, pdfs: Iterator[pd.DataFrame], state: GroupState,
              done_ttl: str | None = None):
    doc_id = key[0]
    if getattr(state, "hasTimedOut", False):
        state.remove()  # an expired completion tombstone
        return
    if state.exists:
        total, acc = state.get
        if total == _DONE:
            # already emitted — a page row redelivered AFTER completion must
            # be ignored, not accumulate fresh state (removing the state on
            # completion left a zombie partial entry, holding page payloads
            # forever, whenever an at-least-once upstream redelivered late).
            # The tombstone is a few bytes per completed doc; a deployment
            # that needs it bounded adds a GroupStateTimeout to expire it.
            return
        chunks = json.loads(acc)
        total = None if total < 0 else total
    else:
        total, chunks = None, {}
    for pdf in pdfs:
        for pg, sj, tp in zip(pdf["page"], pdf["spans_json"],
                              pdf["total_pages"]):
            # at-least-once upstreams may redeliver a page row: first
            # delivery wins, duplicates are ignored (completion counts
            # DISTINCT pages, never raw rows)
            chunks.setdefault(str(int(pg)), sj)
            # null total_pages = "total not yet known" (a feed may only know
            # it on the last page); int(None/NaN) would crash the task
            if tp is not None and not pd.isna(tp):
                total = int(tp)
    if total is not None and len(chunks) >= total:
        spans = []
        for pg in sorted(chunks, key=int):
            spans.extend(json.loads(chunks[pg]))
        recs, md = core.extract_document([_span_tuple(d) for d in spans])
        state.update((_DONE, ""))
        if done_ttl is not None:
            state.setTimeoutDuration(_ttl_ms(done_ttl))
        yield pd.DataFrame(
            [{"doc_id": doc_id, "n_spans": len(recs), "markdown": md}])
    else:
        state.update((_PENDING if total is None else total,
                      json.dumps(chunks, ensure_ascii=False)))


def assemble_documents(pages: DataFrame,
                       done_ttl: str | None = None) -> DataFrame:
    """Stateful page→document assembly over a streaming DataFrame of
    PAGE_ROW_SCHEMA rows. Emits one ASSEMBLED_SCHEMA row per document,
    exactly once, when all its pages have arrived (across micro-batches
    and restarts). Completion leaves a few-byte tombstone in state so that
    pages redelivered after emission are absorbed rather than accumulating
    zombie partial state; pass ``done_ttl`` (e.g. ``"30 minutes"``, or raw
    milliseconds) to expire tombstones once the upstream's redelivery window
    has passed, bounding state size on unbounded corpora.

    Operational caveat (measured): a query with processing-time timeouts
    NEVER self-terminates under ``trigger(availableNow=True)`` — Spark keeps
    scheduling empty micro-batches to service future timeouts. With
    ``done_ttl`` set, run a continuous trigger (timeouts fire on the empty
    batches) and stop the query explicitly; use availableNow only for the
    no-ttl drain shape."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if done_ttl
               else GroupStateTimeout.NoTimeout)

    def fn(key, pdfs, state):
        return _assemble(key, pdfs, state, done_ttl)

    return pages.groupBy("doc_id").applyInPandasWithState(
        fn,
        outputStructType=ASSEMBLED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def pages_of(docs: DataFrame) -> DataFrame:
    """Batch helper: shred a documents table into PAGE_ROW_SCHEMA rows (the
    page-grained arrival feed), preserving within-page span arrival order."""
    spans = docs.select(
        "doc_id", F.posexplode("spans").alias("idx", "s")
    ).select(
        "doc_id", "idx", "s",
        # floor, not cast-truncation: corrupt negative offsets must group
        # under the same page that unpack_offset/np.divmod derive (matches
        # pipeline.py and relational.py)
        F.floor(F.coalesce(F.col("s.offset"), F.lit(0)) / F.lit(C.OFFSET_PAGE))
        .cast("int").alias("page"),
    )
    per_page = (
        spans.groupBy("doc_id", "page")
        .agg(
            F.to_json(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "s"))),
                    lambda x: x["s"],
                )
            ).alias("spans_json"),
        )
    )
    n_pages = spans.groupBy("doc_id").agg(
        F.countDistinct("page").cast("int").alias("total_pages"))
    # docs with empty/null spans produce no posexplode rows — without a
    # synthetic page the streaming assembly would silently never emit them
    # while the batch pipeline emits (doc_id, [], ''); one empty page row
    # keeps the two paths' coverage identical
    empty = docs.where(F.col("spans").isNull() | (F.size("spans") == 0)).select(
        "doc_id",
        F.lit(0).cast("int").alias("page"),
        F.lit(1).cast("int").alias("total_pages"),
        F.lit("[]").alias("spans_json"),
    )
    return (
        per_page.join(n_pages, "doc_id")
        .select("doc_id", "page", "total_pages", "spans_json")
        .unionByName(empty)
    )
