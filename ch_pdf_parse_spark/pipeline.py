"""Flagship extraction pipeline (zero-shuffle scale path).

Input (per BASELINE.json ``input_hint``)::

    documents(doc_id string,
              spans array<struct<kind,text,media_ref,offset:int>>)

Output::

    (doc_id string,
     spans array<struct<kind,text,media_ref,offset:int>>,   -- parsed_json analog
     markdown string)                                        -- mdstring analog

Design for 10^12 documents:

* Documents arrive **nested** (one row per doc), so the common case is a pure
  ``mapInPandas`` — embarrassingly parallel, **no shuffle at all**. Arrow
  batches many documents per Python call (no per-row Python).
* The long tail of oversized documents (span count > SALT_SPAN_THRESHOLD) is
  **salted page-wise**: explode → per-(doc,page) partial extraction
  (``applyInPandas``) → per-doc stitch. This replaces the reference's
  drop-oversized-pages guard (/root/reference/train/preprocess.py:568-571)
  with skew-defeating redistribution (north_rule), because page folds are
  independent except for a single boundary bit (cross-page paragraph
  continuation, /root/reference/predict/pdf2markdown.py:571-577), which the
  stitch step resolves exactly.

Both paths reproduce the golden oracle (``core.extract_document``) bit-for-bit
— asserted by tests/test_pipeline.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from . import constants as C
from . import core

SPAN_STRUCT = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    T.StructField("markdown", T.StringType()),
])

_ORDERED_STRUCT = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("y1", T.IntegerType()),
    T.StructField("x1", T.IntegerType()),
    T.StructField("x0", T.IntegerType()),   # region_x0 from XY-cut
])

_MEDIA_STRUCT = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("ref", T.StringType()),
])

_PARTIAL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("page", T.IntegerType()),
    T.StructField("ordered", T.ArrayType(_ORDERED_STRUCT)),
    T.StructField("media", T.ArrayType(_MEDIA_STRUCT)),
])


def _spans_to_tuples(spans) -> list[tuple[str, str, str, int]]:
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def normalize_columns(columns) -> tuple[str, ...]:
    """Validate + canonicalize an output-column projection. One definition so
    job.py / run_with_lineage can fail fast BEFORE the staging copy (a typo'd
    --columns must not cost a full input pass) and duplicates can't reach the
    salted branch's select (where they'd surface as a confusing unionByName
    AnalysisException). Canonical order = OUTPUT_SCHEMA order, matching the
    kernel's emit order regardless of how the caller ordered the names."""
    cols = tuple(columns)
    bad = set(cols) - {"spans", "markdown"}
    if not cols or bad or len(set(cols)) != len(cols):
        raise ValueError(
            f"columns must be non-empty, duplicate-free, and a subset of "
            f"('spans', 'markdown'); got {columns!r}")
    return tuple(c for c in ("spans", "markdown") if c in cols)


def _extract_arrow(it, columns: tuple[str, ...] = ("spans", "markdown")):
    """mapInArrow kernel: operate on the columnar batch directly — the nested
    spans array is consumed as flat child arrays (no per-span dict or object
    materialization, which costs more than the extraction itself). The
    per-document semantics live in ``kernel.extract_document`` (optimized
    twin of the golden oracle ``core.extract_document`` — differentially
    tested in tests/test_kernel.py).

    ``columns`` is manual projection pushdown through the UDF barrier:
    Catalyst prunes columns up to the scan, but nothing inside a
    mapInArrow can be pruned for it — a consumer that selects only
    ``spans`` would still pay Arrow serialization for every markdown
    string (≈ the document's full text again) unless the kernel skips
    building the column entirely."""
    import numpy as np
    import pyarrow as pa

    from . import kernel
    from . import native

    def low_card_strs(arr):
        # kind/media_ref are low-cardinality ("text", "", doc-local refs):
        # decoding via dictionary indices reuses one Python str per distinct
        # value instead of materializing one per span — ~8-15x faster than
        # to_pylist on these columns (measured on the bench corpus).
        enc = arr.fill_null("").dictionary_encode()
        pool = np.array(enc.dictionary.to_pylist(), dtype=object)
        return pool[enc.indices.to_numpy(zero_copy_only=False)].tolist()

    use_native = native.available()
    for batch in it:
        if use_native:
            # whole-batch C kernel (classification + XY-cut + fold over the
            # Arrow buffers directly — round 7; bit-identical, differential-
            # pinned in tests/test_kernel.py); None → sliced/dictionary/
            # empty/OOM edge, fall through to the Python twin
            out = native.extract_batch(
                batch, "spans" in columns, "markdown" in columns)
            if out is not None:
                yield out
                continue
        doc_ids = batch.column("doc_id")
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):  # normalize
            spans = spans.combine_chunks()
        lst = spans
        offs = lst.offsets.to_numpy(zero_copy_only=False)
        vals = lst.values
        # `.values` ignores array slicing: on a sliced ListArray it returns the
        # FULL child array, so converting it would do work proportional to the
        # parent, not this batch (quadratic across batches). Spark's IPC
        # batches arrive compacted, but trim anyway so any caller is safe.
        if offs[0] > 0 or offs[-1] < len(vals):
            vals = vals.slice(offs[0], offs[-1] - offs[0])
            offs = offs - offs[0]
        kinds = low_card_strs(vals.field("kind"))
        texts = vals.field("text").to_pylist()
        refs = low_card_strs(vals.field("media_ref"))
        pages, y1s, x1s = kernel.decode_offsets(
            vals.field("offset").fill_null(0)  # null geometry ≡ origin
            .to_numpy(zero_copy_only=False))
        want_spans = "spans" in columns
        want_md = "markdown" in columns
        # flat output columns + list offsets (built directly; no per-span dicts)
        ok, ot, om = [], [], []
        loffs = [0]
        out_md = []
        for i in range(len(batch)):
            lo, hi = offs[i], offs[i + 1]  # absolute into the child arrays
            recs, md = kernel.extract_document(
                kinds, texts, refs, pages, y1s, x1s, lo, hi,
                want_records=want_spans, want_markdown=want_md)
            if want_spans:
                for k, t, m in recs:
                    ok.append(k)
                    ot.append(t)
                    om.append(m)
                loffs.append(len(ok))
            if want_md:
                out_md.append(md)
        out_cols = [doc_ids.combine_chunks()
                    if isinstance(doc_ids, pa.ChunkedArray) else doc_ids]
        out_names = ["doc_id"]
        if want_spans:
            # output span order == position within the doc's records list
            orders = [o for i in range(len(batch))
                      for o in range(loffs[i + 1] - loffs[i])]
            struct = pa.StructArray.from_arrays(
                [pa.array(ok, pa.string()), pa.array(ot, pa.string()),
                 pa.array(om, pa.string()), pa.array(orders, pa.int32())],
                names=["kind", "text", "media_ref", "offset"],
            )
            out_cols.append(
                pa.ListArray.from_arrays(pa.array(loffs, pa.int32()), struct))
            out_names.append("spans")
        if want_md:
            out_cols.append(pa.array(out_md, pa.string()))
            out_names.append("markdown")
        yield pa.RecordBatch.from_arrays(out_cols, names=out_names)


# ---------------------------------------------------------------------------
# salted path: per-page partials + per-doc stitch
# ---------------------------------------------------------------------------


def _extract_page_partial(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel for one (doc_id, page) group of exploded spans:
    the page-local half only (classification + XY-cut via core.prepare_page
    — the expensive work, embarrassingly parallel). The cross-page fold
    happens in _stitch_doc, so kind inheritance across page boundaries
    (a page opening as the continuation of a caption/equation, the orphan-
    caption drop quirk) is exact by construction — no boundary heuristics."""
    doc_id = pdf["doc_id"].iloc[0]
    page = int(pdf["page"].iloc[0])
    pdf = pdf.sort_values("idx")
    spans = [
        core.Span.from_raw(k, t, m, int(o), int(i))
        for k, t, m, o, i in zip(pdf["kind"], pdf["text"], pdf["media_ref"],
                                 pdf["offset"], pdf["idx"])
    ]
    ordered, media = core.prepare_page(spans)
    return pd.DataFrame([{
        "doc_id": doc_id, "page": page,
        "ordered": [{"kind": s.kind, "text": s.text, "y1": s.y1, "x1": s.x1,
                     "x0": x0} for s, x0 in ordered],
        "media": [{"kind": m.kind, "ref": m.media_ref} for m in media],
    }])


def _stitch_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: run the golden fold (core.fold_page) over the
    per-page prepared results in page order. Sequential per doc but cheap —
    O(spans) string work; the parallel-expensive parts already ran."""
    pdf = pdf.sort_values("page")
    doc_id = pdf["doc_id"].iloc[0]
    state = core.ExtractState()
    for row in pdf.itertuples(index=False):
        page = int(row.page)
        ordered = [
            (core.Span(o["kind"], o["text"], "", page, o["y1"], o["x1"], i),
             o["x0"])
            for i, o in enumerate(row.ordered)
        ]
        media = [core.Span(m["kind"], "", m["ref"], page, 0, 0, 0)
                 for m in row.media]
        core.fold_page(state, page, ordered, media)
    recs, md = core.finish_document(state)
    return pd.DataFrame([{
        "doc_id": doc_id,
        "spans": [{"kind": k, "text": t, "media_ref": m, "offset": o}
                  for k, t, m, o in recs],
        "markdown": md,
    }])


def extract_documents(
    docs: DataFrame,
    salt_threshold: int = C.SALT_SPAN_THRESHOLD,
    columns: tuple[str, ...] = ("spans", "markdown"),
) -> DataFrame:
    """End-to-end extraction. Zero-shuffle ``mapInPandas`` for regular docs;
    page-salted two-stage aggregation for the oversized long tail.

    ``columns`` selects which output columns the kernel builds AND ships
    (subset of {"spans", "markdown"}): projection pushdown through the UDF
    barrier — a spans-only consumer (the driver's ``extract_spans``) skips
    Arrow-serializing every markdown string, a markdown-only consumer
    (``extract_markdown``) skips the span arrays. Catalyst cannot do this
    pruning for a black-box mapInArrow."""
    from functools import partial

    from .packaging import ensure_on_executors

    cols = normalize_columns(columns)
    schema = T.StructType(
        [T.StructField("doc_id", T.StringType())]
        + [f for f in OUTPUT_SCHEMA.fields if f.name in cols])

    ensure_on_executors(docs.sparkSession)
    # Route on a stored stats column when available: `n_spans` is written at
    # ingest, so the oversized-branch predicate is pushed into the scan and
    # min/max row-group pruning makes the second pass near-free (at 10^12 docs
    # the salted long tail is <0.1% of files). Fallback: compute size(spans).
    n = F.col("n_spans") if "n_spans" in docs.columns else F.size("spans")
    # Source-side routing pushdown (round 7): a source whose scan is opaque
    # to Catalyst (the wire parse lives inside a mapInArrow) can offer the
    # oversized predicate itself — `_chpdf_wire_over(threshold)` returns the
    # parsed rows of only the shards whose sidecar max n_spans exceeds the
    # threshold (sources/wireformat.py), or None to decline. Without it the
    # big branch re-executes the FULL scan+parse to keep its (usually zero)
    # rows. Identical rows either way; the hook only prunes the second pass.
    wire_over = getattr(docs, "_chpdf_wire_over", None)
    docs = docs.select("doc_id", "spans")
    # null spans rows must route somewhere (n is null ⇒ BOTH branch
    # predicates are unknown and the doc would silently vanish): they take
    # the small branch and extract to (empty spans, empty markdown)
    small = docs.where((n <= salt_threshold) | n.isNull())
    small_out = small.mapInArrow(partial(_extract_arrow, columns=cols), schema)

    big = None
    if wire_over is not None:
        pruned = wire_over(salt_threshold)
        if pruned is not None:
            if getattr(pruned, "_chpdf_known_empty", False):
                # the source proved NO record can route big: the salted
                # branch contributes zero rows, so the union is the small
                # branch — skip planning the empty explode/groupBy subtree
                return small_out
            big = (pruned.where(F.col("n_spans") > salt_threshold)
                   .select("doc_id", "spans"))
    if big is None:
        big = docs.where(n > salt_threshold)

    off = F.coalesce(F.col("s.offset"), F.lit(0))  # null geometry ≡ origin
    exploded = (
        big.select("doc_id", F.posexplode("spans").alias("idx", "s"))
        .select(
            "doc_id", "idx",
            F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"), off.alias("offset"),
            # floor, not cast-truncation: a (corrupt) negative offset must
            # group under the same page that unpack_offset/np.divmod derive
            F.floor(off / F.lit(C.OFFSET_PAGE)).cast("int").alias("page"),
        )
    )
    partials = exploded.groupBy("doc_id", "page").applyInPandas(
        _extract_page_partial, _PARTIAL_SCHEMA
    )
    # the salted long tail is <0.1% of docs — it always computes both columns
    # (the stitch is the cheap half) and projects down to match
    big_out = (partials.groupBy("doc_id")
               .applyInPandas(_stitch_doc, OUTPUT_SCHEMA)
               .select("doc_id", *cols))
    return small_out.unionByName(big_out)


def read_documents(spark, path: str) -> DataFrame:
    """Read the input corpus (parquet file or Iceberg table, sources.catalog)."""
    from .sources.catalog import read_table

    return read_table(spark, path)
