"""Golden-parquet oracles for the non-SQL-expressible queries.

The XY-cut extraction flagship and the multimodal decode-stub pipeline cannot
be *recomputed* in ANSI SQL — but the driver's hash check doesn't need SQL
that recomputes them, only SQL that *returns the expected rows*. The expected
rows come from the same pure-Python oracles the pytest goldens already trust
(``core.extract_document``; the deterministic media fake in
``operators/multimodal.py``): this module materializes their output as
deterministic parquet beside the fixture corpus, and ``registry.oracle_sql``
registers ``SELECT ... FROM read_parquet('<golden>')`` per query. That turns
the flagship's driver row from "trust my pytest" into a driver-verified hash.

Determinism: golden content is a pure function of (sf, seed=42, GOLDEN_VERSION)
— the corpus itself is fixtures.write_corpus's cached pure function, and every
derived value (extraction spans, markdown md5/len, media md5-math, float32
band means) is bit-stable. Numeric columns are written in the exact Arrow type
Spark's query exports (int32 offsets/lengths, float32 features) so the
driver's schema/hash comparison sees identical types on both sides.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from . import fixtures
from .core import extract_document

# bump when any golden-producing rule changes so stale caches regenerate
GOLDEN_VERSION = "v2"  # v2: + phash dedup table

SPANS = "golden_spans.parquet"
MARKDOWN = "golden_markdown.parquet"
MEDIA_FEATURES = "golden_media_features.parquet"
FRAME_SAMPLE = "golden_frame_sample.parquet"
PHASH_DEDUP = "golden_phash_dedup.parquet"


def _media_rows(doc_id: str, spans: list[tuple[str, str, str, int]]):
    """Golden rows for the media pipeline, via the SAME shared pure-Python
    twins the multimodal tests use (media_meta_py / _decode_image — one
    definition next to the SQL expressions they mirror)."""
    from .operators.multimodal import IMAGE_KINDS, _decode_image, media_meta_py

    for kind, _text, media_ref, _off in spans:
        if media_ref == "":
            continue
        media_type = "image" if kind in IMAGE_KINDS else "video"
        width, height, n_frames, payload = media_meta_py(media_ref)
        img = _decode_image(payload, width, height)
        band0 = np.array_split(img, 8)[0]
        f0 = np.float32(float(np.round(band0.mean(), 3)))
        yield doc_id, media_ref, media_type, len(payload), f0, n_frames


def write_golden(sf: float, base: str | None = None,
                 force: bool = False) -> str:
    """Materialize all four golden tables beside the fixture corpus; returns
    the corpus dir. Idempotent per (sf, GOLDEN_VERSION). The corpus seed is
    fixed at the fixture default (42): the corpus cache directory is keyed by
    sf alone, so a seed parameter here would silently return the cached
    other-seed corpus/golden — not offered."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = fixtures.write_corpus(sf, base=base)
    marker = os.path.join(out, "_GOLDEN_SUCCESS")
    if not force and os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == GOLDEN_VERSION:
                return out

    docs = pq.read_table(os.path.join(out, "documents.parquet"),
                         columns=["doc_id", "spans"])
    span_rows: list[tuple] = []
    md_rows: list[tuple] = []
    feat_rows: list[tuple] = []
    frame_rows: list[tuple] = []
    phash_media: list[tuple] = []  # (doc_id, media_ref, phash)
    from .operators.multimodal import _decode_image, dhash64_py, media_meta_py

    for doc_id, spans in zip(docs.column("doc_id").to_pylist(),
                             docs.column("spans").to_pylist()):
        raw = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in spans or []]
        recs, md = extract_document(raw)
        span_rows.extend((doc_id, k, t, m, o) for k, t, m, o in recs)
        # md5 over UTF-8 bytes, length in characters — F.md5 / F.length twins
        md_rows.append((doc_id, hashlib.md5(md.encode()).hexdigest(), len(md)))
        for d, ref, mtype, n_bytes, f0, n_frames in _media_rows(doc_id, raw):
            feat_rows.append((d, ref, mtype, n_bytes, f0))
            if mtype == "video":
                frame_rows.extend(
                    (d, ref, i) for i in range(0, n_frames, 4))
        # phash corpus: every media object, plus a '#dup' copy for docs
        # whose id ends in 0/3 (operators/multimodal._phash_corpus twin)
        for kind, _t, ref, _o in raw:
            if ref == "":
                continue
            w, h, _nf, payload = media_meta_py(ref)
            ph = dhash64_py(_decode_image(payload, w, h))
            phash_media.append((doc_id, ref, ph))
            if doc_id and doc_id[-1] in ("0", "3"):
                phash_media.append((doc_id + "#dup", ref, ph))
    phash_groups: dict[str, list[tuple]] = {}
    for d, ref, ph in phash_media:
        phash_groups.setdefault(ph, []).append((d, ref))
    phash_rows = [
        (ph, len(ms), len({r for _, r in ms}),
         min(d for d, _ in ms), min(r for _, r in ms))
        for ph, ms in phash_groups.items()
    ]

    # Atomic publish: write each table (and the marker) to a tmp path and
    # os.replace into place, so a concurrent oracle_sql() either sees the
    # complete previous file or the complete new one — never a half-written
    # parquet that would ArrowInvalid-degrade its query to rows-only
    # (round-3 advice). os.replace is atomic within one filesystem.
    def _write(name: str, cols: dict) -> None:
        tmp = os.path.join(out, f".{name}.tmp.{os.getpid()}")
        pq.write_table(pa.table(cols), tmp)
        os.replace(tmp, os.path.join(out, name))

    _write(SPANS, {
        "doc_id": pa.array([r[0] for r in span_rows], pa.string()),
        "kind": pa.array([r[1] for r in span_rows], pa.string()),
        "text": pa.array([r[2] for r in span_rows], pa.string()),
        "media_ref": pa.array([r[3] for r in span_rows], pa.string()),
        "ord": pa.array([r[4] for r in span_rows], pa.int32()),
    })
    _write(MARKDOWN, {
        "doc_id": pa.array([r[0] for r in md_rows], pa.string()),
        "md_hash": pa.array([r[1] for r in md_rows], pa.string()),
        "md_len": pa.array([r[2] for r in md_rows], pa.int32()),
    })
    _write(MEDIA_FEATURES, {
        "doc_id": pa.array([r[0] for r in feat_rows], pa.string()),
        "media_ref": pa.array([r[1] for r in feat_rows], pa.string()),
        "media_type": pa.array([r[2] for r in feat_rows], pa.string()),
        "n_bytes": pa.array([r[3] for r in feat_rows], pa.int32()),
        "f0": pa.array([r[4] for r in feat_rows], pa.float32()),
    })
    _write(FRAME_SAMPLE, {
        "doc_id": pa.array([r[0] for r in frame_rows], pa.string()),
        "media_ref": pa.array([r[1] for r in frame_rows], pa.string()),
        "frame_idx": pa.array([r[2] for r in frame_rows], pa.int32()),
    })
    _write(PHASH_DEDUP, {
        "phash": pa.array([r[0] for r in phash_rows], pa.string()),
        "n_media": pa.array([r[1] for r in phash_rows], pa.int64()),
        "n_refs": pa.array([r[2] for r in phash_rows], pa.int64()),
        "keeper_doc": pa.array([r[3] for r in phash_rows], pa.string()),
        "keeper_ref": pa.array([r[4] for r in phash_rows], pa.string()),
    })
    tmp_marker = f"{marker}.tmp.{os.getpid()}"
    with open(tmp_marker, "w") as f:
        f.write(GOLDEN_VERSION)
    os.replace(tmp_marker, marker)
    return out


def golden_sql(sf: float, base: str | None = None) -> dict[str, str]:
    """Materialize goldens for ``sf`` and return the oracle SQL per query."""
    out = write_golden(sf, base=base)

    def sel(name: str, cols: str) -> str:
        return f"SELECT {cols} FROM read_parquet('{os.path.join(out, name)}')"

    from .operators.multimodal import phash_neardup_sql

    return {
        "multimodal_phash_neardup": phash_neardup_sql(
            os.path.join(out, PHASH_DEDUP)),
        "extract_spans": sel(SPANS, "doc_id, kind, text, media_ref, ord"),
        "extract_spans_relational": sel(SPANS,
                                        "doc_id, kind, text, media_ref, ord"),
        "extract_markdown": sel(MARKDOWN, "doc_id, md_hash, md_len"),
        "multimodal_features": sel(
            MEDIA_FEATURES, "doc_id, media_ref, media_type, n_bytes, f0"),
        "multimodal_frame_sample": sel(FRAME_SAMPLE,
                                       "doc_id, media_ref, frame_idx"),
        "multimodal_phash_dedup": sel(
            PHASH_DEDUP, "phash, n_media, n_refs, keeper_doc, keeper_ref"),
    }
