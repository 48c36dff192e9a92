"""Raw wire-format ingest: packed binary document shards → `documents` rows.

The reference's true S1 source is raw PDF bytes parsed per document
(/root/reference/predict/pdf2markdown.py:44-61: open bytes with PyMuPDF,
rasterize pages, decode into spans). The sandbox corpus is pre-parsed spans
(SURVEY §2.1), so this module supplies the missing *wire-format lifecycle* on
a deterministic stand-in container: documents are serialized to packed binary
shards, shipped as opaque bytes, and parsed back inside Spark from a
``binaryFile`` scan — the same read-bytes→decode→extract shape a raw-PDF
deployment would use, with the PDF decoder swapped for a deterministic codec
(same precedent as the multimodal decode stubs).

Container format ``CPW1`` (one shard file = many documents):

    shard   := b"CPW1" record* footer
    footer  := b"CPWE" u32(n_records)
    record  := SYNC u32(payload_len) payload u32(crc32(payload))
    payload := str(doc_id) u32(n_spans | NULL32) span*
    span    := str(kind) str(text) str(media_ref) u8(flag) i32(offset)
    str     := u32(byte_len | NULL32) utf8_bytes      # NULL32 = 0xFFFFFFFF
    SYNC    := b"\\xc5\\xd2\\x0c\\x77"                # resync marker

All integers little-endian. NULL is distinct from empty at every level
(null spans array, null text, null offset via flag=0) — the corpus and the
adversarial gate both carry such rows.

Why this shape scales to 10^12 documents:

* **Many docs per shard, not file-per-doc.** 10^12 objects would drown any
  listing/commit path; ~4 MB of packed docs per shard at sandbox scale,
  256-512 MB in production, keeps the file count at ~10^7 and each
  ``binaryFile`` task decoding one whole shard (the format is
  deliberately read-whole — parallelism comes from shard count, which the
  writer controls, not from intra-file splits).
* **Per-record CRC + sync marker.** A flipped byte costs one record, not the
  shard: the parser CRC-checks each record and on mismatch (or a corrupt
  length field) scans forward to the next SYNC marker. One corrupt record
  degrades per-record — it must never abort a 10^12-row job. A missing
  footer (truncated upload) is likewise counted, not raised.
* **Deterministic bytes.** Shard membership is ``crc32(doc_id) % n_shards``
  and records are doc_id-sorted within a shard, so the written bytes are a
  pure function of (corpus, n_shards) — resumable re-writes produce
  identical shards (idempotent overwrite; tmp + atomic rename per file
  keeps retried/speculative tasks from publishing partial shards).
* **Decode cost is the honest floor.** Parsing is per-record Python over raw
  bytes inside ``mapInPandas`` — exactly the per-document decode any raw-PDF
  ingest pays (the reference pays PyMuPDF per page); Spark-side batching is
  per-shard, and everything downstream of the parse is the existing
  zero-shuffle Arrow kernel. The parsed rows carry ``n_spans`` so the
  oversized-doc salting route (pipeline.extract_documents) still sees its
  stored stats column.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"CPW1"
FOOTER_MAGIC = b"CPWE"
SYNC = b"\xc5\xd2\x0c\x77"
NULL32 = 0xFFFFFFFF
_U32 = struct.Struct("<I")
_I32 = struct.Struct("<i")

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]))),
    T.StructField("n_spans", T.IntegerType()),
])

STATS_SCHEMA = T.StructType([
    T.StructField("shard_path", T.StringType()),
    T.StructField("n_records", T.IntegerType()),
    T.StructField("n_corrupt", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


# ---------------------------------------------------------------- encoding

def _put_str(buf: bytearray, s: str | None) -> None:
    if s is None:
        buf += _U32.pack(NULL32)
    else:
        b = s.encode("utf-8")
        buf += _U32.pack(len(b))
        buf += b


def encode_record(doc_id: str | None, spans) -> bytes:
    """One document → one framed wire record (SYNC + len + payload + crc)."""
    payload = bytearray()
    _put_str(payload, doc_id)
    if spans is None:
        payload += _U32.pack(NULL32)
    else:
        payload += _U32.pack(len(spans))
        for s in spans:
            # accept either dict-shaped or attr-shaped span rows
            get = s.get if isinstance(s, dict) else lambda k, _s=s: getattr(_s, k)
            _put_str(payload, get("kind"))
            _put_str(payload, get("text"))
            _put_str(payload, get("media_ref"))
            off = get("offset")
            if off is None:
                payload += b"\x00" + _I32.pack(0)
            else:
                payload += b"\x01" + _I32.pack(int(off))
    return SYNC + _U32.pack(len(payload)) + bytes(payload) + \
        _U32.pack(zlib.crc32(bytes(payload)))


def encode_shard(rows: Iterable[tuple[str | None, object]]) -> bytes:
    """(doc_id, spans) rows → full shard bytes with header + footer."""
    out = bytearray(MAGIC)
    n = 0
    for doc_id, spans in rows:
        out += encode_record(doc_id, spans)
        n += 1
    out += FOOTER_MAGIC + _U32.pack(n)
    return bytes(out)


# ---------------------------------------------------------------- decoding

class _Cursor:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int):
        self.b, self.i = b, i

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise ValueError("truncated")
        v = self.b[self.i:self.i + n]
        self.i += n
        return v

    def u32(self) -> int:
        return _U32.unpack(self.take(4))[0]


def _get_str(c: _Cursor) -> str | None:
    n = c.u32()
    if n == NULL32:
        return None
    if n > len(c.b) - c.i:
        raise ValueError("bad string length")
    return c.take(n).decode("utf-8")


def _parse_payload(payload: bytes) -> tuple[str | None, list | None]:
    c = _Cursor(payload, 0)
    doc_id = _get_str(c)
    n = c.u32()
    if n == NULL32:
        spans = None
    else:
        if n > len(payload):  # a span is ≥15 bytes; cheap sanity bound
            raise ValueError("bad span count")
        spans = []
        for _ in range(n):
            kind = _get_str(c)
            text = _get_str(c)
            media = _get_str(c)
            flag = c.take(1)[0]
            off = _I32.unpack(c.take(4))[0]
            spans.append({"kind": kind, "text": text, "media_ref": media,
                          "offset": off if flag else None})
    if c.i != len(payload):
        raise ValueError("trailing bytes in payload")
    return doc_id, spans


def parse_shard(data: bytes) -> tuple[list[tuple[str | None, list | None]], int]:
    """Decode one shard → (records, n_corrupt).

    Corruption contract: a record whose CRC or structure fails is skipped by
    scanning to the next SYNC marker; a truncated tail / missing footer adds
    one corrupt count and stops. Never raises on hostile bytes.
    """
    records: list[tuple[str | None, list | None]] = []
    corrupt = 0
    if data[:4] != MAGIC:
        return records, 1
    i = 4
    end = len(data)
    while i < end:
        if data[i:i + 4] == FOOTER_MAGIC:
            # footer count is advisory (the CRCs are the integrity check); a
            # mismatch with ZERO framing/CRC hits means records were silently
            # lost upstream — but when corruption was already counted, the
            # mismatch is explained and must not double-count the same loss
            if corrupt == 0 and (
                    len(data) - i < 8
                    or _U32.unpack(data[i + 4:i + 8])[0] != len(records)):
                corrupt += 1
            return records, corrupt
        if data[i:i + 4] != SYNC:
            corrupt += 1
            nxt = data.find(SYNC, i + 1)
            if nxt < 0:
                return records, corrupt
            i = nxt
            continue
        try:
            c = _Cursor(data, i + 4)
            plen = c.u32()
            if plen > end - c.i:
                raise ValueError("bad record length")
            payload = c.take(plen)
            crc = c.u32()
            if crc != zlib.crc32(payload):
                raise ValueError("crc mismatch")
            records.append(_parse_payload(payload))
            i = c.i
        except ValueError:
            corrupt += 1
            nxt = data.find(SYNC, i + 4)
            if nxt < 0:
                return records, corrupt
            i = nxt
    corrupt += 1  # ran off the end without a footer: truncated shard
    return records, corrupt


# ---------------------------------------------------------------- Spark IO

def write_wire_shards(docs: DataFrame, out_dir: str, n_shards: int = 8) -> int:
    """Spark-parallel shard writer: one task per shard, deterministic bytes.

    Returns the number of shards written. ``out_dir`` must be a filesystem
    path visible to the executors (local-mode sandbox: any local dir; a real
    cluster points this at shared storage — the tmp+rename publish keeps
    retried tasks idempotent either way).
    """
    os.makedirs(out_dir, exist_ok=True)
    sharded = docs.select(
        "doc_id", "spans",
        (F.crc32(F.coalesce(F.col("doc_id"), F.lit("\x00null")).cast("binary"))
         % n_shards).cast("int").alias("shard"))

    def _write(key, pdf):
        shard = int(key[0])
        pdf = pdf.sort_values("doc_id", kind="mergesort", na_position="first")
        data = encode_shard(
            (None if pd.isna(d) else d,
             # a NULL array column reaches pandas as None (or NaN on some
             # Arrow paths) — both mean "spans is NULL", not "empty"
             None if s is None or isinstance(s, float) else s)
            for d, s in zip(pdf["doc_id"], pdf["spans"]))
        path = os.path.join(out_dir, f"shard-{shard:05d}.cpw")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pd.DataFrame({"shard_path": [path],
                             "n_records": [len(pdf)],
                             "n_corrupt": [0],
                             "n_bytes": [len(data)]})

    stats = sharded.groupBy("shard").applyInPandas(_write, STATS_SCHEMA)
    return stats.count()


def _parse_batches(it: Iterator[pd.DataFrame], want_stats: bool
                   ) -> Iterator[pd.DataFrame]:
    for pdf in it:
        for path, content in zip(pdf["path"], pdf["content"]):
            records, corrupt = parse_shard(bytes(content))
            if want_stats:
                yield pd.DataFrame({"shard_path": [path],
                                    "n_records": [len(records)],
                                    "n_corrupt": [corrupt],
                                    "n_bytes": [len(content)]})
            else:
                yield pd.DataFrame({
                    "doc_id": [d for d, _ in records],
                    "spans": [s for _, s in records],
                    "n_spans": [None if s is None else len(s)
                                for _, s in records],
                })


def _binary_scan(spark: SparkSession, path: str) -> DataFrame:
    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.cpw").load(path)
            .select("path", "content"))


def read_wire(spark: SparkSession, path: str) -> DataFrame:
    """``binaryFile`` scan → parsed `documents` rows (doc_id, spans, n_spans).

    Drop-in replacement for the parquet `documents` source: feeding this into
    ``pipeline.extract_documents`` is the full raw-bytes S1 lifecycle.
    Corrupt records are dropped per-record (see parse_shard); audit the drop
    count with ``wire_scan_stats`` — same scan, stats projection.
    """
    return _binary_scan(spark, path).mapInPandas(
        lambda it: _parse_batches(it, want_stats=False), DOC_SCHEMA)


def wire_scan_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-shard ingest audit: (shard_path, n_records, n_corrupt, n_bytes).

    The per-partition metrics row the north rule's lineage story wants for
    ingest: a nonzero ``n_corrupt`` names the exact shard to re-fetch."""
    return _binary_scan(spark, path).mapInPandas(
        lambda it: _parse_batches(it, want_stats=True), STATS_SCHEMA)
