"""Wire-parser micro-benchmark (round-6 verdict item #7).

The .cpw decode is the wire lifecycle's dominant cost (per-record Python
over raw bytes; the r5 columnar rewrite already bought 2× over the
dict-per-span parser). This tool A/Bs the production parser against
candidate variants on one synthetic shard shaped like the bench corpus
(~214 spans/doc, mixed span kinds, NULLs present), single-thread, so a
variant's win/loss is attributable before touching the production codec.

Variants:
* prod            — sources/wireformat._parse_shard_columnar as shipped
                    (round 6: span-field loop unrolled, appends locally
                    bound — promoted after this tool measured it faster;
                    quiet-window honest margin 1.06×, contended up to 1.5×)
* looped_baseline — the pre-round-6 tuple-loop parser, kept verbatim as
                    the identical-output baseline the promotion is
                    re-validated against every run

Usage: python tools/bench_wire_parse.py [n_docs] [reps]
Prints one JSON line with per-variant best wall + docs/sec and asserts the
variants produce IDENTICAL columns (same framing/corruption contract).
"""

from __future__ import annotations

import json
import os
import sys
import time
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from ch_pdf_parse_spark.sources.wireformat import (  # noqa: E402
    FOOTER_MAGIC, MAGIC, NULL32, SYNC, _Columns, _I32, _U32, encode_record,
    _parse_shard_columnar)


def make_shard(n_docs: int, seed: int = 7) -> bytes:
    import random

    rng = random.Random(seed)
    kinds = ["text", "title", "table", "figure", "formula", None]
    out = bytearray(MAGIC)
    for d in range(n_docs):
        n_spans = rng.choice([0, 3, 80, 214, 214, 300])
        if d % 97 == 0:
            spans = None
        else:
            spans = [{
                "kind": rng.choice(kinds),
                "text": (None if rng.random() < 0.05
                         else "样本 span text %d with some words" % j),
                "media_ref": ("media/%d.png" % j if rng.random() < 0.1
                              else None),
                "offset": (None if rng.random() < 0.05 else j * 17),
            } for j in range(n_spans)]
        out += encode_record(f"doc_{d:06d}", spans)
    out += FOOTER_MAGIC + _U32.pack(n_docs)
    return bytes(out)


def parse_looped(data: bytes) -> _Columns:
    """Semantics-identical twin of _parse_shard_columnar holding the
    PRE-round-6 span-field tuple loop (`for lst in (kinds, texts, medias)`,
    unbound appends) — kept as the measured baseline the production
    unrolled parser is compared against every run."""
    out = _Columns()
    if data[:4] != MAGIC:
        out.corrupt = 1
        return out
    u32, i32 = _U32.unpack_from, _I32.unpack_from
    find = data.find
    kinds, texts, medias, offs = out.kinds, out.texts, out.medias, out.offs
    end = len(data)
    i = 4
    while i < end:
        head = data[i:i + 4]
        if head == FOOTER_MAGIC:
            if out.corrupt == 0 and (
                    end - i < 8 or u32(data, i + 4)[0] != len(out.doc_ids)):
                out.corrupt += 1
            return out
        mark = len(kinds)
        if head == SYNC and end - i >= 8:
            try:
                plen = u32(data, i + 4)[0]
                p0 = i + 8
                pend = p0 + plen
                if pend + 4 > end:
                    raise ValueError("bad record length")
                if u32(data, pend)[0] != zlib.crc32(data[p0:pend]):
                    raise ValueError("crc mismatch")
                pos = p0
                if pos + 4 > pend:
                    raise ValueError("truncated")
                n = u32(data, pos)[0]
                pos += 4
                if n == NULL32:
                    doc_id = None
                else:
                    if pos + n > pend:
                        raise ValueError("bad string length")
                    doc_id = data[pos:pos + n].decode("utf-8")
                    pos += n
                if pos + 4 > pend:
                    raise ValueError("truncated")
                n_spans = u32(data, pos)[0]
                pos += 4
                if n_spans == NULL32:
                    cnt = None
                else:
                    if n_spans > plen:
                        raise ValueError("bad span count")
                    for _ in range(n_spans):
                        for lst in (kinds, texts, medias):
                            if pos + 4 > pend:
                                raise ValueError("truncated")
                            n = u32(data, pos)[0]
                            pos += 4
                            if n == NULL32:
                                lst.append(None)
                            else:
                                if pos + n > pend:
                                    raise ValueError("bad string length")
                                lst.append(data[pos:pos + n].decode("utf-8"))
                                pos += n
                        if pos + 5 > pend:
                            raise ValueError("truncated")
                        offs.append(i32(data, pos + 1)[0]
                                    if data[pos] else None)
                        pos += 5
                    cnt = n_spans
                if pos != pend:
                    raise ValueError("trailing bytes in payload")
                out.doc_ids.append(doc_id)
                out.counts.append(cnt)
                i = pend + 4
                continue
            except (ValueError, UnicodeDecodeError):
                del kinds[mark:], texts[mark:], medias[mark:], offs[mark:]
        out.corrupt += 1
        nxt = find(SYNC, i + (4 if head == SYNC else 1))
        if nxt < 0:
            return out
        i = nxt
    out.corrupt += 1
    return out


def _cols_tuple(c: _Columns):
    return (c.doc_ids, c.counts, c.kinds, c.texts, c.medias, c.offs,
            c.corrupt)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    data = make_shard(n_docs)

    variants = {"prod": _parse_shard_columnar, "looped_baseline": parse_looped}
    # equality first — on the clean shard AND on a corrupted twin
    base = _cols_tuple(_parse_shard_columnar(data))
    bad = bytearray(data)
    bad[len(bad) // 3] ^= 0xFF  # one flipped byte mid-shard
    bad = bytes(bad)
    base_bad = _cols_tuple(_parse_shard_columnar(bad))
    for name, fn in variants.items():
        assert _cols_tuple(fn(data)) == base, f"{name} diverges (clean)"
        assert _cols_tuple(fn(bad)) == base_bad, f"{name} diverges (corrupt)"

    res = {}
    for name, fn in variants.items():
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(data)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        res[name] = {"best_sec": round(best, 4),
                     "docs_per_sec_1thread": round(n_docs / best, 1)}
    print(json.dumps({"n_docs": n_docs, "shard_mb": round(len(data) / 2**20, 1),
                      "variants": res}))


if __name__ == "__main__":
    main()
