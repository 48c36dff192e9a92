"""Differential property tests: the C wire-shard parser (native.
parse_shard_batch) must agree with the Python parser
(_parse_shard_columnar + _doc_batch) BATCH-FOR-BATCH — including the
corrupt-record count — on arbitrary documents and arbitrary byte
corruption. Skipped wholesale when no C toolchain is available (the
engine then runs the Python parser everywhere)."""

import pytest
from hypothesis import given, settings, strategies as st

from ch_pdf_parse_spark import native
from ch_pdf_parse_spark.sources import wireformat as wf

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C toolchain: python parser is used")

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60)
_opt_text = st.one_of(st.none(), _text)

_span = st.fixed_dictionaries({
    "kind": _opt_text,
    "text": _opt_text,
    "media_ref": _opt_text,
    "offset": st.one_of(st.none(),
                        st.integers(min_value=-2**31, max_value=2**31 - 1)),
})

_doc = st.tuples(_opt_text, st.one_of(st.none(), st.lists(_span, max_size=8)))
_docs = st.lists(_doc, max_size=12)


def _assert_agree(data: bytes):
    got = native.parse_shard_batch(data)
    assert got is not None
    batch, corrupt = got
    cols = wf._parse_shard_columnar(data)
    want = wf._doc_batch(cols)
    assert corrupt == cols.corrupt, (corrupt, cols.corrupt)
    assert batch.equals(want), (batch.to_pydict(), want.to_pydict())


@settings(max_examples=150, deadline=None)
@given(_docs)
def test_clean_shards_agree(docs):
    _assert_agree(wf.encode_shard(docs))


@settings(max_examples=300, deadline=None)
@given(_docs, st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=0, max_value=255),
       st.integers(min_value=1, max_value=9))
def test_corrupted_shards_agree(docs, pos_seed, xor, width):
    data = bytearray(wf.encode_shard(docs))
    if not xor:
        xor = 0xFF
    for k in range(width):
        data[(pos_seed + k * 7919) % len(data)] ^= xor
    _assert_agree(bytes(data))


@settings(max_examples=150, deadline=None)
@given(_docs, st.integers(min_value=0, max_value=10**9))
def test_truncated_shards_agree(docs, cut_seed):
    data = wf.encode_shard(docs)
    _assert_agree(data[: cut_seed % (len(data) + 1)])


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_garbage_bytes_agree(blob):
    _assert_agree(blob)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_magic_plus_garbage_agree(blob):
    _assert_agree(wf.MAGIC + blob)


def test_invalid_utf8_and_surrogate_payloads_agree():
    """CRC-valid records whose strings are invalid UTF-8 (needs a buggy
    foreign encoder, not bit rot) must be dropped identically."""
    import struct
    import zlib

    def rec(payload: bytes) -> bytes:
        return (wf.SYNC + struct.pack("<I", len(payload)) + payload
                + struct.pack("<I", zlib.crc32(payload)))

    bad_strings = [
        b"\xff\xfe",          # invalid lead bytes
        b"\xc0\xaf",          # overlong 2-byte
        b"\xe0\x80\x80",      # overlong 3-byte
        b"\xed\xa0\x80",      # surrogate
        b"\xf0\x80\x80\x80",  # overlong 4-byte
        b"\xf4\x90\x80\x80",  # > U+10FFFF
        b"\xf5\x80\x80\x80",  # invalid lead
        b"abc\x80",           # stray continuation
        b"\xe4\xb8",          # truncated multibyte at end
    ]
    for bad in bad_strings:
        payload = (struct.pack("<I", len(bad)) + bad          # doc_id
                   + struct.pack("<I", 0))                    # 0 spans
        shard = (wf.MAGIC + rec(payload)
                 + wf.FOOTER_MAGIC + struct.pack("<I", 1))
        _assert_agree(shard)
        # same bytes inside a span's text field
        payload2 = (struct.pack("<I", wf.NULL32)              # null doc_id
                    + struct.pack("<I", 1)                    # 1 span
                    + struct.pack("<I", 0)                    # kind ""
                    + struct.pack("<I", len(bad)) + bad       # text
                    + struct.pack("<I", wf.NULL32)            # media null
                    + b"\x01" + struct.pack("<i", -7))
        shard2 = (wf.MAGIC + rec(payload2)
                  + wf.FOOTER_MAGIC + struct.pack("<I", 1))
        _assert_agree(shard2)
