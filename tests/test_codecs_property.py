"""Property-based tests (hypothesis) for the round-2 byte-level codecs:
BMP encode/decode round-trip, PDF literal-string escaping round-trip,
key_partition range/determinism, popcount vs int.bit_count."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bmp_roundtrip(w, h, seed):
    from indexer_ray.pipelines.multimodal import decode_bmp, encode_bmp

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()


def _escape_pdf_literal(b: bytes) -> bytes:
    out = bytearray(b"(")
    for c in b:
        if c in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([c])
        elif c == 13:
            out += b"\\r"  # raw CR would be normalized by real parsers
        else:
            out.append(c)
    out += b")"
    return bytes(out)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=200))
def test_pdf_literal_string_roundtrip(payload):
    from indexer_ray.functions.extractors import _pdf_literal_string

    src = _escape_pdf_literal(payload)
    got, end = _pdf_literal_string(src, 0)
    assert end == len(src)
    assert got == payload


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=128),
)
def test_key_partition_range_and_determinism(keys, n_parts):
    from indexer_ray.functions.hashing import key_partition

    arr = np.array(keys, dtype=np.uint64)
    p1 = key_partition(arr, n_parts)
    p2 = key_partition(arr, n_parts)
    assert (p1 == p2).all()
    assert p1.dtype == np.int32
    assert (p1 >= 0).all() and (p1 < n_parts).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=100))
def test_popcount_matches_bit_count(vals):
    from indexer_ray.pipelines.dedup import _popcount64

    arr = np.array(vals, dtype=np.uint64)
    got = _popcount64(arr)
    assert got.tolist() == [int(v).bit_count() for v in vals]
