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
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=200),
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


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31),
    n_users=st.integers(min_value=1, max_value=6),
    n_events=st.integers(min_value=1, max_value=60),
)
def test_sessionize_matches_brute_spec(ray_session, seed, n_users, n_events):
    """Randomized sessionize vs a per-user brute spec — includes equal-ts
    events and gaps exactly AT the threshold (strictly-greater semantics)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from indexer_ray.pipelines.events import sessionize

    rng = np.random.default_rng(seed)
    uid = rng.integers(0, n_users, size=n_events)
    # minute offsets with deliberate 0 and exactly-30 gaps in the pool
    offs = np.cumsum(rng.choice([0, 1, 5, 30, 31, 90], size=n_events))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + offs.astype("timedelta64[m]").astype("timedelta64[us]")
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n_events), type=pa.int64()),
            "user_id": pa.array(uid, type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    got = (
        sessionize(rd.from_arrow(t), gap_minutes=30.0)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    # brute spec
    rows = []
    df = pd.DataFrame({"event_id": np.arange(n_events), "user_id": uid, "ts": ts})
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        sess, start, last, cnt, idx = [], None, None, 0, -1
        for _, r in g.iterrows():
            if last is None or (r["ts"] - last) / np.timedelta64(1, "m") > 30.0:
                if last is not None:
                    rows.append((u, idx, start, last, cnt))
                idx += 1
                start, cnt = r["ts"], 0
            last = r["ts"]
            cnt += 1
        rows.append((u, idx, start, last, cnt))
    want = (
        pd.DataFrame(
            rows,
            columns=["user_id", "session_idx", "session_start", "session_end", "n_events"],
        )
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
        .astype(
            {
                "user_id": "int64",
                "session_idx": "int64",
                "n_events": "int64",
                "session_start": "datetime64[us]",
                "session_end": "datetime64[us]",
            }
        )
    )
    got = got.astype({"user_id": "int64", "session_idx": "int64", "n_events": "int64"})
    pd.testing.assert_frame_equal(got, want)
