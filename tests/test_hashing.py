"""Identity + routing property tests (functions/hashing.py)."""

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from indexer_ray.functions.hashing import (
    hash64_str,
    hot_term_partitions,
    salt_of_doc,
    term_partition,
)


@given(st.text(max_size=50))
def test_hash64_deterministic_and_in_range(s):
    h = hash64_str(s)
    assert h == hash64_str(s)
    assert 0 <= h < 1 << 64


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=1, max_size=200),
       st.integers(min_value=1, max_value=64))
def test_salt_hash_space_order_preserving(ids, n_salts):
    d = np.array(sorted(ids), dtype=np.uint64)
    salts = salt_of_doc(d, n_salts)
    assert salts.max() < n_salts
    assert (np.diff(salts.astype(np.int64)) >= 0).all()  # monotone in doc_id


@given(st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=200),
       st.integers(min_value=1, max_value=64),
       st.integers(min_value=1, max_value=10**7 + 10))
def test_salt_dense_space_order_preserving_and_clipped(ids, n_salts, id_space):
    d = np.array(sorted(ids), dtype=np.uint64)
    salts = salt_of_doc(d, n_salts, id_space)
    assert salts.max() < n_salts  # ids beyond id_space clip, never overflow
    assert (np.diff(salts.astype(np.int64)) >= 0).all()


def test_salt_dense_space_balanced():
    # dense ids over [0, N): salts split into equal ranges
    N, S = 100_000, 8
    d = np.arange(N, dtype=np.uint64)
    salts = salt_of_doc(d, S, N)
    counts = np.bincount(salts, minlength=S)
    assert counts.min() >= (N // S) - 1
    assert counts.max() <= -(-N // S)


def test_term_partition_stability():
    assert term_partition("hello", 32) == term_partition("hello", 32)
    ps = hot_term_partitions("hello", 4, 32)
    assert len(ps) == 4
    assert all(0 <= p < 32 for p in ps)
