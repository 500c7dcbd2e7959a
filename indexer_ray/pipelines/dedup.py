"""Deduplication family over a documents table (doc_id, text, ...).

Large-scale training-data operators, Ray-Data-first (the reference engine has
only exact path-keyed identity, SURVEY.md §2.7/A4):

  * exact_duplicates    — content-hash partition + per-group first-wins
  * minhash_lsh_pairs   — shingle -> minhash -> banded LSH buckets ->
                          candidate pairs -> exact Jaccard verification
  * simhash_pairs       — 64-bit simhash, 4x16-bit band blocking, Hamming
                          verification
  * embedding_dup_pairs — multi-table random-hyperplane LSH over an
                          embedding column, cosine verification (brute
                          mode for small inputs)
  * winnow_dup_pairs    — winnowing fingerprints (Schleimer et al. 2003):
                          substring-overlap detection — any shared token
                          run >= w+k-1 yields a shared fingerprint

Shuffle discipline: every operator pre-reduces inside `map_batches` (one
signature/hash row per doc) before its single groupby; candidate pair sets
are verified AFTER blocking, so the quadratic step only ever runs inside a
bucket.  Buckets larger than `max_bucket` contribute no pairs and are
reported in a `truncated_buckets` counter instead of silently exploding
(no-silent-caps rule).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from indexer_ray.conformance.lexer import tokenize_plain

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_MERSENNE = np.uint64((1 << 61) - 1)


def _hash64_bytes(b: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")


# ------------------------------------------------------------ exact dedup


def _content_hash_batch(batch: pa.Table, key: str) -> pa.Table:
    # 128-bit digest as two int64 columns: a 64-bit key has ~N^2/2^65
    # expected birthday collisions (~10^4 silent false merges at 10^12
    # docs); 128 bits pushes that to ~10^-15.  Signed int64 halves (not
    # uint64): keys above 2^63 force Ray's groupby key handling into a
    # pickled-object fallback path.
    his, los = [], []
    for v in batch.column(key).to_pylist():
        d = hashlib.blake2b((v or "").encode("utf-8"), digest_size=16).digest()
        his.append(int.from_bytes(d[:8], "big", signed=True))
        los.append(int.from_bytes(d[8:], "big", signed=True))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "hash_hi": pa.array(his, type=pa.int64()),
            "hash_lo": pa.array(los, type=pa.int64()),
        }
    )


def exact_duplicates(ds, key: str = "text"):
    """(keep_doc_id, dup_count) per distinct content: hash-partition the
    128-bit content hash, keep the smallest doc_id per group (first-wins,
    deterministic).  Returns one row per distinct content value."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: _content_hash_batch(b, key), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=4096
    )
    return hashed.groupby(["hash_hi", "hash_lo"]).aggregate(
        Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="dup_count")
    )


# ------------------------------------------------------------ minhash LSH


_TOKEN_HASH_CACHE: dict[str, int] = {}
_SHINGLE_B = np.uint64(1099511628211)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token; Zipfian vocab -> high cache hit rate."""
    cache = _TOKEN_HASH_CACHE
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = _hash64_bytes(t.encode())
            if len(cache) < 4_000_000:
                cache[t] = h
        out[i] = h
    return out


def _kgram_hashes(tokens: list[str], k: int) -> np.ndarray:
    """POSITIONAL uint64 k-gram hashes (vectorized rolling polynomial over
    per-token hashes: k vector ops per doc, no per-shingle hashing)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(tokens)
    if n < k:
        k = n
    with np.errstate(over="ignore"):
        acc = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            acc = (acc * _SHINGLE_B + th[j : n - k + 1 + j]) & _M64
    return acc


def _shingles(tokens: list[str], k: int) -> np.ndarray:
    """Sorted unique uint64 k-shingle hashes."""
    return np.unique(_kgram_hashes(tokens, k))


def _winnow(kgrams: np.ndarray, w: int) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
    published algorithm): the minimum k-gram hash of every window of w
    consecutive k-grams, deduplicated.  Guarantees every run of w k-grams
    contributes at least one fingerprint, so any shared substring of
    length >= w+k-1 tokens yields at least one shared fingerprint."""
    n = len(kgrams)
    if n == 0:
        return kgrams
    if n <= w:
        return np.unique(kgrams.min(keepdims=True))
    wins = np.lib.stride_tricks.sliding_window_view(kgrams, w)
    return np.unique(wins.min(axis=1))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (bit-parallel via unpackbits
    on the byte view — replaces the per-pair Python bin().count loop)."""
    if not len(x):
        return np.zeros(0, dtype=np.int64)
    return (
        np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
        .reshape(len(x), 64)
        .sum(axis=1)
        .astype(np.int64)
    )


class MinHashStage:
    """Per-doc minhash signature + banded emission (actor pool: permutation
    coefficients generated once per actor from the fixed seed)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm, self.bands = num_perm, bands
        self.rows = num_perm // bands
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray | None:
        x = _shingles(tokenize_plain(text or ""), self.shingle_k)
        if not len(x):
            return None
        with np.errstate(over="ignore"):
            # (a*x + b) mod 2^61-1, vectorized over (perm, shingle)
            prod = (self.a[:, None] * x[None, :] + self.b[:, None]) & _M64
            vals = (prod >> np.uint64(3)) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, sigs = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = self.signature(text)
            if sig is None:
                continue
            doc_ids.append(doc_id)
            sigs.append(sig)
        n = len(doc_ids)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "band": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.uint64()),
                }
            )
        # band hashing vectorized across the whole batch: a polynomial roll
        # over each band's `rows` signature values (equal band-slices still
        # collide identically — the LSH property — without the round-1
        # bands-per-doc Python loop of blake2b calls)
        S = np.stack(sigs)  # (n, num_perm) uint64
        bh = np.zeros((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for band in range(self.bands):
                acc = np.zeros(n, dtype=np.uint64)
                for j in range(self.rows):
                    acc = acc * _SHINGLE_B + S[:, band * self.rows + j]
                bh[:, band] = acc
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(np.asarray(doc_ids, dtype=np.int64), self.bands),
                    type=pa.int64(),
                ),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), type=pa.int32()
                ),
                "band_hash": pa.array(bh.ravel(), type=pa.uint64()),
            }
        )


_PAIR_PARTITIONS = 64


def _add_bucket_part(batch: pa.Table, n_parts: int = _PAIR_PARTITIONS) -> pa.Table:
    """Route each banded row to a bucket partition: ONE map_groups call per
    partition (not per bucket) keeps the per-group overhead off the ~N·bands
    tiny buckets — the shuffle key co-locates whole buckets."""
    bh = batch.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
    band = batch.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        part = ((bh ^ (band * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(n_parts)).astype(
            np.int32
        )
    return batch.append_column("part", pa.array(part, type=pa.int32()))


def _bucket_pairs_in_part(g: pd.DataFrame, max_bucket: int) -> pd.DataFrame:
    """All candidate pairs from every bucket in one partition, vectorized:
    sort by (band, band_hash, doc_id), find bucket boundaries with diff, and
    emit triangular pairs only for the (rare) buckets of size >= 2."""
    g = g.sort_values(["band", "band_hash", "doc_id"]).drop_duplicates(
        ["band", "band_hash", "doc_id"]
    )
    band = g["band"].to_numpy()
    bh = g["band_hash"].to_numpy()
    ids = g["doc_id"].to_numpy()
    n = len(ids)
    if n == 0:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "truncated": pd.Series([], dtype="int64"),
            }
        )
    starts = np.flatnonzero(np.r_[True, (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])])
    ends = np.r_[starts[1:], n]
    out_a, out_b, truncated = [], [], []
    for s, e in zip(starts, ends):
        size = e - s
        if size < 2:
            continue
        if size > max_bucket:
            truncated.append(int(size))
            continue
        ia, ib = np.triu_indices(size, k=1)
        out_a.append(ids[s:e][ia])
        out_b.append(ids[s:e][ib])
    doc_a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
    doc_b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
    res = pd.DataFrame(
        {
            "doc_a": doc_a.astype("int64"),
            "doc_b": doc_b.astype("int64"),
            "truncated": np.zeros(len(doc_a), dtype="int64"),
        }
    )
    if truncated:
        res = pd.concat(
            [res, pd.DataFrame({"doc_a": [-1] * len(truncated), "doc_b": [-1] * len(truncated), "truncated": truncated})],
            ignore_index=True,
        )
    return res


def _pairwise_jaccard_distributed(
    ds, pairs: pd.DataFrame, shingle_k: int, n_parts: int = _PAIR_PARTITIONS
) -> pd.DataFrame:
    """Exact shingle-set Jaccard for candidate pairs, with NO driver-side
    corpus iteration (the round-1 scale-killer): the corpus STREAMS through
    a shingle stage that drops every non-candidate doc (candidate-id routing
    table broadcast once via ray.put), each surviving doc's shingle set is
    routed to every pair-partition that references it, and one vectorized
    verify pass runs per partition.  Driver-side state is only the candidate
    pair list itself — the blocking OUTPUT, not the corpus.

    Returns (doc_a, doc_b, jaccard) for every input pair.
    """
    import ray

    if pairs.empty:
        return pairs.assign(jaccard=pd.Series([], dtype="float64"))
    pairs = pairs[["doc_a", "doc_b"]].drop_duplicates().reset_index(drop=True)
    # partition count tracks the pair count (>=64 pairs per part target):
    # tiny candidate sets shouldn't pay a 64-way shuffle's scheduling toll
    n_parts = int(np.clip(len(pairs) // 64, 4, n_parts))
    part_of_pair = (
        (pairs["doc_a"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        ^ pairs["doc_b"].to_numpy(np.uint64)
    ) % np.uint64(n_parts)
    pairs_by_part: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    doc_parts: dict[int, list[int]] = {}
    for p in np.unique(part_of_pair):
        sel = part_of_pair == p
        a = pairs["doc_a"].to_numpy()[sel]
        b = pairs["doc_b"].to_numpy()[sel]
        pairs_by_part[int(p)] = (a, b)
        for d in np.unique(np.concatenate([a, b])):
            doc_parts.setdefault(int(d), []).append(int(p))
    doc_parts_ref = ray.put(doc_parts)
    pairs_ref = ray.put(pairs_by_part)

    class _ShingleStage:
        def __init__(self, ref, k):
            self.doc_parts = ray.get(ref)  # one fetch per actor
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_part, out_doc, out_sh = [], [], []
            for doc_id, text in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                parts = self.doc_parts.get(doc_id)
                if not parts:
                    continue
                sh = _shingles(tokenize_plain(text or ""), self.k)
                for p in parts:
                    out_part.append(p)
                    out_doc.append(doc_id)
                    out_sh.append(sh)
            return pa.table(
                {
                    "part": pa.array(out_part, type=pa.int32()),
                    "doc_id": pa.array(out_doc, type=pa.int64()),
                    "shingles": pa.array(
                        [s.tolist() for s in out_sh], type=pa.list_(pa.uint64())
                    ),
                }
            )

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        a_ids, b_ids = ray.get(pairs_ref)[part]
        sh = {
            int(d): np.asarray(s, dtype=np.uint64)
            for d, s in zip(g["doc_id"], g["shingles"])
        }
        empty = np.empty(0, dtype=np.uint64)
        jac = np.empty(len(a_ids), dtype=np.float64)
        for i, (a, b) in enumerate(zip(a_ids, b_ids)):
            sa, sb = sh.get(int(a), empty), sh.get(int(b), empty)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac[i] = inter / union if union else 0.0
        return pd.DataFrame(
            {
                "doc_a": a_ids.astype("int64"),
                "doc_b": b_ids.astype("int64"),
                "jaccard": jac,
            }
        )

    return (
        ds.map_batches(
            _ShingleStage,
            fn_constructor_args=(doc_parts_ref, shingle_k),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=2048,
            concurrency=(1, 8),
        )
        .groupby("part")
        .map_groups(verify_part, batch_format="pandas")
        .to_pandas()
    )


def minhash_lsh_pairs(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 2000,
    verify: bool = True,
):
    """Near-duplicate pairs via MinHash + banded LSH.

    Returns a pandas DataFrame (doc_a, doc_b, jaccard) with doc_a < doc_b,
    verified against exact shingle-set Jaccard when `verify`.  Verification
    is fully distributed (`_pairwise_jaccard_distributed`): the corpus is
    never iterated on the driver.
    """
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_args=(num_perm, bands, shingle_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=2048,
        concurrency=(1, 8),
    )
    pairs = (
        sigs.map_batches(_add_bucket_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: _bucket_pairs_in_part(g, max_bucket), batch_format="pandas")
        .to_pandas()
    )
    truncated = int(pairs[pairs["truncated"] > 0]["truncated"].sum())
    pairs = pairs[pairs["truncated"] == 0][["doc_a", "doc_b"]].drop_duplicates()
    if truncated:
        print(f"[minhash_lsh_pairs] WARNING: skipped buckets covering {truncated} docs (> max_bucket)")
    if not verify or pairs.empty:
        pairs["jaccard"] = np.nan
        return pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    out = _pairwise_jaccard_distributed(ds, pairs, shingle_k)
    out = out[out["jaccard"] >= jaccard_threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(
    ds,
    pairs: pd.DataFrame | None = None,
    shingle_k: int = 3,
    threshold: float = 0.0,
    max_bucket: int = 2000,
) -> pd.DataFrame:
    """Exact n-gram (k-shingle) Jaccard for given candidate pairs — or, when
    ``pairs`` is None, for MinHash-LSH candidates (blocking first, so the
    quadratic step never touches the full corpus).  Output: (doc_a, doc_b,
    jaccard) with jaccard >= threshold.  Distributed verify, no driver-side
    corpus iteration."""
    if pairs is None:
        return minhash_lsh_pairs(
            ds, shingle_k=shingle_k, jaccard_threshold=threshold, max_bucket=max_bucket
        )
    out = _pairwise_jaccard_distributed(ds, pairs, shingle_k)
    return out[out["jaccard"] >= threshold].sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# --------------------------------------------------------------- simhash


class SimHashStage:
    """64-bit SimHash over the plain token multiset (tf-weighted)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            counts = Counter(tokenize_plain(text or ""))
            if not counts:
                out.append(0)
                continue
            hashes = _token_hashes(list(counts.keys()))
            weights = np.fromiter(counts.values(), dtype=np.float64, count=len(counts))
            bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            v = ((bits * 2.0 - 1.0) * weights[:, None]).sum(axis=0)
            sim_bits = (v > 0).astype(np.uint8)
            out.append(int(np.packbits(sim_bits, bitorder="little").view(np.uint64)[0]))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(out, type=pa.uint64()),
            }
        )


def simhash_signatures(ds):
    return ds.map_batches(SimHashStage, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=2048, concurrency=(1, 8))


def simhash_pairs(ds, max_hamming: int = 3, max_bucket: int = 2000) -> pd.DataFrame:
    """Near-dup pairs by SimHash: block on 4x16-bit bands (any pair within
    Hamming<=3 of 64 bits must agree exactly on at least one 16-bit quarter,
    pigeonhole), verify Hamming distance on candidates."""
    sigs = simhash_signatures(ds)

    def emit_bands(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch.column("simhash").to_numpy(zero_copy_only=False), dtype=np.uint64)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        docs, bands, keys = [], [], []
        for band in range(4):
            part = (sh >> np.uint64(16 * band)) & np.uint64(0xFFFF)
            docs.extend(doc.tolist())
            bands.extend([band] * len(doc))
            keys.extend(part.tolist())
        return pa.table(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "band": pa.array(bands, type=pa.int32()),
                "band_hash": pa.array(keys, type=pa.uint64()),
                "simhash": pa.array(np.tile(sh, 4), type=pa.uint64()),
            }
        )

    banded = sigs.map_batches(emit_bands, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=8192)

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "band_hash", "doc_id"]).drop_duplicates(
            ["band", "band_hash", "doc_id"]
        )
        band = g["band"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        n = len(ids)
        empty = pd.DataFrame(
            {"doc_a": [], "doc_b": [], "hamming": [], "truncated": []}
        ).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64", "truncated": "int64"}
        )
        if n == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])])
        ends = np.r_[starts[1:], n]
        frames = []
        truncated = []
        for s, e in zip(starts, ends):
            size = e - s
            if size < 2:
                continue
            if size > max_bucket:
                # no-silent-caps: surface skipped buckets as counter rows
                truncated.append(int(size))
                continue
            ia, ib = np.triu_indices(size, k=1)
            x = hs[s:e][ia] ^ hs[s:e][ib]
            ham = _popcount64(x)
            m = ham <= max_hamming
            if m.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_a": ids[s:e][ia][m].astype("int64"),
                            "doc_b": ids[s:e][ib][m].astype("int64"),
                            "hamming": ham[m].astype("int64"),
                            "truncated": np.zeros(int(m.sum()), dtype="int64"),
                        }
                    )
                )
        if truncated:
            frames.append(
                pd.DataFrame(
                    {
                        "doc_a": [-1] * len(truncated),
                        "doc_b": [-1] * len(truncated),
                        "hamming": [-1] * len(truncated),
                        "truncated": truncated,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else empty

    pairs = (
        banded.map_batches(_add_bucket_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
        )
    n_trunc = int(pairs.loc[pairs["truncated"] > 0, "truncated"].sum())
    if n_trunc:
        print(f"[simhash_pairs] WARNING: skipped buckets covering {n_trunc} docs (> max_bucket)")
    pairs = pairs[pairs["truncated"] == 0].drop(columns=["truncated"])
    return (
        pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


# --------------------------------------------- embedding near-dup / cosine


def embedding_dup_pairs(
    emb_ds,
    cosine_threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    brute: bool = False,
    max_bucket: int = 4000,
    n_tables: int = 4,
) -> pd.DataFrame:
    """Near-duplicate embedding pairs (vec_a < vec_b, cosine >= threshold).

    Scale path: multi-table random-hyperplane LSH — `n_tables` independent
    hash tables of `n_planes` sign bits each; vectors agreeing on ALL bits
    of ANY table become candidates (recall 1-(1-p^k)^L instead of the
    single-table p^k cliff at the threshold), exact cosine verifies inside
    buckets, pairs dedup across tables.  Each vector emits n_tables rows,
    so the shuffle grows L-fold — the standard LSH recall/cost trade.
    (`brute=True` is the exact baseline used by tests to measure recall.)"""
    import ray

    if brute:
        t = emb_ds.select_columns(["vec_id", "embedding"]).to_pandas()
        ids = t["vec_id"].to_numpy()
        X = np.stack(t["embedding"].to_numpy())
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = Xn @ Xn.T
        ia, ib = np.triu_indices(len(ids), k=1)
        m = sims[ia, ib] >= cosine_threshold
        return (
            pd.DataFrame({"vec_a": ids[ia][m], "vec_b": ids[ib][m], "cosine": sims[ia, ib][m]})
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )

    rng = np.random.default_rng(seed)

    class SignStage:
        def __init__(self, planes):
            self.planes = planes  # (n_tables, n_planes, dim) — broadcast once

        def __call__(self, batch: pa.Table) -> pa.Table:
            from indexer_ray.pipelines.ann import _embedding_matrix, _normalize

            Xn = _normalize(_embedding_matrix(batch.column("embedding")))
            n = len(Xn)
            keys = []
            for ti in range(len(self.planes)):
                bits = (Xn @ self.planes[ti].T) > 0
                key = np.full(n, np.uint64(ti) << np.uint64(56), dtype=np.uint64)
                for j in range(bits.shape[1]):
                    key |= bits[:, j].astype(np.uint64) << np.uint64(j)
                keys.append(key)
            return pa.table(
                {
                    "vec_id": pa.array(
                        np.tile(
                            batch.column("vec_id").to_numpy(zero_copy_only=False),
                            len(self.planes),
                        )
                    ),
                    "bucket": pa.array(np.concatenate(keys), type=pa.uint64()),
                    "embedding": pa.concat_arrays(
                        [batch.column("embedding").combine_chunks()] * len(self.planes)
                    ),
                }
            )

    # peek dim from schema/first row
    first = emb_ds.take(1)[0]
    dim = len(first["embedding"])
    planes = rng.standard_normal((n_tables, n_planes, dim))
    bucketed = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        SignStage,
        fn_constructor_args=(planes,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=(1, 8),
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        empty = pd.DataFrame(
            {"vec_a": [], "vec_b": [], "cosine": [], "truncated": []}
        ).astype(
            {"vec_a": "int64", "vec_b": "int64", "cosine": "float64", "truncated": "int64"}
        )
        if len(ids) < 2:
            return empty
        if len(ids) > max_bucket:
            # no-silent-caps: one counter row per skipped oversized bucket
            return pd.DataFrame(
                {"vec_a": [-1], "vec_b": [-1], "cosine": [0.0], "truncated": [len(ids)]}
            ).astype(empty.dtypes)
        X = np.stack(g["embedding"].to_numpy())
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = Xn @ Xn.T
        ia, ib = np.triu_indices(len(ids), k=1)
        m = sims[ia, ib] >= cosine_threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ia][m],
                "vec_b": ids[ib][m],
                "cosine": sims[ia, ib][m],
                "truncated": np.zeros(int(m.sum()), dtype="int64"),
            }
        )

    pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pandas").to_pandas()
    if pairs.empty:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
            {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
        )
    n_trunc = int(pairs.loc[pairs["truncated"] > 0, "truncated"].sum())
    if n_trunc:
        print(
            f"[embedding_dup_pairs] WARNING: skipped buckets covering {n_trunc} vectors (> max_bucket)"
        )
    pairs = pairs[pairs["truncated"] == 0]
    a = np.minimum(pairs["vec_a"], pairs["vec_b"])
    b = np.maximum(pairs["vec_a"], pairs["vec_b"])
    return (
        pd.DataFrame({"vec_a": a, "vec_b": b, "cosine": pairs["cosine"]})
        .drop_duplicates(["vec_a", "vec_b"])
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )


# ----------------------------------------------------------- winnowing

def winnow_fingerprints(ds, k: int = 5, w: int = 4):
    """(doc_id, fp) rows: winnowing fingerprints of each doc's plain token
    stream (one row per distinct selected k-gram hash).  Winnowing
    guarantees any shared token run of length >= w+k-1 produces at least
    one shared fp — the substring-overlap detector MinHash (a whole-doc
    similarity sketch) is not."""

    def _fp_batch(batch: pa.Table) -> pa.Table:
        doc_ids, fps = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sel = _winnow(_kgram_hashes(tokenize_plain(text or ""), k), w)
            doc_ids.extend([doc_id] * len(sel))
            fps.extend(sel.tolist())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "fp": pa.array(fps, type=pa.uint64()),
            }
        )

    return ds.map_batches(_fp_batch, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=2048)


def winnow_dup_pairs(
    ds,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 2000,
    n_parts: int = _PAIR_PARTITIONS,
) -> pd.DataFrame:
    """Overlap-duplicate pairs: docs sharing >= `min_shared` winnowing
    fingerprints (doc_a < doc_b, n_shared desc-agnostic).  Blocking is the
    LSH-bucket pattern: fps hash-route to partitions, each partition emits
    per-bucket pairs WITH per-part shared-counts (one vectorized pass), a
    final groupby sums counts across partitions.  Oversized fp buckets
    (boilerplate runs shared by >max_bucket docs) are dropped with a
    counter — no silent caps."""
    from ray.data.aggregate import Sum

    fps = winnow_fingerprints(ds, k=k, w=w)

    def _route(batch: pa.Table) -> pa.Table:
        from indexer_ray.functions.hashing import key_partition

        part = key_partition(batch.column("fp").to_numpy(zero_copy_only=False), n_parts)
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fp", "doc_id"]).drop_duplicates(["fp", "doc_id"])
        fp = g["fp"].to_numpy(dtype=np.uint64)
        ids = g["doc_id"].to_numpy()
        n = len(ids)
        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "n_shared": [], "truncated": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "n_shared": "int64", "truncated": "int64"}
        )
        if n == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, fp[1:] != fp[:-1]])
        ends = np.r_[starts[1:], n]
        out_a, out_b, truncated = [], [], []
        for s, e in zip(starts, ends):
            size = e - s
            if size < 2:
                continue
            if size > max_bucket:
                truncated.append(int(size))
                continue
            ia, ib = np.triu_indices(size, k=1)
            out_a.append(ids[s:e][ia])
            out_b.append(ids[s:e][ib])
        frames = []
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            pairs = pd.DataFrame({"doc_a": a.astype("int64"), "doc_b": b.astype("int64")})
            agg = pairs.groupby(["doc_a", "doc_b"], sort=False).size().reset_index(name="n_shared")
            agg["truncated"] = np.int64(0)
            frames.append(agg)
        if truncated:
            frames.append(
                pd.DataFrame(
                    {
                        "doc_a": [-1] * len(truncated),
                        "doc_b": [-1] * len(truncated),
                        "n_shared": [0] * len(truncated),
                        "truncated": truncated,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else empty

    counted = (
        fps.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("n_shared", alias_name="n_shared"), Sum("truncated", alias_name="truncated"))
        .to_pandas()
    )
    if counted.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "n_shared": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "n_shared": "int64"}
        )
    n_trunc = int(counted.loc[counted["truncated"] > 0, "truncated"].sum())
    if n_trunc:
        print(f"[winnow_dup_pairs] WARNING: skipped fp buckets covering {n_trunc} docs (> max_bucket)")
    out = counted[(counted["truncated"] == 0) & (counted["n_shared"] >= min_shared)]
    return (
        out[["doc_a", "doc_b", "n_shared"]]
        .astype({"doc_a": "int64", "doc_b": "int64", "n_shared": "int64"})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
