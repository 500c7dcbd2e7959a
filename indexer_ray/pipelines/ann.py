"""Approximate-nearest-neighbor search over an embedding column
(list<float>), per the training-data operator set.

  * ann_brute_topk — exact cosine top-k baseline: the query matrix is
    broadcast once (ray.put) and every batch does one numpy matmul; each
    batch emits only its LOCAL top-k per query (partial top-k combiner), so
    the driver-side reduce sees #batches x k rows, not the corpus.
  * ann_lsh_topk   — scale path A: random-hyperplane bucketing restricts
    scoring to vectors sharing (or neighboring, via multi-probe on 1-bit
    flips) the query's bucket.  Recall measured against brute in tests.
  * ann_ivf_topk   — scale path B: IVF — k-means centroids fit on a driver
    sample, broadcast once; vectors score only against queries probing
    their centroid's cell (nprobe nearest cells per query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _embedding_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> / fixed_size_list<float>
    Arrow column with no per-row Python objects: one flat values-buffer
    view + reshape (the round-1 `np.stack(col.to_pylist())` built n Python
    lists per batch in the hottest numeric stages)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), dim).astype(np.float64, copy=False)
    widths = np.diff(col.offsets.to_numpy(zero_copy_only=False))
    if len(widths) and not (widths == widths[0]).all():
        raise ValueError("ragged embedding column: rows have unequal dims")
    dim = int(widths[0]) if len(widths) else 0
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), dim).astype(np.float64, copy=False)


class _BruteScoreStage:
    """Per-batch cosine vs the broadcast query matrix; emits local top-k."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.Q = _normalize(np.asarray(q, dtype=np.float64))  # (nq, dim)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        X = _normalize(_embedding_matrix(batch.column("embedding")))
        sims = X @ self.Q.T  # (n, nq)
        k = min(self.k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(self.Q.shape[0]):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
            out_q.extend([qi] * len(top))
            out_id.extend(ids[top].tolist())
            out_s.extend(col[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )


def _final_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    partials = partials.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype("int64")
    return out


def ann_brute_topk(emb_ds, queries: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank); ties broken by
    vec_id asc.  `queries` is (nq, dim)."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(
            _BruteScoreStage,
            fn_constructor_args=(qref, k),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
            concurrency=(1, 8),
        )
        .to_pandas()
    )
    return _final_topk(partials, k)


def ann_lsh_topk(
    emb_ds,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 11,
    multiprobe: int = 1,
) -> pd.DataFrame:
    """LSH-bucketed ANN: score only vectors whose hyperplane signature is
    within `multiprobe` bit flips of the query's.  Same output shape as
    brute; approximate (recall < 1)."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, Q.shape[1]))

    def sig(X: np.ndarray) -> np.ndarray:
        bits = (X @ planes.T) > 0
        key = np.zeros(len(X), dtype=np.uint64)
        for j in range(n_planes):
            key |= bits[:, j].astype(np.uint64) << np.uint64(j)
        return key

    q_sigs = sig(Q)
    # probe set per query: own bucket + all 1..multiprobe bit flips
    def probes(s: int) -> set[int]:
        out = {s}
        frontier = {s}
        for _ in range(multiprobe):
            nxt = set()
            for v in frontier:
                for j in range(n_planes):
                    nxt.add(v ^ (1 << j))
            out |= nxt
            frontier = nxt
        return out

    wanted: dict[int, list[int]] = {}
    for qi, s in enumerate(q_sigs):
        for b in probes(int(s)):
            wanted.setdefault(b, []).append(qi)
    wanted_ref = ray.put(wanted)
    qref = ray.put(Q)

    class Stage:
        def __init__(self):
            self.wanted = ray.get(wanted_ref)
            self.Q = ray.get(qref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            X = _normalize(_embedding_matrix(batch.column("embedding")))
            keys = sig(X)
            out_q, out_id, out_s = [], [], []
            # group rows of this batch by bucket, score only probed queries
            for b in np.unique(keys):
                qis = self.wanted.get(int(b))
                if not qis:
                    continue
                rows = np.flatnonzero(keys == b)
                sims = X[rows] @ self.Q[qis].T
                for ci, qi in enumerate(qis):
                    col = sims[:, ci]
                    kk = min(self.k, len(rows))
                    top = np.argpartition(-col, kk - 1)[:kk] if kk < len(rows) else np.arange(len(rows))
                    out_q.extend([qi] * len(top))
                    out_id.extend(ids[rows[top]].tolist())
                    out_s.extend(col[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "vec_id": pa.array(out_id, type=pa.int64()),
                    "cosine": pa.array(out_s, type=pa.float64()),
                }
            )

    partials = (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(Stage, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=4096, concurrency=(1, 8))
        .to_pandas()
    )
    if partials.empty:
        return partials.assign(rank=pd.Series([], dtype="int64"))
    return _final_topk(partials, k)


def _kmeans(X: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic Lloyd's k-means on unit vectors (cosine == dot)."""
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    C[c] = m / n
    return C


def ann_ivf_topk(
    emb_ds,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 13,
    sample_size: int = 2000,
    iters: int = 10,
) -> pd.DataFrame:
    """IVF ANN: centroids from a bounded driver-side sample (k-means is tiny;
    the corpus itself streams), broadcast via ray.put; each batch assigns its
    vectors to cells and scores them only against the queries probing that
    cell.  Approximate (recall < 1, grows with nprobe)."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    sample_rows = emb_ds.select_columns(["embedding"]).take(sample_size)
    Xs = _normalize(np.stack([r["embedding"] for r in sample_rows]).astype(np.float64))
    C = _kmeans(Xs, n_centroids, iters, seed)
    # nprobe nearest cells per query -> cell -> probing queries
    order = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    wanted: dict[int, list[int]] = {}
    for qi in range(len(Q)):
        for c in order[qi]:
            wanted.setdefault(int(c), []).append(qi)
    cref, qref, wref = ray.put(C), ray.put(Q), ray.put(wanted)

    class Stage:
        def __init__(self):
            self.C, self.Q, self.wanted = ray.get(cref), ray.get(qref), ray.get(wref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            X = _normalize(_embedding_matrix(batch.column("embedding")))
            cell = np.argmax(X @ self.C.T, axis=1)
            out_q, out_id, out_s = [], [], []
            for c in np.unique(cell):
                qis = self.wanted.get(int(c))
                if not qis:
                    continue
                rows = np.flatnonzero(cell == c)
                sims = X[rows] @ self.Q[qis].T
                kk = min(self.k, len(rows))
                for ci, qi in enumerate(qis):
                    col = sims[:, ci]
                    top = np.argpartition(-col, kk - 1)[:kk] if kk < len(rows) else np.arange(len(rows))
                    out_q.extend([qi] * len(top))
                    out_id.extend(ids[rows[top]].tolist())
                    out_s.extend(col[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "vec_id": pa.array(out_id, type=pa.int64()),
                    "cosine": pa.array(out_s, type=pa.float64()),
                }
            )

    partials = (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(Stage, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=4096, concurrency=(1, 8))
        .to_pandas()
    )
    if partials.empty:
        return partials.assign(rank=pd.Series([], dtype="int64"))
    return _final_topk(partials, k)
