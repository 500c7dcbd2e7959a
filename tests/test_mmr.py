"""MMR diversified top-k: engine vs a brute single-process greedy
reference, plus the diversification property itself (crafted clustered
embeddings: plain top-k stays inside the query's near-duplicate cluster,
MMR crosses clusters early)."""

import numpy as np
import pandas as pd


def _brute_mmr(X, vid, q, k, pool, lam):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    rel = Xn @ qn
    # pool cut: (rel desc, vec_id asc)
    order = np.lexsort((vid, -rel))[:pool]
    Xp, vp, rp = Xn[order], vid[order], rel[order]
    S = Xp @ Xp.T
    chosen, mask, maxsim = [], np.zeros(len(vp), bool), np.full(len(vp), -np.inf)
    for step in range(min(k, len(vp))):
        sc = rp if step == 0 else lam * rp - (1 - lam) * maxsim
        sc = np.where(mask, -np.inf, sc)
        b = int(np.lexsort((vp, -sc))[0])
        chosen.append(b)
        mask[b] = True
        maxsim = np.maximum(maxsim, S[:, b])
    return vp[chosen].tolist()


def _emb_ds(X, vid):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame({"vec_id": vid, "embedding": [r for r in X.astype(np.float32)]})
    )


def test_mmr_matches_brute(ray_session):
    from indexer_ray.pipelines.ann import mmr_topk

    rng = np.random.default_rng(7)
    X = rng.normal(size=(300, 16))
    vid = np.arange(300, dtype=np.int64)
    q = rng.normal(size=16)
    out = mmr_topk(_emb_ds(X, vid), q, k=10, pool=50, lam=0.7)
    assert out["vec_id"].tolist() == _brute_mmr(
        X.astype(np.float32).astype(np.float64), vid, q, 10, 50, 0.7
    )
    assert out["rank"].tolist() == list(range(10))


def test_mmr_diversifies_across_clusters(ray_session):
    from indexer_ray.pipelines.ann import ann_brute_topk, mmr_topk

    rng = np.random.default_rng(3)
    centers = np.eye(4)[:, :4]  # 4 orthogonal cluster directions, dim 4
    rows, vid = [], []
    for c in range(4):
        for i in range(20):
            rows.append(centers[c] + 0.01 * rng.normal(size=4))
            vid.append(c * 100 + i)
    X = np.array(rows)
    vid = np.array(vid, dtype=np.int64)
    q = centers[0] + 0.6 * centers[1] + 0.5 * centers[2] + 0.4 * centers[3]
    ds = _emb_ds(X, vid)
    plain = ann_brute_topk(ds, q.reshape(1, -1), k=8)
    mmr = mmr_topk(ds, q, k=8, pool=80, lam=0.5)
    plain_clusters = {v // 100 for v in plain["vec_id"]}
    mmr_clusters = {v // 100 for v in mmr["vec_id"]}
    # plain top-8 is swallowed by the dominant cluster; MMR spans all 4
    assert len(plain_clusters) == 1
    assert len(mmr_clusters) == 4


def test_mmr_k_exceeds_pool(ray_session):
    from indexer_ray.pipelines.ann import mmr_topk

    rng = np.random.default_rng(1)
    X = rng.normal(size=(6, 8))
    out = mmr_topk(_emb_ds(X, np.arange(6)), rng.normal(size=8), k=10, pool=4)
    assert len(out) == 4  # bounded by the pool
