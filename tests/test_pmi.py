"""PMI collocations: engine vs a brute single-process reference (same
quantize-before-combine arithmetic), including min_count filtering and
deterministic tie-breaks."""

import math
import re
from collections import Counter

import pandas as pd


def _q(x: int) -> int:
    return math.floor(1e6 * math.log(x) + 0.5)


def _brute(texts, k, min_count):
    uni: Counter = Counter()
    big: Counter = Counter()
    for t in texts:
        toks = re.findall(r"[a-z0-9]+", t.lower())
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n1, n2 = sum(uni.values()), sum(big.values())
    rows = [
        {
            "w1": a,
            "w2": b,
            "cnt": c,
            "pmi_q": _q(c) + 2 * _q(n1) - _q(n2) - _q(uni[a]) - _q(uni[b]),
        }
        for (a, b), c in big.items()
        if c >= min_count
    ]
    rows.sort(key=lambda r: (-r["pmi_q"], r["w1"], r["w2"]))
    for i, r in enumerate(rows[:k]):
        r["rank"] = i
    return pd.DataFrame(rows[:k])


def _run(texts, ray_session, k=10, min_count=2):
    import ray.data as rd

    from indexer_ray.pipelines.text_analysis import pmi_collocations

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        pmi_collocations(rd.from_pandas(df), k=k, min_count=min_count)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    ref = _brute(texts, k, min_count).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["w1", "w2", "cnt", "pmi_q", "rank"]], ref, check_dtype=False
    )
    return out


def test_pmi_matches_brute(ray_session):
    texts = [
        "strong tea strong tea strong coffee",
        "black tea black coffee strong tea",
        "the cat sat on the mat the cat ran",
        "strong tea is not weak tea strong tea",
    ]
    out = _run(texts, ray_session, k=20, min_count=2)
    assert len(out) > 0
    # an exclusive pair ("strong tea": tea only follows strong often)
    # must out-rank a promiscuous one with the same raw count shape
    pairs = list(zip(out["w1"], out["w2"]))
    assert ("strong", "tea") in pairs


def test_pmi_min_count_drops_rare_pairs(ray_session):
    texts = ["unique pairing here", "alpha beta alpha beta alpha beta"]
    out = _run(texts, ray_session, k=10, min_count=3)
    pairs = set(zip(out["w1"], out["w2"]))
    assert ("unique", "pairing") not in pairs
    assert ("alpha", "beta") in pairs


def test_pmi_layout_independent(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.text_analysis import pmi_collocations

    texts = [f"tok{i % 7} tok{(i + 1) % 7} tok{i % 3} common word" for i in range(60)]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    a = (
        pmi_collocations(rd.from_pandas(df), k=15, min_count=2)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    b = (
        pmi_collocations(rd.from_pandas(df).repartition(7), k=15, min_count=2)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------ skipgram_counts


def _brute_skipgrams(texts, window, k):
    from collections import Counter

    c = Counter()
    for t in texts:
        toks = re.findall(r"[a-z0-9]+", t.lower())
        for i, a in enumerate(toks):
            for j in range(max(0, i - window), min(len(toks), i + window + 1)):
                if j != i:
                    c[(a, toks[j])] += 1
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(
        [
            {"center": a, "context": b, "cnt": n, "rank": i}
            for i, ((a, b), n) in enumerate(rows)
        ]
    )


def test_skipgram_matches_brute(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.text_analysis import skipgram_counts

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick red fox runs",
        "Punct-uation; splits! tokens 42 here",
        "",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        skipgram_counts(rd.from_pandas(df), window=2, k=30)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    ref = _brute_skipgrams(texts, 2, 30)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_skipgram_window_bounds(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.text_analysis import skipgram_counts

    df = pd.DataFrame({"doc_id": [0], "text": ["a b c d e"]})
    out = skipgram_counts(rd.from_pandas(df), window=1, k=100).to_pandas()
    pairs = set(zip(out["center"], out["context"]))
    assert ("a", "b") in pairs and ("b", "a") in pairs
    assert ("a", "c") not in pairs  # beyond the window
