"""Tests for the web-corpus curation operators added in round 3:
repetition signals (Gopher-style), per-source caps, chunk-level exact
dedup census (C4-style spans), and two-pass Misra-Gries heavy hitters."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest


# ------------------------------------------------------ repetition_stats
def test_repetition_stats_known_counts(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.text_analysis import repetition_stats

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a a a b",          # top word 'a'=3, top bigram 'a a'=2
                "x y x y x",        # top word 'x'=3, top bigram 'x y'=2
                "only",             # one word, no bigram
                "",                 # empty
            ],
        }
    )
    out = (
        repetition_stats(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_words"].tolist() == [4, 5, 1, 0]
    assert out["top_word_n"].tolist() == [3, 3, 1, 0]
    assert out["top_bigram_n"].tolist() == [2, 2, 0, 0]


def test_repetition_stats_whitespace_handling(ray_session):
    """Leading/trailing/multiple whitespace must not create empty tokens
    (Arrow's split emits '' there; '\\S+' semantics drop them)."""
    import ray.data as rd

    from indexer_ray.pipelines.text_analysis import repetition_stats

    df = pd.DataFrame({"doc_id": [0], "text": ["  w1   w2  w1 "]})
    out = repetition_stats(rd.from_pandas(df)).to_pandas()
    assert out.iloc[0]["n_words"] == 3
    assert out.iloc[0]["top_word_n"] == 2


# --------------------------------------------------------- cap_per_group
def test_cap_per_group_keeps_smallest_ids(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.sampling import cap_per_group

    rng = np.random.default_rng(3)
    ids = rng.permutation(100)
    df = pd.DataFrame({"doc_id": ids, "source": [f"s{i % 7}" for i in ids]})
    out = cap_per_group(rd.from_pandas(df), cap=2, group_col="source").to_pandas()
    # exactly ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) <= 2
    expect = (
        df.sort_values("doc_id")
        .groupby("source")
        .head(2)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = out.sort_values("doc_id").reset_index(drop=True)[["doc_id", "source"]]
    pd.testing.assert_frame_equal(got, expect[["doc_id", "source"]])


def test_cap_per_group_small_groups_uncapped(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.sampling import cap_per_group

    df = pd.DataFrame({"doc_id": [1, 2], "source": ["a", "b"]})
    out = cap_per_group(rd.from_pandas(df), cap=5).to_pandas()
    assert len(out) == 2


# ----------------------------------------------------- chunk_dedup_stats
def test_chunk_dedup_census(ray_session):
    """Cross-doc and within-doc duplicate chunks, trailing partial chunks,
    and 'earlier' = (doc_id, chunk_idx) lexicographic order."""
    import ray.data as rd

    from indexer_ray.pipelines.dedup import chunk_dedup_stats

    c1 = "w1 w2 w3"  # one 3-word chunk at chunk_words=3
    c2 = "x1 x2 x3"
    df = pd.DataFrame(
        {
            "doc_id": [10, 20, 30],
            "text": [
                f"{c1} {c2}",        # doc 10: both chunks first occurrences
                f"{c2} {c1} tail",   # doc 20: both dups + unique partial
                f"{c1} {c1}",        # doc 30: both dups (of doc 10's)
            ],
        }
    )
    out = (
        chunk_dedup_stats(rd.from_pandas(df), chunk_words=3)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.loc[10].tolist() == [2, 0]
    assert out.loc[20].tolist() == [3, 2]  # 'tail' partial chunk is unique
    assert out.loc[30].tolist() == [2, 2]


def test_chunk_dedup_within_doc_repeat_counts_later_occurrence(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.dedup import chunk_dedup_stats

    df = pd.DataFrame({"doc_id": [1], "text": ["a b a b"]})
    out = chunk_dedup_stats(rd.from_pandas(df), chunk_words=2).to_pandas()
    assert out.iloc[0]["n_chunks"] == 2
    assert out.iloc[0]["n_dup_chunks"] == 1  # second 'a b' dups the first


def test_chunk_dedup_empty_docs_emit_no_rows(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.dedup import chunk_dedup_stats

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["has words", ""]})
    out = chunk_dedup_stats(rd.from_pandas(df), chunk_words=2).to_pandas()
    assert out["doc_id"].tolist() == [1]


# --------------------------------------------------------- heavy_hitters
def _zipf_corpus(n_docs: int, vocab: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    texts = [
        " ".join(f"t{w}" for w in rng.choice(vocab, size=40, p=probs))
        for _ in range(n_docs)
    ]
    return pd.DataFrame({"doc_id": range(n_docs), "text": texts})


def test_heavy_hitters_exact_under_mg_pruning(ray_session):
    """Wide Zipf vocabulary so per-batch MG reduction actually fires
    (total_err > 0), yet the output equals the exact HAVING >= answer."""
    import ray.data as rd

    from indexer_ray.pipelines.sketches import heavy_hitters

    df = _zipf_corpus(n_docs=400, vocab=2000, seed=11)
    exact = Counter()
    for t in df["text"]:
        exact.update(t.split())
    min_count = 60
    truth = sorted((t, c) for t, c in exact.items() if c >= min_count)
    out = (
        heavy_hitters(rd.from_pandas(df), min_count=min_count, n_counters=512)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    assert list(zip(out["term"], out["cnt"])) == truth
    assert len(truth) > 3  # the test actually checks something


def test_heavy_hitters_raises_when_undersized(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.sketches import heavy_hitters

    df = _zipf_corpus(n_docs=300, vocab=2000, seed=5)
    with pytest.raises(ValueError, match="not guaranteed"):
        heavy_hitters(rd.from_pandas(df), min_count=5, n_counters=8).to_pandas()


def test_heavy_hitters_no_hitters_empty_result(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.sketches import heavy_hitters

    df = pd.DataFrame({"doc_id": [0], "text": ["unique words only here"]})
    out = heavy_hitters(rd.from_pandas(df), min_count=10, n_counters=64).to_pandas()
    assert len(out) == 0
