"""BPE merge learning (Sennrich 2016): driver-regime correctness against
a hand-worked example, regime equivalence (driver vs distributed), and
determinism/tie-breaking."""

import pyarrow as pa

from indexer_ray.pipelines.bpe import learn_bpe


def test_hand_worked_example(ray_session):
    import ray.data as rd

    # classic example: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    docs = []
    for w, n in (("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)):
        docs.append({"doc_id": len(docs), "text": " ".join([w] * n)})
    ds = rd.from_items(docs)
    rules = learn_bpe(ds, n_merges=4)
    got = list(zip(rules["left"], rules["right"], rules["pair_count"]))
    # Sennrich's worked merges: (e,s)=9 -> (es,t)=9 -> (est,</w>)=9 -> ...
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("est", "</w>", 9)
    # 4th merge: remaining top pair is (l,o) with count 7 (low+lower)
    assert got[3] == ("l", "o", 7)


def test_regime_equivalence(ray_session):
    import ray.data as rd

    docs = [
        {"doc_id": i, "text": "banana bandana anagram " * (1 + i % 3)}
        for i in range(12)
    ]
    ds = rd.from_items(docs)
    a = learn_bpe(ds, n_merges=6)
    b = learn_bpe(ds, n_merges=6, driver_vocab_threshold=0)  # force distributed
    assert a.equals(b)
    # deterministic across layouts too
    c = learn_bpe(rd.from_items(docs).repartition(5), n_merges=6)
    assert a.equals(c)


def test_exhausted_corpus_stops_early(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": 0, "text": "ab"}])
    rules = learn_bpe(ds, n_merges=50)
    # 'a b </w>' admits exactly 2 merges before no pairs remain
    assert len(rules) == 2


def test_bpe_encode_applies_learned_rules(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.bpe import bpe_encode

    train = []
    for w, n in (("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)):
        train.append({"doc_id": len(train), "text": " ".join([w] * n)})
    ds = rd.from_items(train)
    rules = learn_bpe(ds, n_merges=10)
    enc = (
        bpe_encode(
            rd.from_items([{"doc_id": 0, "text": "newest lowest"}]), rules
        )
        .to_pandas()
        .iloc[0]
    )
    pieces = list(enc["pieces"])
    assert enc["n_pieces"] == len(pieces)
    # 'newest' was in training: its learned subwords end with est</w>
    joined = "|".join(pieces)
    assert "est</w>" in joined
    # roundtrip: concatenating pieces and stripping markers recovers text
    assert joined.replace("|", "").replace("</w>", "") == "newestlowest"


def test_bpe_encode_priority_order(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.bpe import bpe_encode

    # rules as explicit pairs: (a,b) ranked before (ab,c)
    rules = [("a", "b"), ("ab", "c")]
    enc = (
        bpe_encode(rd.from_items([{"doc_id": 0, "text": "abc abd"}]), rules)
        .to_pandas()
        .iloc[0]["pieces"]
    )
    assert list(enc) == ["abc", "</w>", "ab", "d", "</w>"]
