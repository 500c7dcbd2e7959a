"""BPE merge-rule learning (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units") — learn a subword
tokenizer's merge table from the corpus itself, the step a training-data
pipeline runs before tokenizing 100 TB with the result.

Scale design: the algorithm operates on the corpus VOCABULARY (distinct
word -> count), not the corpus — one term_stats pass reduces the text to
a vocabulary-sized table (10^7-10^8 rows even at web scale), and every
merge iteration is then bounded by vocabulary size, not corpus size.
Regime gate on the vocabulary row count:

  * driver regime (vocab <= driver_vocab_threshold): the classic exact
    in-memory loop — fastest for the common case;
  * distributed regime: the vocabulary stays a Dataset of
    (symbols list<string>, cf); each iteration is one partial weighted
    pair-count map -> groupby-sum -> driver top-1 (the pair table is
    symbol-pair-sized, tiny) -> broadcast merge map; state materializes
    per iteration to keep lineage flat (the pagerank pattern).

Determinism: the greedy pick breaks ties by (count desc, pair asc) —
both regimes produce the IDENTICAL merge list (pinned by test).  Words
end with the spec's end-of-word marker '</w>' so final subwords are
position-aware.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa


def _pairs_of(sym: list, cf: int, acc: Counter) -> None:
    for a, b in zip(sym, sym[1:]):
        acc[(a, b)] += cf


def _merge_word(sym: list, a: str, b: str, ab: str) -> list:
    out = []
    i = 0
    n = len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _learn_driver(words: list, n_merges: int) -> list:
    """Exact reference loop over [(symbols, cf)] — the classic impl."""
    merges = []
    for _ in range(n_merges):
        acc: Counter = Counter()
        for sym, cf in words:
            _pairs_of(sym, cf, acc)
        if not acc:
            break
        # deterministic greedy pick: count desc, pair asc
        top_count = max(acc.values())
        best_pair = min(p for p, c in acc.items() if c == top_count)
        a, b = best_pair
        ab = a + b
        merges.append((a, b, int(top_count)))
        words = [
            ( _merge_word(sym, a, b, ab) if a in sym else sym, cf)
            for sym, cf in words
        ]
    return merges


def learn_bpe(
    ds,
    n_merges: int = 100,
    mode: str = "plain",
    min_count: int = 1,
    driver_vocab_threshold: int = 2_000_000,
):
    """Learn `n_merges` BPE merge rules from a documents Dataset.
    Returns a pandas DataFrame (merge_idx, left, right, pair_count) —
    driver-sized by definition (one row per learned rule)."""
    import ray
    import ray.data as rd

    from indexer_ray.pipelines.text_analysis import term_stats
    from ray.data.aggregate import Sum

    vocab = term_stats(ds, mode=mode)
    if min_count > 1:
        vocab = vocab.filter(lambda r: r["cf"] >= min_count)
    vocab = vocab.materialize()
    n_vocab = vocab.count()

    def _rules_frame(merges: list) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "merge_idx": np.arange(len(merges), dtype=np.int64),
                "left": [m[0] for m in merges],
                "right": [m[1] for m in merges],
                "pair_count": np.array([m[2] for m in merges], dtype=np.int64),
            }
        )

    if n_vocab <= driver_vocab_threshold:
        words = [
            (list(r["term"]) + ["</w>"], int(r["cf"]))
            for r in vocab.iter_rows()
        ]
        return _rules_frame(_learn_driver(words, n_merges))

    # ---- distributed regime: vocabulary stays a Dataset ----
    def _init_syms(t: pa.Table) -> pa.Table:
        syms = [list(w) + ["</w>"] for w in t.column("term").to_pylist()]
        return pa.table(
            {
                "symbols": pa.array(syms, type=pa.list_(pa.string())),
                "cf": pa.array(
                    t.column("cf").to_numpy(zero_copy_only=False).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    state = vocab.map_batches(_init_syms, batch_format="pyarrow").materialize()
    merges: list = []
    for _ in range(n_merges):

        def _pair_partial(t: pa.Table) -> pa.Table:
            acc: Counter = Counter()
            cfs = t.column("cf").to_numpy(zero_copy_only=False)
            for sym, cf in zip(t.column("symbols").to_pylist(), cfs):
                _pairs_of(sym, int(cf), acc)
            keys = list(acc.keys())
            return pa.table(
                {
                    "a": pa.array([k[0] for k in keys], type=pa.string()),
                    "b": pa.array([k[1] for k in keys], type=pa.string()),
                    "n": pa.array([acc[k] for k in keys], type=pa.int64()),
                }
            )

        pairs = (
            state.map_batches(_pair_partial, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()  # symbol-pair-sized: bounded by |alphabet|^2-ish
        )
        if pairs.empty:
            break
        top = int(pairs["n"].max())
        cand = pairs[pairs["n"] == top].sort_values(["a", "b"]).iloc[0]
        a, b = str(cand["a"]), str(cand["b"])
        merges.append((a, b, top))
        ref = ray.put((a, b))

        def _apply(t: pa.Table) -> pa.Table:
            aa, bb = ray.get(ref)
            ab = aa + bb
            syms = [
                _merge_word(s, aa, bb, ab) if aa in s else s
                for s in t.column("symbols").to_pylist()
            ]
            return pa.table(
                {
                    "symbols": pa.array(syms, type=pa.list_(pa.string())),
                    "cf": t.column("cf"),
                }
            )

        state = state.map_batches(_apply, batch_format="pyarrow").materialize()
    return _rules_frame(merges)


class _BpeEncodeStage:
    """Actor-pool stage: the merge-rank table compiles ONCE per actor
    (setup in __init__, per the stateful-stage discipline); encoding
    applies merges in learned priority order per word with a memo cache
    keyed by word (Zipf reuse makes the cache hit rate high)."""

    def __init__(self, rules_ref, mode: str):
        import ray

        from indexer_ray.conformance.lexer import make_tokenizer

        rules = ray.get(rules_ref) if not isinstance(rules_ref, list) else rules_ref
        self.rank = {(a, b): i for i, (a, b) in enumerate(rules)}
        self.tok = make_tokenizer(mode)
        self.memo: dict = {}

    def _encode_word(self, w: str) -> list:
        got = self.memo.get(w)
        if got is not None:
            return got
        sym = list(w) + ["</w>"]
        while len(sym) > 1:
            best_i, best_r = -1, None
            for i, pair in enumerate(zip(sym, sym[1:])):
                r = self.rank.get(pair)
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        if len(self.memo) < 200_000:  # bounded worker-lifetime cache
            self.memo[w] = sym
        return sym

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for txt in t.column("text").to_pylist():
            pieces: list = []
            for w in self.tok(txt or ""):
                pieces.extend(self._encode_word(w))
            out.append(pieces)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "pieces": pa.array(out, type=pa.list_(pa.string())),
                "n_pieces": pa.array(
                    [len(p) for p in out], type=pa.int64()
                ),
            }
        )


def bpe_encode(ds, rules, mode: str = "plain", batch_size: int = 512):
    """Apply a learned merge table (learn_bpe's (left, right) rows, or a
    list of pairs) to a documents Dataset -> (doc_id, pieces, n_pieces).
    The learn -> encode pair is the full subword-tokenizer lifecycle."""
    import ray

    if hasattr(rules, "itertuples"):
        rules = [(str(r.left), str(r.right)) for r in rules.itertuples()]
    ref = ray.put(list(rules))
    return ds.map_batches(
        _BpeEncodeStage,
        fn_constructor_args=(ref, mode),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 8),
    )
