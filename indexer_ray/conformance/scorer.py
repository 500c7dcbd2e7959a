"""Brute-force (spec) scorers.  These are the oracles the distributed engine
must match rank-identically (SURVEY.md §5.3).

Conformance scorer = the reference formula exactly (tree.rs:388-465):
    N   = number of documents with >= 1 token (empty docs are never added;
          tree.rs:333-335)
    df  = number of documents containing the term (global)
    Duplicate query tokens: the reference iterates the RAW token list in
    BOTH passes.  Pass 1 (tree.rs:406-415) adds metadata.df to global_dfs
    and pushes a postings-cache copy once per OCCURRENCE, so a token with
    multiplicity m sees global_df = m*df and m cached copies; pass 2
    (tree.rs:419-449) then runs once per occurrence over all m copies.
    Net effect per distinct token t with multiplicity m:
        idf(t)   = |ln(N / (m * df))|        (tree.rs:426 — note the abs())
        score(d) += m^2 * tf(t, d) * idf(t)
    (m=1 reduces to the familiar tf*|ln(N/df)|.  A duplicated token whose
    m*df reaches N scores exactly 0 — e.g. 'cat cat' over a corpus where
    df(cat) = N/2 returns EMPTY; verified against the reference source
    semantics, tree.rs:396-449 — the binary cannot be built offline.)
    documents with score == 0.0 dropped (tree.rs:457); sort by score desc.
    Tie-break (score desc, doc_id asc) replaces the reference's
    nondeterministic HashMap order (SURVEY.md quirk Q7).

Engine scorer = BM25 (Lucene-style positive idf), same iteration rules.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterable, Sequence

K1 = 1.2
B = 0.75


def tfidf_idf(n_docs: int, df: int) -> float:
    return abs(math.log(n_docs / df))


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _corpus_stats(corpus: Iterable[tuple[int, Sequence[str]]]):
    """corpus: iterable of (doc_id, tokens).  Returns (N, df, tf_by_term,
    doc_len) with empty docs excluded."""
    df: Counter = Counter()
    tf_by_term: dict[str, dict[int, int]] = {}
    doc_len: dict[int, int] = {}
    for doc_id, tokens in corpus:
        if not tokens:
            continue  # reference skips empty docs (tree.rs:333-335)
        doc_len[doc_id] = len(tokens)
        counts = Counter(tokens)
        for term, tf in counts.items():
            df[term] += 1
            tf_by_term.setdefault(term, {})[doc_id] = tf
    return len(doc_len), df, tf_by_term, doc_len


def brute_force_tfidf_topk(
    corpus: Iterable[tuple[int, Sequence[str]]],
    q_tokens: Sequence[str],
    k: int | None = 10,
) -> list[tuple[int, float]]:
    """Exhaustive reference-formula scoring.  Accumulation order is fixed:
    first-occurrence token order, then doc_id order (pins float
    associativity).  Duplicate tokens: m^2 * tf * |ln(N/(m*df))| — see the
    module docstring for the reference's two-pass df inflation."""
    n_docs, df, tf_by_term, _ = _corpus_stats(corpus)
    mult: dict[str, int] = {}
    order: list[str] = []
    for tok in q_tokens:
        if tok not in mult:
            order.append(tok)
        mult[tok] = mult.get(tok, 0) + 1
    scores: dict[int, float] = {}
    for tok in order:
        d = df.get(tok, 0)
        if d == 0:
            continue
        m = mult[tok]
        w = (m * m) * tfidf_idf(n_docs, m * d)
        for doc_id in sorted(tf_by_term[tok]):
            scores[doc_id] = scores.get(doc_id, 0.0) + w * tf_by_term[tok][doc_id]
    results = [(doc, s) for doc, s in scores.items() if s != 0.0]
    results.sort(key=lambda x: (-x[1], x[0]))
    return results if k is None else results[:k]


def brute_force_bm25_topk(
    corpus: Iterable[tuple[int, Sequence[str]]],
    q_tokens: Sequence[str],
    k: int | None = 10,
    k1: float = K1,
    b: float = B,
) -> list[tuple[int, float]]:
    n_docs, df, tf_by_term, doc_len = _corpus_stats(corpus)
    if n_docs == 0:
        return []
    avgdl = sum(doc_len.values()) / n_docs
    scores: dict[int, float] = {}
    for tok in q_tokens:
        d = df.get(tok, 0)
        if d == 0:
            continue
        idf = bm25_idf(n_docs, d)
        for doc_id in sorted(tf_by_term[tok]):
            tf = tf_by_term[tok][doc_id]
            norm = tf + k1 * (1.0 - b + b * doc_len[doc_id] / avgdl)
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * tf * (k1 + 1.0) / norm
    results = [(doc, s) for doc, s in scores.items() if s != 0.0]
    results.sort(key=lambda x: (-x[1], x[0]))
    return results if k is None else results[:k]
