"""Query engines over the partitioned index (rebuild of reference
tree.rs:388-465 `search` + lib.rs:92-100 `search_term`; SURVEY.md §2.6, §7.1 M4).

Two scorers sharing one decode path:
  * conformance TF-IDF — the reference formula exactly: idf = |ln(N/df)|,
    score += tf*idf accumulated in query-token order then doc_id order,
    score==0.0 dropped, ties broken (score desc, doc_id asc).  Duplicate
    query tokens: the reference's raw-token-list iteration in BOTH search
    passes (tree.rs:406-415, 419-449) inflates global_df to m*df and
    accumulates m^2 times — replicated in `_weights` (and in the spec
    scorer, conformance/scorer.py).
  * BM25 (k1=1.2, b=0.75, Lucene-style positive idf) — the engine-mode
    scorer named by the north rule; doc length comes from the posting
    payload (inlined norms), avgdl/N from the manifest.

Two algorithms, both exact:
  * exhaustive — decode every matching block, vectorized numpy accumulate;
  * block-max WAND ("wand") — document-at-a-time at BLOCK granularity:
    blocks carry (first_doc_id, last_doc_id, max_tf, min_dl), giving a
    per-block upper bound on the term's contribution; the cursor sweep
    skips every block window whose summed upper bound is below the current
    top-k threshold θ, and scores surviving windows with the same
    vectorized kernel.  Skipping uses strict <, so tie candidates are never
    lost; results are identical to exhaustive (tested).

Unlike the reference — which re-reads every segment dictionary from disk on
every query (tree.rs:397-404) — term lookups are parquet reads pruned to the
term's partition(s) with predicate pushdown, and a small LRU caches dict
partitions across queries.
"""

from __future__ import annotations

import math
import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from indexer_ray.conformance.lexer import tokenize, tokenize_plain
from indexer_ray.conformance.scorer import B, K1, bm25_idf, tfidf_idf
from indexer_ray.functions.hashing import hot_term_partitions, term_partition
from indexer_ray.stages.codec import decode_blocks
from indexer_ray.state.manifest import IndexManifest, part_dir


class _TermBlocks:
    """All block metadata + payloads for one term, in global doc_id order.

    ``decoded`` lazily caches the fully-decoded (doc_ids, tfs, dls) arrays —
    hot Zipf-head terms are decoded once per searcher, not once per query;
    ``dec_blocks`` is the per-BLOCK analogue for the WAND path, which only
    touches the blocks its upper bounds can't skip (both caches live inside
    the 24-bytes-per-posting share `_tb_size` already charges to the
    searcher's block-LRU budget)."""

    __slots__ = ("term", "df", "first", "last", "n", "max_tf", "min_dl", "payloads", "decoded", "dec_blocks")

    def __init__(self, term, df, first, last, n, max_tf, min_dl, payloads):
        self.term, self.df = term, df
        self.first, self.last, self.n = first, last, n
        self.max_tf, self.min_dl, self.payloads = max_tf, min_dl, payloads
        self.decoded = None
        self.dec_blocks: dict[int, tuple] = {}

    def decode_all(self):
        if self.decoded is None:
            doc_ids, tfs, dls, _ = decode_blocks(self.payloads, self.n, self.first)
            self.decoded = (doc_ids, tfs, dls)
        return self.decoded

    def decode_block(self, cur: int):
        raw = self.dec_blocks.get(cur)
        if raw is None:
            doc_ids, tfs, dls, _ = decode_blocks(
                [self.payloads[cur]], self.n[cur : cur + 1], self.first[cur : cur + 1]
            )
            raw = self.dec_blocks[cur] = (doc_ids, tfs, dls)
        return raw


class IndexSearcher:
    def __init__(
        self,
        index_dir: str,
        dict_cache_parts: int = 64,
        blocks_cache_bytes: int = 256 << 20,
        dict_full_load_rows: int = 1 << 17,
    ):
        self.index_dir = index_dir
        self.m = IndexManifest.load(index_dir)
        self.n_docs = self.m.n_docs
        self.avgdl = self.m.avgdl
        # effective stats for the CURRENT search: equal to the local index's
        # by default; a doc-sharded deployment overrides them with gathered
        # GLOBAL (n_docs, avgdl, per-term df) so every shard scores with the
        # same idf/norms (ShardedSearcher in pipelines/serve.py)
        self._eff_n_docs = self.n_docs
        self._eff_avgdl = self.avgdl
        self._eff_df: dict[str, int] = {}
        self.mode = self.m.config.get("mode", "conformance")
        if self.m.config.get("stem_tokens", True) and self.m.config.get("stop_filter", True):
            self._tokenize = tokenize if self.mode == "conformance" else tokenize_plain
        else:
            # query tokenization must mirror the build's tokenizer config
            # exactly (symmetry invariant, reference lib.rs:92-96 / T5)
            from indexer_ray.conformance.lexer import make_tokenizer
            from indexer_ray.conformance.stopwords import STOP_WORDS

            self._tokenize = make_tokenizer(
                self.mode,
                stem_tokens=self.m.config.get("stem_tokens", True),
                stop_words=STOP_WORDS if self.m.config.get("stop_filter", True) else None,
            )
        self.hot_terms = self.m.hot_terms
        self.P = self.m.n_partitions
        self._dict_cache: OrderedDict[int, dict[str, int]] = OrderedDict()
        self._dict_cache_parts = dict_cache_parts
        # searcher memory stays bounded at web scale: a partition dict is
        # loaded whole only while it is SMALL (<= dict_full_load_rows terms,
        # a few MB); above that, df lookups become predicate-pushdown point
        # reads (dict.parquet is term-sorted with 16k row groups, so footer
        # stats prune to ~1 row group) memoized in a per-(part, term) LRU —
        # the same discipline _read_term_blocks already applies to postings
        self._dict_full_load_rows = dict_full_load_rows
        self._dict_nrows: dict[int, int] = {}
        self._df_point_cache: OrderedDict[tuple[int, str], int] = OrderedDict()
        self._df_point_cache_cap = 1 << 16
        # posting-block LRU (byte-budgeted): hot Zipf-head terms are touched
        # by most queries; re-reading their ~MB payloads from parquet per
        # query would dominate latency (the reference re-reads EVERYTHING
        # per query, tree.rs:397-443 — the quirk we explicitly fix)
        self._blocks_cache: OrderedDict[str, _TermBlocks] = OrderedDict()
        self._blocks_cache_budget = blocks_cache_bytes
        self._blocks_cache_bytes = 0

    # ---- lookup ----

    def _parts_of_term(self, term: str) -> list[int]:
        s = self.hot_terms.get(term)
        if s:
            # distinct partitions only: two salts may hash to the same
            # partition, whose dict/blocks already merge both (doc-disjoint)
            # runs — visiting it twice would double-count.
            return list(dict.fromkeys(hot_term_partitions(term, int(s), self.P)))
        return [term_partition(term, self.P)]

    def _part_df(self, part_id: int, term: str) -> int:
        cached = self._dict_cache.get(part_id)
        if cached is not None:
            self._dict_cache.move_to_end(part_id)
            return cached.get(term, 0)
        path = os.path.join(part_dir(self.index_dir, part_id), "dict.parquet")
        nrows = self._dict_nrows.get(part_id)
        if nrows is None:
            nrows = (
                pq.ParquetFile(path).metadata.num_rows if os.path.exists(path) else 0
            )
            self._dict_nrows[part_id] = nrows
        if nrows <= self._dict_full_load_rows:
            # small partition dict: load whole, serve every term from memory
            if nrows == 0:
                cached = {}
            else:
                t = pq.read_table(path, columns=["term", "df"])
                cached = dict(
                    zip(t.column("term").to_pylist(), t.column("df").to_pylist())
                )
            self._dict_cache[part_id] = cached
            if len(self._dict_cache) > self._dict_cache_parts:
                self._dict_cache.popitem(last=False)
            return cached.get(term, 0)
        # web-scale partition dict (millions of terms): point read with
        # predicate pushdown, memoized per (partition, term)
        key = (part_id, term)
        hit = self._df_point_cache.get(key)
        if hit is not None:
            self._df_point_cache.move_to_end(key)
            return hit
        t = pq.read_table(path, columns=["df"], filters=[("term", "=", term)])
        df = int(t.column("df")[0].as_py()) if t.num_rows else 0
        self._df_point_cache[key] = df
        if len(self._df_point_cache) > self._df_point_cache_cap:
            self._df_point_cache.popitem(last=False)
        return df

    def term_df(self, term: str) -> int:
        # global df = sum of per-partition dfs (runs are doc-disjoint; the
        # reference's analogous sum over segments is tree.rs:413)
        return sum(self._part_df(p, term) for p in self._parts_of_term(term))

    def _load_term_blocks(self, term: str) -> _TermBlocks | None:
        cached = self._blocks_cache.get(term)
        if cached is not None:
            self._blocks_cache.move_to_end(term)
            return cached
        tb = self._read_term_blocks(term)
        if tb is not None:
            self._blocks_cache[term] = tb
            self._blocks_cache_bytes += self._tb_size(tb)
            while self._blocks_cache_bytes > self._blocks_cache_budget and self._blocks_cache:
                _, old = self._blocks_cache.popitem(last=False)
                self._blocks_cache_bytes -= self._tb_size(old)
        return tb

    @staticmethod
    def _tb_size(tb: _TermBlocks) -> int:
        # payloads + block metadata + the lazily-decoded arrays (3 x uint64)
        return sum(len(p) for p in tb.payloads) + 40 * len(tb.n) + 24 * int(tb.n.sum())

    def _read_term_blocks(self, term: str) -> _TermBlocks | None:
        firsts, lasts, ns, mtfs, mdls, pays = [], [], [], [], [], []
        df = 0
        for p in self._parts_of_term(term):
            df_p = self._part_df(p, term)
            if df_p == 0:
                continue
            df += df_p
            path = os.path.join(part_dir(self.index_dir, p), "blocks.parquet")
            t = pq.read_table(path, filters=[("term", "=", term)])
            firsts.append(t.column("first_doc_id").to_numpy(zero_copy_only=False))
            lasts.append(t.column("last_doc_id").to_numpy(zero_copy_only=False))
            ns.append(t.column("n").to_numpy(zero_copy_only=False))
            mtfs.append(t.column("max_tf").to_numpy(zero_copy_only=False))
            mdls.append(t.column("min_dl").to_numpy(zero_copy_only=False))
            pays.extend(t.column("payload").to_pylist())
        if df == 0:
            return None
        first = np.concatenate(firsts).astype(np.uint64)
        last = np.concatenate(lasts).astype(np.uint64)
        n = np.concatenate(ns).astype(np.int64)
        max_tf = np.concatenate(mtfs).astype(np.int64)
        min_dl = np.concatenate(mdls).astype(np.int64)
        # salted runs are doc_id-range-disjoint: order blocks globally
        order = np.argsort(first, kind="stable")
        return _TermBlocks(
            term,
            df,
            first[order],
            last[order],
            n[order],
            max_tf[order],
            min_dl[order],
            [pays[i] for i in order],
        )

    # ---- scoring kernels ----

    def _weights(self, q_tokens: list[str], scorer: str) -> list[tuple[str, float, _TermBlocks]]:
        """Per unique term: (term, weight, blocks) in first-occurrence order.

        Duplicate query tokens (multiplicity m):
          * tfidf (conformance) — the reference iterates the RAW token list
            in both search passes (tree.rs:406-415 + 419-449), inflating
            global_df to m*df and accumulating each of its m cached copies
            once per occurrence: weight = m^2 * |ln(N/(m*df))| (so 'cat cat'
            over a corpus with df(cat)=N/2 returns EMPTY — idf hits 0).
          * bm25 (engine mode, no reference analogue) — per-occurrence
            accumulation without df inflation: weight = m * idf(df)."""
        mult: dict[str, int] = {}
        order: list[str] = []
        for t in q_tokens:
            if t not in mult:
                order.append(t)
            mult[t] = mult.get(t, 0) + 1
        out = []
        for t in order:
            tb = self._load_term_blocks(t)
            if tb is None:
                continue
            df = self._eff_df.get(t, tb.df)
            n = self._eff_n_docs
            m = mult[t]
            if scorer == "tfidf":
                w = (m * m) * tfidf_idf(n, m * df)
            else:
                w = m * bm25_idf(n, df)
            out.append((t, w, tb))
        return out

    def _contrib(self, scorer: str, w: float, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        if scorer == "tfidf":
            return w * tfs.astype(np.float64)
        tff = tfs.astype(np.float64)
        norm = tff + K1 * (1.0 - B + B * dls.astype(np.float64) / self._eff_avgdl)
        return w * tff * (K1 + 1.0) / norm

    def _block_ub(self, scorer: str, w: float, max_tf: np.ndarray, min_dl: np.ndarray) -> np.ndarray:
        if scorer == "tfidf":
            return w * max_tf.astype(np.float64)
        mt = max_tf.astype(np.float64)
        norm = mt + K1 * (1.0 - B + B * min_dl.astype(np.float64) / self._eff_avgdl)
        return w * mt * (K1 + 1.0) / norm

    # ---- public API ----

    def search(
        self,
        query: str,
        k: int = 10,
        scorer: str = "tfidf",
        algorithm: str = "exhaustive",
        global_stats: dict | None = None,
    ) -> list[tuple[int, float]]:
        """Returns [(doc_id, score)] sorted (score desc, doc_id asc), top k.
        ``k=None`` returns all matches (exhaustive only).

        ``global_stats`` ({"n_docs", "avgdl", "df": {term: global_df}})
        overrides the local index statistics — the doc-sharded deployment
        passes corpus-wide values so every shard scores with identical
        idf/norms and shard top-ks merge exactly (serve.ShardedSearcher)."""
        if global_stats is not None:
            self._eff_n_docs = int(global_stats["n_docs"])
            self._eff_avgdl = float(global_stats["avgdl"])
            self._eff_df = dict(global_stats.get("df") or {})
        else:
            self._eff_n_docs, self._eff_avgdl, self._eff_df = self.n_docs, self.avgdl, {}
        q_tokens = self._tokenize(query)
        if not q_tokens or self._eff_n_docs == 0:
            return []
        terms = self._weights(q_tokens, scorer)
        if not terms:
            return []
        if algorithm == "auto" and k is not None:
            # Dense queries (candidate set ~ corpus) decode everything anyway;
            # vectorized exhaustive beats the sweep there.  WAND pays off when
            # upper-bound pruning can actually skip blocks — selective terms.
            total_df = sum(tb.df for _, _, tb in terms)
            algorithm = "wand" if total_df < 0.1 * max(self.n_docs, 1) else "exhaustive"
        if algorithm == "wand" and k is not None:
            return self._search_wand(terms, k, scorer)
        return self._search_exhaustive(terms, k, scorer)

    def _search_exhaustive(self, terms, k, scorer) -> list[tuple[int, float]]:
        # Vectorized accumulate: concatenate per-term postings in query-term
        # order, group-sum with np.add.at (processes elements in array order,
        # so each doc's contributions still add in term order — float-order
        # parity with the spec scorer, tree.rs:418/445-449).
        doc_parts, contrib_parts = [], []
        for _, w, tb in terms:
            doc_ids, tfs, dls = tb.decode_all()
            doc_parts.append(doc_ids)
            contrib_parts.append(self._contrib(scorer, w, tfs, dls))
        all_docs = np.concatenate(doc_parts)
        all_contrib = np.concatenate(contrib_parts)
        uniq, inv = np.unique(all_docs, return_inverse=True)
        scores = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(scores, inv, all_contrib)
        nz = scores != 0.0  # Q6: exact-zero results dropped (tree.rs:457)
        uniq, scores = uniq[nz], scores[nz]
        if k is not None and k < len(scores):
            kth = np.partition(scores, len(scores) - k)[len(scores) - k]
            idx = np.flatnonzero(scores >= kth)  # includes ALL boundary ties
        else:
            idx = np.arange(len(scores))
        order = idx[np.lexsort((uniq[idx], -scores[idx]))]
        items = [(int(d), float(s)) for d, s in zip(uniq[order], scores[order])]
        return items if k is None else items[:k]

    def _search_wand(self, terms, k, scorer) -> list[tuple[int, float]]:
        """Block-max WAND at block granularity — an interval sweep.

        Doc-id space is processed left to right in maximal windows over which
        the set of covering blocks ("active set") is constant.  A window is
        skipped without decoding iff the summed block upper bounds of its
        active set are STRICTLY below the current top-k threshold θ (a doc
        scoring exactly θ can still win its tie on doc_id, so it is never
        skipped).  Surviving windows are scored with the vectorized decode
        kernel; decoded blocks are cached per cursor so a block spanning
        several windows decodes once.  Exact: equals the exhaustive scorer.
        """
        n_t = len(terms)
        ubs = [self._block_ub(scorer, w, tb.max_tf, tb.min_dl) for _, w, tb in terms]
        cursors = [0] * n_t
        nblocks = [len(t[2].n) for t in terms]
        decoded: list[tuple | None] = [None] * n_t
        INF = 1 << 66
        heap_scores = np.empty(0, dtype=np.float64)
        heap_docs = np.empty(0, dtype=np.uint64)
        theta = -math.inf
        # pruning telemetry (read via self.last_wand_stats after a search):
        # windows under/over θ and payload decodes actually avoided — the
        # regression gate that keeps the skip path observable, not just
        # equal to exhaustive
        stats = {
            "windows": 0,
            "windows_skipped": 0,
            "blocks_decoded": 0,
            "blocks_total": int(sum(nblocks)),
        }
        self.last_wand_stats = stats

        def push_candidates(docs: np.ndarray, scs: np.ndarray):
            nonlocal heap_scores, heap_docs, theta
            nz = scs != 0.0
            docs, scs = docs[nz], scs[nz]
            if len(docs) == 0:
                return
            heap_docs = np.concatenate([heap_docs, docs])
            heap_scores = np.concatenate([heap_scores, scs])
            if len(heap_scores) > 8 * k:
                keep = np.lexsort((heap_docs, -heap_scores))[: 2 * k]
                heap_docs, heap_scores = heap_docs[keep], heap_scores[keep]
            if len(heap_scores) >= k:
                theta = float(np.partition(heap_scores, -k)[-k])

        cur_pos = 0
        while True:
            live = [t for t in range(n_t) if cursors[t] < nblocks[t]]
            if not live:
                break
            f = {t: int(terms[t][2].first[cursors[t]]) for t in live}
            l = {t: int(terms[t][2].last[cursors[t]]) for t in live}
            # invariant: l[t] >= cur_pos for all live blocks
            lo = min(max(f[t], cur_pos) for t in live)
            active = [t for t in live if f[t] <= lo]
            boundary = min(l[t] for t in active)
            for t in live:
                if f[t] > lo:
                    boundary = min(boundary, f[t] - 1)
            bound = sum(float(ubs[t][cursors[t]]) for t in active)
            stats["windows"] += 1
            if bound < theta:
                stats["windows_skipped"] += 1
            if bound >= theta:
                d_parts, c_parts = [], []
                for t in active:
                    if decoded[t] is None:
                        stats["blocks_decoded"] += 1
                        tb = terms[t][2]
                        cur = cursors[t]
                        doc_ids, tfs, dls = tb.decode_block(cur)
                        decoded[t] = (doc_ids, self._contrib(scorer, terms[t][1], tfs, dls))
                    doc_ids, contrib = decoded[t]
                    # decoded doc_ids are sorted: window slice via searchsorted.
                    # scalars MUST be uint64: a python int would promote the
                    # uint64 array to float64 and round 64-bit ids at the
                    # window boundary (observed: docs split across windows)
                    a = int(np.searchsorted(doc_ids, np.uint64(lo), side="left"))
                    b = int(np.searchsorted(doc_ids, np.uint64(boundary), side="right"))
                    if a < b:
                        d_parts.append(doc_ids[a:b])
                        c_parts.append(contrib[a:b])
                if d_parts:
                    dcat = np.concatenate(d_parts)
                    ccat = np.concatenate(c_parts)
                    if len(d_parts) == 1:
                        push_candidates(dcat, ccat)
                    else:
                        uniq, inv = np.unique(dcat, return_inverse=True)
                        sums = np.zeros(len(uniq), dtype=np.float64)
                        np.add.at(sums, inv, ccat)
                        push_candidates(uniq, sums)
            for t in active:
                if l[t] <= boundary:
                    cursors[t] += 1
                    decoded[t] = None
            cur_pos = boundary + 1
        if len(heap_scores) == 0:
            return []
        order = np.lexsort((heap_docs, -heap_scores))[:k]
        return [(int(d), float(s)) for d, s in zip(heap_docs[order], heap_scores[order])]

    # ---- boolean retrieval (beyond the reference: tree.rs scores OR-mode
    # only; conjunctive AND / AND-NOT is standard fulltext surface) ----

    def search_boolean(
        self, must: str | list[str], must_not: str | list[str] = ()
    ) -> np.ndarray:
        """Conjunctive boolean retrieval: doc_ids containing EVERY ``must``
        term and NONE of the ``must_not`` terms, sorted ascending (uint64).

        Strings are tokenized with the index's own tokenizer (symmetry
        invariant, T5); a ``must`` term absent from the index short-circuits
        to empty.  Pure-NOT queries are rejected (unbounded result).

        Intersection is index-grade, not scan-grade: the smallest-df term
        seeds the candidate set, and every further term decodes ONLY the
        posting blocks whose [first_doc_id, last_doc_id] range intersects a
        live candidate (block metadata is already in memory; payload decode
        is the cost being skipped).  Membership tests are vectorized
        searchsorted over the sorted decoded ids."""
        toks_must = self._boolean_terms(must)
        toks_not = self._boolean_terms(must_not)
        if not toks_must:
            if toks_not:
                raise ValueError("pure-NOT boolean query is unbounded")
            return np.empty(0, dtype=np.uint64)
        tbs = []
        for t in toks_must:
            tb = self._load_term_blocks(t)
            if tb is None:
                return np.empty(0, dtype=np.uint64)
            tbs.append(tb)
        tbs.sort(key=lambda tb: tb.df)
        cand = self._sorted_doc_ids(tbs[0])
        for tb in tbs[1:]:
            if len(cand) == 0:
                return cand
            cand = self._filter_member(cand, tb, keep=True)
        for t in dict.fromkeys(toks_not):
            if len(cand) == 0:
                break
            tb = self._load_term_blocks(t)
            if tb is not None:
                cand = self._filter_member(cand, tb, keep=False)
        return cand

    def _boolean_terms(self, q: str | list[str]) -> list[str]:
        parts = [q] if isinstance(q, str) else list(q)
        out: list[str] = []
        for p in parts:
            out.extend(self._tokenize(p))
        return list(dict.fromkeys(out))

    @staticmethod
    def _sorted_doc_ids(tb: _TermBlocks) -> np.ndarray:
        ids = tb.decode_all()[0]
        if len(ids) > 1 and not np.all(ids[1:] > ids[:-1]):
            ids = np.sort(ids)  # defensive: runs are normally range-disjoint
        return ids

    def _filter_member(self, cand: np.ndarray, tb: _TermBlocks, keep: bool) -> np.ndarray:
        """Keep (or drop) candidates that appear in ``tb``'s posting list,
        decoding only blocks whose id range intersects the candidates."""
        lo = np.searchsorted(cand, tb.first, side="left")
        hi = np.searchsorted(cand, tb.last, side="right")
        needed = np.flatnonzero(hi > lo)
        if len(needed) == 0:
            return np.empty(0, dtype=np.uint64) if keep else cand
        if tb.decoded is not None:
            ids = self._sorted_doc_ids(tb)
        else:
            ids, _, _, _ = decode_blocks(
                [tb.payloads[i] for i in needed], tb.n[needed], tb.first[needed]
            )
            if len(ids) > 1 and not np.all(ids[1:] > ids[:-1]):
                ids = np.sort(ids)
        pos = np.searchsorted(ids, cand)
        member = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)] == cand)
        return cand[member] if keep else cand[~member]

    def term_postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Decoded global posting list for one ALREADY-tokenized term:
        (doc_ids, tfs) in doc_id order (S8 analogue, decoded via the block
        codec; used by the driver oracle to diff the built index against
        SQL-computed term frequencies)."""
        tb = self._load_term_blocks(term)
        if tb is None:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
        doc_ids, tfs, _, _ = decode_blocks(tb.payloads, tb.n, tb.first)
        order = np.argsort(doc_ids, kind="stable")
        return doc_ids[order], tfs[order]

    # ---- resolution (Q5 analogue: doc_id -> url via docmap) ----

    def _docmap_catalog(self):
        """Per-fragment (min_doc_id, max_doc_id) ranges from parquet footer
        stats, read ONCE per searcher.  Dense-id builds write fragments
        covering contiguous disjoint ranges, so a k=10 resolve touches ~1
        fragment instead of scanning every footer per query (the round-1
        behavior); hash-id fragments have wide ranges and degrade gracefully
        to the full scan."""
        if getattr(self, "_docmap_cat", None) is None:
            import glob as _glob

            files = sorted(
                _glob.glob(os.path.join(self.index_dir, "docmap", "*.parquet"))
            )
            lows, highs = [], []
            for f in files:
                md = pq.ParquetFile(f).metadata
                names = [md.schema.column(j).name for j in range(md.num_columns)]
                j = names.index("doc_id")
                lo, hi = None, None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(j).statistics
                    if st is None or not st.has_min_max:
                        lo, hi = 0, (1 << 64) - 1  # no stats: never prune
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                lows.append(lo if lo is not None else 0)
                highs.append(hi if hi is not None else (1 << 64) - 1)
            self._docmap_cat = (
                files,
                np.array(lows, dtype=np.uint64),
                np.array(highs, dtype=np.uint64),
            )
        return self._docmap_cat

    def resolve_urls(self, doc_ids: list[int]) -> dict[int, str]:
        if not doc_ids:
            return {}
        files, lows, highs = self._docmap_catalog()
        ids = np.array(sorted(doc_ids), dtype=np.uint64)
        # fragment needed iff any requested id falls inside its range
        pos = np.searchsorted(ids, lows, side="left")
        need = (pos < len(ids)) & np.array(
            [ids[min(p, len(ids) - 1)] <= h for p, h in zip(pos, highs)]
        )
        sel = [f for f, n in zip(files, need) if n]
        if not sel:
            return {}
        ds = pads.dataset(sel, format="parquet")
        t = ds.to_table(
            columns=["doc_id", "url"],
            filter=pads.field("doc_id").isin(pa.array(doc_ids, type=pa.uint64())),
        )
        return dict(zip(t.column("doc_id").to_pylist(), t.column("url").to_pylist()))

    def search_urls(self, query: str, k: int = 10, **kw) -> list[tuple[str, float]]:
        hits = self.search(query, k=k, **kw)
        urls = self.resolve_urls([d for d, _ in hits])
        return [(urls.get(d, str(d)), s) for d, s in hits]

    def matching_doc_ids(self, query: str) -> np.ndarray:
        """All doc_ids containing ANY query term (OR semantics, no scoring),
        sorted ascending — the candidate set faceting/filtering runs over."""
        parts = []
        for t in dict.fromkeys(self._tokenize(query)):
            tb = self._load_term_blocks(t)
            if tb is not None:
                parts.append(self._sorted_doc_ids(tb))
        if not parts:
            return np.empty(0, dtype=np.uint64)
        out = parts[0]
        for p in parts[1:]:
            out = np.union1d(out, p)
        return out


def _member_mask(sorted_ids: np.ndarray, doc_ids: np.ndarray) -> np.ndarray:
    """Vectorized membership of `doc_ids` in a SORTED int64 id array — the
    broadcast-filter kernel shared by facet_counts / phrase_search /
    search_snippets.  Callers must cast to int64 BEFORE sorting (uint64
    ids >= 2^63 reorder under the cast and would break searchsorted)."""
    if len(sorted_ids) == 0:
        return np.zeros(len(doc_ids), dtype=bool)
    pos = np.searchsorted(sorted_ids, doc_ids)
    return (pos < len(sorted_ids)) & (
        sorted_ids[np.minimum(pos, len(sorted_ids) - 1)] == doc_ids
    )


def facet_counts(searcher: IndexSearcher, docs_ds, query: str, facet_col: str = "lang"):
    """Facet rollup for a query: per-``facet_col`` count of ALL documents
    matching ANY query term (standard search-engine facets; the reference
    has no analogue — its result is a flat scored list, tree.rs:452-465).

    The index supplies the match set (posting-list union — no corpus scan);
    the corpus table is then streamed through a broadcast membership filter
    (`ray.put` of the sorted id array, searchsorted per batch) and a tiny
    groupby counts survivors per facet.  The broadcast is the match set,
    not the corpus: fine to ~10^8 ids; above that, swap the filter for a
    distributed semi-join on doc_id (the dedup family's routing-join
    pattern, dedup._pairwise_jaccard_join_ds).

    Output: (facet_col, n_docs)."""
    import ray
    from ray.data.aggregate import Count

    # int64 cast BEFORE sort: hash-assigned ids >= 2^63 reorder under the
    # cast, and searchsorted requires the CAST order
    ids_ref = ray.put(np.sort(searcher.matching_doc_ids(query).astype(np.int64)))

    def _member(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)  # zero-copy object-store view, already sorted
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(_member_mask(ids, d)))

    return (
        docs_ds.select_columns(["doc_id", facet_col])
        .map_batches(_member, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(facet_col)
        .aggregate(Count(alias_name="n_docs"))
    )


def prefix_suggest(index_dir: str, prefix: str, k: int = 10):
    """Index-backed autocomplete: the top-`k` dictionary terms with the
    given prefix, ranked by global df desc (term asc tie-break) — a
    dictionary-range query the reference cannot serve without
    deserializing every segment dict (tree.rs:397-404 re-reads them per
    query; there is no prefix API).

    Distributed over the per-partition ``dict.parquet`` files: each dict
    is term-sorted with 16k row groups, so the [prefix, prefix+1) range
    predicate prunes row groups at the parquet footer — only matching
    slices of each partition's dictionary are read.  Salted hot terms
    appear in several partitions with doc-disjoint postings, so per-
    partition dfs SUM to the global df; the groupby moves only the
    prefix-filtered terms, and the final top-k is a per-batch partial
    cut + single merge (same shape as text_analysis.top_docs_by_length).

    Output: (rank, term, df)."""
    import glob as _glob

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    if not prefix:
        raise ValueError("prefix must be non-empty")
    paths = sorted(_glob.glob(os.path.join(index_dir, "parts", "*", "dict.parquet")))
    hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
    expr = (pads.field("term") >= prefix) & (pads.field("term") < hi)
    ds = rd.read_parquet(paths, columns=["term", "df"], filter=expr)
    agg = ds.groupby("term").aggregate(Sum("df", alias_name="df"))

    def _local_topk(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        dfs = batch.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        # global order is (df desc, term asc); lexsort keys are last-primary
        keep = np.lexsort((terms, -dfs))[: min(k, len(terms))]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(keep), dtype=np.int32)),
                "term": pa.array(terms[keep], type=pa.string()),
                "df": pa.array(dfs[keep], type=pa.int64()),
            }
        )

    def _merge(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["df", "term"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype="int64")
        return g[["rank", "term", "df"]]

    return (
        agg.map_batches(_local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .map_groups(_merge, batch_format="pandas")
    )


def _hot_global_counts(index_dir: str, hot_terms, col: str) -> dict[str, int]:
    """Global df/cf for the SALTED hot terms: salt partitions hold
    doc-disjoint runs, so their per-partition dict values SUM to the
    global count.  The hot set is manifest-bounded and tiny; the `term in
    hotset` parquet filter prunes to the few row groups of each
    term-sorted dict that can contain them — never a full-vocabulary
    driver scan."""
    import glob as _glob

    out: dict[str, int] = {}
    if not hot_terms:
        return out
    flt = [("term", "in", sorted(hot_terms))]
    for f in sorted(_glob.glob(os.path.join(index_dir, "parts", "*", "dict.parquet"))):
        t = pq.read_table(f, columns=["term", col], filters=flt)
        for term, v in zip(t.column("term").to_pylist(), t.column(col).to_pylist()):
            out[term] = out.get(term, 0) + int(v)
    return out


def doc_keywords(index_dir: str, m: int = 3, n_parts: int = 64):
    """Per-document top-`m` TF-IDF keywords extracted straight off the
    INDEX postings (no corpus re-tokenization): score = tf·|ln(N/df)|
    (the reference's idf, tree.rs:426) quantized to int64 like the search
    oracles, ranked (score desc, term asc) within each doc.

    Scale shape: each index partition is one task — its dict supplies df
    locally (term and its postings are co-located by the build's term-hash
    routing, so NO df join ships anywhere); salted hot terms get their
    global df from a driver-read correction map (the hot set is
    manifest-bounded and tiny).  Each partition pre-reduces to at most `m`
    candidate rows per (doc, partition) before the single doc-routed
    shuffle, and the final per-doc merge is one vectorized lexsort pass
    per routed partition — never a per-doc group call.

    Output: (doc_id, rank, term, score_q)."""
    import pandas as pd
    import ray
    import ray.data as rd

    from indexer_ray.functions.hashing import key_partition

    manifest = IndexManifest.load(index_dir)
    n_docs = manifest.n_docs
    hot_ref = ray.put(_hot_global_counts(index_dir, manifest.hot_terms, "df"))

    def _score_part(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        out = []
        for pid in batch.column("part_id").to_pylist():
            pdir = part_dir(index_dir, int(pid))
            if not os.path.exists(os.path.join(pdir, "blocks.parquet")):
                continue  # empty partition: the build writes no dir for it
            d = pq.read_table(os.path.join(pdir, "dict.parquet"), columns=["term", "df"])
            b = pq.read_table(
                os.path.join(pdir, "blocks.parquet"),
                columns=["term", "n", "first_doc_id", "payload"],
            )
            if b.num_rows == 0:
                continue
            ns = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            first = b.column("first_doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            doc, tf, _, _ = decode_blocks(b.column("payload"), ns, first)
            bterms = np.asarray(b.column("term").to_pylist(), dtype=object)
            dterms = np.asarray(d.column("term").to_pylist(), dtype=object)
            dfs = d.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
            # dict is term-sorted: df per block row via searchsorted
            block_df = dfs[np.searchsorted(dterms, bterms)].copy()
            for term, gdf in hot.items():
                block_df[bterms == term] = gdf
            pterms = np.repeat(bterms, ns)
            pdf = np.repeat(block_df, ns).astype(np.float64)
            score = tf.astype(np.float64) * np.abs(np.log(n_docs / pdf))
            score_q = np.floor(score * 1e6 + 0.5).astype(np.int64)
            # per-doc top-m inside the partition (the combiner): global
            # order is (doc asc, score desc, term asc)
            order = np.lexsort((pterms, -score_q, doc))
            sdoc = doc[order]
            starts = np.flatnonzero(np.r_[True, sdoc[1:] != sdoc[:-1]])
            rank_in_doc = np.arange(len(sdoc)) - np.repeat(
                starts, np.diff(np.r_[starts, len(sdoc)])
            )
            keep = order[rank_in_doc < m]
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(doc[keep].astype("int64"), type=pa.int64()),
                        "term": pa.array(pterms[keep], type=pa.string()),
                        "score_q": pa.array(score_q[keep], type=pa.int64()),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "term": pa.array([], type=pa.string()),
                    "score_q": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(out)

    cands = rd.from_items(
        [{"part_id": k} for k in range(manifest.n_partitions)]
    ).map_batches(_score_part, batch_format="pyarrow", batch_size=1)

    def _route(batch: pa.Table) -> pa.Table:
        part = key_partition(
            batch.column("doc_id").to_numpy(zero_copy_only=False), n_parts
        )
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    def _merge(g: "pd.DataFrame") -> "pd.DataFrame":
        doc = g["doc_id"].to_numpy()
        sq = g["score_q"].to_numpy()
        terms = g["term"].to_numpy()
        order = np.lexsort((terms, -sq, doc))
        sdoc = doc[order]
        starts = np.flatnonzero(np.r_[True, sdoc[1:] != sdoc[:-1]])
        rank = np.arange(len(sdoc)) - np.repeat(
            starts, np.diff(np.r_[starts, len(sdoc)])
        )
        keep = rank < m
        return pd.DataFrame(
            {
                "doc_id": sdoc[keep].astype("int64"),
                "rank": rank[keep].astype("int64"),
                "term": terms[order][keep],
                "score_q": sq[order][keep].astype("int64"),
            }
        )

    return (
        cands.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_merge, batch_format="pandas")
    )


def search_snippets(
    searcher: IndexSearcher,
    docs_ds,
    query: str,
    k: int = 10,
    scorer: str = "tfidf",
    width: int = 3,
):
    """Top-k search + keyword-in-context snippet per hit: the full
    result-page composition (index scoring -> corpus text fetch ->
    concordance), which the reference stops short of (tree.rs returns only
    ids/scores; main.rs prints paths).

    Ranking uses the repo's cross-engine compare discipline: scores
    quantized to int64 (floor(s*1e6+0.5)) BEFORE ranking, ties broken
    doc_id asc.  The snippet is `width` tokens each side of the FIRST
    occurrence of any query token, in the index's own token mode (plain
    mode == the SQL oracle's regexp tokens).

    The corpus table streams through a broadcast membership filter (the
    top-k id set — k rows, trivially broadcastable at any corpus size);
    only the <=k surviving rows pay tokenization.

    Output: (rank, doc_id, score_q, pos, snippet)."""
    import math as _math

    import ray
    import ray.data as rd

    hits = searcher.search(query, k=None, scorer=scorer, algorithm="exhaustive")
    # signed int64 view of the (possibly uint64 hash-range) ids BEFORE
    # ranking: the (score_q desc, doc_id asc) tie-break and the rank_map
    # keys must use the same cast order as the corpus-side _member_mask
    # filter below (ids >= 2^63 reorder under the cast — see
    # test_member_mask_handles_hash_range_ids)
    hit_arr = np.array([d for d, _ in hits], dtype=np.uint64).astype(np.int64)
    ranked = sorted(
        (-int(_math.floor(sc * 1e6 + 0.5)), int(ds))
        for (_, sc), ds in zip(hits, hit_arr)
    )[: k]
    rank_of = {d: (r, -negq) for r, (negq, d) in enumerate(ranked)}
    q_tokens = list(dict.fromkeys(searcher._tokenize(query)))
    mode = searcher.mode
    sorted_hits = np.sort(np.fromiter(rank_of, dtype=np.int64, count=len(rank_of)))
    ref = ray.put((sorted_hits, rank_of, q_tokens))

    def _snip(batch: pa.Table) -> pa.Table:
        from indexer_ray.conformance.lexer import make_tokenizer

        hit_ids, rank_map, qtoks = ray.get(ref)
        # vectorized membership prefilter: only the <=k hit rows pay the
        # Python-object conversion + tokenization below
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        batch = batch.filter(pa.array(_member_mask(hit_ids, d)))
        tokenize_fn = make_tokenizer(mode)
        qset = set(qtoks)
        # signed view to match the rank_map keys (uint64 corpus columns
        # would otherwise yield unsigned Python ints here)
        ids = (
            batch.column("doc_id")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .tolist()
        )
        texts = batch.column("text").to_pylist()
        rows = {"rank": [], "doc_id": [], "score_q": [], "pos": [], "snippet": []}
        for did, text in zip(ids, texts):
            hit = rank_map.get(int(did))
            if hit is None:
                continue
            toks = tokenize_fn(text or "")
            pos = next((i for i, t in enumerate(toks) if t in qset), None)
            if pos is None:
                continue
            rows["rank"].append(hit[0])
            rows["doc_id"].append(int(did))
            rows["score_q"].append(hit[1])
            rows["pos"].append(pos)
            rows["snippet"].append(
                " ".join(toks[max(0, pos - width) : pos + width + 1])
            )
        return pa.table(
            {
                "rank": pa.array(rows["rank"], type=pa.int64()),
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "score_q": pa.array(rows["score_q"], type=pa.int64()),
                "pos": pa.array(rows["pos"], type=pa.int64()),
                "snippet": pa.array(rows["snippet"], type=pa.string()),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _snip, batch_format="pyarrow", zero_copy_batch=True
    )


def phrase_search(searcher: IndexSearcher, docs_ds, phrase: str):
    """INDEX-ACCELERATED exact phrase match: the boolean AND of the
    phrase's terms prunes the corpus to candidate docs via posting-list
    intersection (no corpus scan), then only the candidates' text is
    streamed through the adjacency regex verifier
    (text_analysis.phrase_match_docs semantics — identical output).

    At 10^12 docs the candidate set of a selective phrase is orders of
    magnitude smaller than the corpus: the broadcast membership filter
    ships the sorted candidate id array once (`ray.put`), every batch
    drops non-candidates with one vectorized searchsorted, and the RE2
    verification cost is paid only by survivors.  Falls back gracefully —
    a phrase term absent from the dictionary yields an empty result, as
    it must (AND semantics).

    Output: (doc_id,) — docs whose plain tokens contain the phrase
    adjacently."""
    import re as _re

    import pyarrow.compute as pc
    import ray

    if searcher.mode != "plain":
        # a stop-filtered/stemmed dictionary can't promise the candidate
        # superset (a stopword phrase term has no postings at all)
        raise ValueError("phrase_search requires a plain-mode index")
    words = tokenize_plain(phrase)
    if not words:
        raise ValueError("phrase has no plain tokens")
    cand = searcher.search_boolean(words)
    # int64 cast BEFORE sort (see _member_mask: hash ids >= 2^63 reorder)
    ids_ref = ray.put(np.sort(cand.astype(np.int64)))
    pat = (
        "(^|[^a-z0-9])"
        + "[^a-z0-9]+".join(_re.escape(w) for w in words)
        + "($|[^a-z0-9])"
    )

    def _verify(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)  # zero-copy object-store view
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.filter(pa.array(_member_mask(ids, d)))
        mask = pc.match_substring_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pat
        )
        return pa.table({"doc_id": t.filter(mask).column("doc_id")})

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _verify, batch_format="pyarrow", zero_copy_batch=True, batch_size=8192
    )


def doc_unigram_nll(index_dir: str, n_parts: int = 64):
    """Per-document unigram negative log-likelihood off the INDEX — the
    CCNet/Gopher-family LM quality signal (Wenzek et al. 2020 use a real
    LM; the unigram corpus model is its shuffle-free first rung):
    nll(doc) = Σ_terms tf · ln(total_tokens / cf).

    Exactness trick: each (term, doc) CONTRIBUTION is quantized to int64
    (floor(x·1e6 + 0.5)) BEFORE summation, so partial sums are exact
    integers that merge associatively in any order — the property that
    lets a float-flavored score be hash-checked against SQL (the repo's
    quantize-before-rank discipline, moved one step earlier).

    Scale shape (doc_keywords' pattern): contributions are scored inside
    their own index partition (cf from the co-located dict; salted hot
    terms corrected to global cf), PARTIAL-SUMMED per (doc, partition) —
    the shuffle moves one row per doc per partition, not one per posting —
    then one final Sum groupby.  total_tokens and per-doc lengths come
    from the manifest / posting payloads; no corpus pass at all.

    Output: (doc_id, nll_q, n_tokens)."""
    import ray
    import ray.data as rd

    manifest = IndexManifest.load(index_dir)
    total = manifest.total_doc_len
    hot_ref = ray.put(_hot_global_counts(index_dir, manifest.hot_terms, "cf"))

    def _part_nll(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        out = []
        for pid in batch.column("part_id").to_pylist():
            pdir = part_dir(index_dir, int(pid))
            if not os.path.exists(os.path.join(pdir, "blocks.parquet")):
                continue  # empty partition: the build writes no dir for it
            d = pq.read_table(os.path.join(pdir, "dict.parquet"), columns=["term", "cf"])
            b = pq.read_table(
                os.path.join(pdir, "blocks.parquet"),
                columns=["term", "n", "first_doc_id", "payload"],
            )
            if b.num_rows == 0:
                continue
            ns = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            first = b.column("first_doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            doc, tf, dl, _ = decode_blocks(b.column("payload"), ns, first)
            bterms = np.asarray(b.column("term").to_pylist(), dtype=object)
            dterms = np.asarray(d.column("term").to_pylist(), dtype=object)
            cfs = d.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)
            block_cf = cfs[np.searchsorted(dterms, bterms)].copy()
            for term, gcf in hot.items():
                block_cf[bterms == term] = gcf
            pcf = np.repeat(block_cf, ns).astype(np.float64)
            contrib_q = np.floor(
                tf.astype(np.float64) * np.log(total / pcf) * 1e6 + 0.5
            ).astype(np.int64)
            # partial sum per doc WITHIN the partition (exact: integers)
            di = doc.astype(np.int64)
            order = np.argsort(di, kind="mergesort")
            sdoc = di[order]
            starts = np.flatnonzero(np.r_[True, sdoc[1:] != sdoc[:-1]])
            sums = np.add.reduceat(contrib_q[order], starts)
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(sdoc[starts], type=pa.int64()),
                        "nll_q": pa.array(sums, type=pa.int64()),
                        "n_tokens": pa.array(
                            dl[order][starts].astype("int64"), type=pa.int64()
                        ),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "nll_q": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(out)

    partials = rd.from_items(
        [{"part_id": k} for k in range(manifest.n_partitions)]
    ).map_batches(_part_nll, batch_format="pyarrow", batch_size=1)

    # final merge: doc-routed partitions + ONE vectorized reduceat pass
    # each (Ray's sort-based groupby().aggregate() over n_docs tiny keys
    # measured 5x superlinear at a 25k->100k-doc probe; the routed merge
    # is the repo's standard discipline — see doc_keywords/sessionize)
    from indexer_ray.functions.hashing import key_partition

    def _route(batch: pa.Table) -> pa.Table:
        part = key_partition(
            batch.column("doc_id").to_numpy(zero_copy_only=False), n_parts
        )
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    def _merge(g):
        doc = g["doc_id"].to_numpy()
        order = np.argsort(doc, kind="mergesort")
        sdoc = doc[order]
        starts = np.flatnonzero(np.r_[True, sdoc[1:] != sdoc[:-1]])
        import pandas as pd

        return pd.DataFrame(
            {
                "doc_id": sdoc[starts].astype("int64"),
                "nll_q": np.add.reduceat(g["nll_q"].to_numpy()[order], starts).astype(
                    "int64"
                ),
                # every partial carries the SAME dl for a doc; take the first
                "n_tokens": g["n_tokens"].to_numpy()[order][starts].astype("int64"),
            }
        )

    return (
        partials.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_merge, batch_format="pandas")
    )


def proximity_topk(searcher: "IndexSearcher", docs_ds, query: str, k: int = 10):
    """Proximity-ranked retrieval — minimal-window span scoring, the
    classic positional-IR ranker (Clarke et al. 1995 shortest-substring
    ranking): a document's score is the length of the SMALLEST token
    window containing at least one occurrence of every distinct query
    term; top-k ascending (ties break doc_id asc).

    Shape (phrase_search's pruning + the partial-top-k merge): the
    posting-list AND prunes the corpus to candidate docs and the sorted
    candidate-id array broadcasts once; survivors tokenize and run one
    linear two-pointer minimal-window pass over their query-term
    positions only; each batch emits a local top-k and one constant-key
    merge yields the global ranking.  Integer windows keep the output
    hash-checkable.

    Output: (doc_id, window_len, rank), rank 0-based."""
    import ray

    if searcher.mode != "plain":
        raise ValueError("proximity_topk requires a plain-mode index")
    words = sorted(set(tokenize_plain(query)))
    if not words:
        raise ValueError("query has no plain tokens")
    cand = searcher.search_boolean(words)
    ids_ref = ray.put(np.sort(cand.astype(np.int64)))
    need = len(words)
    wset = set(words)

    def _min_window(toks: list[str]) -> int:
        # two-pointer over query-term hits only: O(#hits)
        hits = [(i, t) for i, t in enumerate(toks) if t in wset]
        best = -1
        have: dict[str, int] = {}
        left = 0
        for right in range(len(hits)):
            have[hits[right][1]] = have.get(hits[right][1], 0) + 1
            while len(have) == need:
                w = hits[right][0] - hits[left][0] + 1
                if best < 0 or w < best:
                    best = w
                t = hits[left][1]
                have[t] -= 1
                if not have[t]:
                    del have[t]
                left += 1
        return best

    def _score(batch: pa.Table):
        import pandas as pd

        ids = ray.get(ids_ref)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.filter(pa.array(_member_mask(ids, d)))
        rows = []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            w = _min_window(tokenize_plain(text or ""))
            if w > 0:
                rows.append((int(doc_id), w))
        rows.sort(key=lambda r: (r[1], r[0]))
        out = pd.DataFrame(
            rows[:k], columns=["doc_id", "window_len"]
        ).astype({"doc_id": "int64", "window_len": "int64"})
        out["g"] = np.int32(0)
        return out

    def _merge(g):
        import pandas as pd

        g = (
            g.sort_values(["window_len", "doc_id"])
            .head(k)
            .reset_index(drop=True)
        )
        g["rank"] = np.arange(len(g), dtype="int64")
        return g[["doc_id", "window_len", "rank"]].astype(
            {"doc_id": "int64", "window_len": "int64"}
        )

    return (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(_score, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=8192)
        .groupby("g")
        .map_groups(_merge, batch_format="pandas")
    )


def ccnet_perplexity_buckets(index_dir: str, k: int = 3, n_parts: int = 64):
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3,
    arXiv:1911.00359): rank every document by its per-token unigram NLL
    (`doc_unigram_nll`, the repo's LM-quality proxy for CCNet's real LM)
    and NTILE the corpus into `k` equal-size buckets — bucket 1 = head
    (most fluent) through k = tail.  ppl_q = nll_q // n_tokens (integer
    micro-nats per token) keeps the order SQL-checkable; doc_id breaks
    ties so the rank is a total order.

    Distribution (the pack_sequences two-pass shape; the shuffle payload
    is 3 ints per doc): scores range-partition by ppl_q VALUE into
    contiguous slices; pass 1 collects the P slice counts on the driver
    (P ints) into exclusive prefix offsets; pass 2 sorts each slice
    locally and assigns global rank = offset + local position, then the
    exact NTILE split (first n mod k buckets get ceil(n/k)).  Value-range
    slicing can skew if ppl concentrates — swap the splitter for sampled
    quantiles when a corpus does; the per-slice payload stays key-sized
    either way.

    Output: (doc_id, ppl_q, bucket, label)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    scores = doc_unigram_nll(index_dir, n_parts=n_parts)

    def _ppl(t: pa.Table) -> pa.Table:
        nll = t.column("nll_q").to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = np.maximum(
            t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64),
            1,
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "ppl_q": pa.array(nll // ntok, type=pa.int64()),
            }
        )

    ppl = scores.map_batches(
        _ppl, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_total = ppl.count()
    if n_total == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "ppl_q": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int64()),
                    "label": pa.array([], type=pa.string()),
                }
            )
        )
    bounds = ppl.aggregate(Min("ppl_q"), Max("ppl_q"))
    lo, hi = int(bounds["min(ppl_q)"]), int(bounds["max(ppl_q)"])
    width = max(-(-(hi - lo + 1) // n_parts), 1)

    def _route(t: pa.Table) -> pa.Table:
        v = t.column("ppl_q").to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.minimum((v - lo) // width, n_parts - 1).astype(np.int32)
        return t.append_column("part", pa.array(part, type=pa.int32()))

    routed = ppl.map_batches(
        _route, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    counts_df = routed.groupby("part").count().to_pandas()
    counts = dict(
        zip(counts_df["part"].astype(int), counts_df["count()"].astype(int))
    )
    offsets = {}
    acc = 0
    for p in range(n_parts):
        offsets[p] = acc
        acc += counts.get(p, 0)

    q, r = divmod(n_total, k)
    cut = r * (q + 1)
    labels = (
        {1: "head", 2: "middle", 3: "tail"}
        if k == 3
        else {i: f"b{i}" for i in range(1, k + 1)}
    )

    def _assign(g):
        import pandas as pd

        g = g.sort_values(["ppl_q", "doc_id"], kind="mergesort")
        part = int(g["part"].iloc[0])
        rank0 = offsets[part] + np.arange(len(g), dtype=np.int64)
        bucket = np.empty(len(g), dtype=np.int64)
        head = rank0 < cut
        bucket[head] = rank0[head] // (q + 1)
        if q:
            bucket[~head] = r + (rank0[~head] - cut) // q
        bucket += 1
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                "ppl_q": g["ppl_q"].to_numpy(dtype=np.int64),
                "bucket": bucket,
                "label": [labels[int(b)] for b in bucket],
            }
        )

    return routed.groupby("part").map_groups(_assign, batch_format="pandas")


def _levenshtein_within(a: str, b: str, cap: int) -> int:
    """Standard unit-cost Levenshtein (insert/delete/substitute — NO
    transposition, matching DuckDB's levenshtein()) with an early-exit
    band: returns cap+1 as soon as the distance must exceed `cap`."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = i
        ca = a[i - 1]
        for j in range(1, lb + 1):
            c = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
            cur[j] = c
            if c < best:
                best = c
        if best > cap:
            return cap + 1
        prev = cur
    return prev[lb]


def fuzzy_suggest(index_dir: str, term: str, k: int = 10, max_dist: int = 1):
    """"Did you mean": the top-`k` dictionary terms within `max_dist`
    Levenshtein edits of `term`, ranked (distance asc, global df desc,
    term asc) — the misspelling-recovery stage the reference has no
    analogue for (an unknown term simply scores nothing, tree.rs:406-415).

    Scan pruning: indexes built with the length-banded dict sidecar
    (dict_len.parquet, (term_len, term)-sorted, small row groups) read
    ONLY the row groups intersecting the |len - len(q)| <= max_dist
    band — edit distance admits no TERM-order pruning, but it does bound
    candidate LENGTH, and the sidecar clusters by length so parquet
    row-group stats turn that bound into pruned bytes.  Older indexes
    without the sidecar fall back to the full dict scan.  The
    per-candidate DP runs only on surviving terms; salted per-partition
    dfs Sum to global df; final top-k is a partial cut + single merge.

    Output: (rank, term, dist, df)."""
    import glob as _glob

    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    if not term:
        raise ValueError("term must be non-empty")
    dict_paths = sorted(_glob.glob(os.path.join(index_dir, "parts", "*", "dict.parquet")))
    len_paths = sorted(_glob.glob(os.path.join(index_dir, "parts", "*", "dict_len.parquet")))
    if len(len_paths) == len(dict_paths) and len_paths:
        expr = (pads.field("term_len") >= len(term) - max_dist) & (
            pads.field("term_len") <= len(term) + max_dist
        )
        ds = rd.read_parquet(len_paths, columns=["term", "df"], filter=expr)
    else:
        ds = rd.read_parquet(dict_paths, columns=["term", "df"])

    def _candidates(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lens = pc.utf8_length(batch.column("term"))
        band = pc.and_(
            pc.greater_equal(lens, len(term) - max_dist),
            pc.less_equal(lens, len(term) + max_dist),
        )
        t = batch.filter(band)
        terms = t.column("term").to_pylist()
        dists = np.fromiter(
            (_levenshtein_within(term, c, max_dist) for c in terms),
            dtype=np.int64,
            count=len(terms),
        )
        ok = dists <= max_dist
        return pa.table(
            {
                "term": pa.array(np.asarray(terms, dtype=object)[ok], type=pa.string()),
                "dist": pa.array(dists[ok], type=pa.int64()),
                "df": t.column("df").to_numpy(zero_copy_only=False)[ok].astype("int64"),
            }
        )

    agg = (
        ds.map_batches(_candidates, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )

    # dist is a property of the TERM (salted copies agree), recomputed on
    # the few surviving candidates rather than carried through the groupby
    def _local_topk(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        dfs = batch.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        dists = np.fromiter(
            (_levenshtein_within(term, c, max_dist) for c in terms),
            dtype=np.int64,
            count=len(terms),
        )
        keep = np.lexsort((terms, -dfs, dists))[: min(k, len(terms))]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(keep), dtype=np.int32)),
                "term": pa.array(terms[keep], type=pa.string()),
                "dist": pa.array(dists[keep], type=pa.int64()),
                "df": pa.array(dfs[keep], type=pa.int64()),
            }
        )

    def _merge(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["dist", "df", "term"], ascending=[True, False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype="int64")
        return g[["rank", "term", "dist", "df"]]

    return (
        agg.map_batches(_local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .map_groups(_merge, batch_format="pandas")
    )


def related_terms(searcher: IndexSearcher, docs_ds, term: str, k: int = 10):
    """"Related searches": the top-`k` terms by document frequency WITHIN
    `term`'s match set (docs containing `term`), excluding the term itself
    — a co-occurrence rollup composed from existing primitives: the index
    supplies the match set (posting-list read, no corpus scan for
    candidates), the corpus streams through the broadcast membership
    filter, and term_stats' partial-aggregation counts survivors.

    Output: (rank, term, df) — df counted within the match set."""
    import pandas as pd
    import ray

    from indexer_ray.pipelines.text_analysis import term_stats

    mode = searcher.mode
    if mode != "plain":
        raise ValueError("related_terms requires a plain-mode index")
    ids_ref = ray.put(
        np.sort(searcher.matching_doc_ids(term).astype(np.int64))
    )

    def _member(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(_member_mask(ids, d)))

    matched = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _member, batch_format="pyarrow", zero_copy_batch=True
    )
    stats = term_stats(matched, mode="plain")

    def _local_topk(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        dfs = batch.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        ok = terms != term
        terms, dfs = terms[ok], dfs[ok]
        keep = np.lexsort((terms, -dfs))[: min(k, len(terms))]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(keep), dtype=np.int32)),
                "term": pa.array(terms[keep], type=pa.string()),
                "df": pa.array(dfs[keep], type=pa.int64()),
            }
        )

    def _merge(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["df", "term"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype="int64")
        return g[["rank", "term", "df"]]

    return (
        stats.map_batches(_local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .map_groups(_merge, batch_format="pandas")
    )


def more_like_this(
    searcher: IndexSearcher,
    docs_ds,
    doc_id: int,
    m: int = 5,
    k: int = 10,
    scorer: str = "tfidf",
):
    """"More like this": rank documents similar to a SEED document — the
    classic MoreLikeThis design (Lucene's published recipe): extract the
    seed's top-`m` TF-IDF terms, run them as a query, drop the seed from
    the results.  Keyword score = tf·|ln(N/df)| quantized (the repo's
    doc_keywords formula); df comes from the INDEX's pruned point reads,
    never a corpus scan — only the seed's own text is tokenized.

    Plain-mode indexes only (like phrase_search/related_terms: plain
    [a-z0-9]+ terms re-tokenize to themselves, so the keyword query round-
    trips through search() unchanged; conformance-mode stems would
    re-stem).

    Output: (rank, doc_id, score_q) — score quantized like the search
    oracles; the seed never appears."""
    import pandas as pd

    from indexer_ray.conformance.lexer import tokenize_plain

    if searcher.mode != "plain":
        raise ValueError("more_like_this requires a plain-mode index")

    seed = (
        docs_ds.select_columns(["doc_id", "text"])
        .filter(lambda r: r["doc_id"] == doc_id)
        .take(1)
    )
    if not seed:
        raise KeyError(f"doc_id {doc_id} not found in docs_ds")
    toks = tokenize_plain(seed[0]["text"] or "")
    if not toks:
        return pd.DataFrame(
            {
                "rank": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "score_q": pd.Series([], dtype="int64"),
            }
        )
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    n = searcher.n_docs
    scored = []
    for t, c in tf.items():
        df = searcher.term_df(t)
        if df == 0:
            continue
        q = int(np.floor(c * abs(np.log(n / df)) * 1e6 + 0.5))
        if q > 0:  # terms in every doc carry no signal (idf 0)
            scored.append((-q, t))
    keywords = [t for _, t in sorted(scored)[:m]]
    if not keywords:
        return pd.DataFrame(
            {
                "rank": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "score_q": pd.Series([], dtype="int64"),
            }
        )

    # over-fetch one slot: the seed itself usually tops its own query
    hits = searcher.search(" ".join(keywords), k=k + 1, scorer=scorer)
    sid = np.uint64(doc_id).astype(np.int64) if doc_id >= 0 else np.int64(doc_id)
    rows = []
    for d, s in hits:
        d_signed = int(np.uint64(d).astype(np.int64))
        if d_signed == int(sid):
            continue
        rows.append((d_signed, int(np.floor(s * 1e6 + 0.5))))
        if len(rows) == k:
            break
    return pd.DataFrame(
        {
            "rank": pd.Series(range(len(rows)), dtype="int64"),
            "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "score_q": pd.Series([r[1] for r in rows], dtype="int64"),
        }
    )


def search_rocchio(
    searcher: "IndexSearcher",
    docs_path: str,
    query: str,
    k: int = 10,
    n_fb: int = 5,
    m_exp: int = 3,
):
    """Pseudo-relevance-feedback query expansion (the Rocchio 1971 /
    Buckley 1994 "blind feedback" loop over the conformance tf-idf):

      1. base search, keep the top `n_fb` feedback docs (quantized
         score desc, doc_id asc — the repo's rank contract);
      2. expansion weight w(t) = (Σ_{d∈F} tf(t, d)) · |ln(N / df(t))|
         over the feedback docs' plain tokens, df from index point
         reads; the top `m_exp` terms NOT already in the query
         (floor(w·1e6 + 0.5) desc, term asc) join the query;
      3. re-search with the expanded term set (all distinct, so the
         duplicate-token m² semantics stay inert).

    Feedback texts are fetched by a predicate-pushdown parquet read of
    the `n_fb` ids — constant rows, never a corpus scan; expansion df
    lookups are the searcher's bounded point reads.  Returns
    (rank, doc_id, score_q, exp_terms) — `exp_terms` is the space-joined
    expansion in weight order (constant per row, so the oracle
    hash-checks the chosen expansion too)."""
    import math
    from collections import Counter as _Counter

    import pyarrow.parquet as _pq

    import pandas as pd

    from indexer_ray.conformance.lexer import tokenize_plain as _tp

    base = searcher.search(query, k=None, scorer="tfidf", algorithm="exhaustive")
    ranked = sorted((-(int(math.floor(sc * 1e6 + 0.5))), d) for d, sc in base)
    fb_ids = [int(d) for _, d in ranked[:n_fb]]

    cnt: _Counter = _Counter()
    if fb_ids:
        t = _pq.read_table(
            docs_path, columns=["doc_id", "text"],
            filters=[("doc_id", "in", fb_ids)],
        )
        for tx in t.column("text").to_pylist():
            cnt.update(_tp(tx or ""))

    qset = set(_tp(query))
    n = searcher.n_docs
    weighted = []
    for term, tf in cnt.items():
        if term in qset:
            continue
        df = searcher.term_df(term)
        if df <= 0:
            continue
        w_q = int(math.floor(tf * abs(math.log(n / df)) * 1e6 + 0.5))
        weighted.append((-w_q, term))
    weighted.sort()
    exp_terms = [t for _, t in weighted[:m_exp]]

    expanded = " ".join(list(dict.fromkeys(_tp(query))) + exp_terms)
    hits = searcher.search(expanded, k=None, scorer="tfidf", algorithm="exhaustive")
    final = sorted((-(int(math.floor(sc * 1e6 + 0.5))), d) for d, sc in hits)[:k]
    exp_str = " ".join(exp_terms)
    return pd.DataFrame(
        {
            "rank": pd.Series(range(len(final)), dtype="int64"),
            "doc_id": pd.Series([int(d) for _, d in final], dtype="int64"),
            "score_q": pd.Series([int(-negq) for negq, _ in final], dtype="int64"),
            "exp_terms": pd.Series([exp_str] * len(final), dtype="object"),
        }
    )


def search_wildcard(
    searcher: "IndexSearcher",
    query: str,
    k: int = 10,
    max_expand: int = 25,
):
    """Wildcard query support — 'bat*' matches every term with that
    prefix (the reference's exact-token-only query path cannot): each
    trailing-star token expands through the DICTIONARY (prefix_suggest's
    row-group-pruned range read) to its top `max_expand` prefix terms by
    global df (df desc, term asc — Lucene's deterministic max-expansions
    cap), and ONE search scores the distinct union of plain + expanded
    terms with the standard tf-idf (a doc matching several expansions
    sums their contributions — OR semantics).

    Expanded terms already present as plain tokens are dropped from the
    expansion (no duplicate-token m² inflation), so the SQL oracle can
    replay the whole chain.  Returns (rank, doc_id, score_q, exp_terms);
    `exp_terms` is the space-joined expansion in rank order."""
    import math

    import pandas as pd

    from indexer_ray.conformance.lexer import tokenize_plain as _tp

    plain: list[str] = []
    prefixes: list[str] = []
    for raw in query.split():
        if raw.endswith("*") and len(raw) > 1:
            body = _tp(raw[:-1])
            if len(body) != 1:
                raise ValueError(f"wildcard token must be one plain token: {raw!r}")
            prefixes.append(body[0])
        else:
            plain.extend(_tp(raw))

    expanded: list[str] = []
    seen = set(plain)
    for p in prefixes:
        sug = prefix_suggest(searcher.index_dir, p, k=max_expand)
        if hasattr(sug, "to_pandas"):
            sug = sug.to_pandas()
        for t in sug.sort_values("rank")["term"]:
            if t not in seen:
                expanded.append(t)
                seen.add(t)

    terms = list(dict.fromkeys(plain)) + expanded
    if not terms:
        raise ValueError("query has no plain tokens after expansion")
    hits = searcher.search(
        " ".join(terms), k=None, scorer="tfidf", algorithm="exhaustive"
    )
    final = sorted((-(int(math.floor(sc * 1e6 + 0.5))), int(d)) for d, sc in hits)[:k]
    exp_str = " ".join(expanded)
    return pd.DataFrame(
        {
            "rank": pd.Series(range(len(final)), dtype="int64"),
            "doc_id": pd.Series([d for _, d in final], dtype="int64"),
            "score_q": pd.Series([int(-negq) for negq, _ in final], dtype="int64"),
            "exp_terms": pd.Series([exp_str] * len(final), dtype="object"),
        }
    )
