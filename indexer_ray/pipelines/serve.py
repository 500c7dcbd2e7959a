"""Query service: a pool of warm searcher actors (Q9 analogue at engine
level — the reference reloads the whole index per HTTP request,
server.rs:62-88 + lib.rs:97; here each replica holds warmed dict/posting
caches across queries).

Scaling model: REPLICATION for query throughput — each actor owns a full
index view (memory-mapped parquet + byte-budgeted caches), so QPS scales
with the replica count while per-query latency stays the single-searcher
latency.  At 10^12 docs a single index no longer fits one node's storage;
the layout then shards the DOCUMENT space (each shard a complete
term-partitioned index over its documents, built independently by this
build pipeline — doc-id ranges make that a pure input split), queries fan
out to one replica per shard, and the additive-score merge is exactly
`_merge_topk` below.  Replication and doc-sharding compose.
"""

from __future__ import annotations

from typing import Any


def _merge_topk(partials: list[list[tuple[int, float]]], k: int) -> list[tuple[int, float]]:
    """Merge per-shard top-k lists: scores are complete per doc within its
    shard (doc-sharded layout), so merging is sort-and-cut with the engine's
    (score desc, doc_id asc) tie-break."""
    allhits = [h for p in partials for h in p]
    allhits.sort(key=lambda x: (-x[1], x[0]))
    return allhits[:k]


class ShardedSearcher:
    """Distributed search over a DOC-SHARDED corpus: each shard is a complete
    term-partitioned index over a disjoint document range (built with
    ``BuildConfig(id_offset=<shard base>)`` so ids stay globally unique).

    Query protocol (two rounds, both fan-out):
      1. df-gather: every shard actor reports per-term local df; the driver
         sums them and computes corpus-global N, avgdl and df.
      2. score: every shard scores with the SAME global stats (idf + BM25
         norms override) and returns its top-k; additive scores are complete
         per doc within its shard, so the merge is sort-and-cut with the
         engine tie-break.  Results are rank-identical to a single index
         over the union corpus (tested).
    """

    def __init__(self, shard_dirs: list[str], num_cpus: float = 1):
        import ray

        from indexer_ray.pipelines.query import IndexSearcher

        @ray.remote(num_cpus=num_cpus)
        class _ShardActor:
            def __init__(self, d: str):
                self.s = IndexSearcher(d)

            def stats(self) -> tuple[int, float]:
                return self.s.n_docs, self.s.m.total_doc_len

            def term_dfs(self, terms: list[str]) -> dict[str, int]:
                return {t: self.s.term_df(t) for t in terms}

            def tokenize(self, query: str) -> list[str]:
                return self.s._tokenize(query)

            def search(self, query, k, scorer, algorithm, global_stats):
                return self.s.search(
                    query, k=k, scorer=scorer, algorithm=algorithm, global_stats=global_stats
                )

        import ray as _ray

        self._actors = [_ShardActor.remote(d) for d in shard_dirs]
        stats = _ray.get([a.stats.remote() for a in self._actors])
        self.n_docs = sum(n for n, _ in stats)
        total_dl = sum(t for _, t in stats)
        self.avgdl = total_dl / self.n_docs if self.n_docs else 0.0

    def search(
        self, query: str, k: int = 10, scorer: str = "bm25", algorithm: str = "auto"
    ) -> list[tuple[int, float]]:
        import ray

        terms = ray.get(self._actors[0].tokenize.remote(query))
        if not terms:
            return []
        uniq = list(dict.fromkeys(terms))
        df_maps = ray.get([a.term_dfs.remote(uniq) for a in self._actors])
        df = {t: sum(m[t] for m in df_maps) for t in uniq}
        gs = {"n_docs": self.n_docs, "avgdl": self.avgdl, "df": df}
        partials = ray.get(
            [a.search.remote(query, k, scorer, algorithm, gs) for a in self._actors]
        )
        return _merge_topk(partials, k)

    def shutdown(self) -> None:
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []


class QueryService:
    """Round-robin pool of searcher actors over one index (replication)."""

    def __init__(self, index_dir: str, replicas: int = 2, num_cpus: float = 1):
        import ray

        from indexer_ray.pipelines.query import IndexSearcher

        @ray.remote(num_cpus=num_cpus)
        class _SearcherActor:
            def __init__(self, d: str):
                self.s = IndexSearcher(d)

            def search(self, query: str, k: int, scorer: str, algorithm: str):
                return self.s.search(query, k=k, scorer=scorer, algorithm=algorithm)

            def search_urls(self, query: str, k: int, scorer: str, algorithm: str):
                return self.s.search_urls(query, k=k, scorer=scorer, algorithm=algorithm)

            def warm(self, queries: list[str]) -> int:
                for q in queries:
                    self.s.search(q, k=10)
                return len(queries)

        self._actors = [_SearcherActor.remote(index_dir) for _ in range(replicas)]
        self._rr = 0

    def _next(self):
        a = self._actors[self._rr % len(self._actors)]
        self._rr += 1
        return a

    def warm(self, queries: list[str]) -> None:
        import ray

        ray.get([a.warm.remote(queries) for a in self._actors])

    def search(
        self, query: str, k: int = 10, scorer: str = "bm25", algorithm: str = "auto"
    ) -> list[tuple[int, float]]:
        import ray

        return ray.get(self._next().search.remote(query, k, scorer, algorithm))

    def search_many(
        self,
        queries: list[str],
        k: int = 10,
        scorer: str = "bm25",
        algorithm: str = "auto",
    ) -> list[Any]:
        """Fan a batch of queries across all replicas concurrently."""
        import ray

        refs = [self._next().search.remote(q, k, scorer, algorithm) for q in queries]
        return ray.get(refs)

    def shutdown(self) -> None:
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []
