"""indexer_ray — a Ray-Data-native inverted-index + BM25/TF-IDF query engine.

A from-scratch rebuild of the capabilities of the reference engine
(juanmilkah/indexer, a single-node Rust search engine; see SURVEY.md) as a
distributed, streaming, resumable Ray Data pipeline over Parquet tables of
Common-Crawl-style web pages.

Layout:
  conformance/ — the executable spec (no Ray): tokenizer chain, stemmer,
                 stop words, text extraction, brute-force scorers.  Everything
                 distributed is judged against this package.
  sources/     — deterministic synthetic `pages` table generator + read helpers.
  stages/      — map_batches stage bodies (tokenize actor, codecs).
  pipelines/   — build (index construction), query (search engines), dedup,
                 ann, text_analysis, multimodal.
  state/       — index manifest, checkpoint/resume bookkeeping, metrics.
  functions/   — vectorized scalar helpers shared across stages.
"""

__version__ = "0.1.0"
