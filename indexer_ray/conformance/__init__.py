"""Executable conformance spec (no Ray imports allowed in this package).

Implements, token-for-token, the semantics of the reference engine's text
chain (reference: /root/reference/src/lexer.rs:66-128, parsers.rs, tree.rs
scoring) as plain Python.  The distributed engine is tested against this
package; fixtures are generated from it.
"""

from indexer_ray.conformance.lexer import tokenize, tokenize_plain
from indexer_ray.conformance.stemmer import stem
from indexer_ray.conformance.stopwords import STOP_WORDS
from indexer_ray.conformance.extract import extract_text, extract_visible_text
from indexer_ray.conformance.scorer import (
    brute_force_tfidf_topk,
    brute_force_bm25_topk,
    tfidf_idf,
    bm25_idf,
)

__all__ = [
    "tokenize",
    "tokenize_plain",
    "stem",
    "STOP_WORDS",
    "extract_text",
    "extract_visible_text",
    "brute_force_tfidf_topk",
    "brute_force_bm25_topk",
    "tfidf_idf",
    "bm25_idf",
]
