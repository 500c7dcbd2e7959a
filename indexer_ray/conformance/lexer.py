"""The conformance tokenizer — a faithful re-implementation of the reference
lexer state machine (reference lexer.rs:66-128) plus the lowercase step the
reference applies before lexing (parsers.rs:66,111,158,212,254; lib.rs:93).

Token rules, in order, over the lowercased character sequence:
  1. skip whitespace;
  2. leading numeric char  -> chop maximal numeric run, emit as-is (no stem);
  3. leading alphabetic char -> chop maximal ALPHANUMERIC run, Porter2-stem it;
  4. anything else -> emit the single character as a token (punctuation and
     symbols ARE terms; reference lexer.rs:83).
Then stop words are removed by exact match AFTER stemming (lexer.rs:107-128):
stemmed tokens are compared against the unstemmed stop list ("having"->"have"
is dropped; "has"->"ha" is kept).

An exact ASCII fast path uses a compiled regex; strings containing non-ASCII
characters take the per-character state machine with Rust char classes.
"""

from __future__ import annotations

import re
from functools import lru_cache

from indexer_ray.conformance import chars
from indexer_ray.conformance.stemmer import stem
from indexer_ray.conformance.stopwords import STOP_WORDS

# ASCII fast path.  After str.lower() an ASCII string contains no A-Z.  Rust
# ASCII whitespace (White_Space ∩ ASCII) = space \t \n \x0b \x0c \r.
_ASCII_TOKEN_RE = re.compile(r"([0-9]+)|([a-z][a-z0-9]*)|([^ \t\n\x0b\x0c\r])")

# Cache stems: natural-language token distributions are Zipfian, so the hit
# rate is very high; the reference instead rebuilt its stemmer per token
# (lexer.rs:93-96) — one of the quirks we do NOT replicate (output-identical).
_cached_stem = lru_cache(maxsize=1 << 18)(stem)


def _lex_ascii(text: str) -> list[str]:
    cs = _cached_stem
    return [
        cs(alpha) if alpha else (num or single)
        for num, alpha, single in _ASCII_TOKEN_RE.findall(text)
    ]


def _lex_unicode(text: str) -> list[str]:
    out = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if chars.is_whitespace(ch):
            i += 1
            continue
        if chars.is_numeric(ch):
            j = i + 1
            while j < n and chars.is_numeric(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if chars.is_alphabetic(ch):
            j = i + 1
            while j < n and chars.is_alphanumeric(text[j]):
                j += 1
            out.append(_cached_stem(text[i:j]))
            i = j
            continue
        out.append(ch)
        i += 1
    return out


def _lex_ascii_nostem(text: str) -> list[str]:
    out = []
    for num, alpha, single in _ASCII_TOKEN_RE.findall(text):
        out.append(alpha or num or single)
    return out


def _lex_unicode_nostem(text: str) -> list[str]:
    out = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if chars.is_whitespace(ch):
            i += 1
            continue
        if chars.is_numeric(ch):
            j = i + 1
            while j < n and chars.is_numeric(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if chars.is_alphabetic(ch):
            j = i + 1
            while j < n and chars.is_alphanumeric(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        out.append(ch)
        i += 1
    return out


def lex(lowered: str, stem_tokens: bool = True) -> list[str]:
    """Tokenize (+ optionally stem) an ALREADY-lowercased string (no stop
    filtering)."""
    if lowered.isascii():
        return _lex_ascii(lowered) if stem_tokens else _lex_ascii_nostem(lowered)
    return _lex_unicode(lowered) if stem_tokens else _lex_unicode_nostem(lowered)


def tokenize(text: str, stop_words: frozenset[str] = STOP_WORDS) -> list[str]:
    """Full reference chain: lowercase -> lex+stem -> post-stem stop filter."""
    tokens = lex(text.lower())
    if stop_words:
        return [t for t in tokens if t not in stop_words]
    return tokens


_PLAIN_RE = re.compile(r"[a-z0-9]+")


def tokenize_plain(text: str) -> list[str]:
    """SQL-expressible "plain mode": lowercase + maximal [a-z0-9] runs.

    No stemming, no stop words, no punctuation tokens.  Matches DuckDB's
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` (empties removed),
    which is what the driver's oracle queries use.
    """
    return _PLAIN_RE.findall(text.lower())


def make_tokenizer(
    mode: str = "conformance",
    stem_tokens: bool = True,
    stop_words: frozenset[str] | None = STOP_WORDS,
):
    """Tokenizer factory — the user-extension surface the reference lacks
    (SURVEY.md §2.7: its only configuration point is the compile-time
    parser registry).  Conformance mode with defaults IS the reference
    chain; `stem_tokens=False` and/or a custom/empty `stop_words` give the
    engine-mode variants; `mode="plain"` is the SQL-expressible tokenizer.

    Stop filtering stays POST-stem (lexer.rs:107-128, quirk Q3) whatever
    the configuration, so toggles compose without changing semantics."""
    if mode == "plain":
        return tokenize_plain
    stops = stop_words or frozenset()

    def tok(text: str) -> list[str]:
        tokens = lex(text.lower(), stem_tokens=stem_tokens)
        if stops:
            return [t for t in tokens if t not in stops]
        return tokens

    return tok
