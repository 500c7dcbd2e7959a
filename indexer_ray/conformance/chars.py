"""Rust `char` class emulation (reference lexer.rs:66-84 tokenizes with
`char::is_whitespace` / `is_numeric` / `is_alphabetic` / `is_alphanumeric`).

Mapping to Unicode properties (Rust std definitions):
  is_whitespace   -> White_Space property
  is_numeric      -> general categories Nd, Nl, No
  is_alphabetic   -> Alphabetic property (L*, Nl, Other_Alphabetic)
  is_alphanumeric -> is_alphabetic | is_numeric

Python approximations (documented deltas, SURVEY.md §7.4.2):
  * Python str.isspace() == White_Space plus U+001C..U+001F; we subtract those.
  * Other_Alphabetic (combining vowel signs etc.) is approximated by L* + Nl +
    the Mn/Mc categories whose chars are overwhelmingly Other_Alphabetic.
    Conformance fixtures stay inside the exactly-matching subset.
"""

from __future__ import annotations

import unicodedata

_NOT_RUST_WS = frozenset("\x1c\x1d\x1e\x1f")
_ALPHA_CATS = frozenset(("Lu", "Ll", "Lt", "Lm", "Lo", "Nl"))
_NUMERIC_CATS = frozenset(("Nd", "Nl", "No"))
_OTHER_ALPHA_CATS = frozenset(("Mn", "Mc"))


def is_whitespace(ch: str) -> bool:
    return ch.isspace() and ch not in _NOT_RUST_WS


def is_numeric(ch: str) -> bool:
    return unicodedata.category(ch) in _NUMERIC_CATS


def is_alphabetic(ch: str) -> bool:
    cat = unicodedata.category(ch)
    return cat in _ALPHA_CATS or cat in _OTHER_ALPHA_CATS


def is_alphanumeric(ch: str) -> bool:
    return is_alphabetic(ch) or is_numeric(ch)
