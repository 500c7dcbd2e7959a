"""Vendored pure-Python Snowball English ("Porter2") stemmer.

Implemented from the published algorithm description at snowballstem.org
(public specification).  The reference engine stems alphabetic-initial tokens
with `rust_stemmers::Algorithm::English` (reference lexer.rs:93-96), which is
generated from the same published Snowball source; this module is our offline
stand-in (no stemmer wheel is available in this environment).

Input is expected to be already lowercased (the reference lowercases the whole
text before lexing; parsers.rs:66,111,158,212,254).  Non-ASCII letters are
treated as consonants, matching the Snowball-generated code's behavior of only
recognizing ASCII vowels.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms applied to the whole word before the algorithm proper.
_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Words left unchanged after step 1a.
_EXCEPTIONS2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed")
)


def _is_vowel(word: str, i: int) -> bool:
    # 'Y' (marked consonant-y) is never a vowel; 'y' is.
    return word[i] in _VOWELS


def _compute_r1_r2(word: str) -> tuple[int, int]:
    n = len(word)
    # R1: region after the first non-vowel following a vowel; special prefixes.
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    # R2: same definition evaluated inside R1.
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable.

    (a) vowel followed by a non-vowel other than w, x or Y, preceded by a
        non-vowel; or (b) a vowel at the beginning of the word followed by a
        non-vowel.
    """
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        if (
            _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 1)
            and word[n - 1] not in "wxY"
            and not _is_vowel(word, n - 3)
        ):
            return True
    return False


def _contains_vowel(word: str, start: int, end: int) -> bool:
    for i in range(start, end):
        if _is_vowel(word, i):
            return True
    return False


def stem(token: str) -> str:
    """Snowball English stem of an already-lowercased token."""
    word = token
    if len(word) <= 2:
        return word
    if word[0] == "'":
        word = word[1:]
        if len(word) <= 2:
            return word

    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc

    # Mark consonant-y as 'Y': initial y, or y after a vowel.
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _compute_r1_r2(word)

    # --- Step 0: longest among ' , 's , 's' ---
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # --- Step 1a ---
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        # delete if the preceding word part contains a vowel not immediately
        # before the s
        if _contains_vowel(word, 0, len(word) - 2):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # --- Step 1b ---
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part, 0, len(stem_part)):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _ends_short_syllable(word) and r1 >= len(word):
                        word += "e"
                break

    # --- Step 1c: y/Y -> i if preceded by a non-vowel which is not the first
    # letter of the word ---
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # --- Step 2 (suffix must lie in R1) ---
    step2 = (
        ("ization", "ize"),
        ("ational", "ate"),
        ("ousness", "ous"),
        ("iveness", "ive"),
        ("fulness", "ful"),
        ("tional", "tion"),
        ("lessli", "less"),
        ("biliti", "ble"),
        ("entli", "ent"),
        ("ation", "ate"),
        ("alism", "al"),
        ("aliti", "al"),
        ("ousli", "ous"),
        ("iviti", "ive"),
        ("fulli", "ful"),
        ("enci", "ence"),
        ("anci", "ance"),
        ("abli", "able"),
        ("izer", "ize"),
        ("ator", "ate"),
        ("alli", "al"),
        ("bli", "ble"),
        ("ogi", None),  # special: -> og if preceded by l
        ("li", None),  # special: delete if preceded by valid li-ending
    )
    for suf, rep in step2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if len(word) >= 4 and word[-4] == "l":
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # --- Step 3 (suffix must lie in R1) ---
    step3 = (
        ("ational", "ate"),
        ("tional", "tion"),
        ("alize", "al"),
        ("icate", "ic"),
        ("iciti", "ic"),
        ("ative", None),  # delete if in R2
        ("ical", "ic"),
        ("ness", ""),
        ("ful", ""),
    )
    for suf, rep in step3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + rep
            break

    # --- Step 4 (suffix must lie in R2) ---
    step4 = (
        "ement",
        "ance",
        "ence",
        "able",
        "ible",
        "ment",
        "ent",
        "ism",
        "ate",
        "iti",
        "ous",
        "ive",
        "ize",
        "ion",
        "al",
        "er",
        "ic",
        "ant",
    )
    # longest-match semantics: order by length descending, stable.
    for suf in sorted(step4, key=len, reverse=True):
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # --- Step 5 ---
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")
