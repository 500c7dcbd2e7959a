"""M0 spec tests: stemmer vectors, lexer state machine, stop-word quirk,
extraction, brute-force scorer sanity (SURVEY.md §5.1-5.3)."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from indexer_ray.conformance import (
    STOP_WORDS,
    brute_force_bm25_topk,
    brute_force_tfidf_topk,
    extract_text,
    extract_visible_text,
    stem,
    tokenize,
    tokenize_plain,
)
from indexer_ray.conformance.lexer import _lex_ascii, _lex_unicode, lex


def test_stemmer_vectors():
    with open("fixtures/stemmer_vectors.tsv") as f:
        for line in f:
            word, expected = line.rstrip("\n").split("\t")
            assert stem(word) == expected, word


def test_stemmer_short_words_unchanged():
    for w in ("a", "ab", "is", "x", ""):
        assert stem(w) == w


# --- lexer golden cases (each branch of reference lexer.rs:66-84) ---
GOLDEN = [
    ("", []),
    ("   \t\n ", []),
    ("hello world", ["hello", "world"]),
    ("Hello WORLD", ["hello", "world"]),
    ("running quickly", ["run", "quick"]),
    # numeric run, unstemmed
    ("2024 3.14", ["2024", "3", ".", "14"]),
    # alphabetic-initial alphanumeric run is stemmed as a unit
    ("abc123 def", ["abc123", "def"]),
    # digit-initial: numeric run stops at non-numeric -> 'abc' restarts a token
    ("123abc", ["123", "abc"]),
    # punctuation/symbols are single-char terms (lexer.rs:83); '_' is a term
    ("a_b", ["_", "b"]),  # 'a' is a stop word
    ("x=1", ["x", "=", "1"]),
    ("<div>", ["<", "div", ">"]),
    (".,/", [".", ",", "/"]),
    # stop filter runs AFTER stemming against the unstemmed list:
    #   having->have (in list, dropped); has->has (in list, dropped);
    #   goes->goe (not in list, kept)
    ("having has goes", ["goe"]),
    ("the cat and the hat", ["cat", "hat"]),
    # unicode: greek sigma lowercases (final sigma rule), then unicode path
    ("ΣΟΦΟΣ", ["σοφοσ"] if "σοφοσ" == "ΣΟΦΟΣ".lower() else ["σοφος"]),
    ("café", ["café"]),
    # non-ascii digits (Devanagari) are numeric chars
    ("१२३", ["१२३"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_tokenize_golden(text, expected):
    assert tokenize(text) == expected


def test_ascii_and_unicode_paths_agree():
    for text in ("hello world 42!", "a_b c.d", "running 123abc <tag>"):
        lowered = text.lower()
        assert _lex_ascii(lowered) == _lex_unicode(lowered)


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
@settings(max_examples=300, deadline=None)
def test_ascii_fast_path_equals_state_machine(text):
    lowered = text.lower()
    assert _lex_ascii(lowered) == _lex_unicode(lowered)


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=None)
def test_tokenize_total_and_deterministic(text):
    a = tokenize(text)
    b = tokenize(text)
    assert a == b
    for t in a:
        assert t  # never emits empty tokens
        assert t not in STOP_WORDS


def test_tokenize_plain():
    assert tokenize_plain("Hello, World-42 x") == ["hello", "world", "42", "x"]
    assert tokenize_plain("") == []


def test_extract_text():
    assert extract_text(b"  <html>x</html>\n") == "<html>x</html>"
    assert extract_text("abc") == "abc"
    assert extract_text(b"\xff\xfe") is None  # invalid utf-8 -> skipped doc


def test_extract_visible_text():
    html = b"<html><head><title>T</title><style>p{}</style></head><body><p>Hello <b>world</b></p><script>var x;</script></body></html>"
    assert extract_visible_text(html) == "T Hello world"


def test_brute_force_tfidf():
    corpus = [
        (1, ["apple", "banana", "apple"]),
        (2, ["banana", "cherry"]),
        (3, ["cherry", "cherry", "durian"]),
        (4, []),  # empty doc: not counted in N
    ]
    n = 3
    res = brute_force_tfidf_topk(corpus, ["apple"], k=10)
    assert res == [(1, 2 * abs(math.log(n / 1)))]
    # df == N -> idf 0 -> zero score dropped entirely (quirk Q5)
    corpus2 = [(1, ["x"]), (2, ["x"]), (3, ["x", "y"])]
    assert brute_force_tfidf_topk(corpus2, ["x"], k=10) == []
    # duplicate query tokens: the reference's two-pass raw-list iteration
    # inflates global_df to m*df and accumulates m^2 times ->
    # m^2 * tf * |ln(N/(m*df))| (tree.rs:406-415 + 419-449)
    res1 = brute_force_tfidf_topk(corpus, ["apple", "apple"], k=10)
    assert res1[0][1] == pytest.approx(4 * 2 * abs(math.log(n / 2)))
    # df inflation can zero the idf: df(c)=2, N=4, m=2 -> |ln(4/4)| = 0 ->
    # every score is 0.0 -> dropped -> EMPTY (the 'cat cat' reference quirk)
    corpus4 = [(1, ["c", "p1"]), (2, ["c", "p2"]), (3, ["p3"]), (4, ["p4"])]
    assert brute_force_tfidf_topk(corpus4, ["c", "c"], k=10) == []
    assert brute_force_tfidf_topk(corpus4, ["c"], k=10) != []
    # tie-break: score desc then doc_id asc
    corpus3 = [(5, ["z"]), (2, ["z"]), (9, ["z", "w"]), (7, ["w"])]
    r = brute_force_tfidf_topk(corpus3, ["z"], k=10)
    assert [d for d, _ in r] == [2, 5, 9]


def test_brute_force_bm25_orders_by_tf_and_len():
    corpus = [(1, ["t"] * 5 + ["pad"] * 5), (2, ["t", "pad"]), (3, ["pad"])]
    res = brute_force_bm25_topk(corpus, ["t"], k=10)
    assert [d for d, _ in res] == [1, 2]
    assert all(s > 0 for _, s in res)


class TestMakeTokenizer:
    def test_defaults_equal_reference_chain(self):
        from indexer_ray.conformance.lexer import make_tokenizer, tokenize

        tok = make_tokenizer()
        for s in ("Running fast!", "abc123 42 _x", "having has was"):
            assert tok(s) == tokenize(s)

    def test_stem_off(self):
        from indexer_ray.conformance.lexer import make_tokenizer

        tok = make_tokenizer(stem_tokens=False, stop_words=None)
        assert tok("Running dogs") == ["running", "dogs"]

    def test_custom_stop_list_post_stem(self):
        from indexer_ray.conformance.lexer import make_tokenizer

        # quirk Q3 preserved: filtering compares STEMMED token to the list
        tok = make_tokenizer(stop_words=frozenset({"run"}))
        assert tok("running walks") == ["walk"]

    def test_plain_mode(self):
        from indexer_ray.conformance.lexer import make_tokenizer, tokenize_plain

        assert make_tokenizer(mode="plain")("A-b c!") == tokenize_plain("A-b c!")
