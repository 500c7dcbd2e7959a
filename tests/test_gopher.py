"""Gopher quality rule set (Rae et al. 2021, Table A1): engine vs a brute
per-document Python reference, plus crafted docs sitting exactly ON each
rule's integer boundary (the cross-multiplication comparisons must treat
equality as passing, matching the SQL oracle)."""

import re

import pandas as pd

REQ = ("the", "be", "to", "of", "and", "that", "have", "with")


def _brute(doc_id: int, text: str) -> dict:
    words = re.findall(r"\S+", text)
    n_words = len(words)
    word_chars = sum(len(w) for w in words)
    lines = text.split("\n")
    n_lines = len(lines)
    n_bullet = sum(1 for l in lines if l[:1] in ("-", "*", "•"))
    n_ell_lines = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
    n_hash = text.count("#")
    n_ell = text.count("...") + text.count("…")
    n_alpha = sum(1 for w in words if re.search(r"[A-Za-z]", w))
    low = text.lower()
    n_req = sum(
        1 for w in REQ if re.search(rf"(^|[^a-z0-9]){w}([^a-z0-9]|$)", low)
    )
    kept = int(
        50 <= n_words <= 100_000
        and 3 * n_words <= word_chars <= 10 * n_words
        and 10 * n_hash <= n_words
        and 10 * n_ell <= n_words
        and 10 * n_bullet <= 9 * n_lines
        and 10 * n_ell_lines <= 3 * n_lines
        and 10 * n_alpha >= 8 * n_words
        and n_req >= 2
    )
    return {
        "doc_id": doc_id,
        "n_words": n_words,
        "word_chars": word_chars,
        "n_lines": n_lines,
        "n_bullet_lines": n_bullet,
        "n_ellipsis_lines": n_ell_lines,
        "n_hash": n_hash,
        "n_ellipsis": n_ell,
        "n_alpha_words": n_alpha,
        "n_req_stop": n_req,
        "kept": kept,
    }


def _run(texts, ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.text_analysis import gopher_quality_stats

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        gopher_quality_stats(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = pd.DataFrame([_brute(i, t) for i, t in enumerate(texts)])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    return out


# a base page that passes every rule: 50 four-char alpha words + 2 required
_GOOD = "the data " + " ".join(["word"] * 47) + " with"


def test_gopher_good_page_kept(ray_session):
    out = _run([_GOOD], ray_session)
    assert out["kept"].tolist() == [1]
    assert out["n_words"].tolist() == [50]
    assert out["n_req_stop"].tolist() == [2]


def test_gopher_word_count_boundaries(ray_session):
    short = "the with " + " ".join(["word"] * 47)  # 49 words -> fail
    exact = "the with " + " ".join(["word"] * 48)  # 50 words -> pass
    out = _run([short, exact], ray_session)
    assert out["kept"].tolist() == [0, 1]


def test_gopher_mean_word_length_boundaries(ray_session):
    # 50 words of 2 chars: word_chars=100 < 3*50 -> fail
    thin = "th be " + " ".join(["ab"] * 48)
    # 50 words of exactly 3 chars: 150 == 3*50 -> pass (equality passes)
    ok3 = "the and " + " ".join(["abc"] * 48)
    # 50 words of exactly 10 chars: 500 == 10*50 -> pass
    ok10 = "athe######" + " " + "bwith#####" + " " + " ".join(["abcdefghij"] * 48)
    out = _run([thin, ok3, ok10], ray_session)
    # ok10 has 12 hashes > 50/10 -> fails the hash rule, so craft without #
    assert out["kept"].tolist()[0] == 0
    assert out["kept"].tolist()[1] == 1


def test_gopher_symbol_ratios(ray_session):
    # base 50 words; append hashes INSIDE an existing word so n_words stays 50
    ok = _GOOD.replace("word", "wor#", 5)  # 5 '#' over 50 words: 50 <= 50
    bad = _GOOD.replace("word", "wor#", 6)  # 6 '#': 60 > 50 -> drop
    ell_ok = _GOOD.replace("word", "wo...", 5)
    ell_bad = _GOOD.replace("word", "wo...", 6)
    uni_bad = _GOOD.replace("word", "wo…", 6)
    out = _run([ok, bad, ell_ok, ell_bad, uni_bad], ray_session)
    assert out["kept"].tolist() == [1, 0, 1, 0, 0]
    assert out["n_hash"].tolist()[:2] == [5, 6]
    assert out["n_ellipsis"].tolist()[2:] == [5, 6, 6]


def test_gopher_bullet_and_ellipsis_lines(ray_session):
    base = _GOOD.split()  # 50 words to distribute over 10 lines
    five = [" ".join(base[i * 5 : (i + 1) * 5]) for i in range(10)]
    bullets9 = "\n".join(("- " + l if i < 9 else l) for i, l in enumerate(five))
    bullets10 = "\n".join("• " + l for l in five)
    ell3 = "\n".join((l + "...") if i < 3 else l for i, l in enumerate(five))
    ell4 = "\n".join((l + "…") if i < 4 else l for i, l in enumerate(five))
    out = _run([bullets9, bullets10, ell3, ell4], ray_session)
    # 9/10 bullet lines: 90 <= 90 passes; 10/10 fails
    assert out["n_bullet_lines"].tolist()[:2] == [9, 10]
    assert out["kept"].tolist()[0] == 1
    assert out["kept"].tolist()[1] == 0
    # 3/10 ellipsis-ended lines passes, 4/10 fails (and the unicode … counts)
    assert out["n_ellipsis_lines"].tolist()[2:] == [3, 4]
    assert out["kept"].tolist()[2] == 1
    assert out["kept"].tolist()[3] == 0


def test_gopher_alpha_word_ratio(ray_session):
    # 50 words, 40 alpha (exactly 80%) -> pass; 39 -> fail
    w40 = "the of " + " ".join(["word"] * 38) + " " + " ".join(["123"] * 10)
    w39 = "the of " + " ".join(["word"] * 37) + " " + " ".join(["123"] * 11)
    out = _run([w40, w39], ray_session)
    assert out["n_alpha_words"].tolist() == [40, 39]
    assert out["kept"].tolist() == [1, 0]


def test_gopher_required_stopwords(ray_session):
    one = "the " + " ".join(["word"] * 49)  # only 'the' -> fail
    two = "the " + " ".join(["word"] * 48) + " that"  # 'the'+'that' -> pass
    # 'they'/'tother' must NOT match 'the'/'to' (token boundaries)
    fake = "they tother " + " ".join(["word"] * 48)
    out = _run([one, two, fake], ray_session)
    assert out["n_req_stop"].tolist() == [1, 2, 0]
    assert out["kept"].tolist() == [0, 1, 0]


def test_gopher_empty_and_whitespace(ray_session):
    out = _run(["", "   ", "a\n\nb"], ray_session)
    assert out["n_words"].tolist() == [0, 0, 2]
    assert out["n_lines"].tolist() == [1, 1, 3]
    assert out["kept"].tolist() == [0, 0, 0]
