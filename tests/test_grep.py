"""Trigram-index regex search (Cox 2012): literal extraction, index
roundtrip, pruned-vs-scan identity, regimes, and the superset invariant
(candidates always contain every true match)."""

import os
import re

import numpy as np
import pandas as pd
import pytest

from indexer_ray.pipelines.grep import required_literals


# ------------------------------------------------- literal extraction
def test_required_literals_cases():
    assert required_literals("batch [a-z]+ window") == ["batch ", " window"]
    assert required_literals("plaintext") == ["plaintext"]
    # quantifier drops the preceding char; the run after it IS required
    assert required_literals("foobar+baz") == ["fooba", "baz"]
    assert required_literals("colou?r fast") == ["colo", "r fast"]
    # alternation anywhere -> no required substring
    assert required_literals("alpha|beta") == []
    assert required_literals("pre (a|b) post") == []
    # escapes break runs; both sides stay required
    assert required_literals(r"abc\d+def") == ["abc", "def"]
    # {m,n} quantifier body skipped
    assert required_literals("head{2,3}tail") == ["hea", "tail"]
    # short fragments dropped
    assert required_literals("ab.cd") == []
    # quantified groups: literals inside the group are NOT required
    assert required_literals("(foo)?bar") == ["bar"]
    assert required_literals("(abc)*tail") == ["tail"]
    assert required_literals("(word){0,2}rest") == ["rest"]
    # unquantified groups keep their literals required
    assert required_literals("(abc)def") == ["abc", "def"]
    assert required_literals("((abc)def)?tail") == ["tail"]
    # inline-flag / lookaround groups kill all required literals
    assert required_literals("(?i)pattern") == []
    assert required_literals("(?:abc)def") == []
    assert required_literals("foo(?=bar)") == []


def test_required_literals_superset_semantics():
    # every extracted literal must be a substring of every match
    pats = [
        "batch [a-z]+ window",
        "foobar+baz",
        "head{2,3}tail",
        "colou?r fast",
        "(foo)?bar",
        "(abc)*tail",
        "(word){0,2}rest",
        "(abc)def",
    ]
    samples = {
        "batch [a-z]+ window": "x batch zzz window y",
        "foobar+baz": "foobarrrbaz",
        "head{2,3}tail": "headdtail",
        "colou?r fast": "color fast",
        "(foo)?bar": "xxbarxx",
        "(abc)*tail": "zz tail zz",
        "(word){0,2}rest": "no rest here",
        "(abc)def": "xabcdefy",
    }
    for p in pats:
        m = samples[p]
        assert re.search(p, m)
        for lit in required_literals(p):
            assert lit in m, (p, lit)


# ------------------------------------------------------ index + grep
@pytest.fixture(scope="module")
def grep_corpus(ray_session, tmp_path_factory):
    import ray.data as rd

    from indexer_ray.pipelines.grep import build_trigram_index

    base = tmp_path_factory.mktemp("grep")
    rows = []
    for i in range(200):
        body = f"filler{i} common text body number {i}"
        if i % 7 == 0:
            body += " needle alpha needle"
        if i % 11 == 0:
            body += " magic WORD here"
        rows.append((i, body))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs_path = os.path.join(base, "docs.parquet")
    df.to_parquet(docs_path, index=False)
    idx = os.path.join(base, "tri_index")
    meta = build_trigram_index(rd.from_pandas(df), idx, n_parts=8)
    assert meta["n_rows"] > 0
    return idx, docs_path, df


def _brute(df, pattern):
    return sorted(
        int(d) for d, t in zip(df["doc_id"], df["text"]) if re.search(pattern, t)
    )


def test_grep_indexed_matches_brute(grep_corpus):
    from indexer_ray.pipelines.grep import regex_grep

    idx, docs_path, df = grep_corpus
    for pat in ["needle [a-z]+ needle", "magic WORD", "number 19"]:
        out, stats = regex_grep(idx, docs_path, pat, return_stats=True)
        assert stats["used_index"]
        assert out["doc_id"].tolist() == _brute(df, pat), pat


def test_grep_candidates_prune(grep_corpus):
    from indexer_ray.pipelines.grep import regex_grep

    idx, docs_path, df = grep_corpus
    out, stats = regex_grep(idx, docs_path, "magic WORD", return_stats=True)
    # the trigram cut must be much smaller than the corpus
    assert stats["n_candidates"] < 50
    assert stats["n_candidates"] >= len(out)  # superset invariant


def test_grep_scan_fallback_alternation(grep_corpus):
    from indexer_ray.pipelines.grep import regex_grep

    idx, docs_path, df = grep_corpus
    pat = "needle|magic"
    out, stats = regex_grep(idx, docs_path, pat, return_stats=True)
    assert not stats["used_index"]
    assert out["doc_id"].tolist() == _brute(df, pat)


def test_grep_distributed_verify_regime(grep_corpus):
    from indexer_ray.pipelines.grep import regex_grep

    idx, docs_path, df = grep_corpus
    pat = "needle alpha"
    a = regex_grep(idx, docs_path, pat)
    b = regex_grep(idx, docs_path, pat, scan_threshold=0)  # force streaming
    pd.testing.assert_frame_equal(a, b)


def test_grep_no_match_early_exit(grep_corpus):
    from indexer_ray.pipelines.grep import regex_grep

    idx, docs_path, _ = grep_corpus
    out, stats = regex_grep(idx, docs_path, "zzqx absent trigram", return_stats=True)
    assert len(out) == 0 and stats["n_candidates"] == 0


# -------------------------------------------------- generation append


def test_trigram_append_equals_rebuild(grep_corpus, tmp_path, ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.grep import (
        build_trigram_index,
        regex_grep,
        trigram_index_append,
    )

    new = pd.DataFrame(
        {
            "doc_id": [1000, 1001],
            "text": ["fresh needle alpha needle crawl", "fresh magic WORD page"],
        }
    )
    _, docs_path, df = grep_corpus
    both = pd.concat([df, new], ignore_index=True)
    docs2 = os.path.join(tmp_path, "docs2.parquet")
    both.to_parquet(docs2, index=False)

    idx_a = os.path.join(tmp_path, "appended")
    build_trigram_index(rd.from_pandas(df), idx_a, n_parts=8)
    meta = trigram_index_append(idx_a, rd.from_pandas(new))
    assert meta["gens"] == ["gen0", "gen1"]

    idx_b = os.path.join(tmp_path, "rebuilt")
    build_trigram_index(rd.from_pandas(both), idx_b, n_parts=8)

    for pat in ["needle [a-z]+ needle", "magic WORD"]:
        a = regex_grep(idx_a, docs2, pat)
        b = regex_grep(idx_b, docs2, pat)
        pd.testing.assert_frame_equal(a, b)
        assert 1000 in set(a["doc_id"]) or pat == "magic WORD"


def test_trigram_append_crash_orphan_invisible_then_reclaimed(
    grep_corpus, tmp_path, ray_session
):
    import json

    import ray.data as rd

    from indexer_ray.pipelines.grep import (
        build_trigram_index,
        regex_grep,
        trigram_index_append,
    )

    _, _, df = grep_corpus
    idx = os.path.join(tmp_path, "crashy")
    build_trigram_index(rd.from_pandas(df), idx, n_parts=4)
    new = pd.DataFrame({"doc_id": [5000], "text": ["zzqx absent trigram page"]})
    docs2 = os.path.join(tmp_path, "docs3.parquet")
    pd.concat([df, new], ignore_index=True).to_parquet(docs2, index=False)

    # simulate a crashed append: gen1 files written, meta NOT committed
    from indexer_ray.pipelines.grep import _write_trigram_gen

    _write_trigram_gen(rd.from_pandas(new), idx, 4, "gen1")
    out = regex_grep(idx, docs2, "zzqx absent")
    assert len(out) == 0  # orphan generation is invisible

    # retry reclaims and commits
    trigram_index_append(idx, rd.from_pandas(new))
    meta = json.load(open(os.path.join(idx, "grep_meta.json")))
    assert meta["gens"] == ["gen0", "gen1"]
    out = regex_grep(idx, docs2, "zzqx absent")
    assert out["doc_id"].tolist() == [5000]
