"""URL canonicalization (R1-R5) and host rollups."""

import pandas as pd
import pytest
import ray.data as rd

from indexer_ray.pipelines.urls import _canon_one, canonicalize_urls, host_doc_counts


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTP://WWW.Ex.COM/Path", "http://www.ex.com/Path"),  # R3 path case kept
        ("http://ex.com:80/a", "http://ex.com/a"),  # R4 default port
        ("https://ex.com:443/a", "https://ex.com/a"),
        ("http://ex.com:8080/a", "http://ex.com:8080/a"),  # non-default kept
        ("http://ex.com/a#frag", "http://ex.com/a"),  # R1
        ("http://ex.com/a?b=2&a=1", "http://ex.com/a?a=1&b=2"),  # R2 sort
        ("http://ex.com/a?", "http://ex.com/a"),  # empty query drops
        ("http://ex.com/", "http://ex.com"),  # R5 root slash
        ("http://ex.com/a/b/", "http://ex.com/a/b"),  # R5 path slash
        ("http://ex.com/a/?b=2&a=1#f", "http://ex.com/a/?a=1&b=2"),  # combined
        ("", ""),
    ],
)
def test_canon_rules(raw, canon):
    assert _canon_one(raw) == canon


def test_canonicalize_and_host_rollup(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": pd.array(range(6), dtype="int64"),
            "url": [
                "HTTP://A.COM:80/x",
                "http://a.com/x/",
                "https://B.com:443/y#z",
                "http://b.COM:8080/y",
                "http://a.com/x?q=1",
                "http://A.com/x",
            ],
        }
    )
    out = canonicalize_urls(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out["canon_url"].tolist() == [
        "http://a.com/x",
        "http://a.com/x",
        "https://b.com/y",
        "http://b.com:8080/y",
        "http://a.com/x?q=1",
        "http://a.com/x",
    ]
    assert out["host"].tolist() == [
        "a.com", "a.com", "b.com", "b.com", "a.com", "a.com",
    ]
    hc = (
        host_doc_counts(rd.from_pandas(df))
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    assert hc.to_dict("records") == [
        {"host": "a.com", "n_docs": 4},
        {"host": "b.com", "n_docs": 2},
    ]


# ------------------------------------------------------- property tests
from hypothesis import given, settings
from hypothesis import strategies as st

_url_st = st.one_of(
    st.text(max_size=40),
    st.builds(
        lambda scheme, host, port, path, q, frag: (
            f"{scheme}://{host}{port}{path}{q}{frag}"
        ),
        scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
        host=st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
        port=st.sampled_from(["", ":80", ":443", ":8080"]),
        path=st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,4}/?", fullmatch=True),
        q=st.sampled_from(["", "?", "?a=1", "?b=2&a=1", "?z=9&a=1&m=3"]),
        frag=st.sampled_from(["", "#x", "#frag"]),
    ),
)


@settings(max_examples=300, deadline=None)
@given(_url_st)
def test_canonicalization_is_idempotent(u):
    once = _canon_one(u)
    assert _canon_one(once) == once


# --------------------------------------------- keep_latest_per_key


def test_keep_latest_per_key_picks_newest_then_largest_id(ray_session):
    import pandas as pd
    import ray.data as rd

    from indexer_ray.pipelines.urls import keep_latest_per_key

    df = pd.DataFrame(
        {
            "url": ["a", "a", "a", "b", "b", "c"],
            "doc_id": [1, 2, 3, 10, 11, 20],
            "ts": [5, 9, 9, 7, 3, 1],
        }
    )
    out = (
        keep_latest_per_key(rd.from_pandas(df))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # a: ts tie at 9 -> larger doc_id (3); b: newest ts 7 -> doc 10
    assert out["url"].tolist() == ["a", "b", "c"]
    assert out["doc_id"].tolist() == [3, 10, 20]
    assert out["ts"].tolist() == [9, 7, 1]


def test_keep_latest_per_key_layout_independent(ray_session):
    import pandas as pd
    import ray.data as rd

    from indexer_ray.pipelines.urls import keep_latest_per_key

    df = pd.DataFrame(
        {
            "url": [f"u{i % 9}" for i in range(100)],
            "doc_id": list(range(100)),
            "ts": [(i * 37) % 11 for i in range(100)],
        }
    )
    a = (
        keep_latest_per_key(rd.from_pandas(df))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        keep_latest_per_key(rd.from_pandas(df).repartition(8))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 9


def test_crawl_diff_statuses(ray_session):
    import ray.data as rd
    from indexer_ray.pipelines.urls import crawl_diff

    old = pd.DataFrame(
        {"url": ["a", "b", "c", "d"], "text": ["1", "2", "3", "4"]}
    )
    new = pd.DataFrame(
        {"url": ["b", "c", "d", "e"], "text": ["2", "XX", "4", "5"]}
    )
    out = (
        crawl_diff(rd.from_pandas(old), rd.from_pandas(new))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert out["status"].tolist() == [
        "removed",
        "unchanged",
        "changed",
        "unchanged",
        "added",
    ]


def test_crawl_diff_layout_independent(ray_session):
    import ray.data as rd
    from indexer_ray.pipelines.urls import crawl_diff

    n = 500
    old = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(n) if i % 7],
            "text": [
                ("OLD " + f"t{i}" if i % 5 == 0 else f"t{i}")
                for i in range(n)
                if i % 7
            ],
        }
    )
    new = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(n) if i % 11],
            "text": [f"t{i}" for i in range(n) if i % 11],
        }
    )
    a = (
        crawl_diff(rd.from_pandas(old), rd.from_pandas(new))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        crawl_diff(
            rd.from_pandas(old).repartition(8),
            rd.from_pandas(new).repartition(5),
            num_partitions=7,
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    counts = a["status"].value_counts()
    # i%7==0 rows exist only in new -> added; i%11==0 only in old -> removed
    assert counts["added"] == sum(1 for i in range(n) if i % 7 == 0 and i % 11)
    assert counts["removed"] == sum(
        1 for i in range(n) if i % 11 == 0 and i % 7
    )
    assert counts["changed"] == sum(
        1 for i in range(n) if i % 5 == 0 and i % 7 and i % 11
    )
