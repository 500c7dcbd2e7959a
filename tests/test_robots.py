"""RFC 9309 robots.txt tests: group selection and merging, longest-match
with Allow tie-break, * / $ metacharacters, empty patterns, unknown
directives, and the broadcast actor-pool corpus filter."""

import pyarrow as pa

from indexer_ray.pipelines.robots import RobotsMatcher, filter_disallowed

BASIC = """
# policy
User-agent: evilbot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 10
"""


def test_group_selection_and_default():
    m = RobotsMatcher(BASIC)
    assert not m.allowed("/anything", agent="EvilBot")  # case-insensitive
    assert m.allowed("/public/x")  # * group, no match
    assert not m.allowed("/private/secret")
    assert m.allowed("/private/ok/x")  # longer Allow beats Disallow
    assert m.allowed("/x", agent="goodbot")  # falls to * group


def test_no_group_and_empty_robots():
    assert RobotsMatcher("").allowed("/x")
    m = RobotsMatcher("User-agent: other\nDisallow: /")
    assert m.allowed("/x", agent="mybot")  # no matching group, no * group


def test_longest_match_and_tie():
    m = RobotsMatcher(
        "User-agent: *\nDisallow: /a/\nAllow: /a/b\nDisallow: /a/b"
    )
    assert not m.allowed("/a/x")
    # /a/b: Allow and Disallow same length -> Allow wins the tie (§2.3.2)
    assert m.allowed("/a/b")


def test_wildcards_and_anchor():
    m = RobotsMatcher(
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/x\nAllow: /tmp-keep/x"
    )
    assert not m.allowed("/docs/report.pdf")
    assert m.allowed("/docs/report.pdf?download=1")  # $ anchor: query breaks it
    assert not m.allowed("/tmp123/x")
    assert m.allowed("/tmp-keep/x")  # longer Allow wins
    assert m.allowed("/other")


def test_empty_disallow_and_group_merge():
    m = RobotsMatcher(
        "User-agent: *\nDisallow:\n\nUser-agent: *\nDisallow: /b/"
    )
    assert m.allowed("/a")  # empty pattern matches nothing
    assert not m.allowed("/b/1")  # later same-agent group merged


def test_multi_agent_group():
    m = RobotsMatcher("User-agent: a\nUser-agent: b\nDisallow: /x/")
    assert not m.allowed("/x/1", agent="a")
    assert not m.allowed("/x/1", agent="b")
    assert m.allowed("/x/1", agent="c")


def test_filter_disallowed_dataset(ray_session):
    import ray.data as rd

    robots = {
        "a.test": "User-agent: *\nDisallow: /no/",
        "b.test": "User-agent: *\nDisallow: /",
    }
    t = pa.table(
        {
            "url": [
                "https://a.test/ok/1",
                "https://a.test/no/2",
                "https://b.test/any",
                "https://c.test/unlisted",  # host without robots: allowed
            ]
        }
    )
    ds = rd.from_arrow(t)
    kept = filter_disallowed(ds, robots).to_pandas()["url"].tolist()
    assert sorted(kept) == ["https://a.test/ok/1", "https://c.test/unlisted"]
    flagged = (
        filter_disallowed(ds, robots, annotate_col="allowed")
        .to_pandas()
        .sort_values("url")
    )
    # url-sorted: a.test/no/2, a.test/ok/1, b.test/any, c.test/unlisted
    assert flagged["allowed"].tolist() == [False, True, False, True]
