"""Hypothesis property tests for the round-4 from-spec components: GIF
and JPEG roundtrips over arbitrary small images, WARC record-grammar
roundtrips over arbitrary bodies (including CRLF/0xFF edge bytes), and
robots.txt longest-match consistency."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from indexer_ray.pipelines.gif import decode_gif, encode_gif
from indexer_ray.pipelines.jpeg import decode_jpeg, encode_jpeg_baseline
from indexer_ray.sources.warc import _parse_warc_records, write_warc


@st.composite
def small_image(draw, max_side=24, max_colors=16):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    ncol = draw(st.integers(1, max_colors))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncol, size=(h, w))]


@settings(max_examples=40, deadline=None)
@given(px=small_image(), interlace=st.booleans())
def test_gif_roundtrip_property(px, interlace):
    out = decode_gif(encode_gif(px, interlace=interlace))
    assert out is not None
    np.testing.assert_array_equal(out, px)


@settings(max_examples=30, deadline=None)
@given(px=small_image(max_side=20, max_colors=256), sub=st.sampled_from(["4:4:4"]))
def test_jpeg_flat_quant_property(px, sub):
    # flat quant tables: DCT rounding only — every pixel within 3
    out = decode_jpeg(encode_jpeg_baseline(px, quant=1, subsampling=sub))
    assert out is not None and out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


@settings(max_examples=40, deadline=None)
@given(
    bodies=st.lists(
        st.binary(min_size=0, max_size=200), min_size=1, max_size=5
    ),
    compress=st.booleans(),
)
def test_warc_record_grammar_roundtrip(tmp_path_factory, bodies, compress):
    # bodies are arbitrary bytes — Content-Length framing must survive
    # CRLFs, 0xFF, and even text that LOOKS like a WARC version line
    import gzip as _gz

    p = str(tmp_path_factory.mktemp("w") / "x.warc")
    recs = [
        {"url": f"https://x.test/{i}", "ctype": "application/octet-stream",
         "body": b}
        for i, b in enumerate(bodies)
    ]
    write_warc(p, recs, compress=compress)
    raw = open(p, "rb").read()
    if compress:
        raw = _gz.decompress(raw)
    parsed = list(_parse_warc_records(raw))
    # +1 for the warcinfo header record
    assert len(parsed) == len(bodies) + 1
    for (headers, block), rec in zip(parsed[1:], recs):
        assert headers["warc-target-uri"] == rec["url"]
        assert block == rec["body"]


@settings(max_examples=60, deadline=None)
@given(
    rules=st.lists(
        st.tuples(
            st.booleans(),  # allow?
            st.text(alphabet="abc/*$", min_size=1, max_size=8),
        ),
        min_size=0,
        max_size=6,
    ),
    path=st.text(alphabet="abc/", min_size=1, max_size=10),
)
def test_robots_longest_match_reference(rules, path):
    """The matcher agrees with a direct transcription of RFC 9309 §2.3.2:
    most-specific (longest octet) match wins, Allow wins ties."""
    import re as _re

    from indexer_ray.pipelines.robots import RobotsMatcher, _rule_regex

    text = "User-agent: *\n" + "".join(
        f"{'Allow' if a else 'Disallow'}: {p}\n" for a, p in rules
    )
    m = RobotsMatcher(text)
    best_len, best_allow = -1, True
    for allow, pat in rules:
        if _rule_regex(pat).match(path):
            ln = len(pat.encode())
            if ln > best_len or (ln == best_len and allow):
                best_len, best_allow = ln, allow
    expected = best_allow if best_len >= 0 else True
    assert m.allowed(path) == expected
