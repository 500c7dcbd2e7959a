"""From-spec PNG codec tests (RFC 2083 / W3C PNG spec).

decode_png is validated by roundtrip against encode_png over every
(color type x scanline filter) combination, by a handcrafted palette
image, and by rejection tests for the documented out-of-scope shapes
(16-bit depth, Adam7 interlace, truncation, bad zlib stream).
"""

import struct
import zlib

import numpy as np
import pytest

from indexer_ray.pipelines.multimodal import (
    _PNG_SIG,
    decode_image,
    decode_png,
    encode_png,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_rgb_roundtrip_every_filter(filter_type):
    rng = np.random.default_rng(100 + filter_type)
    px = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    out = decode_png(encode_png(px, filter_type=filter_type))
    assert out is not None and out.shape == (13, 7, 3)
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_rgba_roundtrip_drops_alpha(filter_type):
    rng = np.random.default_rng(200 + filter_type)
    px = rng.integers(0, 256, size=(9, 11, 4), dtype=np.uint8)
    out = decode_png(encode_png(px, filter_type=filter_type))
    np.testing.assert_array_equal(out, px[:, :, :3])


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_grayscale_roundtrip_replicates(filter_type):
    rng = np.random.default_rng(300 + filter_type)
    px = rng.integers(0, 256, size=(6, 17), dtype=np.uint8)
    out = decode_png(encode_png(px, filter_type=filter_type))
    np.testing.assert_array_equal(out, np.repeat(px[:, :, None], 3, axis=2))


def test_single_pixel_and_single_row():
    px = np.array([[[1, 2, 3]]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(px, 4)), px)
    row = np.arange(30, dtype=np.uint8).reshape(1, 10, 3)
    np.testing.assert_array_equal(decode_png(encode_png(row, 1)), row)


def test_gradient_image_filters_agree():
    # a smooth gradient exercises the filters' mod-256 wraparound paths
    y, x = np.mgrid[0:32, 0:32]
    px = np.stack([(y * 9) % 256, (x * 7) % 256, (y * x) % 256], axis=2).astype(
        np.uint8
    )
    ref = decode_png(encode_png(px, 0))
    for ft in (1, 2, 3, 4):
        np.testing.assert_array_equal(decode_png(encode_png(px, ft)), ref)


def test_palette_handcrafted():
    # 2x2 palette image: indices [[0,1],[2,0]] through a 3-entry PLTE
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1]) + bytes([0, 2, 0])  # filter-0 scanlines
    body = zlib.compress(raw)
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", body)
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], dtype=np.uint8
    )
    np.testing.assert_array_equal(out, expect)


def test_gray_alpha_roundtrip():
    # handcrafted color type 4 (gray+alpha), filter 0
    g = np.array([[10, 200], [77, 3]], dtype=np.uint8)
    a = np.array([[255, 0], [128, 9]], dtype=np.uint8)
    rows = b"".join(
        b"\x00" + bytes(np.stack([g[r], a[r]], axis=1).ravel()) for r in range(2)
    )
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 4, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(rows))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(png), np.repeat(g[:, :, None], 3, axis=2))


def test_multi_idat_chunks():
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    body = zlib.compress(
        b"".join(b"\x00" + px[r].tobytes() for r in range(4))
    )
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", body[: len(body) // 2])
        + _chunk(b"IDAT", body[len(body) // 2 :])
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(png), px)


@pytest.mark.parametrize(
    "ihdr",
    [
        struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0),  # 16-bit depth
        struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1),  # Adam7 interlace
        struct.pack(">IIBBBBB", 4, 4, 4, 3, 0, 0, 0),  # sub-byte depth
        struct.pack(">IIBBBBB", 0, 4, 8, 2, 0, 0, 0),  # zero width
    ],
)
def test_out_of_scope_shapes_return_none(ihdr):
    body = zlib.compress(b"\x00" * (4 * (4 * 3 + 1)))
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", body)
        + _chunk(b"IEND", b"")
    )
    assert decode_png(png) is None


def test_malformed_streams_return_none():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(px)
    assert decode_png(good[: len(good) - 20]) is None  # truncated
    assert decode_png(b"\x89PNG not a real file") is None  # bad signature
    # corrupt the zlib stream inside IDAT (flip bytes past the IHDR chunk)
    bad = bytearray(good)
    bad[len(_PNG_SIG) + 25 + 12 : len(_PNG_SIG) + 25 + 16] = b"\xff\xff\xff\xff"
    assert decode_png(bytes(bad)) is None
    # wrong IDAT length for the declared geometry
    short_body = zlib.compress(b"\x00" * 5)
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", short_body)
        + _chunk(b"IEND", b"")
    )
    assert decode_png(png) is None
    # palette image without a PLTE chunk
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x01\x00\x02\x00"))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(png) is None


def test_decode_image_dispatches_png():
    px = np.full((5, 5, 3), 42, dtype=np.uint8)
    out = decode_image(encode_png(px, 2))
    np.testing.assert_array_equal(out, px)

def test_mixed_media_real_decode_pipeline(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.multimodal import (
        decode_features,
        resize_media,
        decode_ppm,
        synth_media_table,
    )

    t = synth_media_table(35, seed=7, fmt="mixed")  # bmp/png/jpeg/gif/fake rotation
    out = (
        decode_features(rd.from_arrow(t), decoder="real", feat_dim=8)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    # rows rotate bmp, png, jpeg, gif, fake — only the fake hash bytes fail
    assert out["ok"].tolist() == [i % 5 != 4 for i in range(35)]
    feats = np.stack(out["feature"].to_numpy())
    assert np.isfinite(feats).all()

    # resize consumes PNG payloads through the same dispatch
    rs = (
        resize_media(rd.from_arrow(t), width=4, height=4, decoder="real")
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i in range(35):
        if i % 5 != 4:
            px = decode_ppm(rs["payload"][i])
            assert px is not None and px.shape == (4, 4, 3)
        else:
            assert rs["payload"][i] == b""
