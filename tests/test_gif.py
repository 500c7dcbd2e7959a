"""From-spec GIF codec tests (GIF87a/89a, variable-width LZW): encoder
roundtrips (sequential + interlaced + transparency + >16-color palettes
that force code-width growth and clear-code resets), a handcrafted
KwKwK-case stream, sub-block splitting, frame extraction, and rejection
of truncated/corrupt input."""

import struct

import numpy as np
import pytest

from indexer_ray.pipelines.gif import (
    _lzw_decode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def _quant(rng, h, w, ncolors):
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncolors, size=(h, w))]


@pytest.mark.parametrize("ncolors", [2, 7, 40, 200])
def test_roundtrip_palette_sizes(ncolors):
    rng = np.random.default_rng(ncolors)
    px = _quant(rng, 13, 17, ncolors)
    out = decode_gif(encode_gif(px))
    assert out is not None and out.shape == (13, 17, 3)
    np.testing.assert_array_equal(out, px)


def test_roundtrip_interlaced():
    rng = np.random.default_rng(9)
    px = _quant(rng, 23, 11, 30)  # >8 rows exercises all four passes
    np.testing.assert_array_equal(decode_gif(encode_gif(px, interlace=True)), px)


def test_transparency_takes_background():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[1, 1] = [200, 10, 10]
    out = decode_gif(
        encode_gif(px, transparent_from=np.array([200, 10, 10]), bg_rgb=(7, 8, 9))
    )
    # the marked pixel renders as the background color
    np.testing.assert_array_equal(out[1, 1], [7, 8, 9])
    np.testing.assert_array_equal(out[0, 0], [0, 0, 0])


def test_large_image_forces_width_growth():
    rng = np.random.default_rng(3)
    px = _quant(rng, 64, 64, 250)  # 4096 pixels, 250 colors: multi-width LZW
    np.testing.assert_array_equal(decode_gif(encode_gif(px)), px)


def test_kwkwk_case_handcrafted():
    # classic KwKwK stream over a 2-color table (mcs=2): codes
    # CLEAR, 0, 6(=next_code at that point) decode to 0, 0,0
    from indexer_ray.pipelines.gif import _BitPacker

    bp = _BitPacker()
    for code in (4, 0, 6, 5):  # CLEAR, root 0, KwKwK, END
        bp.put(code, 3)
    out = _lzw_decode(bp.flush(), 2, 3)
    np.testing.assert_array_equal(out, [0, 0, 0])


def test_multi_frame_animation():
    # two-frame animation: frame 2 reuses the global table via a second
    # image block spliced before the trailer (same palette both frames)
    base = np.zeros((3, 3, 3), dtype=np.uint8)
    frame1 = base.copy()
    frame1[0, 0] = [9, 9, 9]
    frame2 = base.copy()
    frame2[2, 2] = [9, 9, 9]
    g1 = encode_gif(frame1)
    g2 = encode_gif(frame2)
    assert g1[:13] == g2[:13]  # same logical screen + GCT geometry
    gct_len = 3 * 4  # 2 colors -> 4-entry table
    animated = g1[:-1] + g2[13 + gct_len : -1] + b"\x3b"
    frames = decode_gif_frames(animated)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], frame1)
    np.testing.assert_array_equal(frames[1], frame2)
    # decode_gif yields only the first
    np.testing.assert_array_equal(decode_gif(animated), frame1)


def test_malformed_returns_none():
    px = np.full((4, 4, 3), 42, dtype=np.uint8)
    good = encode_gif(px)
    assert decode_gif(good[:10]) is None  # truncated header
    assert decode_gif(b"NOTAGIF") is None
    bad = bytearray(good)
    bad[0:6] = b"GIF99a"
    assert decode_gif(bytes(bad)) is None
    # zero logical screen
    z = bytearray(good)
    z[6:8] = struct.pack("<H", 0)
    assert decode_gif(bytes(z)) is None


def test_subblock_splitting_roundtrip():
    rng = np.random.default_rng(12)
    px = _quant(rng, 40, 40, 64)  # compressed stream >255 bytes: many blocks
    np.testing.assert_array_equal(decode_gif(encode_gif(px)), px)


def test_sample_frames_real_gif(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from indexer_ray.pipelines.gif import encode_gif
    from indexer_ray.pipelines.multimodal import decode_ppm, sample_frames

    # 8-frame animation: frame k paints pixel (0, k) bright
    frames_px = []
    for k in range(8):
        px = np.zeros((2, 8, 3), dtype=np.uint8)
        px[0, k] = [255, 255, 255]
        frames_px.append(px)
    gifs = [encode_gif(p) for p in frames_px]
    gct_len = 3 * 4
    animated = gifs[0][:-1] + b"".join(
        g[13 + gct_len : -1] for g in gifs[1:]
    ) + b"\x3b"
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1, 2, 3], type=pa.int64()),
                "payload": pa.array(
                    [animated, gifs[0], b"not media"], type=pa.large_binary()
                ),
            }
        )
    )
    out = (
        sample_frames(media, n_frames=4, decoder="real")
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    anim = out[out["media_id"] == 1]
    assert len(anim) == 4 and (anim["n_source_frames"] == 8).all()
    # evenly sampled: source frames 0, 2, 4, 6
    for row, src in zip(anim.itertuples(), (0, 2, 4, 6)):
        np.testing.assert_array_equal(decode_ppm(row.payload), frames_px[src])
    still = out[out["media_id"] == 2]
    assert len(still) == 1 and still["n_source_frames"].iloc[0] == 1
    bad = out[out["media_id"] == 3]
    assert len(bad) == 1 and not bad["ok"].iloc[0]
