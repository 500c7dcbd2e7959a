"""From-spec baseline JPEG codec tests (ITU-T T.81 / ISO 10918-1).

decode_jpeg is validated by roundtrip against encode_jpeg_baseline over
the supported shapes (4:4:4 / 4:2:0, grayscale, restart intervals, odd
dimensions, 16-bit DQT precision) plus rejection tests for the documented
out-of-scope markers (progressive SOF2, 12-bit precision, truncation).
Flat quant tables of 1 make the DCT near-lossless, so roundtrips can
assert tight pixel bounds; Annex K tables exercise the realistic lossy
path on a smooth gradient.
"""

import struct

import numpy as np
import pytest

from indexer_ray.pipelines.jpeg import (
    ANNEX_K_LUMA,
    decode_jpeg,
    encode_jpeg_baseline,
)
from indexer_ray.pipelines.multimodal import decode_image


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, (2 * xx + yy) % 256], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("shape", [(8, 8), (21, 13), (1, 1), (3, 40)])
def test_rgb_444_roundtrip_near_lossless(shape):
    rng = np.random.default_rng(sum(shape))
    px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(px, quant=1, subsampling="4:4:4"))
    assert out is not None and out.shape == (*shape, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


@pytest.mark.parametrize("shape", [(16, 16), (21, 13), (40, 24)])
def test_rgb_420_roundtrip_smooth(shape):
    # chroma subsampling averages 2x2 neighbourhoods, so the tight-bound
    # roundtrip uses a smooth gradient (noise chroma is unrecoverable by
    # design, not a codec defect)
    px = _smooth(*shape)
    out = decode_jpeg(encode_jpeg_baseline(px, quant=1, subsampling="4:2:0"))
    assert out is not None and out.shape == (*shape, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 4


def test_grayscale_roundtrip_replicates():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(17, 19), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(g, quant=1))
    assert out.shape == (17, 19, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 2
    np.testing.assert_array_equal(out[:, :, 0], out[:, :, 1])
    np.testing.assert_array_equal(out[:, :, 0], out[:, :, 2])


@pytest.mark.parametrize("ri", [1, 2, 7])
def test_restart_intervals(ri):
    rng = np.random.default_rng(40 + ri)
    px = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_baseline(px, quant=1))
    out = decode_jpeg(encode_jpeg_baseline(px, quant=1, restart_interval=ri))
    assert out is not None
    np.testing.assert_array_equal(out, base)  # DRI must not change pixels


def test_restart_interval_with_subsampling():
    px = _smooth(33, 47)
    out = decode_jpeg(
        encode_jpeg_baseline(px, quant=1, subsampling="4:2:0", restart_interval=3)
    )
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 4


def test_annex_k_lossy_smooth():
    px = _smooth(48, 64)
    out = decode_jpeg(
        encode_jpeg_baseline(px, quant=(ANNEX_K_LUMA, ANNEX_K_LUMA))
    )
    assert out is not None
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 4.0


def test_sixteen_bit_dqt_precision():
    # Pq=1 DQT (16-bit entries) is in the decode scope; splice one in by
    # re-encoding with a table value > 255 forced through a manual segment
    px = _smooth(16, 16)
    b = bytearray(encode_jpeg_baseline(px, quant=4))
    # locate the luma DQT segment (FFDB, len 67, Pq/Tq=0x00) and replace it
    # with a 16-bit-precision table holding the same values
    i = bytes(b).index(b"\xff\xdb")
    q16 = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + b"\x10"
    q16 += b"".join(struct.pack(">H", 4) for _ in range(64))
    out = decode_jpeg(bytes(b[:i]) + q16 + bytes(b[i + 69 :]))
    ref = decode_jpeg(bytes(b))
    np.testing.assert_array_equal(out, ref)


def test_out_of_scope_markers_return_none():
    px = _smooth(16, 16)
    good = bytearray(encode_jpeg_baseline(px, quant=1))
    i = bytes(good).index(b"\xff\xc0")
    prog = bytearray(good)
    prog[i + 1] = 0xC2  # progressive DCT
    assert decode_jpeg(bytes(prog)) is None
    arith = bytearray(good)
    arith[i + 1] = 0xC9  # arithmetic coding
    assert decode_jpeg(bytes(arith)) is None
    twelve = bytearray(good)
    twelve[i + 4] = 12  # 12-bit precision
    assert decode_jpeg(bytes(twelve)) is None


def test_malformed_streams_return_none():
    px = _smooth(16, 16)
    good = encode_jpeg_baseline(px, quant=1)
    assert decode_jpeg(good[: len(good) // 2]) is None  # truncated entropy
    assert decode_jpeg(good[:10]) is None  # truncated header
    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # empty SOI/EOI
    # corrupt entropy data (valid header, garbage Huffman stream)
    bad = bytearray(good)
    bad[-20:-2] = b"\xff" * 18
    assert decode_jpeg(bytes(bad)) is None


def test_decode_image_dispatches_jpeg():
    px = _smooth(9, 9)
    out = decode_image(encode_jpeg_baseline(px, quant=1))
    assert out is not None and out.shape == (9, 9, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3
