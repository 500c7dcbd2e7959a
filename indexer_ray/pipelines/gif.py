"""GIF codec implemented from the PUBLISHED spec (GIF87a/GIF89a,
CompuServe 1987/1989; LZW per the spec's variable-width variant), stdlib +
numpy only — the same from-spec pattern as the PDF/PNG/JPEG/BMP/PPM/WAV
codecs (routing: multimodal.decode_image dispatches on magic bytes).

Scope (decode): GIF87a + GIF89a, global and local color tables,
interlaced and sequential images, 89a extensions skipped by sub-block
grammar, Graphic Control Extension transparency (transparent pixels take
the logical-screen background color), FIRST image frame only —
`decode_gif` returns it as (H, W, 3) uint8 over the logical screen;
`decode_gif_frames` yields every frame rendered independently onto the
background (NO inter-frame disposal compositing — each frame is its own
descriptor region; documented limitation, fine for frame-sampling
features).  Malformed/truncated input -> None, never raises.

Scope (encode): fixture writer for the tests — valid LZW using the
spec's clear-code reset trick (a CLEAR is emitted before the code width
would grow past the initial width, so the encoder needs no dictionary),
global color table, optional interlace and transparency.
"""

from __future__ import annotations

import struct

import numpy as np


class _Corrupt(Exception):
    pass


def _read_color_table(b: bytes, pos: int, size_bits: int):
    n = 2 << size_bits  # 2^(size_bits+1)
    end = pos + 3 * n
    if end > len(b):
        raise _Corrupt("truncated color table")
    table = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
    return table, end


def _read_subblocks(b: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(b):
            raise _Corrupt("truncated sub-blocks")
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(b):
            raise _Corrupt("truncated sub-block")
        out += b[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW per the GIF spec appendix; returns exactly
    n_pixels indices (extra codes ignored, shortfall -> _Corrupt)."""
    clear = 1 << min_code_size
    end = clear + 1
    # dictionary as (prefix_code, tail_byte); roots have prefix -1
    prefix = np.full(4096, -1, dtype=np.int32)
    tail = np.zeros(4096, dtype=np.uint8)
    for i in range(clear):
        tail[i] = i
    next_code = end + 1
    width = min_code_size + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    acc = 0
    nbits = 0
    prev = -1
    buf = np.empty(4096, dtype=np.uint8)  # expansion scratch (max chain)

    def expand(code: int) -> tuple[int, int]:
        """Write code's byte chain into buf reversed; return (start, first_byte)."""
        i = 4096
        c = code
        while c >= 0:
            i -= 1
            buf[i] = tail[c]
            c = prefix[c]
        return i, buf[i]

    pos = 0
    ln = len(data)
    while n_out < n_pixels:
        while nbits < width:
            if pos >= ln:
                raise _Corrupt("LZW stream exhausted early")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code = end + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == end:
            raise _Corrupt("LZW EOI before enough pixels")
        if prev < 0:
            if code >= clear:
                raise _Corrupt("first code not a root")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            start, first = expand(code)
            chain = buf[start:4096]
        elif code == next_code:
            # KwKwK case: prev's chain + its own first byte
            start, first = expand(prev)
            chain = np.concatenate([buf[start:4096], buf[start : start + 1]])
        else:
            raise _Corrupt("LZW code out of range")
        take = min(len(chain), n_pixels - n_out)
        out[n_out : n_out + take] = chain[:take]
        n_out += take
        if next_code < 4096:
            prefix[next_code] = prev
            tail[next_code] = chain[0]
            next_code += 1
            if next_code < 4096 and next_code == (1 << width):
                width += 1
        prev = code
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start:h:step] = rows[src : src + n]
        src += n
    return out.reshape(-1)


def decode_gif(b: bytes) -> np.ndarray | None:
    """First frame -> (H, W, 3) uint8 over the logical screen, or None."""
    frames = decode_gif_frames(b, max_frames=1)
    return frames[0] if frames else None


def decode_gif_frames(b: bytes, max_frames: int = 0) -> list[np.ndarray] | None:
    """All frames (or the first `max_frames`), each rendered independently
    onto the background-filled logical screen.  None for non-GIF or
    corrupt input."""
    try:
        return _decode_frames(b, max_frames)
    except Exception:
        return None


def _decode_frames(b: bytes, max_frames: int) -> list[np.ndarray] | None:
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh = struct.unpack_from("<HH", b, 6)
    packed, bg_idx = b[10], b[11]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(b, pos, packed & 0x07)
    if sw == 0 or sh == 0:
        return None
    bg_rgb = (
        gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(3, np.uint8)
    )
    frames: list[np.ndarray] = []
    transparent = -1
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(b):
                raise _Corrupt("truncated extension")
            label = b[pos]
            pos += 1
            data, pos = _read_subblocks(b, pos)
            if label == 0xF9 and len(data) >= 4:  # GCE
                transparent = data[3] if data[0] & 0x01 else -1
            continue
        if block != 0x2C:
            raise _Corrupt(f"unknown block 0x{block:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", b, pos)
        ipacked = b[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:
            table, pos = _read_color_table(b, pos, ipacked & 0x07)
        if table is None:
            raise _Corrupt("image without any color table")
        if pos >= len(b):
            raise _Corrupt("missing LZW min code size")
        mcs = b[pos]
        pos += 1
        if not (2 <= mcs <= 11):
            raise _Corrupt("bad LZW min code size")
        data, pos = _read_subblocks(b, pos)
        idx = _lzw_decode(data, mcs, w * h)
        if ipacked & 0x40:
            idx = _deinterlace(idx, w, h)
        if int(idx.max(initial=0)) >= len(table):
            raise _Corrupt("pixel index outside color table")
        rgb = table[idx].reshape(h, w, 3).copy()
        if transparent >= 0:
            mask = idx.reshape(h, w) == transparent
            rgb[mask] = bg_rgb
        screen = np.empty((sh, sw, 3), dtype=np.uint8)
        screen[:] = bg_rgb
        y1, x1 = min(top + h, sh), min(left + w, sw)
        if top < sh and left < sw:
            screen[top:y1, left:x1] = rgb[: y1 - top, : x1 - left]
        frames.append(screen)
        transparent = -1  # GCE applies to one rendering block
        if max_frames and len(frames) >= max_frames:
            return frames
    return frames if frames else None


# ---------------------------------------------------------------------------
# Encoder (test/fixture support)
# ---------------------------------------------------------------------------


class _BitPacker:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode_plain(indices: np.ndarray, min_code_size: int) -> bytes:
    """Spec-valid LZW without compression: every pixel a root code, a
    CLEAR emitted before the decoder's dictionary would widen codes."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    bp = _BitPacker()
    bp.put(clear, width)
    budget = (1 << width) - end - 2  # codes before width would grow
    used = 0
    for v in indices:
        if used >= budget:
            bp.put(clear, width)
            used = 0
        bp.put(int(v), width)
        used += 1
    bp.put(end, width)
    return bp.flush()


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    px: np.ndarray,
    interlace: bool = False,
    transparent_from: np.ndarray | None = None,
    bg_rgb: tuple = (0, 0, 0),
) -> bytes:
    """(H, W, 3) uint8 -> single-frame GIF89a.  The palette is built from
    the image's distinct colors (must be <= 256; fixtures control this).
    `transparent_from` marks pixels equal to that RGB as transparent via a
    GCE, with `bg_rgb` as the screen background."""
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    palette = [tuple(bg_rgb)] + [tuple(c) for c in colors if tuple(c) != tuple(bg_rgb)]
    if transparent_from is not None and tuple(transparent_from) not in palette:
        palette.append(tuple(transparent_from))
    if len(palette) > 256:
        raise ValueError("fixture image needs <= 256 distinct colors")
    lookup = {c: i for i, c in enumerate(palette)}
    indices = np.fromiter(
        (lookup[tuple(c)] for c in flat), dtype=np.uint8, count=len(flat)
    )
    size_bits = max(1, (max(len(palette) - 1, 1)).bit_length() - 1)
    while (2 << size_bits) < len(palette):
        size_bits += 1
    n = 2 << size_bits
    table = bytearray()
    for c in palette:
        table += bytes(c)
    table += b"\x00" * (3 * n - len(table))
    mcs = max(2, size_bits + 1)

    if interlace:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
        )
        indices = indices.reshape(h, w)[order].reshape(-1)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_bits, 0, 0])  # GCT flag + size, bg index 0
    out += table
    if transparent_from is not None:
        t_idx = lookup[tuple(transparent_from)]
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, t_idx, 0])
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([mcs])
    out += _subblocks(_lzw_encode_plain(indices, mcs))
    out += b"\x3b"
    return bytes(out)
