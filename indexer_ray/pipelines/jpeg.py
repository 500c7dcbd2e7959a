"""Baseline JPEG codec implemented from the PUBLISHED spec (ITU-T T.81 /
ISO 10918-1), stdlib + numpy only — the same from-spec pattern as the PDF
text extractor and the PNG/BMP/PPM/WAV codecs (reference parity anchor:
parsers.rs routes media-ish payloads by extension; this repo routes by
magic bytes through multimodal.decode_image).

Scope (decode): baseline sequential DCT (SOF0; SOF1 accepted — identical
entropy coding), 8-bit precision, 1- or 3-component (grayscale / JFIF
YCbCr), interleaved or single-component scans, integer sampling-factor
ratios (4:4:4, 4:2:2, 4:2:0), restart intervals, FF00 byte stuffing.
Out of scope (returns None, never raises): progressive (SOF2),
arithmetic coding, 12-bit precision, CMYK/Adobe 4-component, hierarchical.

Scope (encode): the exact inverse subset — used by synth_media_table and
the roundtrip tests, since no codec wheel exists in this container.  With
flat quant tables of 1 the DCT path is near-lossless (rounding only), so
tests can assert tight pixel bounds; Annex-K-style tables exercise the
realistic lossy path on smooth images.

Entropy decoding is inherently bit-serial (T.81 F.2); the per-block loop
is plain Python, but dequantization, IDCT (one einsum over all blocks of
a component) and color conversion are vectorized numpy.  At 100-TB scale
real corpora would use a native codec behind the same decode_image
dispatch; this module keeps the pipeline honest-and-testable offline.
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Figure A.6 zigzag: stream position k holds the coefficient at
# raster offset _ZIGZAG[k] of the 8x8 block.
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1)u*pi/16).
# Forward: F = C @ f @ C.T ; inverse: f = C.T @ F @ C  (A.3.3).
_C = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            * 0.5
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C code generation: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _Corrupt(Exception):
    """Internal: any malformed/unsupported structure -> decode_jpeg None."""


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing (T.81 F.2.2.5).

    Hitting a marker (FF followed by non-zero) raises _Corrupt unless the
    caller is at an expected restart boundary and consumes it explicitly
    via expect_restart()."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.d):
            raise _Corrupt("EOS inside entropy data")
        byte = self.d[self.pos]
        if byte == 0xFF:
            nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else -1
            if nxt != 0x00:
                raise _Corrupt("marker inside entropy data")
            self.pos += 2
        else:
            self.pos += 1
        self.buf = byte
        self.n = 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def receive(self, size: int) -> int:
        v = 0
        for _ in range(size):
            v = (v << 1) | self.bit()
        return v

    def expect_restart(self, idx: int) -> None:
        """Byte-align and consume RST(idx mod 8) (T.81 F.2.1.3.1)."""
        self.n = 0
        if (
            self.pos + 2 > len(self.d)
            or self.d[self.pos] != 0xFF
            or self.d[self.pos + 1] != 0xD0 + (idx & 7)
        ):
            raise _Corrupt("missing restart marker")
        self.pos += 2


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise _Corrupt("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size`-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(b: bytes) -> np.ndarray | None:
    """Baseline JPEG -> (H, W, 3) uint8, or None for anything outside the
    documented scope (contract matches decode_png/decode_bmp: never
    raises on untrusted bytes)."""
    try:
        return _decode(b)
    except Exception:
        return None


def _decode(b: bytes) -> np.ndarray | None:
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (H, W, [(id, h, v, tq), ...])
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise _Corrupt("expected marker")
        while pos < len(b) and b[pos] == 0xFF:
            pos += 1  # fill bytes (B.1.1.2)
        marker = b[pos]
        pos += 1
        if marker == 0xD9:  # EOI before any scan
            return None
        (seglen,) = struct.unpack_from(">H", b, pos)
        seg = b[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise _Corrupt("truncated segment")
        if marker == 0xDB:  # DQT (B.2.4.1); may hold several tables
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    q = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                elif pq == 1:
                    q = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                else:
                    raise _Corrupt("bad DQT precision")
                qtables[tq] = q
        elif marker == 0xC4:  # DHT (B.2.4.2); may hold several tables
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nsym = sum(bits)
                huffval = list(seg[i + 17 : i + 17 + nsym])
                if len(huffval) != nsym:
                    raise _Corrupt("truncated DHT")
                i += 17 + nsym
                htables[(tc, th)] = {
                    (ln, code): sym
                    for sym, (code, ln) in _canonical_codes(bits, huffval).items()
                }
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline-decodable
            prec, h, w, nf = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8 or nf not in (1, 3) or h == 0 or w == 0:
                return None
            comps = []
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical: out of scope
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS: entropy data follows the segment
            if frame is None:
                raise _Corrupt("SOS before SOF")
            return _decode_scan(
                b, pos + seglen, frame, seg, qtables, htables, restart_interval
            )
        # APPn / COM / others: skipped by length
        pos += seglen
    return None


def _decode_scan(b, pos, frame, seg, qtables, htables, ri):
    H, W, comps = frame
    ns = seg[0]
    scan = []  # (comp_idx, dc_table, ac_table)
    for s in range(ns):
        cs, tdta = seg[1 + 2 * s], seg[2 + 2 * s]
        idx = next((i for i, c in enumerate(comps) if c[0] == cs), None)
        if idx is None:
            raise _Corrupt("scan references unknown component")
        scan.append((idx, htables[(0, tdta >> 4)], htables[(1, tdta & 15)]))
    if ns != len(comps):
        return None  # multi-scan non-interleaved files: out of scope
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if ns == 1:
        # Single-component scan: MCU is one block; grid from the component's
        # own sample dims (T.81 A.2.2 note) — sampling factors moot.
        ci = scan[0][0]
        cw = -(-W * comps[ci][1] // hmax)
        ch = -(-H * comps[ci][2] // vmax)
        grids = {ci: (-(-ch // 8), -(-cw // 8))}
        mcu_layout = [(ci, 0, 0, scan[0][1], scan[0][2])]
        n_mcux, n_mcuy = grids[ci][1], grids[ci][0]
        mcu_step = {ci: (1, 1)}
    else:
        n_mcux = -(-W // (8 * hmax))
        n_mcuy = -(-H // (8 * vmax))
        grids = {i: (n_mcuy * c[2], n_mcux * c[1]) for i, c in enumerate(comps)}
        mcu_layout = [
            (ci, by, bx, dc_t, ac_t)
            for ci, dc_t, ac_t in scan
            for by in range(comps[ci][2])
            for bx in range(comps[ci][1])
        ]
        mcu_step = {i: (c[2], c[1]) for i, c in enumerate(comps)}
    blocks = {
        i: np.zeros((gy * gx, 64), dtype=np.int32) for i, (gy, gx) in grids.items()
    }
    br = _BitReader(b, pos)
    pred = [0] * len(comps)
    n_mcus = n_mcux * n_mcuy
    for m in range(n_mcus):
        if ri and m and m % ri == 0:
            br.expect_restart(m // ri - 1)
            pred = [0] * len(comps)
        my, mx = divmod(m, n_mcux)
        for ci, by, bx, dc_t, ac_t in mcu_layout:
            sv, sh = mcu_step[ci]
            row = my * sv + by
            col = mx * sh + bx
            blk = blocks[ci][row * grids[ci][1] + col]
            # DC (F.2.2.1)
            size = _huff_decode(br, dc_t)
            if size > 11:
                raise _Corrupt("bad DC size")
            pred[ci] += _extend(br.receive(size), size)
            blk[0] = pred[ci]
            # AC (F.2.2.2)
            k = 1
            while k < 64:
                rs = _huff_decode(br, ac_t)
                run, size = rs >> 4, rs & 15
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise _Corrupt("AC run past block end")
                blk[k] = _extend(br.receive(size), size)
                k += 1
    planes = []
    for i, (cid, ch_, cv_, tq) in enumerate(comps):
        if tq not in qtables:
            raise _Corrupt("missing quant table")
        gy, gx = grids[i]
        deq = blocks[i].astype(np.float64) * qtables[tq][np.newaxis, :]
        raster = np.zeros_like(deq)
        raster[:, _ZIGZAG] = deq
        coef = raster.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _C, coef, _C) + 128.0
        plane = (
            spatial.reshape(gy, gx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gy * 8, gx * 8)
        )
        # upsample to full resolution (integer replication)
        fy, fx = vmax // cv_, hmax // ch_
        if fy * cv_ != vmax or fx * ch_ != hmax:
            return None  # non-integer sampling ratio: out of scope
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:H, :W])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, np.newaxis], 3, axis=2)
    y, cb, cr = planes
    # JFIF (BT.601 full-range) YCbCr -> RGB
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bl], axis=2)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (test/fixture support — exact inverse subset of the decoder)
# ---------------------------------------------------------------------------

# Encoder Huffman tables: every symbol the baseline syntax can emit, at
# fixed code lengths (canonical codes; Kraft-complete, last code never
# all-ones).  Deliberately NOT the Annex K tables — simpler, and proves
# the decoder honours arbitrary valid DHT segments.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]

# T.81 Annex K.1 luminance quantization table (published example table),
# for realistic-lossy fixtures.
ANNEX_K_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        """Pad to byte boundary with 1-bits (B.2.5)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(gy*8, gx*8) float plane -> (nblocks, 64) int32 zigzag coefficients."""
    gy, gx = plane.shape[0] // 8, plane.shape[1] // 8
    f = plane.reshape(gy, 8, gx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    coef = np.einsum("ux,nxy,vy->nuv", _C, f, _C).reshape(-1, 64)
    return np.round(coef[:, _ZIGZAG] / q[np.newaxis, :]).astype(np.int32)


def encode_jpeg_baseline(
    px: np.ndarray,
    quant: int | np.ndarray | tuple = 1,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> baseline JFIF-style JPEG.

    quant: scalar -> flat tables (1 = near-lossless, for tight roundtrip
    tests); a 64-vector or (luma, chroma) pair for realistic tables.
    subsampling: "4:4:4" or "4:2:0" (color only).
    """
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if isinstance(quant, tuple):
        qy, qc = (np.asarray(t, dtype=np.int32).ravel() for t in quant)
    elif isinstance(quant, np.ndarray):
        qy = qc = np.asarray(quant, dtype=np.int32).ravel()
    else:
        qy = qc = np.full(64, int(quant), dtype=np.int32)
    qy, qc = np.clip(qy, 1, 255), np.clip(qc, 1, 255)
    if gray:
        factors = [(1, 1)]
        planes = [px.astype(np.float64)]
        qsel = [0]
    else:
        rgb = px.astype(np.float64)
        r, g, bl = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * bl
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * bl
        if subsampling == "4:4:4":
            factors = [(1, 1), (1, 1), (1, 1)]
            planes = [y, cb, cr]
        elif subsampling == "4:2:0":
            factors = [(2, 2), (1, 1), (1, 1)]
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = _pad_edge(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            crp = _pad_edge(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            planes = [y, cbp, crp]
        else:
            raise ValueError(f"unsupported subsampling {subsampling}")
        qsel = [0, 1, 1]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    n_mcux = -(-w // (8 * hmax))
    n_mcuy = -(-h // (8 * vmax))
    qtabs = [qy, qc]
    comp_blocks, grids = [], []
    for (fh, fv), qi, plane in zip(factors, qsel, planes):
        gx, gy = n_mcux * fh, n_mcuy * fv
        comp_blocks.append(_fdct_quant(_pad_edge(plane, gy * 8, gx * 8), qtabs[qi]))
        grids.append((gy, gx))

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()
    pred = [0] * len(planes)
    n_mcus = n_mcux * n_mcuy
    layout = (
        [(0, 0, 0)]
        if gray
        else [
            (ci, by, bx)
            for ci, (fh, fv) in enumerate(factors)
            for by in range(fv)
            for bx in range(fh)
        ]
    )
    data = bytearray()
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.align()
            data += bw.out
            data += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) & 7)])
            bw = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(m, n_mcux)
        for ci, by, bx in layout:
            fh, fv = factors[ci]
            row, col = my * fv + by, mx * fh + bx
            blk = comp_blocks[ci][row * grids[ci][1] + col]
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            size = _size_cat(diff)
            code, ln = dc_codes[size]
            bw.write(code, ln)
            if size:
                bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
            nz = np.nonzero(blk[1:])[0]
            k = 1
            for pos_ in nz + 1:
                run = int(pos_) - k
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                v = int(blk[pos_])
                size = _size_cat(v)
                code, ln = ac_codes[(run << 4) | size]
                bw.write(code, ln)
                bw.write(v if v > 0 else v + (1 << size) - 1, size)
                k = int(pos_) + 1
            if k < 64:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    bw.align()
    data += bw.out

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + qy.astype(np.uint8).tobytes())
    if not gray:
        out += seg(0xDB, bytes([0x01]) + qc.astype(np.uint8).tobytes())
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, qsel[ci]])
    out += seg(0xC0, sof)
    out += seg(
        0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    )
    out += seg(
        0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += data
    out += b"\xff\xd9"
    return bytes(out)


def _pad_edge(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    if h == ph and w == pw:
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
