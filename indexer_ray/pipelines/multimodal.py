"""Multimodal column plumbing: opaque binary media columns with typed
metadata, decoded / feature-extracted in actor-pool map_batches stages.

Decoders: `decoder="real"` decodes the formats expressible with
stdlib+numpy from their PUBLISHED specs — uncompressed BMP (24/32-bit),
binary PPM (P6), baseline PNG (RFC 2083: zlib IDAT + the five scanline
filters; 8-bit gray/gray+alpha/RGB/RGBA/palette), baseline JPEG
(ITU-T T.81 sequential DCT — see pipelines/jpeg.py), GIF87a/89a (LZW,
interlace, transparency — see pipelines/gif.py) and PCM WAV (via the
stdlib `wave` module); payloads in any other format (mp4 / progressive
JPEG need external codec libraries that are not in this container) come
back `ok=False` and are skipped, with the integration point documented on
MediaDecodeStage._decode_real.
`decoder="fake"` is a deterministic stand-in (hash-derived pixels) that
keeps the Ray-side plumbing — schema, batch sizing for large binary rows,
actor signature, output layout — exercised without any codec.

Memory note: media rows are orders of magnitude wider than text rows; these
stages default to small `batch_size` so (batch x concurrency) stays inside a
worker's heap, per the Ray Data guidance for large binary payloads.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa


def decode_bmp(b: bytes) -> np.ndarray | None:
    """Uncompressed 24/32-bit BMP -> (H, W, 3) uint8 (bottom-up rows
    flipped; published BITMAPFILEHEADER/BITMAPINFOHEADER layout)."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + row_bytes * h
    if len(b) < need:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    px = rows.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    if bottom_up:
        px = px[::-1]
    return px[:, :, 2::-1]  # BGR(A) -> RGB


def decode_ppm(b: bytes) -> np.ndarray | None:
    """Binary PPM (P6) -> (H, W, 3) uint8 (published netpbm format)."""
    if not b.startswith(b"P6"):
        return None
    # header: P6 <w> <h> <maxval> separated by whitespace/comments
    fields, i = [], 2
    while len(fields) < 3 and i < len(b):
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment to EOL
            while i < len(b) and b[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        fields.append(b[i:j])
        i = j
    try:
        w, h, maxval = (int(f) for f in fields)
    except (ValueError, TypeError):
        return None
    if maxval > 255 or w <= 0 or h <= 0:
        return None
    i += 1  # single whitespace after maxval
    need = w * h * 3
    if len(b) < i + need:
        return None
    return np.frombuffer(b, dtype=np.uint8, count=need, offset=i).reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters (RFC 2083 §6 / PNG spec
    §9 'Filtering'): raw is the inflated IDAT stream, one filter byte +
    `stride` bytes per scanline.  Returns (h, stride) uint8 of
    reconstructed bytes.  All arithmetic is mod-256 per the spec.

    None/Up are whole-row vectorized; Sub is an exact per-pixel-lane
    cumulative sum (addition mod 256 is associative); Average/Paeth are
    sequential in the pixel axis by definition, so they loop over pixels
    within the row with the byte lanes vectorized."""
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    npix = stride // bpp
    for r in range(h):
        ft = ftypes[r]
        cur = rows[r, 1:].copy()
        if ft == 0:  # None
            pass
        elif ft == 1:  # Sub: x + recon(left)
            lanes = cur.reshape(npix, bpp).astype(np.uint64)
            cur = np.cumsum(lanes, axis=0).astype(np.uint8).reshape(stride)
        elif ft == 2:  # Up: x + recon(above)
            cur += prev
        elif ft == 3:  # Average: x + floor((left + above) / 2)
            pcur = cur.reshape(npix, bpp)
            pprev = prev.reshape(npix, bpp).astype(np.uint16)
            left = np.zeros(bpp, dtype=np.uint16)
            for i in range(npix):
                pcur[i] += ((left + pprev[i]) >> 1).astype(np.uint8)
                left = pcur[i].astype(np.uint16)
        elif ft == 4:  # Paeth predictor (spec pseudocode, int arithmetic)
            pcur = cur.reshape(npix, bpp)
            pprev = prev.reshape(npix, bpp).astype(np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for i in range(npix):
                above = pprev[i]
                p = left + above - ul
                pa_ = np.abs(p - left)
                pb_ = np.abs(p - above)
                pc_ = np.abs(p - ul)
                pred = np.where(
                    (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, above, ul)
                )
                pcur[i] += pred.astype(np.uint8)
                left = pcur[i].astype(np.int32)
                ul = above
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = cur
        prev = cur
    return out


def decode_png(b: bytes) -> np.ndarray | None:
    """Baseline PNG -> (H, W, 3) uint8, implemented from the published
    spec (RFC 2083 / W3C PNG): chunk walk, zlib-inflated IDAT, the five
    scanline filters, 8-bit gray / gray+alpha / truecolor / RGBA /
    palette.  Out of scope (returns None, never raises): 1/2/4/16-bit
    depths, Adam7 interlace, malformed/truncated streams.  Alpha is
    dropped (no compositing target in a feature pipeline); gray
    replicates to 3 channels; palette maps through PLTE."""
    import zlib

    if not b.startswith(_PNG_SIG):
        return None
    pos, n = len(_PNG_SIG), len(b)
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= n:
        (clen,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data_start = pos + 8
        if data_start + clen + 4 > n:
            return None  # truncated chunk
        data = b[data_start : data_start + clen]
        pos = data_start + clen + 4  # skip CRC (integrity, not structure)
        if ctype == b"IHDR":
            if clen != 13:
                return None
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8)
            if len(plte) % 3:
                return None
            plte = plte.reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if (
        channels is None
        or depth != 8
        or comp != 0
        or filt != 0
        or interlace != 0
        or w <= 0
        or h <= 0
        or (color == 3 and plte is None)
    ):
        return None
    try:
        raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) != h * (stride + 1):
        return None
    try:
        px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    except ValueError:
        return None
    if color == 2:  # RGB
        return px
    if color == 6:  # RGBA -> drop alpha
        return np.ascontiguousarray(px[:, :, :3])
    if color == 0:  # grayscale
        return np.repeat(px, 3, axis=2)
    if color == 4:  # gray+alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    # color == 3: palette indices through PLTE
    idx = px[:, :, 0]
    if idx.max(initial=0) >= len(plte):
        return None
    return plte[idx]


def encode_png(px: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3|4) or (H, W) uint8 -> PNG bytes, one fixed scanline
    filter for all rows (exercises every decode_png unfilter path in
    tests).  Inverse of decode_png for filter-reachable images."""
    import zlib

    if px.ndim == 2:
        color, channels = 0, 1
        flat = px
    elif px.shape[2] == 3:
        color, channels = 2, 3
        flat = px
    elif px.shape[2] == 4:
        color, channels = 6, 4
        flat = px
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    stride = w * channels
    rows = np.ascontiguousarray(flat, dtype=np.uint8).reshape(h, stride)

    def _filt(r: int) -> bytes:
        cur = rows[r].astype(np.int32)
        prev = rows[r - 1].astype(np.int32) if r else np.zeros(stride, dtype=np.int32)
        left = np.zeros(stride, dtype=np.int32)
        left[channels:] = cur[:-channels]
        ul = np.zeros(stride, dtype=np.int32)
        ul[channels:] = prev[:-channels]
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - left
        elif filter_type == 2:
            out = cur - prev
        elif filter_type == 3:
            out = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - ul
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, prev, ul)
            )
            out = cur - pred
        else:
            raise ValueError(f"bad filter type {filter_type}")
        return bytes([filter_type]) + (out % 256).astype(np.uint8).tobytes()

    body = zlib.compress(b"".join(_filt(r) for r in range(h)))

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", body)
        + _chunk(b"IEND", b"")
    )


def decode_image(b: bytes) -> np.ndarray | None:
    """Magic-byte dispatch over the from-spec-decodable IMAGE formats ->
    (H, W, 3) uint8 or None.  The single integration point for adding
    codecs (mp4 still needs external libraries): both MediaDecodeStage and
    ResizeStage route through here."""
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:8] == _PNG_SIG:
        return decode_png(b)
    if b[:2] == b"\xff\xd8":
        from indexer_ray.pipelines.jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:4] == b"GIF8":
        from indexer_ray.pipelines.gif import decode_gif

        return decode_gif(b)
    return None


def decode_wav(b: bytes) -> np.ndarray | None:
    """PCM WAV -> float32 samples in [-1, 1] (stdlib `wave`; (n,) mono or
    (n, ch))."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(b)) as f:
            nch = f.getnchannels()
            width = f.getsampwidth()
            frames = f.readframes(f.getnframes())
    except (wave.Error, EOFError, OSError):
        return None
    try:
        if width == 2:
            x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 1:
            x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            return None  # 24/32-bit PCM: extend here
        return x.reshape(-1, nch) if nch > 1 else x
    except ValueError:
        # truncated data chunk (odd byte count / partial frames): treat as
        # undecodable, per the module contract (ok=False, never a crash)
        return None

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 if unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def encode_bmp(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> uncompressed 24-bit BMP bytes (bottom-up,
    4-byte-padded rows) — the published layout, inverse of decode_bmp."""
    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    body = b"".join(
        px[r, :, ::-1].tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)
    )
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + dib + body


def synth_media_table(
    n: int, seed: int = 42, kind: str = "image", fmt: str = "fake"
) -> pa.Table:
    """Deterministic media corpus for tests/benches (payload bytes are a
    pure function of (seed, media_id)).  `fmt="fake"` emits opaque hash
    bytes (codec-free plumbing); `fmt="bmp"` / `fmt="png"` / `fmt="jpeg"`
    emit REAL decodable payloads for the decoder="real" path (PNG rotates
    through the five scanline filters; JPEG alternates 4:4:4 / 4:2:0;
    `fmt="gif"` color-quantizes to a 64-color palette first — GIF is
    palettized by format); `fmt="mixed"` interleaves bmp/png/jpeg/gif/fake
    so a corpus exercises both the decode and the ok=False skip paths."""
    if fmt not in ("fake", "bmp", "png", "jpeg", "gif", "mixed"):
        raise ValueError(f"unknown synth media fmt: {fmt}")
    rng = np.random.default_rng(seed)
    payloads, mimes, widths, heights = [], [], [], []
    for i in range(n):
        row_fmt = (
            fmt if fmt != "mixed" else ("bmp", "png", "jpeg", "gif", "fake")[i % 5]
        )
        if row_fmt in ("bmp", "png", "jpeg", "gif"):
            w = 8 + int(rng.integers(0, 24))
            h = 8 + int(rng.integers(0, 24))
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if row_fmt == "png":
                payloads.append(encode_png(px, filter_type=i % 5))
                mimes.append("image/png")
            elif row_fmt == "jpeg":
                from indexer_ray.pipelines.jpeg import encode_jpeg_baseline

                payloads.append(
                    encode_jpeg_baseline(
                        px, quant=1, subsampling=("4:4:4", "4:2:0")[i % 2]
                    )
                )
                mimes.append("image/jpeg")
            elif row_fmt == "gif":
                from indexer_ray.pipelines.gif import encode_gif

                px = (px // 64 * 64).astype(np.uint8)  # <=64 distinct colors
                payloads.append(encode_gif(px, interlace=bool(i % 2)))
                mimes.append("image/gif")
            else:
                payloads.append(encode_bmp(px))
                mimes.append("image/bmp")
            widths.append(w)
            heights.append(h)
        else:
            size = 256 + int(rng.integers(0, 1024))
            hsh = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
            payloads.append((hsh * (size // 32 + 1))[:size])
            mimes.append("image/png" if kind == "image" else "audio/wav")
            widths.append(64)
            heights.append(64)
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(mimes),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "duration_ms": pa.array([-1] * n, type=pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaDecodeStage:
    """Decode + feature-extract actor (one model/codec load per actor).

    Output: media_id, ok, n_bytes, feature (list<float> of `feat_dim`).
    """

    def __init__(self, decoder: str = "fake", feat_dim: int = 16):
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder: {decoder}")
        self.decoder = decoder
        self.feat_dim = feat_dim

    @staticmethod
    def _decode_real(payload: bytes) -> np.ndarray | None:
        """Stdlib-decodable formats via decode_image/decode_wav; None for
        anything else (mp4 / progressive JPEG need external codecs —
        extend decode_image, keeping the surrounding Ray plumbing
        unchanged)."""
        px = decode_image(payload)
        if px is not None:
            return px.astype(np.float32).ravel() / 255.0
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            x = decode_wav(payload)
            return None if x is None else x.astype(np.float32).ravel()
        return None

    def _decode(self, payload: bytes) -> np.ndarray | None:
        if self.decoder == "real":
            return self._decode_real(payload)
        # deterministic fake: 'pixels' derived from payload bytes
        arr = np.frombuffer(payload, dtype=np.uint8)
        return arr.astype(np.float32) / 255.0

    def _features(self, px: np.ndarray) -> np.ndarray:
        # deterministic pooled 'embedding': chunked means padded to feat_dim
        chunks = np.array_split(px, self.feat_dim)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok, nbytes = [], [], []
        for payload in batch.column("payload").to_pylist():
            px = None if payload is None or len(payload) == 0 else self._decode(payload)
            if px is None:
                ok.append(False)
                nbytes.append(0 if not payload else len(payload))
                feats.append([0.0] * self.feat_dim)
                continue
            feats.append(self._features(px).tolist())
            ok.append(True)
            nbytes.append(len(payload))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "ok": pa.array(ok, type=pa.bool_()),
                "n_bytes": pa.array(nbytes, type=pa.int64()),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
            }
        )


def decode_features(media_ds, decoder: str = "fake", feat_dim: int = 16, batch_size: int = 64):
    """media table -> per-item features via an actor pool (small batches:
    binary rows are wide)."""
    return media_ds.map_batches(
        MediaDecodeStage,
        fn_constructor_args=(decoder, feat_dim),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 8),
    )


class ResizeStage:
    """Image resize: `decoder="real"` decodes BMP/PPM (the stdlib-decodable
    formats), nearest-neighbor-resamples with one numpy gather, and
    re-emits binary PPM; undecodable payloads come back EMPTY (b"") so
    downstream stages can filter.  `decoder="fake"` keeps the codec-free
    plumbing stand-in (payload bytes sampled to width*height)."""

    def __init__(self, width: int = 32, height: int = 32, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder: {decoder}")
        self.width, self.height = width, height
        self.decoder = decoder

    def _resize(self, payload: bytes) -> bytes:
        if self.decoder == "real":
            px = decode_image(payload)
            if px is None:
                return b""  # undecodable: empty payload, filter downstream
            h, w, _ = px.shape
            rows = (np.arange(self.height, dtype=np.int64) * h) // self.height
            cols = (np.arange(self.width, dtype=np.int64) * w) // self.width
            out = px[rows][:, cols]
            return (
                f"P6\n{self.width} {self.height}\n255\n".encode() + out.tobytes()
            )
        # deterministic fake: sample payload bytes to width*height "pixels"
        n = self.width * self.height
        if not payload:
            return b"\x00" * n
        arr = np.frombuffer(payload, dtype=np.uint8)
        idx = (np.arange(n, dtype=np.int64) * len(arr)) // n
        return arr[idx].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize(p or b"") for p in batch.column("payload").to_pylist()]
        n = len(out)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "payload": pa.array(out, type=pa.large_binary()),
                "width": pa.array([self.width] * n, type=pa.int32()),
                "height": pa.array([self.height] * n, type=pa.int32()),
            }
        )


def resize_media(media_ds, width: int = 32, height: int = 32, batch_size: int = 64, decoder: str = "fake"):
    return media_ds.map_batches(
        ResizeStage,
        fn_constructor_args=(width, height, decoder),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 8),
    )


class FrameSampleStage:
    """Frame sampling, flat_map-shaped (one input row -> n_frames rows).

    `decoder="stub"` emits evenly spaced BYTE-OFFSET descriptors per row —
    the plumbing a real video pipeline puts before per-frame feature
    extraction (mp4 decode needs external codecs; integration point is
    `_real_frames`).  `decoder="real"` DECODES animated GIFs from spec
    (pipelines/gif.decode_gif_frames) and emits `n_frames` evenly sampled
    REAL frames re-encoded as binary PPM; still images yield their single
    frame at frame_idx 0; undecodable payloads yield one ok=False row.
    Both modes share one output schema:
    (media_id, frame_idx, n_source_frames, payload, ok)."""

    def __init__(self, n_frames: int = 4, decoder: str = "stub"):
        if decoder not in ("stub", "real"):
            raise ValueError(f"unknown decoder: {decoder}")
        self.n_frames = n_frames
        self.decoder = decoder

    @staticmethod
    def _real_frames(payload: bytes) -> list[np.ndarray] | None:
        """Decodable-from-spec multi-frame formats (GIF today; mp4 is the
        external-codec integration point), falling back to the
        single-image dispatch."""
        if payload[:4] == b"GIF8":
            from indexer_ray.pipelines.gif import decode_gif_frames

            return decode_gif_frames(payload)
        px = decode_image(payload)
        return [px] if px is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, n_src, payloads, oks = [], [], [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            payload = payload or b""
            if self.decoder == "stub":
                n = max(1, len(payload))
                for f in range(self.n_frames):
                    ids.append(mid)
                    frame_idx.append(f)
                    n_src.append(n)
                    payloads.append(
                        str((n * f) // self.n_frames).encode()  # byte offset
                    )
                    oks.append(True)
                continue
            frames = self._real_frames(payload)
            if not frames:
                ids.append(mid)
                frame_idx.append(0)
                n_src.append(0)
                payloads.append(b"")
                oks.append(False)
                continue
            take = min(self.n_frames, len(frames))
            for f in range(take):
                src = (len(frames) * f) // take
                px = frames[src]
                h, w, _ = px.shape
                ids.append(mid)
                frame_idx.append(f)
                n_src.append(len(frames))
                payloads.append(f"P6\n{w} {h}\n255\n".encode() + px.tobytes())
                oks.append(True)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "n_source_frames": pa.array(n_src, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
                "ok": pa.array(oks, type=pa.bool_()),
            }
        )


def sample_frames(
    media_ds, n_frames: int = 4, batch_size: int = 32, decoder: str = "stub"
):
    return media_ds.map_batches(
        FrameSampleStage,
        fn_constructor_args=(n_frames, decoder),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 8),
    )
