"""Pure-stdlib/numpy compressed image codecs: PNG and baseline JPEG.

The container ships no image libraries (PIL/ffmpeg absent — probed in
stages/media.py), but compressed formats are ~100% of real multimodal
corpora, so the decode stage needs REAL codecs, not a stub:

  * PNG — full encoder/decoder over the spec's complete static matrix:
    color types 0/2/3/4/6 at every legal bit depth (1/2/4/8/16),
    sequential AND Adam7-interlaced; zlib (stdlib) + the five scanline
    filters.  Lossless → byte-exact roundtrip, and the decoder handles
    any filter choice a real encoder makes.
  * JPEG — baseline sequential DCT (ITU T.81) AND progressive DCT
    (SOF2: spectral selection + successive approximation, EOB runs):
    YCbCr 4:4:4/4:2:0 baseline, 4:4:4 progressive; standard Annex K
    quantization + Huffman tables, quality scaling per the common
    libjpeg convention.  Encoder + decoder pairs; the progressive
    encoding of an image decodes BIT-IDENTICAL to its baseline
    encoding (same quantized coefficients), which is the test.

Both are deliberately scope-limited (PNG covers the spec's whole
static-image matrix — palette PNGs decode through PLTE, 16-bit
returns uint16, sub-byte gray bit-replicates to uint8; APNG
animation chunks acTL/fcTL/fdAT composite per the spec's rendering
model — JPEG covers baseline 4:4:4/4:2:0 and progressive
single-frame streams) and raise ValueError with the unsupported
feature named — arithmetic-coded JPEG and hierarchical/lossless
modes are out of scope for a sandbox codec; restart intervals
(DRI/RSTn) work in BOTH JPEG modes.  GIF87a/89a (palette + LZW,
interlacing undone) and AVI/MJPEG
video (per-frame JPEG) round out the web-staple formats below.
Everything is numpy-vectorized per block/scanline; actor-pool stages
construct codec state once per actor (stages/media.py).
"""
from __future__ import annotations

import functools
import struct
import zlib

import numpy as np


def _valueerror_on_corruption(fn):
    """Decode-boundary contract: ANY malformed/truncated stream raises
    ValueError (web corpora are full of broken bytes — callers handle
    one exception type; stages degrade to decode_ok=False)."""

    @functools.wraps(fn)
    def wrapped(payload: bytes, *a, **k):
        try:
            return fn(payload, *a, **k)
        except ValueError:
            raise
        except (struct.error, zlib.error, IndexError, KeyError) as e:
            raise ValueError(f"corrupt or truncated stream: {type(e).__name__}: {e}") from e

    return wrapped

# ===================================================================== PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


# Adam7 interlace pass geometry: (x0, y0, dx, dy) per pass.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]

# legal bit depths per PNG color type (spec §11.2.2)
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_color_for(arr: np.ndarray) -> tuple[int, int]:
    """array shape/dtype → (color type, channel count)."""
    if arr.ndim == 2:
        return 0, 1
    if arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        return {2: 4, 3: 2, 4: 6}[arr.shape[2]], arr.shape[2]
    raise ValueError(f"unsupported array shape {arr.shape}")


def _raw_scanlines(arr: np.ndarray, channels: int, depth: int) -> bytes:
    """Filter-0-prefixed scanline bytes for one (sub)image."""
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        return b""
    flat = arr.reshape(h, w * channels)
    if depth == 16:
        rows = flat.astype(">u2").view(np.uint8).reshape(h, w * channels * 2)
    else:
        rows = flat.astype(np.uint8)
    raw = np.empty((h, 1 + rows.shape[1]), dtype=np.uint8)
    raw[:, 0] = 0  # per-row filter byte: None
    raw[:, 1:] = rows
    return raw.tobytes()


def png_encode(arr: np.ndarray, level: int = 6, interlace: bool = False) -> bytes:
    """(h, w) gray, (h, w, 2) gray+alpha, (h, w, 3) RGB or (h, w, 4)
    RGBA → PNG bytes; uint8 → depth 8, uint16 → depth 16 (big-endian).
    Rows use filter 0 (None); zlib does the heavy lifting.  With
    ``interlace=True`` the seven Adam7 sub-images are emitted instead of
    the sequential scanlines."""
    if arr.dtype == np.uint8:
        depth = 8
    elif arr.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError("png_encode expects uint8 or uint16")
    color, channels = _png_color_for(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0)
    if interlace:
        raw = b"".join(
            _raw_scanlines(arr[y0::dy, x0::dx], channels, depth)
            for x0, y0, dx, dy in _ADAM7
        )
    else:
        raw = _raw_scanlines(arr, channels, depth)
    idat = zlib.compress(raw, level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Unfilter one Paeth row in place-ish; sequential in x by bpp
    strides (the predictor needs the already-reconstructed left pixel)."""
    out = cur.astype(np.int32)
    n = len(cur)
    prev32 = prev.astype(np.int32)
    for i in range(n):
        a = out[i - bpp] if i >= bpp else 0
        b = prev32[i]
        c = prev32[i - bpp] if i >= bpp else 0
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
        out[i] = (out[i] + pred) & 0xFF
    return out.astype(np.uint8)


def _unfilter(rows: np.ndarray, ftypes: np.ndarray, stride: int, bpp: int) -> np.ndarray:
    """Invert the five PNG scanline filters over one (sub)image.
    rows: (h, stride) filtered bytes; bpp = filter stride in BYTES."""
    h = rows.shape[0]
    out = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, cur, prev = int(ftypes[y]), rows[y], (out[y - 1] if y else zero)
        if f == 0:  # None
            out[y] = cur
        elif f == 1:  # Sub — cumulative by bpp lanes, vectorized per lane
            pad = (-stride) % bpp
            r = np.concatenate([cur, np.zeros(pad, np.uint8)]) if pad else cur
            r = r.reshape(-1, bpp).astype(np.uint32)
            s = (np.cumsum(r, axis=0, dtype=np.uint32) & 0xFF).astype(np.uint8).reshape(-1)
            out[y] = s[:stride]
        elif f == 2:  # Up
            out[y] = cur + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            o = out[y]
            for i in range(stride):
                a = int(o[i - bpp]) if i >= bpp else 0
                o[i] = (int(cur[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            out[y] = _paeth_row(cur, prev, bpp)
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return out


def _decode_pass(raw: np.ndarray, off: int, w: int, h: int, channels: int, depth: int):
    """Decode one (sub)image from the decompressed scanline stream at
    byte offset ``off``.  Returns ((h, w, channels) samples — uint8 for
    depth ≤ 8 (raw sample values, unscaled), uint16 for 16 — and the
    new offset."""
    if w == 0 or h == 0:
        return np.zeros((h, w, channels), dtype=np.uint16 if depth == 16 else np.uint8), off
    stride = (w * channels * depth + 7) // 8
    bpp = max(1, (channels * depth) // 8)
    need = h * (1 + stride)
    if off + need > len(raw):
        raise ValueError("PNG scanline data truncated")
    block = raw[off : off + need].reshape(h, 1 + stride)
    out = _unfilter(block[:, 1:], block[:, 0], stride, bpp)
    if depth == 16:
        samples = out.reshape(h, -1).view(">u2").astype(np.uint16).reshape(h, w, channels)
    elif depth == 8:
        samples = out.reshape(h, w, channels)
    else:  # 1/2/4-bit, MSB-first within each byte
        bits = np.unpackbits(out, axis=1)[:, : w * channels * depth]
        weights = 1 << np.arange(depth - 1, -1, -1)
        samples = (
            bits.reshape(h, w * channels, depth).astype(np.uint16) @ weights
        ).astype(np.uint8).reshape(h, w, channels)
    return samples, off + need


@_valueerror_on_corruption
def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes → array: (h, w) for gray, (h, w, 2) gray+alpha,
    (h, w, 3)/(h, w, 4) for RGB/RGBA; palette PNGs (type 3) map through
    PLTE to (h, w, 3).  All spec color-type/bit-depth combinations
    (depths 1/2/4/8/16) and Adam7 interlacing.  Depth 16 returns
    uint16; sub-byte gray scales to full-range uint8 (bit replication);
    everything else uint8."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, ihdr, idat, plte = len(_PNG_SIG), None, [], None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data[: (len(data) // 3) * 3], dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG (comp={comp}, filt={filt})")
    channels = _PNG_CHANNELS.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    if depth not in _PNG_DEPTHS[color]:
        raise ValueError(f"illegal PNG depth {depth} for color type {color}")
    if interlace not in (0, 1):
        raise ValueError(f"unsupported PNG interlace method {interlace}")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if interlace == 0:
        img, _ = _decode_pass(raw, 0, w, h, channels, depth)
    else:  # Adam7: seven independently filtered sub-images
        img = np.zeros((h, w, channels), dtype=np.uint16 if depth == 16 else np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            sub, off = _decode_pass(raw, off, pw, ph, channels, depth)
            if pw and ph:
                img[y0::dy, x0::dx] = sub
    if color == 3:  # palette lookup → RGB (indices never scale)
        idxs = img[:, :, 0]
        if int(idxs.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idxs]
    if color == 0 and depth < 8:  # left-bit-replicate to full-range uint8
        img = (img.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return img[:, :, 0] if channels == 1 else img


# ================================================================== APNG

# Animated PNG (the PNG Third Edition animation chunks: acTL / fcTL /
# fdAT).  Frames are RGBA rects composited onto the canvas per the
# spec's rendering model — blend_op SOURCE (0, replace the rect) or
# OVER (1, Porter-Duff over), then the frame's OWN dispose_op runs
# before the next frame draws: 0 none, 1 background (clear the rect to
# fully transparent black), 2 previous (restore the canvas as it was
# before the frame drew).

_APNG_DISPOSE_NONE, _APNG_DISPOSE_BACKGROUND, _APNG_DISPOSE_PREVIOUS = 0, 1, 2
_APNG_BLEND_SOURCE, _APNG_BLEND_OVER = 0, 1


def png_is_animated(payload: bytes) -> bool:
    """Chunk-level probe: True iff an acTL chunk precedes the first
    IDAT (the spec's placement rule) — a byte scan would false-positive
    on compressed IDAT content."""
    if not payload.startswith(_PNG_SIG):
        return False
    pos = len(_PNG_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        if tag == b"acTL":
            return True
        if tag in (b"IDAT", b"IEND"):
            return False
        pos += 12 + length
    return False


def apng_encode_animation(frames, size: tuple[int, int] | None = None) -> bytes:
    """Animated PNG writer (same frame-spec convention as
    gif_encode_animation): ``frames`` is an (n, h, w, 3|4) uint8 stack
    (full-canvas frames) or a list of dicts with ``image`` ((h, w, 3|4)
    uint8) and optionally ``left``/``top``, ``dispose`` (0/1/2),
    ``blend`` (0 source / 1 over), ``delay_ms``.  ``size`` is the
    (width, height) canvas; the FIRST frame must cover it (spec rule
    for fcTL sequence 0).  Pixels are stored as RGBA depth 8."""
    if isinstance(frames, np.ndarray):
        frames = [{"image": f} for f in frames]
    if not frames:
        raise ValueError("animated PNG needs at least one frame")
    specs = []
    for f in frames:
        img = f["image"]
        if img.ndim != 3 or img.shape[2] not in (3, 4) or img.dtype != np.uint8:
            raise ValueError("APNG frames must be (h, w, 3|4) uint8")
        if img.shape[2] == 3:
            img = np.concatenate(
                [img, np.full(img.shape[:2] + (1,), 255, dtype=np.uint8)], axis=2
            )
        specs.append(
            {
                "image": img,
                "left": int(f.get("left", 0)),
                "top": int(f.get("top", 0)),
                "dispose": int(f.get("dispose", _APNG_DISPOSE_NONE)),
                "blend": int(f.get("blend", _APNG_BLEND_SOURCE)),
                "delay_ms": int(f.get("delay_ms", 40)),
            }
        )
    if size is None:
        size = (specs[0]["image"].shape[1], specs[0]["image"].shape[0])
    sw, sh = size
    s0 = specs[0]
    if s0["left"] or s0["top"] or s0["image"].shape[:2] != (sh, sw):
        raise ValueError("APNG first frame must cover the full canvas at (0, 0)")
    for s in specs:
        h, w = s["image"].shape[:2]
        if s["left"] + w > sw or s["top"] + h > sh:
            raise ValueError("APNG frame rect exceeds the canvas")
        if s["dispose"] not in (0, 1, 2) or s["blend"] not in (0, 1):
            raise ValueError("bad APNG dispose/blend op")

    def fctl(seq: int, s: dict) -> bytes:
        h, w = s["image"].shape[:2]
        return _chunk(
            b"fcTL",
            struct.pack(
                ">IIIIIHHBB",
                seq, w, h, s["left"], s["top"],
                s["delay_ms"], 1000, s["dispose"], s["blend"],
            ),
        )

    ihdr = struct.pack(">IIBBBBB", sw, sh, 8, 6, 0, 0, 0)  # RGBA depth 8
    out = bytearray(_PNG_SIG)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(specs), 0))  # loop forever
    seq = 0
    for i, s in enumerate(specs):
        out += fctl(seq, s)
        seq += 1
        raw = zlib.compress(_raw_scanlines(s["image"], 4, 8), 6)
        if i == 0:  # the default image doubles as animation frame 0
            out += _chunk(b"IDAT", raw)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + raw)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


@_valueerror_on_corruption
def apng_decode_frames(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """APNG bytes → fully composited animation: ((n, sh, sw, 4) uint8
    RGBA, per-frame delays in ms).  The canvas starts fully transparent;
    each frame blends into its rect (SOURCE replaces, OVER composites
    Porter-Duff) and its dispose op runs before the next frame.  An
    IDAT not preceded by an fcTL is the standalone default image and is
    excluded from the animation (spec).  Raises ValueError when no acTL
    is present (use png_decode) or the fcTL/fdAT sequence numbers are
    not consecutive from 0."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, ihdr, actl = len(_PNG_SIG), None, None
    fctls: list[tuple[int, dict]] = []  # (seq, meta incl. data chunks)
    idat_is_frame0 = False
    seen_idat = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"acTL":
            actl = struct.unpack(">II", data)
        elif tag == b"fcTL":
            seq, w, h, x, y, dnum, dden, dop, bop = struct.unpack(">IIIIIHHBB", data)
            fctls.append(
                # delay_den 0 means 1/100 s per the spec
                (seq, {"w": w, "h": h, "x": x, "y": y,
                       "delay_ms": dnum * 1000 // (dden if dden else 100),
                       "dispose": dop, "blend": bop, "data": [], "dseqs": []})
            )
            if not seen_idat:
                idat_is_frame0 = True
        elif tag == b"IDAT":
            seen_idat = True
            if idat_is_frame0 and fctls:
                fctls[0][1]["data"].append(data)
        elif tag == b"fdAT":
            if not fctls:
                raise ValueError("APNG fdAT before any fcTL")
            (dseq,) = struct.unpack_from(">I", data, 0)
            fctls[-1][1]["data"].append(data[4:])
            fctls[-1][1]["dseqs"].append(dseq)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if actl is None:
        raise ValueError("not an APNG (no acTL)")
    sw, sh, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 6, 0, 0, 0):
        raise ValueError("APNG decoder covers RGBA depth-8 sequential streams")
    if len(fctls) != actl[0]:
        raise ValueError("APNG frame count disagrees with acTL")
    # sequence numbers: fcTL and fdAT share one counter, consecutive from 0
    seqs = sorted([s for s, _ in fctls] + [d for _, m in fctls for d in m["dseqs"]])
    if seqs != list(range(len(seqs))):
        raise ValueError("APNG sequence numbers not consecutive")
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    out, delays = [], []
    for _seq, m in sorted(fctls, key=lambda t: t[0]):
        w, h, x, y = m["w"], m["h"], m["x"], m["y"]
        if x + w > sw or y + h > sh or not m["data"]:
            raise ValueError("APNG frame rect out of bounds or missing data")
        raw = np.frombuffer(zlib.decompress(b"".join(m["data"])), dtype=np.uint8)
        rect, _ = _decode_pass(raw, 0, w, h, 4, 8)
        saved = canvas.copy() if m["dispose"] == _APNG_DISPOSE_PREVIOUS else None
        region = canvas[y : y + h, x : x + w]
        if m["blend"] == _APNG_BLEND_SOURCE:
            region[:] = rect
        else:  # OVER: Porter-Duff with 8-bit alpha
            sa = rect[:, :, 3:4].astype(np.float64) / 255.0
            da = region[:, :, 3:4].astype(np.float64) / 255.0
            oa = sa + da * (1.0 - sa)
            rgb = rect[:, :, :3] * sa + region[:, :, :3] * da * (1.0 - sa)
            safe = np.maximum(oa, 1e-12)
            region[:, :, :3] = np.clip(np.rint(rgb / safe), 0, 255).astype(np.uint8)
            region[:, :, 3:4] = np.clip(np.rint(oa * 255.0), 0, 255).astype(np.uint8)
        out.append(canvas.copy())
        delays.append(m["delay_ms"])
        if m["dispose"] == _APNG_DISPOSE_BACKGROUND:
            canvas[y : y + h, x : x + w] = 0
        elif m["dispose"] == _APNG_DISPOSE_PREVIOUS:
            canvas = saved
    return np.stack(out), delays


# ============================================================ baseline JPEG

# ITU T.81 Annex K.1/K.2 quantization tables (natural order).
_Q_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
_Q_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# zigzag scan order: _ZIGZAG[i] = natural index of the i-th zigzagged coeff
_ZZ = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _huff_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """T.81 C.2: symbol → (code, length)."""
    out, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_lut(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the decoder."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()}


# orthonormal DCT-II matrix
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    C[0] *= 1 / np.sqrt(2)
    return C * 0.5


_C = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128, ycc[..., 2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: value → (category ssss, ssss-bit code)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    code = v if v > 0 else v + (1 << ssss) - 1
    return ssss, code


def _encode_block(bw_: _BitWriter, zz: np.ndarray, prev_dc: int, dct: dict, act: dict) -> int:
    """Huffman-emit one zigzagged quantized block; returns its DC."""
    dc = int(zz[0])
    ssss, code = _magnitude(dc - prev_dc)
    hc, hl = dct[ssss]
    bw_.put(hc, hl)
    if ssss:
        bw_.put(code, ssss)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = act[0xF0]  # ZRL
            bw_.put(hc, hl)
            run -= 16
        ssss, code = _magnitude(v)
        hc, hl = act[(run << 4) | ssss]
        bw_.put(hc, hl)
        bw_.put(code, ssss)
        run = 0
    if last < 63:
        hc, hl = act[0x00]  # EOB
        bw_.put(hc, hl)
    return dc


def _jpeg_zz_grids(rgb: np.ndarray, quality: int, subsampling: str):
    """Shared front half of both JPEG encoders: color convert,
    (optionally) subsample, block, DCT, quantize → per-component
    (gh, gw, 64) zigzag grids + tables/geometry."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("jpeg_encode expects (h, w, 3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = rgb.shape[:2]
    ql, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(rgb)
    samp = [(1, 1), (1, 1), (1, 1)] if subsampling == "444" else [(2, 2), (1, 1), (1, 1)]
    hmax, vmax = max(s[0] for s in samp), max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    zz_grids = []  # per component: (gh, gw, 64) quantized zigzag grid
    for ci in range(3):
        plane = ycc[..., ci]
        hs, vs = samp[ci]
        if (hs, vs) != (hmax, vmax):  # chroma downsample (box mean)
            ph = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
            plane = ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2).mean(axis=(1, 3))
        # pad the component plane to its MCU-covered block grid
        gh, gw = mcuy * vs, mcux * hs
        H, W = gh * 8, gw * 8
        p = np.pad(
            plane,
            ((0, H - plane.shape[0]), (0, W - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = p.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coeffs = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
        q = ql if ci == 0 else qc
        zz = np.round(coeffs / q).astype(np.int32).reshape(-1, 64)[:, _ZZ]
        zz_grids.append(zz.reshape(gh, gw, 64))
    return zz_grids, ql, qc, samp, hmax, vmax, mcux, mcuy, h, w


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _jpeg_dqt(tid: int, tbl: np.ndarray) -> bytes:
    return _jpeg_seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in tbl.reshape(64)[_ZZ]))


def _jpeg_dht(cls: int, tid: int, bits, vals) -> bytes:
    return _jpeg_seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


def jpeg_encode(
    rgb: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (Annex K tables,
    single interleaved scan).  ``subsampling``: "444" or "420" (box
    chroma downsample — the common web-JPEG layout).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that many MCUs (DC predictors reset, stream byte-aligned) —
    the camera-JPEG convention.  A 2-D array encodes as a
    single-component GRAYSCALE stream (document/scan JPEGs)."""
    if rgb.ndim == 2:
        return _jpeg_encode_gray(rgb, quality, restart_interval)
    zz_grids, ql, qc, samp, hmax, vmax, mcux, mcuy, h, w = _jpeg_zz_grids(
        rgb, quality, subsampling
    )

    dc_tabs = (_huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA))
    ac_tabs = (_huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA))
    bw_ = _BitWriter()
    prev_dc = [0, 0, 0]
    mcu_i = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw_.flush()
                bw_.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                prev_dc = [0, 0, 0]
            mcu_i += 1
            for ci in range(3):
                hs, vs = samp[ci]
                ti = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        zz = zz_grids[ci][my * vs + by, mx * hs + bx]
                        prev_dc[ci] = _encode_block(
                            bw_, zz, prev_dc[ci], dc_tabs[ti], ac_tabs[ti]
                        )
    bw_.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _jpeg_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _jpeg_dqt(0, ql) + _jpeg_dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        hs, vs = samp[ci]
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _jpeg_seg(0xFFC0, sof)
    out += _jpeg_dht(0, 0, *_DC_LUMA) + _jpeg_dht(1, 0, *_AC_LUMA)
    out += _jpeg_dht(0, 1, *_DC_CHROMA) + _jpeg_dht(1, 1, *_AC_CHROMA)
    if restart_interval:
        out += _jpeg_seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tabs])
    sos += bytes([0, 63, 0])
    out += _jpeg_seg(0xFFDA, sos)
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _jpeg_encode_gray(gray: np.ndarray, quality: int, restart_interval: int = 0) -> bytes:
    """(h, w) uint8 → single-component baseline JFIF (luma tables)."""
    if gray.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8")
    h, w = gray.shape
    ql, _ = _quality_tables(quality)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    p = np.pad(
        gray.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    ) - 128.0
    blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coeffs = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    zz = np.round(coeffs / ql).astype(np.int32).reshape(-1, 64)[:, _ZZ]
    dct = _huff_codes(*_DC_LUMA)
    act = _huff_codes(*_AC_LUMA)
    bw_ = _BitWriter()
    prev = 0
    rst_n = 0
    for i in range(len(zz)):
        if restart_interval and i and i % restart_interval == 0:
            bw_.flush()
            bw_.out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) & 7
            prev = 0
        prev = _encode_block(bw_, zz[i], prev, dct, act)
    bw_.flush()
    out = bytearray()
    out += b"\xff\xd8"
    out += _jpeg_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _jpeg_dqt(0, ql)
    out += _jpeg_seg(0xFFC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += _jpeg_dht(0, 0, *_DC_LUMA) + _jpeg_dht(1, 0, *_AC_LUMA)
    if restart_interval:
        out += _jpeg_seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _jpeg_seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


class _RestartEmitter:
    """Per-scan restart bookkeeping for the encoders: every ``ri``
    units, flush to a byte boundary and emit the cycling RSTn."""

    def __init__(self, bw_, ri: int):
        self.bw = bw_
        self.ri = ri
        self.i = 0
        self.n = 0

    def tick(self) -> bool:
        fired = False
        if self.ri and self.i and self.i % self.ri == 0:
            self.bw.flush()
            self.bw.out += bytes([0xFF, 0xD0 + self.n])
            self.n = (self.n + 1) & 7
            fired = True
        self.i += 1
        return fired


def jpeg_encode_progressive(
    rgb: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → progressive JFIF bytes (SOF2, 4:4:4 or
    4:2:0): a 9-scan script with spectral selection AND successive
    approximation — interleaved DC first (Al=1), per-component AC
    first scans (luma split into two bands), then DC + AC refinement
    scans.  AC scans iterate each component's TRUE block dims (not the
    MCU-padded grid — T.81 A.2.2).  Uses the Annex K tables (EOB runs
    of length 1 only, so no EOBn symbols are needed); decodes to
    EXACTLY the same visible pixels as the baseline encoding of the
    same image/quality, since both code identical quantized
    coefficients."""
    zz_grids, ql, qc, samp, hmax, vmax, mcux, mcuy, h, w = _jpeg_zz_grids(
        rgb, quality, subsampling
    )
    dc_tabs = (_huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA))
    ac_tabs = (_huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA))

    def true_dims(ci):
        hs, vs = samp[ci]
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    def dc_first(bw_, Al):
        prev = [0, 0, 0]
        rst = _RestartEmitter(bw_, restart_interval)
        for my in range(mcuy):
            for mx in range(mcux):
                if rst.tick():
                    prev = [0, 0, 0]
                for ci in range(3):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(zz_grids[ci][my * vs + by, mx * hs + bx][0]) >> Al
                            ssss, code = _magnitude(v - prev[ci])
                            prev[ci] = v
                            hc, hl = dc_tabs[0 if ci == 0 else 1][ssss]
                            bw_.put(hc, hl)
                            if ssss:
                                bw_.put(code, ssss)

    def dc_refine(bw_, Al):
        rst = _RestartEmitter(bw_, restart_interval)
        for my in range(mcuy):
            for mx in range(mcux):
                rst.tick()
                for ci in range(3):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            bw_.put(
                                (int(zz_grids[ci][my * vs + by, mx * hs + bx][0]) >> Al) & 1,
                                1,
                            )

    def ac_first(bw_, ci, Ss, Se, Al):
        act = ac_tabs[0 if ci == 0 else 1]
        grid = zz_grids[ci]
        bh, bw = true_dims(ci)
        rst = _RestartEmitter(bw_, restart_interval)
        for by in range(bh):
            for bx in range(bw):
                rst.tick()
                zz = grid[by, bx]
                r = 0
                wrote = False
                for k in range(Ss, Se + 1):
                    c = int(zz[k])
                    v = (abs(c) >> Al) * (1 if c >= 0 else -1)  # toward zero
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        hc, hl = act[0xF0]  # ZRL
                        bw_.put(hc, hl)
                        r -= 16
                    ssss, code = _magnitude(v)
                    hc, hl = act[(r << 4) | ssss]
                    bw_.put(hc, hl)
                    bw_.put(code, ssss)
                    r = 0
                    wrote = True
                if r or not wrote:
                    hc, hl = act[0x00]  # EOB (run length 1)
                    bw_.put(hc, hl)

    def ac_refine(bw_, ci, Ss, Se, Al):
        """Mirror of the decoder's walk: ZRL consumes exactly 16
        zero-history slots with corrections for history coefficients
        passed; (r,1) symbols carry sign then the walked corrections;
        a trailing EOB carries the remaining corrections."""
        act = ac_tabs[0 if ci == 0 else 1]
        grid = zz_grids[ci]
        bh, bw = true_dims(ci)
        rst = _RestartEmitter(bw_, restart_interval)
        for by in range(bh):
            for bx in range(bw):
                rst.tick()
                zz = grid[by, bx]
                hist = [(abs(int(zz[k])) >> (Al + 1)) != 0 for k in range(64)]
                newsig = [
                    k for k in range(Ss, Se + 1)
                    if not hist[k] and (abs(int(zz[k])) >> Al) == 1
                ]
                i = Ss
                for p in newsig:
                    r = sum(1 for k in range(i, p) if not hist[k])
                    while r > 15:
                        hc, hl = act[0xF0]  # ZRL: walk 16 zero-history
                        bw_.put(hc, hl)
                        consumed = 0
                        while consumed < 16:
                            if hist[i]:
                                bw_.put((abs(int(zz[i])) >> Al) & 1, 1)
                            else:
                                consumed += 1
                            i += 1
                        r -= 16
                    hc, hl = act[(r << 4) | 1]
                    bw_.put(hc, hl)
                    bw_.put(1 if int(zz[p]) > 0 else 0, 1)
                    for k in range(i, p):  # corrections along the walk
                        if hist[k]:
                            bw_.put((abs(int(zz[k])) >> Al) & 1, 1)
                    i = p + 1
                if i <= Se:  # EOB covers the tail with its corrections
                    hc, hl = act[0x00]
                    bw_.put(hc, hl)
                    for k in range(i, Se + 1):
                        if hist[k]:
                            bw_.put((abs(int(zz[k])) >> Al) & 1, 1)

    out = bytearray()
    out += b"\xff\xd8"
    out += _jpeg_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _jpeg_dqt(0, ql) + _jpeg_dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        hs, vs = samp[ci]
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _jpeg_seg(0xFFC2, sof)  # SOF2: progressive DCT
    out += _jpeg_dht(0, 0, *_DC_LUMA) + _jpeg_dht(1, 0, *_AC_LUMA)
    out += _jpeg_dht(0, 1, *_DC_CHROMA) + _jpeg_dht(1, 1, *_AC_CHROMA)
    if restart_interval:
        out += _jpeg_seg(0xFFDD, struct.pack(">H", restart_interval))

    def sos(scomps, Ss, Se, Ah, Al):
        body = bytes([len(scomps)])
        for cid, tabs in scomps:
            body += bytes([cid, tabs])
        body += bytes([Ss, Se, (Ah << 4) | Al])
        return _jpeg_seg(0xFFDA, body)

    def scan(hdr: bytes, emit, *args) -> bytes:
        bw_ = _BitWriter()
        emit(bw_, *args)
        bw_.flush()
        return hdr + bytes(bw_.out)

    all_dc = [(1, 0x00), (2, 0x10), (3, 0x10)]
    out += scan(sos(all_dc, 0, 0, 0, 1), dc_first, 1)
    out += scan(sos([(1, 0x00)], 1, 5, 0, 1), ac_first, 0, 1, 5, 1)
    out += scan(sos([(1, 0x00)], 6, 63, 0, 1), ac_first, 0, 6, 63, 1)
    out += scan(sos([(2, 0x01)], 1, 63, 0, 1), ac_first, 1, 1, 63, 1)
    out += scan(sos([(3, 0x01)], 1, 63, 0, 1), ac_first, 2, 1, 63, 1)
    out += scan(sos(all_dc, 0, 0, 1, 0), dc_refine, 0)
    out += scan(sos([(1, 0x00)], 1, 63, 1, 0), ac_refine, 0, 1, 63, 0)
    out += scan(sos([(2, 0x01)], 1, 63, 1, 0), ac_refine, 1, 1, 63, 0)
    out += scan(sos([(3, 0x01)], 1, 63, 1, 0), ac_refine, 2, 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:  # a marker: stop feeding real data
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, lut: dict[tuple[int, int], int]) -> int:
        self._fill()
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad JPEG Huffman code")

    def restart(self):
        """Consume an RSTn marker: drop padding bits (byte-align) and
        step over the two marker bytes.  _fill never advances past a
        marker, so self.pos is authoritative."""
        self.acc = 0
        self.nbits = 0
        if not (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _extend(code: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return code if code >= (1 << (ssss - 1)) else code - (1 << ssss) + 1


def _scan_end(payload: bytes, pos: int) -> int:
    """First byte offset ≥ pos holding a REAL marker (not FF00 stuffing,
    not a restart marker) — the end of a scan's entropy data."""
    i = pos
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF:
            b = payload[i + 1]
            if b == 0x00 or 0xD0 <= b <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return n


def _decode_baseline_scan(br, comps, scan, grids, hdc, hac, mcux, mcuy, ri=0):
    """The single interleaved SOF0 scan: full DC+AC per block; ``ri``
    is the DRI restart interval in MCUs (0 = none) — every Ri MCUs an
    RSTn marker byte-aligns the stream and resets the DC predictors."""
    prev_dc = {c[0]: 0 for c in comps}
    tsel = {cid: (td, ta) for cid, td, ta in scan}
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_i and mcu_i % ri == 0:
                br.restart()
                prev_dc = {c[0]: 0 for c in comps}
            mcu_i += 1
            for cid, hs, vs, _tq in comps:
                td, ta = tsel[cid]
                dlut, alut = hdc[td], hac[ta]
                for by in range(vs):
                    for bx in range(hs):
                        zz = grids[cid][my * vs + by, mx * hs + bx]
                        ssss = br.huff(dlut)
                        diff = _extend(br.bits(ssss), ssss)
                        prev_dc[cid] += diff
                        zz[0] = prev_dc[cid]
                        k = 1
                        while k < 64:
                            rs = br.huff(alut)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.bits(rs & 0xF), rs & 0xF)
                            k += 1


def _comp_block_dims(c, h, w, hmax, vmax) -> tuple[int, int]:
    """TRUE block dims of a component (non-interleaved scans iterate
    these, NOT the MCU-padded grid — T.81 A.2.2)."""
    cw = (w * c[1] + hmax - 1) // hmax
    ch = (h * c[2] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _prog_dc_scan(br, scomps, scan, grids, hdc, Ah, Al, mcux, mcuy, h, w, hmax, vmax, ri=0):
    """Progressive DC scan: first (Ah=0, diff-coded value << Al) or
    refinement (one raw bit per block).  ``ri``: restart interval in
    MCUs (interleaved) / blocks (single-component)."""
    if Ah == 0:
        prev_dc = {c[0]: 0 for c in scomps}
    tsel = {cid: td for cid, td, _ta in scan}
    unit_i = 0

    def maybe_restart():
        nonlocal unit_i, prev_dc
        if ri and unit_i and unit_i % ri == 0:
            br.restart()
            if Ah == 0:
                prev_dc = {c[0]: 0 for c in scomps}
        unit_i += 1

    if len(scomps) > 1:  # interleaved MCU order
        iters = [
            (c, by, bx)
            for c in scomps
            for by in range(c[2])
            for bx in range(c[1])
        ]
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for c, by, bx in iters:
                    zz = grids[c[0]][my * c[2] + by, mx * c[1] + bx]
                    if Ah == 0:
                        ssss = br.huff(hdc[tsel[c[0]]])
                        prev_dc[c[0]] += _extend(br.bits(ssss), ssss)
                        zz[0] = prev_dc[c[0]] << Al
                    else:
                        zz[0] |= br.bits(1) << Al
    else:  # single component: its true block raster
        c = scomps[0]
        bh, bw = _comp_block_dims(c, h, w, hmax, vmax)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                zz = grids[c[0]][by, bx]
                if Ah == 0:
                    ssss = br.huff(hdc[tsel[c[0]]])
                    prev_dc[c[0]] += _extend(br.bits(ssss), ssss)
                    zz[0] = prev_dc[c[0]] << Al
                else:
                    zz[0] |= br.bits(1) << Al


def _prog_ac_first(br, c, alut, grid, Ss, Se, Al, bh, bw, ri=0):
    """Progressive AC first scan (Ah=0) over one component's band."""
    eobrun = 0
    blk_i = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and blk_i and blk_i % ri == 0:
                br.restart()
                eobrun = 0  # restart intervals are decode-independent
            blk_i += 1
            if eobrun:
                eobrun -= 1
                continue
            zz = grid[by, bx]
            k = Ss
            while k <= Se:
                rs = br.huff(alut)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                    break
                k += r
                if k > Se:
                    raise ValueError("AC index overflow")
                zz[k] = _extend(br.bits(s), s) << Al
                k += 1


def _prog_ac_refine(br, c, alut, grid, Ss, Se, Al, bh, bw, ri=0):
    """Progressive AC refinement (Ah=Al+1 → Al): newly-significant ±1
    insertions interleaved with correction bits for history-nonzero
    coefficients (T.81 G.1.2.3 / libjpeg jdphuff semantics)."""
    p1, m1 = 1 << Al, -1 << Al
    eobrun = 0
    blk_i = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and blk_i and blk_i % ri == 0:
                br.restart()
                eobrun = 0
            blk_i += 1
            zz = grid[by, bx]
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    rs = br.huff(alut)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) + (br.bits(r) if r else 0)
                            break
                        val = 0  # ZRL: skip 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError("bad refinement magnitude")
                        val = p1 if br.bits(1) else m1
                    while k <= Se:
                        if zz[k] != 0:  # history-nonzero: correction bit
                            if br.bits(1) and not (zz[k] & p1):
                                zz[k] += p1 if zz[k] > 0 else m1
                        else:
                            if r == 0:
                                if val:
                                    zz[k] = val
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                # EOB run covers this block: correction bits only
                while k <= Se:
                    if zz[k] != 0:
                        if br.bits(1) and not (zz[k] & p1):
                            zz[k] += p1 if zz[k] > 0 else m1
                    k += 1
                eobrun -= 1


@_valueerror_on_corruption
def jpeg_decode(payload: bytes) -> np.ndarray:
    """JFIF bytes → (h, w, 3) uint8 RGB.  Baseline sequential (SOF0,
    4:4:4 or 4:2:0) AND progressive (SOF2: spectral selection +
    successive approximation, interleaved or per-component DC scans,
    EOB runs), 8-bit, custom or Annex K tables read from the stream."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    comps = []  # (cid, hsamp, vsamp, tq)
    h = w = 0
    mode = None
    grids: dict[int, np.ndarray] = {}  # cid → (gh, gw, 64) int32 ZIGZAG coeffs
    mcux = mcuy = hmax = vmax = 0
    saw_scan = False
    ri = 0  # DRI restart interval (MCUs; 0 = none)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tid = body[i] >> 4, body[i] & 0xF
                if pq == 0:  # 8-bit precision
                    zzt = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                    i += 65
                elif pq == 1:  # 16-bit precision (big-endian)
                    zzt = np.frombuffer(body[i + 1 : i + 129], dtype=">u2").astype(np.int32)
                    i += 129
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                nat = np.empty(64, dtype=np.int32)
                nat[_ZZ] = zzt
                qtabs[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                (hdc if cls == 0 else hac)[tid] = _huff_lut(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC2):
            if body[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            mode = marker
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i] >> 4, body[7 + 3 * i] & 0xF, body[8 + 3 * i])
                for i in range(nc)
            ]
            if len(comps) not in (1, 3):
                raise ValueError("unsupported component count")
            if not all(c[1] in (1, 2) and c[2] in (1, 2) for c in comps):
                raise ValueError("unsupported sampling factors")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            grids = {
                c[0]: np.zeros((mcuy * c[2], mcux * c[1], 64), dtype=np.int32)
                for c in comps
            }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) and progressive (SOF2) JPEG supported")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if mode is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            Ss, Se = body[1 + 2 * ns], body[2 + 2 * ns]
            Ah, Al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            end = _scan_end(payload, pos)
            br = _BitReader(payload[pos:end])
            by_id = {c[0]: c for c in comps}
            scomps = [by_id[cid] for cid, _t, _a in scan]
            if mode == 0xC0:
                _decode_baseline_scan(br, comps, scan, grids, hdc, hac, mcux, mcuy, ri)
            elif Ss == 0:  # progressive DC scan
                if Se != 0:
                    raise ValueError("progressive DC scan with Se != 0")
                _prog_dc_scan(br, scomps, scan, grids, hdc, Ah, Al, mcux, mcuy, h, w, hmax, vmax, ri)
            else:  # progressive AC scan: exactly one component
                if len(scomps) != 1:
                    raise ValueError("progressive AC scan must be single-component")
                c = scomps[0]
                alut = hac[scan[0][2]]
                bh, bw = _comp_block_dims(c, h, w, hmax, vmax)
                if Ah == 0:
                    _prog_ac_first(br, c, alut, grids[c[0]], Ss, Se, Al, bh, bw, ri)
                else:
                    _prog_ac_refine(br, c, alut, grids[c[0]], Ss, Se, Al, bh, bw, ri)
            saw_scan = True
            pos = end
    if not saw_scan or not comps:
        raise ValueError("JPEG missing SOF/SOS")
    planes = {}
    for cid, hs, vs, tq in comps:
        zzg = grids[cid]
        gh, gw = zzg.shape[:2]
        nat = np.zeros((gh * gw, 64), dtype=np.float64)
        nat[:, _ZZ] = zzg.reshape(-1, 64)
        blocks = nat.reshape(-1, 8, 8) * qtabs[tq]
        pix = np.einsum("ji,njk,kl->nil", _C, blocks, _C) + 128.0
        plane = (
            pix.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        )
        # upsample subsampled chroma to full resolution
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[cid] = plane[:h, :w]
    if len(comps) == 1:
        y = np.clip(planes[comps[0][0]] + 0.5, 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack([planes[c[0]] for c in comps], axis=-1)
    return _ycbcr_to_rgb(ycc)


# ======================================================== AVI (MJPEG) video

# Motion-JPEG in the AVI/RIFF container: each frame is an independent
# baseline JPEG (the codec above), so this is a real, player-compatible
# compressed video format in pure stdlib/numpy.  Minimal single-stream
# layout: RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh, strf } },
# LIST movi { 00dc ... }, idx1 }.


def _riff_chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def _riff_list(kind: bytes, data: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + data)


def avi_mjpeg_encode(frames: np.ndarray, fps: int = 10, quality: int = 85) -> bytes:
    """(n, h, w, 3) uint8 frames → AVI/MJPEG bytes."""
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("avi_mjpeg_encode expects (n, h, w, 3) uint8")
    n, h, w = frames.shape[:3]
    jpegs = [jpeg_encode(frames[i], quality=quality) for i in range(n)]
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # usec per frame
        max_bytes * fps,   # max bytes/sec
        0, 0x10,           # padding, flags (AVIF_HASINDEX)
        n, 0, 1, max_bytes,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_items, idx, off = [], [], 4  # offsets count from the 'movi' tag
    for j in jpegs:
        movi_items.append(_riff_chunk(b"00dc", j))
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += len(movi_items[-1])
    movi = _riff_list(b"movi", b"".join(movi_items))
    idx1 = _riff_chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_valueerror_on_corruption
def avi_mjpeg_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """AVI/MJPEG bytes → ((n, h, w, 3) uint8 frames, fps).  Pulls every
    video chunk (00dc/00db) from the movi list and decodes each frame
    via the baseline JPEG decoder above."""
    if not (payload.startswith(b"RIFF") and payload[8:12] == b"AVI "):
        raise ValueError("not an AVI")
    fps = 10
    frames: list[np.ndarray] = []

    def walk(buf: bytes):
        nonlocal fps
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            data = buf[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size % 2)
            if tag == b"LIST":
                walk(data[4:])
            elif tag == b"avih" and len(data) >= 4:
                (usec,) = struct.unpack_from("<I", data, 0)
                if usec:
                    fps = max(1, round(1_000_000 / usec))
            elif tag in (b"00dc", b"00db") and data[:2] == b"\xff\xd8":
                frames.append(jpeg_decode(data))

    walk(payload[12:])
    if not frames:
        raise ValueError("AVI holds no decodable MJPEG frames")
    if len({f.shape for f in frames}) != 1:
        raise ValueError("AVI frames disagree on dimensions")
    return np.stack(frames), fps


# ================================================================== GIF

# GIF87a/89a, the third web-image staple: palette + LZW.  Decoder
# handles global/local color tables, interlacing, extension blocks AND
# animation composition: partial frames at (left, top) offsets,
# transparency, and disposal methods 0/1 (leave), 2 (restore
# background), 3 (restore previous) — gif_decode_frames returns the
# fully composited (n, sh, sw, 3) stack.  The encoder writes GIF89a
# with a real LZW stream (single-frame via gif_encode; multi-frame
# with per-frame GCEs via gif_encode_animation) and requires ≤256
# distinct colors per frame (the format's own constraint).


def _gif_lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """LZW-encode palette indices (variable width, LSB-first,
    clear=2^min, eoi=clear+1)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out_bits = bytearray()
    acc = 0
    nacc = 0

    def put(code: int, width: int):
        nonlocal acc, nacc
        acc |= code << nacc  # GIF is LSB-first
        nacc += width
        while nacc >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table_next = eoi + 1
    width = min_code + 1
    dic: dict[tuple[int, int], int] = {}
    put(clear, width)
    prev = int(indices[0])
    for sym in indices[1:]:
        sym = int(sym)
        key = (prev, sym)
        if key in dic:
            prev = dic[key]
            continue
        put(prev, width)
        dic[key] = table_next
        table_next += 1
        if table_next > (1 << width) and width < 12:
            width += 1
        if table_next >= 4096:
            put(clear, width)
            dic.clear()
            table_next = eoi + 1
            width = min_code + 1
        prev = sym
    put(prev, width)
    put(eoi, width)
    if nacc:
        out_bits.append(acc & 0xFF)
    return bytes(out_bits)


def _gif_palette(arr: np.ndarray, reserve_transparent: bool) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(h, w, 3) → (padded table, index raster, depth, transparent idx
    or -1).  The transparent slot (when reserved) sits just past the
    real colors."""
    h, w = arr.shape[:2]
    colors, inverse = np.unique(arr.reshape(-1, 3), axis=0, return_inverse=True)
    slots = len(colors) + (1 if reserve_transparent else 0)
    if slots > 256:
        raise ValueError(f"GIF needs ≤256 palette slots, frame needs {slots}")
    depth = max(1, int(np.ceil(np.log2(max(2, slots)))))
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    tidx = len(colors) if reserve_transparent else -1
    return table, inverse.astype(np.int32).reshape(h, w), depth, tidx


def _gif_image_block(out: bytearray, indices: np.ndarray, table: np.ndarray,
                     depth: int, left: int, top: int, local_table: bool) -> None:
    """Append one image descriptor (+ optional local color table) and
    its LZW-compressed sub-blocks."""
    h, w = indices.shape
    out += struct.pack(
        "<BHHHHB", 0x2C, left, top, w, h,
        (0x80 | (depth - 1)) if local_table else 0,
    )
    if local_table:
        out += table.tobytes()
    min_code = max(2, depth)
    out.append(min_code)
    data = _gif_lzw_encode(indices.reshape(-1), min_code)
    for off in range(0, len(data), 255):
        block = data[off : off + 255]
        out.append(len(block))
        out += block
    out.append(0)


def gif_encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 with ≤256 distinct colors → single-frame GIF89a."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("gif_encode expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    table, indices, depth, _ = _gif_palette(arr, reserve_transparent=False)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += table.tobytes()
    _gif_image_block(out, indices, table, depth, 0, 0, local_table=False)
    out += b"\x3b"
    return bytes(out)


def gif_encode_animation(frames, size: tuple[int, int] | None = None) -> bytes:
    """Animated GIF89a writer.

    ``frames`` is either an (n, h, w, 3) uint8 stack (full-canvas
    frames, disposal 1) or a list of dicts with keys ``image``
    ((h, w, 3) uint8), and optionally ``left``/``top`` (offsets),
    ``disposal`` (0-3), ``mask`` ((h, w) bool, False = transparent),
    ``delay_cs`` (centiseconds).  ``size`` is the (width, height)
    logical screen; defaults to the first frame's extent."""
    if isinstance(frames, np.ndarray):
        frames = [{"image": f} for f in frames]
    if not frames:
        raise ValueError("animated GIF needs at least one frame")
    specs = []
    for f in frames:
        specs.append({
            "image": f["image"],
            "left": int(f.get("left", 0)),
            "top": int(f.get("top", 0)),
            "disposal": int(f.get("disposal", 1)),
            "mask": f.get("mask"),
            "delay_cs": int(f.get("delay_cs", 4)),
        })
    if size is None:
        size = (specs[0]["image"].shape[1], specs[0]["image"].shape[0])
    sw, sh = size
    for s in specs:
        h, w = s["image"].shape[:2]
        if s["left"] + w > sw or s["top"] + h > sh:
            raise ValueError("GIF frame rect exceeds the logical screen")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", sw, sh, 0, 0, 0)  # no global color table
    # NETSCAPE 2.0 loop-forever extension (the web convention)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for s in specs:
        table, indices, depth, tidx = _gif_palette(
            s["image"], reserve_transparent=s["mask"] is not None
        )
        if s["mask"] is not None:
            indices = np.where(s["mask"], indices, tidx)
        # graphic control extension: disposal + delay + transparency
        packed = (s["disposal"] << 2) | (1 if s["mask"] is not None else 0)
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, packed,
                           s["delay_cs"], max(tidx, 0), 0)
        _gif_image_block(out, indices, table, depth,
                         s["left"], s["top"], local_table=True)
    out += b"\x3b"
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code: int, npix: int) -> bytes:
    """Inverse of _gif_lzw_encode; decodes exactly ``npix`` indices."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    dic: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    acc = nacc = bitpos = 0
    out = bytearray()
    prev_entry: bytes | None = None
    while True:
        while nacc < width:
            if bitpos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[bitpos] << nacc
            bitpos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            dic = dic[: eoi + 1]
            width = min_code + 1
            prev_entry = None
            continue
        if code == eoi:
            break
        if code < len(dic) and (code <= eoi or dic[code]):
            entry = dic[code]
        elif code == len(dic) and prev_entry is not None:
            entry = prev_entry + prev_entry[:1]
        else:
            raise ValueError("bad GIF LZW code")
        out += entry
        if prev_entry is not None and len(dic) < 4096:
            dic.append(prev_entry + entry[:1])
            if len(dic) == (1 << width) and width < 12:
                width += 1
        prev_entry = entry
        if len(out) >= npix:
            break
    if len(out) < npix:
        raise ValueError("GIF pixel data short of frame size")
    return bytes(out[:npix])


def _gif_parse(payload: bytes):
    """Parse a GIF stream → (sw, sh, gct, bg_index, frames); each frame
    is a dict with left/top/rows (deinterlaced index raster) /table/
    disposal/transparent_idx/delay_cs."""
    if not payload.startswith((b"GIF87a", b"GIF89a")):
        raise ValueError("not a GIF")
    pos = 6
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, pos)
    pos += 7
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    frames = []
    gce = None  # pending graphic control extension (applies to next image)
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                gpacked, delay, tindex = struct.unpack_from("<BHB", payload, pos + 1)
                gce = {
                    "disposal": (gpacked >> 2) & 0x07,
                    "transparent_idx": tindex if gpacked & 0x01 else None,
                    "delay_cs": delay,
                }
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _gif_lzw_decode(b"".join(chunks), min_code, w * h), dtype=np.uint8
        )
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF palette index out of range")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: undo the 4-pass row order
            order = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            undone = np.empty_like(rows)
            undone[order] = rows
            rows = undone
        if left + w > sw or top + h > sh:
            raise ValueError("GIF frame rect exceeds the logical screen")
        frames.append({
            "left": left, "top": top, "rows": rows, "table": table,
            "disposal": (gce or {}).get("disposal", 0),
            "transparent_idx": (gce or {}).get("transparent_idx"),
            "delay_cs": (gce or {}).get("delay_cs", 0),
        })
        gce = None
    if not frames:
        raise ValueError("GIF holds no image block")
    return sw, sh, gct, bg, frames


@_valueerror_on_corruption
def gif_decode_frames(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes → fully composited animation: ((n, sh, sw, 3) uint8,
    per-frame delays in centiseconds).  Composition follows the GIF89a
    rendering model: partial frames draw into the logical screen at
    their (left, top) rect, transparent pixels leave the canvas
    untouched, and the PREVIOUS frame's disposal runs before the next
    draw — 0/1 leave the canvas, 2 restores the frame rect to the
    background color, 3 restores the canvas as it was before the
    frame drew."""
    sw, sh, gct, bg, frames = _gif_parse(payload)
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    out, delays = [], []
    for fr in frames:
        saved = canvas.copy() if fr["disposal"] == 3 else None
        t, l = fr["top"], fr["left"]
        h, w = fr["rows"].shape
        region = canvas[t : t + h, l : l + w]
        colors = fr["table"][fr["rows"]]
        if fr["transparent_idx"] is not None:
            m = fr["rows"] != fr["transparent_idx"]
            region[m] = colors[m]
        else:
            region[:] = colors
        out.append(canvas.copy())
        delays.append(fr["delay_cs"])
        if fr["disposal"] == 2:
            canvas[t : t + h, l : l + w] = bg_rgb
        elif fr["disposal"] == 3:
            canvas = saved
    return np.stack(out), delays


@_valueerror_on_corruption
def gif_decode(payload: bytes) -> np.ndarray:
    """GIF87a/89a bytes → (sh, sw, 3) uint8: the first frame composited
    onto the logical screen (global or local palette; interlaced row
    order undone; transparency over the background color)."""
    frames, _ = gif_decode_frames(payload)
    return frames[0]


# ================================================================== MP4

# ISO BMFF (MP4) demuxer + MJPEG-in-MP4 and intra-H.264 encoders.  The
# container layer is REAL: box walking (ftyp/moov/trak/mdia/minf/stbl),
# sample tables (stsd/stts/stsc/stsz/stco+co64), per-sample byte spans
# into mdat, track metadata (codec fourcc, dimensions, timescale, fps,
# avcC for avc1).  Samples whose codec is intra-frame JPEG
# ('jpeg'/'mjpa'/'MJPG' — Motion-JPEG in MP4) decode through the
# baseline JPEG codec above; 'avc1'/'avc3' route through the intra-only
# H.264 codec (stages/h264.py: NAL/SPS/PPS/slice layer + I_PCM
# macroblocks).  Inter-frame bitstreams (hev1/HEVC, vp09, av01) and
# non-intra H.264 features raise NotImplementedError naming the
# feature — the demux still yields their sample spans and metadata.


def _mp4_box(tag: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data) + 8) + tag + data


def _mp4_fbox(tag: bytes, version: int, flags: int, data: bytes) -> bytes:
    return _mp4_box(tag, bytes([version]) + flags.to_bytes(3, "big") + data)


_MP4_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def mp4_mjpeg_encode(
    frames: np.ndarray, fps: int = 10, quality: int = 85, samples_per_chunk: int = 0
) -> bytes:
    """(n, h, w, 3) uint8 → Motion-JPEG in an ISO BMFF (.mp4) container:
    one video track, 'jpeg' sample entry, per-sample sizes.  By default
    all samples sit in one chunk; ``samples_per_chunk`` > 0 splits mdat
    into chunks of that many samples (exercising multi-entry
    stsc/stco tables)."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("mp4_mjpeg_encode expects (n, h, w, 3) uint8")
    n, h, w = frames.shape[:3]
    jpegs = [jpeg_encode(f, quality) for f in frames]
    sample_entry = _mp4_visual_entry(b"jpeg", w, h)
    return _mp4_container(jpegs, w, h, fps, sample_entry, b"mjpeg\x00", samples_per_chunk)


def _mp4_visual_entry(fourcc: bytes, w: int, h: int, extra: bytes = b"") -> bytes:
    """VisualSampleEntry box (86 bytes + child boxes in ``extra``)."""
    return _mp4_box(
        fourcc,
        b"\x00" * 6 + struct.pack(">H", 1)             # data-reference index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
        + b"\x00" * 32                                 # compressor name
        + struct.pack(">Hh", 0x18, -1)
        + extra,
    )


def mp4_h264_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 → all-keyframe H.264 in ISO BMFF: 'avc1'
    sample entry with an avcC configuration record (SPS/PPS), samples
    are 4-byte-length-prefixed IDR NAL units of I_PCM macroblocks
    (stages/h264.py) — conformant baseline-profile intra video,
    lossless in 4:2:0 YCbCr."""
    from .h264 import h264_encode

    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("mp4_h264_encode expects (n, h, w, 3) uint8")
    _n, h, w = frames.shape[:3]
    sps, pps, aus = h264_encode(frames)
    avcc = _mp4_box(
        b"avcC",
        bytes([1, sps[1], sps[2], sps[3], 0xFC | 3, 0xE0 | 1])
        + struct.pack(">H", len(sps)) + sps
        + bytes([1]) + struct.pack(">H", len(pps)) + pps,
    )
    samples = [struct.pack(">I", len(au)) + au for au in aus]
    entry = _mp4_visual_entry(b"avc1", w, h, extra=avcc)
    return _mp4_container(samples, w, h, fps, entry, b"h264\x00")


def _mp4_container(
    samples: list[bytes], w: int, h: int, fps: int,
    sample_entry: bytes, hdlr_name: bytes, samples_per_chunk: int = 0,
) -> bytes:
    n = len(samples)
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _mp4_box(b"mdat", b"".join(samples))
    first_sample_off = len(ftyp) + 8  # ftyp then mdat header

    timescale = 1000
    delta = max(1, round(timescale / fps))
    dur = n * delta
    mvhd = _mp4_fbox(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)   # rate, volume, reserved
        + b"\x00" * 8 + _MP4_UNITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", 2),                        # next track id
    )
    tkhd = _mp4_fbox(
        b"tkhd", 0, 3,
        struct.pack(">IIII", 0, 0, 1, 0)               # track id 1
        + struct.pack(">I", dur) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + _MP4_UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _mp4_fbox(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, dur) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _mp4_fbox(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + hdlr_name)
    stsd = _mp4_fbox(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _mp4_fbox(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    spc = samples_per_chunk if samples_per_chunk > 0 else n
    chunk_counts = [min(spc, n - i) for i in range(0, n, spc)]
    chunk_offsets, off, si = [], first_sample_off, 0
    for cnt in chunk_counts:
        chunk_offsets.append(off)
        off += sum(len(j) for j in samples[si : si + cnt])
        si += cnt
    # stsc runs: consecutive chunks sharing a samples-per-chunk collapse
    runs = []
    for i, cnt in enumerate(chunk_counts, start=1):
        if runs and runs[-1][1] == cnt:
            continue
        runs.append((i, cnt))
    stsc = _mp4_fbox(
        b"stsc", 0, 0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", first, cnt, 1) for first, cnt in runs),
    )
    stsz = _mp4_fbox(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(j)) for j in samples),
    )
    stco = _mp4_fbox(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _mp4_fbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _mp4_fbox(b"dref", 0, 0, struct.pack(">I", 1) + _mp4_fbox(b"url ", 0, 1, b""))
    dinf = _mp4_box(b"dinf", dref)
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _mp4_walk(buf: bytes, start: int, end: int):
    """Yield (tag, body_start, box_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("bad MP4 box size")
        yield tag, pos + hdr, pos + size
        pos += size


def _mp4_find(buf: bytes, start: int, end: int, tag: bytes):
    for t, s, e in _mp4_walk(buf, start, end):
        if t == tag:
            return s, e
    return None


@_valueerror_on_corruption
def mp4_probe(payload: bytes) -> dict:
    """Demux an ISO BMFF stream WITHOUT decoding samples: returns
    {"brand", "tracks": [{kind, codec, width, height, timescale,
    duration, fps, n_samples, spans=[(offset, size), ...]}]}."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (MP4) stream")
    brand = payload[8:12].decode("latin1")
    moov = _mp4_find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")
    tracks = []
    for t, s, e in _mp4_walk(payload, *moov):
        if t != b"trak":
            continue
        tracks.append(_mp4_track(payload, s, e))
    if not tracks:
        raise ValueError("MP4 moov holds no trak")
    return {"brand": brand, "tracks": tracks}


def _mp4_track(buf: bytes, s: int, e: int) -> dict:
    mdia = _mp4_find(buf, s, e, b"mdia")
    if mdia is None:
        raise ValueError("trak missing mdia")
    mdhd = _mp4_find(buf, *mdia, b"mdhd")
    hdlr = _mp4_find(buf, *mdia, b"hdlr")
    minf = _mp4_find(buf, *mdia, b"minf")
    if mdhd is None or minf is None:
        raise ValueError("mdia missing mdhd/minf")
    ver = buf[mdhd[0]]
    if ver == 1:
        timescale, duration = struct.unpack_from(">IQ", buf, mdhd[0] + 4 + 16)
    else:
        timescale, duration = struct.unpack_from(">II", buf, mdhd[0] + 4 + 8)
    kind = b"????"
    if hdlr is not None:
        kind = buf[hdlr[0] + 8 : hdlr[0] + 12]
    stbl = _mp4_find(buf, *minf, b"stbl")
    if stbl is None:
        raise ValueError("minf missing stbl")
    stsd = _mp4_find(buf, *stbl, b"stsd")
    stts = _mp4_find(buf, *stbl, b"stts")
    stsc = _mp4_find(buf, *stbl, b"stsc")
    stsz = _mp4_find(buf, *stbl, b"stsz")
    stco = _mp4_find(buf, *stbl, b"stco") or _mp4_find(buf, *stbl, b"co64")
    if None in (stsd, stts, stsc, stsz, stco):
        raise ValueError("stbl missing sample tables")
    # stsd first entry: fourcc + (visual entries) dimensions
    codec, width, height, avcc = "", 0, 0, None
    (n_entries,) = struct.unpack_from(">I", buf, stsd[0] + 4)
    if n_entries >= 1:
        entry_pos = stsd[0] + 8
        codec = buf[entry_pos + 4 : entry_pos + 8].decode("latin1")
        if kind == b"vide" and stsd[1] - entry_pos >= 8 + 28 + 4:
            width, height = struct.unpack_from(">HH", buf, entry_pos + 8 + 24)
        if codec in ("avc1", "avc3"):
            # child boxes follow the 86-byte VisualSampleEntry
            (esize,) = struct.unpack_from(">I", buf, entry_pos)
            for t2, s2, e2 in _mp4_walk(buf, entry_pos + 86, entry_pos + esize):
                if t2 == b"avcC":
                    avcc = buf[s2:e2]
                    break
    # stts → per-sample delta (fps from the FIRST run, the common case)
    (stts_n,) = struct.unpack_from(">I", buf, stts[0] + 4)
    delta = 1
    if stts_n >= 1:
        _cnt, delta = struct.unpack_from(">II", buf, stts[0] + 8)
    # stsz → sizes
    fixed, count = struct.unpack_from(">II", buf, stsz[0] + 4)
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", buf, stsz[0] + 12))
    # stco/co64 → chunk offsets
    is64 = buf[stco[0] - 8 + 4 : stco[0] - 8 + 8] == b"co64"
    (nchunks,) = struct.unpack_from(">I", buf, stco[0] + 4)
    fmt = "Q" if is64 else "I"
    offsets = list(struct.unpack_from(f">{nchunks}{fmt}", buf, stco[0] + 8))
    # stsc runs → sample spans
    (nruns,) = struct.unpack_from(">I", buf, stsc[0] + 4)
    runs = [struct.unpack_from(">III", buf, stsc[0] + 8 + 12 * i) for i in range(nruns)]
    spans: list[tuple[int, int]] = []
    si = 0
    for i, (first, spc, _sdi) in enumerate(runs):
        last = (runs[i + 1][0] - 1) if i + 1 < len(runs) else nchunks
        for c in range(first, last + 1):
            if c - 1 >= len(offsets):
                raise ValueError("stsc chunk index out of range")
            off = offsets[c - 1]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                spans.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    if si != len(sizes):
        raise ValueError("sample tables disagree on sample count")
    fps = (timescale / delta) if delta else 0.0
    return {
        "kind": kind.decode("latin1"),
        "codec": codec,
        "width": int(width),
        "height": int(height),
        "timescale": int(timescale),
        "duration": int(duration),
        "fps": float(fps),
        "n_samples": len(spans),
        "spans": spans,
        "avcC": avcc,
    }


_MP4_INTERFRAME = {"hev1", "hvc1", "vp09", "av01", "mp4v"}


def _mp4_decode_avc(
    payload: bytes, tr: dict, spans: list[tuple[int, int]]
) -> np.ndarray:
    """Decode the given sample spans of an avc1/avc3 track via the
    intra-only H.264 codec (stages/h264.py): parse SPS/PPS out of the
    avcC record, then walk each sample's length-prefixed NAL units.
    Every supported sample is an independent intra picture, so a
    filtered span list (keyframe sampling) decodes standalone; in-band
    SPS/PPS NALs inside decoded samples still take effect.  Non-intra
    features raise NotImplementedError at the exact syntax element."""
    from .h264 import h264_decode_frame, parse_pps, parse_sps, _unebsp

    avcc = tr.get("avcC")
    if not avcc or len(avcc) < 7:
        raise ValueError("avc1 track missing avcC configuration record")
    nal_len = (avcc[4] & 3) + 1
    pos, sps, pps = 5, None, None
    n_sps = avcc[pos] & 0x1F
    pos += 1
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", avcc, pos)
        sps = parse_sps(_unebsp(avcc[pos + 2 + 1 : pos + 2 + ln]))
        pos += 2 + ln
    n_pps = avcc[pos]
    pos += 1
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", avcc, pos)
        pps = parse_pps(_unebsp(avcc[pos + 2 + 1 : pos + 2 + ln]))
        pos += 2 + ln
    if sps is None or pps is None:
        raise ValueError("avcC carries no SPS/PPS")
    frames = []
    for off, size in spans:
        if off + size > len(payload):
            raise ValueError("MP4 sample span beyond stream end")
        sample, p = payload[off : off + size], 0
        while p + nal_len <= len(sample):
            ln = int.from_bytes(sample[p : p + nal_len], "big")
            nal = sample[p + nal_len : p + nal_len + ln]
            if len(nal) != ln:
                raise ValueError("truncated NAL unit in MP4 sample")
            p += nal_len + ln
            t = nal[0] & 0x1F
            if t in (1, 5):
                frames.append(h264_decode_frame(nal, sps, pps))
            elif t == 7:
                sps = parse_sps(_unebsp(nal[1:]))
            elif t == 8:
                pps = parse_pps(_unebsp(nal[1:]))
    if not frames:
        raise ValueError("avc1 track holds no decodable slices")
    return np.stack(frames)


@_valueerror_on_corruption
def mp4_decode(
    payload: bytes, sample_indices: list[int] | None = None
) -> tuple[np.ndarray, float]:
    """MP4 → ((n, h, w, 3) uint8 frames, fps) when the video track's
    samples are intra-frame JPEG or intra-only H.264 (avc1 with I_PCM
    macroblocks — stages/h264.py); inter-frame codecs and non-intra
    H.264 features raise NotImplementedError naming the feature (the
    demux itself is real — use mp4_probe for spans/metadata without
    decoding).

    ``sample_indices`` decodes ONLY the selected samples (sorted,
    deduplicated) — the keyframe-sampling access pattern: every
    supported sample is intra-coded, so each decodes independently and
    the skipped majority costs no codec CPU.  Out-of-range indices
    raise ValueError."""
    info = mp4_probe(payload)
    video = [t for t in info["tracks"] if t["kind"] == "vide"]
    if not video:
        raise ValueError("MP4 holds no video track")
    tr = video[0]
    spans = tr["spans"]
    if sample_indices is not None:
        idx = sorted({int(i) for i in sample_indices})
        if not idx:
            raise ValueError("sample_indices is empty")
        if idx[0] < 0 or idx[-1] >= len(spans):
            raise ValueError(
                f"sample index out of range (track holds {len(spans)} samples)"
            )
        spans = [spans[i] for i in idx]
    if tr["codec"] in ("avc1", "avc3"):
        return _mp4_decode_avc(payload, tr, spans), tr["fps"]
    if tr["codec"] in _MP4_INTERFRAME:
        raise NotImplementedError(
            f"MP4 codec '{tr['codec']}' is an inter-frame bitstream — "
            "no ffmpeg in this sandbox; the container demux IS real "
            "(sample spans + metadata via mp4_probe); swap in a codec "
            "library to decode these samples in production"
        )
    if tr["codec"] not in ("jpeg", "mjpa", "MJPG"):
        raise ValueError(f"unsupported MP4 sample codec '{tr['codec']}'")
    frames = []
    for off, size in spans:
        if off + size > len(payload):
            raise ValueError("MP4 sample span beyond stream end")
        frames.append(jpeg_decode(payload[off : off + size]))
    if not frames:
        raise ValueError("MP4 video track holds no samples")
    if len({f.shape for f in frames}) != 1:
        raise ValueError("MP4 frames disagree on dimensions")
    return np.stack(frames), tr["fps"]


# ===================================================================== BMP

def bmp_encode(arr: np.ndarray, top_down: bool = False) -> bytes:
    """(h, w, 3) RGB uint8 → 24-bit BI_RGB BMP; (h, w) gray uint8 →
    8-bit palette BMP (grayscale ramp).  BITMAPFILEHEADER +
    BITMAPINFOHEADER, rows padded to 4 bytes, bottom-up by default
    (``top_down=True`` writes negative biHeight)."""
    h, w = int(arr.shape[0]), int(arr.shape[1])
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if arr.ndim == 3 and arr.shape[2] == 3:
        bpp, palette = 24, b""
        rows = arr[:, :, ::-1].astype(np.uint8)  # BGR byte order
        rowbytes = w * 3
        nclr = 0
    elif arr.ndim == 2:
        bpp = 8
        ramp = np.arange(256, dtype=np.uint8)
        palette = (
            np.stack([ramp, ramp, ramp, np.zeros(256, np.uint8)], axis=1)
            .tobytes()
        )
        rows = arr.astype(np.uint8)
        rowbytes = w
        nclr = 256
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    stride = (rowbytes + 3) // 4 * 4
    if not top_down:
        rows = rows[::-1]
    data = np.zeros((h, stride), dtype=np.uint8)
    data[:, :rowbytes] = rows.reshape(h, rowbytes)
    px = data.tobytes()
    off = 14 + 40 + len(palette)
    bih = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, bpp, 0, len(px),
        2835, 2835, nclr, 0,
    )
    bfh = struct.pack("<2sIHHI", b"BM", off + len(px), 0, 0, off)
    return bfh + bih + palette + px


@_valueerror_on_corruption
def bmp_decode(payload: bytes) -> np.ndarray:
    """BI_RGB BMP → (h, w, 3) uint8 RGB.  24-bit and 8-bit-palette,
    bottom-up AND top-down (negative biHeight), BITMAPINFOHEADER and
    later (larger) header revisions; compressed variants (RLE4/8,
    BI_BITFIELDS) and other depths are refused BY NAME."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP stream")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    off = struct.unpack_from("<I", payload, 10)[0]
    hsz = struct.unpack_from("<I", payload, 14)[0]
    if hsz < 40:
        raise ValueError(f"BMP header size {hsz} unsupported (BITMAPCOREHEADER)")
    w, hraw, planes, bpp, comp, _isz, _xp, _yp, nclr, _ci = struct.unpack_from(
        "<iiHHIIiiII", payload, 18
    )
    top_down, h = hraw < 0, abs(hraw)
    if comp != 0:
        raise ValueError(f"BMP compression {comp} unsupported (BI_RGB only)")
    if bpp not in (8, 24):
        raise ValueError(f"BMP bit depth {bpp} unsupported (8/24 only)")
    if planes != 1:
        raise ValueError(f"BMP planes {planes} != 1")
    if w <= 0 or h == 0 or w > (1 << 16) or h > (1 << 16):
        raise ValueError(f"implausible BMP dimensions {w}x{hraw}")
    rowbytes = w * (3 if bpp == 24 else 1)
    stride = (rowbytes + 3) // 4 * 4
    if off + stride * h > len(payload):
        raise ValueError("truncated BMP pixel data")
    data = np.frombuffer(payload, np.uint8, stride * h, off).reshape(h, stride)[
        :, :rowbytes
    ]
    if bpp == 24:
        img = data.reshape(h, w, 3)[:, :, ::-1]
    else:
        if nclr == 0:
            nclr = 256
        pal_off = 14 + hsz
        if pal_off + nclr * 4 > off:
            raise ValueError("BMP palette overruns pixel offset")
        pal = (
            np.frombuffer(payload, np.uint8, nclr * 4, pal_off)
            .reshape(nclr, 4)[:, :3][:, ::-1]
        )  # stored BGRx
        idx = data
        if int(idx.max(initial=0)) >= nclr:
            raise ValueError("BMP palette index out of range")
        img = pal[idx]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


# ===================================================================== TIFF
# TIFF 6.0 baseline (Adobe spec, 1992): II/MM byte orders, strip
# layout, 8-bit grayscale (PhotometricInterpretation=1) and RGB (=2),
# Compression none (1) and PackBits (32773).  Tiled/JPEG-in-TIFF/LZW
# and planar configurations are out of scope and fail loudly.

_TIFF_SHORT, _TIFF_LONG = 3, 4


def _packbits_encode(data: bytes) -> bytes:
    """Apple PackBits (TIFF 6.0 §9): repeat runs as (257-n, byte),
    literal runs as (n-1, bytes)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j > i:  # run of length >= 2
            out.append((257 - (j - i + 1)) & 0xFF)
            out.append(data[i])
            i = j + 1
        else:  # literal until the next 3-byte run or 128 bytes
            j = i
            while j < n and j - i < 128:
                if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out.extend(data[i:j])
            i = j
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("truncated PackBits stream")
        nb = data[i]
        i += 1
        if nb < 128:
            cnt = nb + 1
            if i + cnt > len(data):
                raise ValueError("PackBits literal run past end of strip")
            out.extend(data[i : i + cnt])
            i += cnt
        elif nb > 128:
            if i >= len(data):
                raise ValueError("PackBits repeat run missing byte")
            out.extend(data[i : i + 1] * (257 - nb))
            i += 1
        # 0x80 is a no-op per spec
    if len(out) != expected:
        raise ValueError("PackBits output overruns expected strip size")
    return bytes(out)


def tiff_encode(
    arr: np.ndarray,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    packbits: bool = False,
) -> bytes:
    """(h, w, 3) RGB uint8 or (h, w) gray uint8 → baseline TIFF.
    Multi-strip by default (rows_per_strip) so readers exercise the
    real strip table, both byte orders, optional PackBits."""
    e = ">" if big_endian else "<"
    h, w = int(arr.shape[0]), int(arr.shape[1])
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if arr.ndim == 3 and arr.shape[2] == 3:
        spp, photometric = 3, 2
    elif arr.ndim == 2:
        spp, photometric = 1, 1
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    arr = arr.astype(np.uint8)
    rps = h if rows_per_strip is None else max(1, int(rows_per_strip))
    strips = []
    for r0 in range(0, h, rps):
        raw = arr[r0 : r0 + rps].tobytes()
        strips.append(_packbits_encode(raw) if packbits else raw)
    nstrips = len(strips)

    # tag, type, count, value(list for external/inline multi)
    tags = [
        (256, _TIFF_LONG, 1, [w]),
        (257, _TIFF_LONG, 1, [h]),
        (258, _TIFF_SHORT, spp, [8] * spp),
        (259, _TIFF_SHORT, 1, [32773 if packbits else 1]),
        (262, _TIFF_SHORT, 1, [photometric]),
        (273, _TIFF_LONG, nstrips, None),  # strip offsets, filled below
        (277, _TIFF_SHORT, 1, [spp]),
        (278, _TIFF_LONG, 1, [rps]),
        (279, _TIFF_LONG, nstrips, [len(s) for s in strips]),
    ]
    ifd_len = 2 + len(tags) * 12 + 4
    tsize = {_TIFF_SHORT: 2, _TIFF_LONG: 4}

    # external area: any entry whose payload exceeds the 4-byte field
    ext = bytearray()
    ext_base = 8 + ifd_len
    ext_off: dict[int, int] = {}
    for tag, typ, cnt, vals in tags:
        if vals is not None and cnt * tsize[typ] > 4:
            ext_off[tag] = ext_base + len(ext)
            fmt = "H" if typ == _TIFF_SHORT else "I"
            ext.extend(struct.pack(f"{e}{cnt}{fmt}", *vals))
    if nstrips * 4 > 4:
        ext_off[273] = ext_base + len(ext)
        ext.extend(b"\x00" * (4 * nstrips))  # patched once offsets known

    data_base = ext_base + len(ext)
    offs = []
    pos = data_base
    for s in strips:
        offs.append(pos)
        pos += len(s)
    if 273 in ext_off:
        struct.pack_into(f"{e}{nstrips}I", ext, ext_off[273] - ext_base, *offs)

    def field(typ, cnt, vals, tag):
        if tag in ext_off:
            return struct.pack(f"{e}I", ext_off[tag])
        fmt = "H" if typ == _TIFF_SHORT else "I"
        raw = struct.pack(f"{e}{cnt}{fmt}", *vals)
        return raw + b"\x00" * (4 - len(raw))  # left-justified per spec

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(f"{e}HI", 42, 8)
    out += struct.pack(f"{e}H", len(tags))
    for tag, typ, cnt, vals in tags:
        v = vals if vals is not None else offs
        out += struct.pack(f"{e}HHI", tag, typ, cnt) + field(typ, cnt, v, tag)
    out += struct.pack(f"{e}I", 0)  # no next IFD
    out += ext
    for s in strips:
        out += s
    return bytes(out)


@_valueerror_on_corruption
def tiff_decode(payload: bytes) -> np.ndarray:
    """Baseline TIFF → (h, w, 3) uint8 RGB or (h, w) gray.  Both byte
    orders, multi-strip, none/PackBits compression; anything fancier
    (LZW, tiles, planar=2, >8-bit) raises by name."""
    if len(payload) < 8:
        raise ValueError("TIFF shorter than its header")
    order = payload[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError(f"not a TIFF: byte-order mark {order!r}")
    magic, ifd_off = struct.unpack_from(f"{e}HI", payload, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    if ifd_off + 2 > len(payload):
        raise ValueError("IFD offset past end of file")
    (n_ent,) = struct.unpack_from(f"{e}H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_ent + 4 > len(payload):
        raise ValueError("IFD truncated")
    tsize = {1: 1, 3: 2, 4: 4}
    tfmt = {1: "B", 3: "H", 4: "I"}
    entries: dict[int, list[int]] = {}
    for i in range(n_ent):
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", payload, ifd_off + 2 + 12 * i)
        vpos = ifd_off + 2 + 12 * i + 8
        if typ not in tsize:
            continue  # RATIONAL resolution etc. — not needed for baseline
        total = cnt * tsize[typ]
        if total > 4:
            (off,) = struct.unpack_from(f"{e}I", payload, vpos)
            if off + total > len(payload):
                raise ValueError(f"tag {tag} value block truncated")
            entries[tag] = list(struct.unpack_from(f"{e}{cnt}{tfmt[typ]}", payload, off))
        else:
            entries[tag] = list(struct.unpack_from(f"{e}{cnt}{tfmt[typ]}", payload, vpos))

    def one(tag, default=None):
        if tag in entries:
            return entries[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w, h = one(256), one(257)
    comp = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = entries.get(258, [8] * spp)
    planar = one(284, 1)
    if comp not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {comp} (baseline: none/PackBits)")
    if planar != 1:
        raise ValueError(f"unsupported TIFF planar configuration {planar}")
    if any(b != 8 for b in bits) or len(bits) != spp:
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    if (photometric, spp) not in ((1, 1), (2, 3)):
        raise ValueError(
            f"unsupported TIFF photometric/spp ({photometric}, {spp})"
        )
    offs = entries.get(273)
    cnts = entries.get(279)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("TIFF strip table missing or inconsistent")
    rps = one(278, h)
    buf = bytearray()
    for si, (off, cnt) in enumerate(zip(offs, cnts)):
        if off + cnt > len(payload):
            raise ValueError(f"TIFF strip {si} truncated")
        raw = payload[off : off + cnt]
        rows = min(rps, h - si * rps)
        if rows <= 0:
            raise ValueError("TIFF strip table longer than image")
        if comp == 32773:
            raw = _packbits_decode(raw, rows * w * spp)
        elif len(raw) != rows * w * spp:
            raise ValueError(
                f"TIFF strip {si}: {len(raw)} bytes != {rows * w * spp}"
            )
        buf += raw
    if len(buf) != h * w * spp:
        raise ValueError("TIFF strips do not cover the image")
    img = np.frombuffer(bytes(buf), dtype=np.uint8)
    return img.reshape((h, w, 3) if spp == 3 else (h, w)).copy()
