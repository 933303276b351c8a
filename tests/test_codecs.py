"""Pure-stdlib/numpy PNG + baseline JPEG codecs (stages/codecs.py).

PNG is lossless → byte-exact roundtrips, plus spec-vector decoding of
ALL five scanline filters (our encoder emits only filter 0, so the
filtered vectors are built with an independent reference filterer).
JPEG is lossy → roundtrips verified by PSNR bound across qualities and
both subsampling layouts, plus determinism and unsupported-feature
errors."""

import struct
import zlib

import numpy as np
import pytest

from crawler_ray.stages.codecs import (
    jpeg_decode,
    jpeg_encode,
    png_decode,
    png_encode,
)


def _smooth_rgb(h=96, w=120, seed=0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            127 + 100 * np.sin(xx / 19) + 20 * np.cos(yy / 11),
            127 + 90 * np.cos(xx / 23 + yy / 17),
            127 + 80 * np.sin((xx + yy) / 29),
        ],
        axis=-1,
    )
    return np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)


# ------------------------------------------------------------------- PNG


@pytest.mark.parametrize(
    "shape", [(13, 17), (13, 17, 3), (8, 8, 4), (1, 1, 3), (64, 48, 3)]
)
def test_png_roundtrip_exact(shape):
    arr = np.random.RandomState(1).randint(0, 256, size=shape, dtype=np.uint8)
    out = png_decode(png_encode(arr))
    assert out.shape == arr.shape and (out == arr).all()


def _ref_filter(img: np.ndarray, ftype: int) -> bytes:
    """Independent reference implementation of PNG scanline filtering
    (the ENCODE direction, RFC 2083 §6) — produces test vectors the
    decoder must invert for every filter type."""
    h, w, c = img.shape
    rows = img.reshape(h, w * c).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = rows[y]
        a = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        b = prev
        cc = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if ftype == 0:
            f = cur
        elif ftype == 1:
            f = cur - a
        elif ftype == 2:
            f = cur - b
        elif ftype == 3:
            f = cur - ((a + b) >> 1)
        else:  # Paeth
            p = a + b - cc
            pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, cc))
            f = cur - pred
        out.append(ftype)
        out += (f & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4], ids=["none", "sub", "up", "avg", "paeth"])
def test_png_decoder_inverts_every_filter(ftype):
    img = np.random.RandomState(2 + ftype).randint(0, 256, size=(11, 9, 3), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 9, 11, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_ref_filter(img, ftype)))
        + _chunk(b"IEND", b"")
    )
    assert (png_decode(payload) == img).all()


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    # illegal depth/color combination (16-bit palette) refused by name
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", b"\x00" * 12)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 40))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="illegal PNG depth"):
        png_decode(bad)
    # unknown color type refused by name
    ihdr7 = struct.pack(">IIBBBBB", 4, 4, 8, 7, 0, 0, 0)
    bad7 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr7)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 20))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="color type"):
        png_decode(bad7)
    # palette PNG missing its PLTE is refused by name
    ihdr3 = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    bad3 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr3)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 20))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        png_decode(bad3)


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((9, 7, 2), np.uint8),     # gray+alpha (color type 4)
        ((9, 7), np.uint16),       # 16-bit gray
        ((9, 7, 2), np.uint16),    # 16-bit gray+alpha
        ((9, 7, 3), np.uint16),    # 16-bit RGB
        ((5, 6, 4), np.uint16),    # 16-bit RGBA
    ],
    ids=["ga8", "g16", "ga16", "rgb16", "rgba16"],
)
def test_png_roundtrip_extended_matrix(shape, dtype):
    """Color type 4 and depth 16 (all types) roundtrip bit-exact."""
    hi = 256 if dtype == np.uint8 else 65536
    arr = np.random.RandomState(7).randint(0, hi, size=shape).astype(dtype)
    out = png_decode(png_encode(arr))
    assert out.shape == arr.shape and out.dtype == dtype and (out == arr).all()


@pytest.mark.parametrize(
    "shape,dtype",
    [((13, 17, 3), np.uint8), ((8, 9), np.uint8), ((10, 5, 4), np.uint16),
     ((1, 1, 3), np.uint8), ((7, 16, 2), np.uint8)],
    ids=["rgb", "gray", "rgba16", "onepx", "ga"],
)
def test_png_adam7_interlace_roundtrip(shape, dtype):
    """Adam7: seven independently-filtered sub-images reassemble to the
    original raster for every supported color/depth."""
    hi = 256 if dtype == np.uint8 else 65536
    arr = np.random.RandomState(11).randint(0, hi, size=shape).astype(dtype)
    payload = png_encode(arr, interlace=True)
    # byte 28 of the stream is the IHDR interlace flag
    assert payload[len(b"\x89PNG\r\n\x1a\n") + 8 + 12] == 1
    out = png_decode(payload)
    assert out.shape == arr.shape and out.dtype == dtype and (out == arr).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray_decode(depth):
    """1/2/4-bit grayscale: hand-packed scanlines decode with
    left-bit-replication to full-range uint8 (0 → 0, max → 255)."""
    w, h = 10, 3
    maxv = (1 << depth) - 1
    vals = (np.arange(h * w).reshape(h, w) % (maxv + 1)).astype(np.uint8)
    rows = bytearray()
    for y in range(h):
        bits = "".join(format(v, f"0{depth}b") for v in vals[y])
        bits += "0" * ((-len(bits)) % 8)
        rows.append(0)  # filter None
        rows += int(bits, 2).to_bytes(len(bits) // 8, "big")
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _chunk(b"IEND", b"")
    )
    out = png_decode(payload)
    assert (out == vals * (255 // maxv)).all()


def test_png_subbyte_palette_decode():
    """2-bit palette indices map through PLTE without scaling."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3, 3], [3, 2, 1, 0, 1]], dtype=np.uint8)
    rows = bytearray()
    for y in range(2):
        bits = "".join(format(v, "02b") for v in idx[y])
        bits += "0" * ((-len(bits)) % 8)
        rows.append(0)
        rows += int(bits, 2).to_bytes(len(bits) // 8, "big")
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 2, 2, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _chunk(b"IEND", b"")
    )
    assert (png_decode(payload) == pal[idx]).all()


def test_png_palette_decode():
    """Color type 3 (the common web palette PNG): indices map through
    PLTE to RGB; out-of-range indices are refused."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert (png_decode(payload) == pal[idx]).all()
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal[:2].tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        png_decode(bad)


# ------------------------------------------------------------------ JPEG


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("quality", [95, 85, 60])
def test_jpeg_roundtrip_psnr(sub, quality):
    img = _smooth_rgb()
    enc = jpeg_encode(img, quality=quality, subsampling=sub)
    dec = jpeg_decode(enc)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    p = _psnr(img, dec)
    assert p > (30 if sub == "444" else 28), (sub, quality, p)
    # higher quality → larger stream (sanity on quant scaling)
    assert len(jpeg_encode(img, 95, sub)) > len(jpeg_encode(img, 60, sub))


@pytest.mark.parametrize(
    "shape", [(5, 7, 3), (9, 16, 3), (16, 16, 3), (17, 33, 3), (8, 8, 3)]
)
def test_jpeg_odd_sizes(shape):
    img = np.clip(
        np.random.RandomState(3).normal(128, 20, shape), 0, 255
    ).astype(np.uint8)
    for sub in ("444", "420"):
        dec = jpeg_decode(jpeg_encode(img, 90, sub))
        assert dec.shape == img.shape


def test_jpeg_deterministic_and_errors():
    img = _smooth_rgb(32, 32)
    assert jpeg_encode(img, 85) == jpeg_encode(img, 85)
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01not jpeg")
    with pytest.raises(ValueError):
        jpeg_encode(img.astype(np.int32))
    # a BASELINE scan header relabeled SOF2 is an invalid progressive
    # stream (full-band scan with Ss=0): refused by name
    enc = bytearray(jpeg_encode(img, 85))
    sof0 = enc.find(b"\xff\xc0")
    enc[sof0 + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        jpeg_decode(bytes(enc))
    # arithmetic coding (SOF9) refused by name
    enc[sof0 + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF0"):
        jpeg_decode(bytes(enc))


@pytest.mark.parametrize("quality", [30, 60, 85, 95])
@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_jpeg_progressive_equals_baseline(quality, subsampling):
    """Progressive (SOF2: spectral selection + successive approximation
    over a 9-scan script) codes the SAME quantized coefficients as
    baseline, so the decoded pixels must be bit-identical — including
    4:2:0, where non-interleaved AC scans iterate each component's TRUE
    block dims, not the MCU-padded grid (the classic decoder bug)."""
    from crawler_ray.stages.codecs import jpeg_encode_progressive

    img = _smooth_rgb(41, 53, seed=quality)  # odd dims: padding ≠ true dims
    base = jpeg_decode(jpeg_encode(img, quality, subsampling))
    prog = jpeg_decode(jpeg_encode_progressive(img, quality, subsampling))
    assert (prog == base).all()


def test_jpeg_progressive_stress_and_truncation():
    """Refinement-path stress (noise maximizes newly-significant /
    ZRL / correction-bit interplay; flat maximizes EOB runs) and the
    decode-boundary contract."""
    from crawler_ray.stages.codecs import jpeg_encode_progressive

    rng = np.random.RandomState(7)
    for img in (
        rng.randint(0, 256, (24, 40, 3)).astype(np.uint8),          # noise
        np.full((17, 19, 3), 130, np.uint8),                        # flat
        (np.indices((32, 32)).sum(0) % 2 * 255).astype(np.uint8)[..., None].repeat(3, -1),
        rng.randint(0, 256, (3, 5, 3)).astype(np.uint8),            # sub-block
    ):
        for q in (30, 85):
            base = jpeg_decode(jpeg_encode(img, q, "444"))
            assert (jpeg_decode(jpeg_encode_progressive(img, q)) == base).all()
    p = jpeg_encode_progressive(rng.randint(0, 256, (24, 40, 3)).astype(np.uint8), 85)
    for k in range(2, len(p), 11):
        try:
            jpeg_decode(p[:k])
        except ValueError:
            pass


def test_jpeg_flat_image_tiny_stream():
    # a constant image quantizes to all-zero AC → near-minimal stream
    img = np.full((64, 64, 3), 200, dtype=np.uint8)
    enc = jpeg_encode(img, 85)
    dec = jpeg_decode(enc)
    assert _psnr(img, dec) > 40
    assert len(enc) < 1200


def test_media_decoder_runs_real_compressed_codecs(ray_session):
    """End-to-end: PNG/JPEG payloads flow through the MediaDecoder
    actor-pool stage — PNG decodes byte-exactly, JPEG within PSNR."""
    import ray.data as rd

    from crawler_ray.stages.media import MediaDecoder, synth_media_table

    refs = [f"http://m.test/img{i}.png" for i in range(4)] + [
        f"http://m.test/photo{i}.jpg" for i in range(4)
    ]
    tbl = synth_media_table(refs)
    assert bytes(tbl["payload"][0].as_py())[:4] == b"\x89PNG"
    assert bytes(tbl["payload"][4].as_py())[:2] == b"\xff\xd8"
    out = (
        rd.from_arrow(tbl)
        .map_batches(MediaDecoder, batch_size=4, concurrency=1, batch_format="pyarrow")
        .to_pandas()
    )
    assert len(out) == len(refs)
    assert out["decode_ok"].all()
    assert (out["decoded_kind"] == "image").all()
    # decoded dimensions match the generator's meta
    assert (out["decoded_width"] == out["meta"].map(lambda m: m["width"])).all()
    assert (out["decoded_height"] == out["meta"].map(lambda m: m["height"])).all()


@pytest.mark.parametrize("codec", ["png", "jpeg"])
def test_truncation_never_escapes_valueerror(codec):
    """Every truncation point of a valid stream either decodes (JPEG's
    zero-padded tail is legitimately decodable garbage) or raises
    ValueError — never IndexError/struct.error/zlib.error, never a
    hang: the decode-boundary contract for corrupt web payloads."""
    img = np.clip(
        np.random.RandomState(0).normal(128, 30, (24, 32, 3)), 0, 255
    ).astype(np.uint8)
    enc = png_encode(img) if codec == "png" else jpeg_encode(img, 85)
    dec = png_decode if codec == "png" else jpeg_decode
    for k in range(1, len(enc), 3):
        try:
            dec(enc[:k])
        except ValueError:
            pass


def test_avi_mjpeg_roundtrip_and_stage(ray_session):
    """AVI/MJPEG video: encode/decode roundtrip within PSNR, fps
    preserved, truncation raises ValueError, and .avi payloads flow
    through MediaDecoder as real video (per-frame JPEG decode)."""
    import ray.data as rd

    from crawler_ray.stages.codecs import avi_mjpeg_decode, avi_mjpeg_encode
    from crawler_ray.stages.media import MediaDecoder, synth_media_table

    yy, xx = np.mgrid[0:40, 0:56]
    frames = np.stack(
        [
            np.clip(
                np.stack(
                    [127 + 100 * np.sin(xx / 9 + t), 127 + 90 * np.cos(yy / 7 - t),
                     np.full_like(xx, 60 + 20 * t)],
                    axis=-1,
                ),
                0, 255,
            ).astype(np.uint8)
            for t in range(5)
        ]
    )
    enc = avi_mjpeg_encode(frames, fps=12, quality=90)
    dec, fps = avi_mjpeg_decode(enc)
    assert fps == 12 and dec.shape == frames.shape
    assert _psnr(frames, dec) > 32
    for k in range(1, len(enc), 17):  # truncation never escapes ValueError
        try:
            avi_mjpeg_decode(enc[:k])
        except ValueError:
            pass

    refs = [f"http://m.test/v{i}.avi" for i in range(3)]
    tbl = synth_media_table(refs)
    assert bytes(tbl["payload"][0].as_py())[8:12] == b"AVI "
    out = (
        rd.from_arrow(tbl)
        .map_batches(MediaDecoder, batch_size=2, concurrency=1, batch_format="pyarrow")
        .to_pandas()
    )
    assert out["decode_ok"].all() and (out["decoded_kind"] == "video").all()
    assert (out["decoded_frames"] == out["meta"].map(lambda m: m["frames"])).all()


def test_gif_roundtrip_and_stage(ray_session):
    """GIF (palette + LZW): exact roundtrip incl. dictionary growth and
    clear codes, interlaced decode, truncation contract, and .gif
    payloads through MediaDecoder."""
    import ray.data as rd

    from crawler_ray.stages.codecs import gif_decode, gif_encode
    from crawler_ray.stages.media import MediaDecoder, synth_media_table

    rng = np.random.RandomState(0)
    pal = rng.randint(0, 256, (19, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 19, (33, 47))]
    enc = gif_encode(img)
    assert (gif_decode(enc) == img).all()
    # large frame: LZW dictionary fills and resets via clear codes
    big = pal[rng.randint(0, 19, (200, 300))]
    assert (gif_decode(gif_encode(big)) == big).all()
    # >256 colors refused by name
    yy, xx = np.indices((30, 30))
    many = np.stack([yy, xx, yy ^ xx], axis=-1).astype(np.uint8)  # 900 colors
    with pytest.raises(ValueError, match="256"):
        gif_encode(many)
    # truncation never escapes ValueError
    for k in range(1, len(enc), 5):
        try:
            gif_decode(enc[:k])
        except ValueError:
            pass
    # interlaced variant: permute rows per the 4-pass order and set the flag
    h = img.shape[0]
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    enc_i = bytearray(gif_encode(img[order]))
    desc = enc_i.find(b"\x2c")
    enc_i[desc + 9] |= 0x40  # image-descriptor packed byte: interlace flag
    assert (gif_decode(bytes(enc_i)) == img).all()

    refs = [f"http://m.test/anim{i}.gif" for i in range(3)]
    tbl = synth_media_table(refs)
    assert bytes(tbl["payload"][0].as_py())[:6] == b"GIF89a"
    out = (
        rd.from_arrow(tbl)
        .map_batches(MediaDecoder, batch_size=2, concurrency=1, batch_format="pyarrow")
        .to_pandas()
    )
    assert out["decode_ok"].all() and (out["decoded_kind"] == "image").all()
    assert (out["decoded_width"] == out["meta"].map(lambda m: m["width"])).all()


def _compose_reference(specs, sw, sh):
    """Independent GIF89a rendering-model compositor (the spec's words,
    not the codec's code): draw rect → emit snapshot → apply the
    frame's disposal before the next draw.  Background is black (the
    encoder writes no global color table)."""
    canvas = np.zeros((sh, sw, 3), np.uint8)
    out = []
    for s in specs:
        saved = canvas.copy()
        t, l = s.get("top", 0), s.get("left", 0)
        img = s["image"]
        h, w = img.shape[:2]
        m = s.get("mask")
        m = np.ones((h, w), bool) if m is None else m
        region = canvas[t : t + h, l : l + w]
        region[m] = img[m]
        out.append(canvas.copy())
        d = s.get("disposal", 1)
        if d == 2:
            canvas[t : t + h, l : l + w] = 0
        elif d == 3:
            canvas = saved
    return np.stack(out)


def test_gif_animation_disposal_composition():
    """Animated GIF: partial frames at offsets, transparency, and all
    three disposal behaviors composite exactly per the GIF89a rendering
    model (checked against an independent reference compositor)."""
    from crawler_ray.stages.codecs import gif_decode_frames, gif_encode_animation

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (7, 3), dtype=np.uint8)
    sw, sh = 16, 12

    def block(h, w):
        return pal[rng.randint(0, 7, (h, w))]

    mask = rng.rand(5, 6) > 0.4
    specs = [
        {"image": block(12, 16), "disposal": 1, "delay_cs": 10},
        # partial + transparent, then restore-to-background of its rect
        {"image": block(5, 6), "left": 4, "top": 2, "mask": mask,
         "disposal": 2, "delay_cs": 7},
        # draws, then the canvas reverts to the pre-frame state
        {"image": block(4, 5), "left": 10, "top": 7, "disposal": 3, "delay_cs": 3},
        # disposal 0 (none): persists like 1
        {"image": block(3, 4), "left": 0, "top": 8, "disposal": 0, "delay_cs": 4},
        # last frame sees: frame-1 canvas, minus frame-2's rect (bg),
        # without frame-3's pixels, plus frame-4's rect
        {"image": block(2, 3), "left": 12, "top": 0, "disposal": 1, "delay_cs": 4},
    ]
    payload = gif_encode_animation(specs, size=(sw, sh))
    frames, delays = gif_decode_frames(payload)
    expected = _compose_reference(specs, sw, sh)
    assert frames.shape == (5, sh, sw, 3)
    assert delays == [10, 7, 3, 4, 4]
    assert (frames == expected).all()

    # frame rect outside the screen refused by name, encode and decode
    with pytest.raises(ValueError, match="logical screen"):
        gif_encode_animation([{"image": block(4, 4), "left": 14, "top": 10}],
                             size=(sw, sh))

    # truncation never escapes ValueError
    for k in range(1, len(payload), 7):
        try:
            gif_decode_frames(payload[:k])
        except ValueError:
            pass


def test_gif_animation_through_media_stage(ray_session):
    """Multi-frame GIFs classify as video with a real frame count in
    MediaDecoder (single-frame GIFs stay images)."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.codecs import gif_encode, gif_encode_animation
    from crawler_ray.stages.media import MediaDecoder

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (5, 3), dtype=np.uint8)
    anim = gif_encode_animation(
        np.stack([pal[rng.randint(0, 5, (10, 14))] for _ in range(4)])
    )
    still = gif_encode(pal[rng.randint(0, 5, (10, 14))])
    tbl = pa.table({
        "ref": ["a.gif", "b.gif"],
        "payload": [anim, still],
        "kind": ["video", "image"],
    })
    out = (
        rd.from_arrow(tbl)
        .map_batches(MediaDecoder, batch_size=2, concurrency=1, batch_format="pyarrow")
        .to_pandas()
        .sort_values("ref")
    )
    assert list(out["decoded_kind"]) == ["video", "image"]
    assert list(out["decoded_frames"]) == [4, 1]
    assert out["decode_ok"].all()


# ------------------------------------------------------------------- MP4


def test_mp4_mjpeg_roundtrip_and_demux():
    """ISO BMFF: real box walk + sample tables; MJPEG samples decode
    within the JPEG codec's PSNR bound; multi-chunk stsc/stco layouts
    demux identically to the single-chunk default."""
    from crawler_ray.stages.codecs import mp4_decode, mp4_mjpeg_encode, mp4_probe

    rng = np.random.RandomState(3)
    base = rng.randint(60, 196, size=(24, 40, 3)).astype(np.float32)
    frames = np.stack(
        [np.clip(base + 5 * i, 0, 255).astype(np.uint8) for i in range(7)]
    )
    p = mp4_mjpeg_encode(frames, fps=25, quality=90)
    info = mp4_probe(p)
    t = info["tracks"][0]
    assert (t["codec"], t["kind"], t["width"], t["height"], t["n_samples"]) == (
        "jpeg", "vide", 40, 24, 7,
    )
    out, fps = mp4_decode(p)
    assert out.shape == frames.shape and abs(fps - 25) < 1
    mse = ((out.astype(np.float32) - frames.astype(np.float32)) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) > 28

    # multi-chunk container (3 chunks incl. a short tail) → same frames
    p3 = mp4_mjpeg_encode(frames, fps=25, quality=90, samples_per_chunk=3)
    t3 = mp4_probe(p3)["tracks"][0]
    assert t3["n_samples"] == 7 and len(t3["spans"]) == 7
    out3, _ = mp4_decode(p3)
    assert (out3 == out).all()

    # truncation at any cut raises ValueError (moov trails mdat)
    for k in range(1, len(p), 53):
        with pytest.raises((ValueError, NotImplementedError)):
            mp4_decode(p[:k])


def test_mp4_through_media_stage(ray_session):
    """.mp4 refs in synth_media_table carry real MP4-MJPEG payloads and
    decode through the actor-pool stage with true frame counts."""
    import ray.data as rd

    from crawler_ray.stages.media import MediaDecoder, synth_media_table

    refs = [f"http://m.test/clip{i}.mp4" for i in range(3)]
    tbl = synth_media_table(refs)
    assert bytes(tbl["payload"][0].as_py())[4:8] == b"ftyp"
    out = (
        rd.from_arrow(tbl)
        .map_batches(MediaDecoder, batch_size=2, concurrency=1, batch_format="pyarrow")
        .to_pandas()
    )
    assert out["decode_ok"].all() and (out["decoded_kind"] == "video").all()
    assert (out["decoded_frames"] == out["meta"].map(lambda m: m["frames"])).all()
    assert (out["decoded_width"] == out["meta"].map(lambda m: m["width"])).all()


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_jpeg_restart_intervals(subsampling):
    """DRI/RSTn (the camera-JPEG convention): restart markers
    byte-align the stream and reset DC predictors; decoded pixels are
    bit-identical to the no-restart encoding, across the RSTn modulo
    cycle and both subsampling layouts."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (45, 61, 3)).astype(np.uint8)
    plain = jpeg_decode(jpeg_encode(img, 80, subsampling))
    for ri in (1, 2, 7):
        enc = jpeg_encode(img, 80, subsampling, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI present
        assert (jpeg_decode(enc) == plain).all()
    # >8 restarts: the RSTn marker index wraps mod 8
    big = rng.randint(0, 256, (96, 96, 3)).astype(np.uint8)
    assert (
        jpeg_decode(jpeg_encode(big, 70, subsampling, restart_interval=2))
        == jpeg_decode(jpeg_encode(big, 70, subsampling))
    ).all()
    # progressive streams honor restarts too: every scan restarts its
    # own modulo count (DC predictors / EOB runs reset per interval)
    from crawler_ray.stages.codecs import jpeg_encode_progressive

    prog_plain = jpeg_decode(jpeg_encode_progressive(img, 80, subsampling))
    for ri in (1, 3):
        enc = jpeg_encode_progressive(img, 80, subsampling, restart_interval=ri)
        assert b"\xff\xdd" in enc
        assert (jpeg_decode(enc) == prog_plain).all()


def test_jpeg_grayscale_and_16bit_dqt():
    """Single-component grayscale JPEG (document/scan streams) encodes
    via the 2-D jpeg_encode path and decodes through the existing
    1-component branch; 16-bit (Pq=1) quantization tables decode
    identically to their 8-bit twins."""
    yy, xx = np.mgrid[0:37, 0:49]
    gray = np.clip(127 + 90 * np.sin(xx / 6) + 30 * np.cos(yy / 9), 0, 255).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(gray, 85))
    assert dec.shape == (37, 49, 3) and (dec[..., 0] == dec[..., 1]).all()
    assert _psnr(np.stack([gray] * 3, -1), dec) > 40
    # restart markers in the single-component scan
    assert (jpeg_decode(jpeg_encode(gray, 85, restart_interval=3)) == dec).all()

    # widen every DQT to Pq=1 (16-bit big-endian): decode must not change
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (24, 31, 3)).astype(np.uint8)
    data = jpeg_encode(img, 80)
    ref = jpeg_decode(data)
    out = bytearray()
    i = 0
    while i < len(data):
        if data[i] == 0xFF and data[i + 1] == 0xDB:
            (ln,) = struct.unpack_from(">H", data, i + 2)
            body = data[i + 4 : i + 2 + ln]
            nb = bytearray()
            j = 0
            while j < len(body):
                nb.append((1 << 4) | (body[j] & 0xF))
                for v in body[j + 1 : j + 65]:
                    nb += struct.pack(">H", v)
                j += 65
            out += b"\xff\xdb" + struct.pack(">H", len(nb) + 2) + nb
            i += 2 + ln
        else:
            out.append(data[i])
            i += 1
    assert (jpeg_decode(bytes(out)) == ref).all()


# ------------------------------------------------------------------- APNG


def _apng_reference_compose(specs, sw, sh):
    """Independent scalar-loop compositor for the APNG rendering model
    (blend SOURCE/OVER + dispose none/background/previous)."""
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    out = []
    for s in specs:
        img = s["image"]
        if img.shape[2] == 3:
            img = np.concatenate(
                [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2
            )
        x, y = s.get("left", 0), s.get("top", 0)
        h, w = img.shape[:2]
        saved = canvas.copy() if s.get("dispose", 0) == 2 else None
        for r in range(h):
            for c in range(w):
                if s.get("blend", 0) == 0:
                    canvas[y + r, x + c] = img[r, c]
                else:
                    sa = img[r, c, 3] / 255.0
                    da = canvas[y + r, x + c, 3] / 255.0
                    oa = sa + da * (1 - sa)
                    if oa > 1e-12:
                        rgb = (
                            img[r, c, :3] * sa
                            + canvas[y + r, x + c, :3] * da * (1 - sa)
                        ) / oa
                        canvas[y + r, x + c, :3] = np.clip(np.rint(rgb), 0, 255)
                    canvas[y + r, x + c, 3] = np.clip(np.rint(oa * 255), 0, 255)
        out.append(canvas.copy())
        if s.get("dispose", 0) == 1:
            canvas[y : y + h, x : x + w] = 0
        elif s.get("dispose", 0) == 2:
            canvas = saved
    return np.stack(out)


def test_apng_full_canvas_roundtrip_lossless():
    """Full-canvas SOURCE frames roundtrip byte-exact (APNG is
    lossless); delays survive; png_is_animated discriminates at the
    chunk level; plain png_decode still reads the default image."""
    from crawler_ray.stages.codecs import (
        apng_decode_frames,
        apng_encode_animation,
        png_decode,
        png_encode,
        png_is_animated,
    )

    rng = np.random.RandomState(13)
    stack = rng.randint(0, 256, size=(4, 9, 11, 4), dtype=np.uint8)
    stack[0, :, :, 3] = 255  # frame 0 fully opaque (it is the default image)
    payload = apng_encode_animation(
        [{"image": f, "delay_ms": 25 * (i + 1)} for i, f in enumerate(stack)]
    )
    assert png_is_animated(payload)
    assert not png_is_animated(png_encode(stack[0]))
    frames, delays = apng_decode_frames(payload)
    assert frames.shape == (4, 9, 11, 4)
    assert (frames == stack).all()
    assert delays == [25, 50, 75, 100]
    # the default image (frame 0) is also a plain PNG decode
    assert (png_decode(payload) == stack[0]).all()


def test_apng_blend_dispose_composition():
    """Partial frames at offsets with OVER blending and all three
    dispose ops composite exactly per the spec's rendering model
    (checked against an independent scalar compositor)."""
    from crawler_ray.stages.codecs import apng_decode_frames, apng_encode_animation

    rng = np.random.RandomState(7)
    sw, sh = 16, 12

    def block(h, w, alpha=None):
        img = rng.randint(0, 256, size=(h, w, 4), dtype=np.uint8)
        img[:, :, 3] = 255 if alpha is None else alpha
        return img

    specs = [
        {"image": block(12, 16), "dispose": 0, "delay_ms": 10},
        # semi-transparent over-blend, then clear its rect to transparent
        {"image": block(5, 6, alpha=128), "left": 4, "top": 2,
         "blend": 1, "dispose": 1, "delay_ms": 20},
        # draws, then the canvas reverts to the pre-frame state
        {"image": block(4, 5), "left": 10, "top": 7, "dispose": 2, "delay_ms": 30},
        # over-blend onto the now partially-transparent canvas region
        {"image": block(6, 7, alpha=200), "left": 3, "top": 1,
         "blend": 1, "dispose": 0, "delay_ms": 40},
    ]
    payload = apng_encode_animation(specs, size=(sw, sh))
    frames, delays = apng_decode_frames(payload)
    expected = _apng_reference_compose(specs, sw, sh)
    assert frames.shape == (4, sh, sw, 4)
    assert delays == [10, 20, 30, 40]
    assert (frames == expected).all()

    # contract errors refused by name
    with pytest.raises(ValueError, match="full canvas"):
        apng_encode_animation([{"image": specs[1]["image"]}], size=(sw, sh))
    with pytest.raises(ValueError, match="exceeds"):
        apng_encode_animation(
            [specs[0], {"image": specs[2]["image"], "left": 14, "top": 10}],
            size=(sw, sh),
        )

    # truncation never escapes ValueError
    for k in range(1, len(payload), 7):
        try:
            apng_decode_frames(payload[:k])
        except ValueError:
            pass


def test_apng_through_media_stage(ray_session):
    """Multi-frame APNGs classify as video in MediaDecoder (alpha
    dropped for the featurizers); plain PNGs stay images."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.codecs import apng_encode_animation, png_encode
    from crawler_ray.stages.media import MediaDecoder

    rng = np.random.RandomState(3)
    anim = apng_encode_animation(
        rng.randint(0, 256, size=(3, 10, 14, 3), dtype=np.uint8)
    )
    still = png_encode(rng.randint(0, 256, size=(10, 14, 3), dtype=np.uint8))
    tbl = pa.table({
        "ref": ["a.png", "b.png"],
        "payload": [anim, still],
        "kind": ["video", "image"],
    })
    out = (
        rd.from_arrow(tbl)
        .map_batches(MediaDecoder, batch_size=2, concurrency=1, batch_format="pyarrow")
        .to_pandas()
        .sort_values("ref")
    )
    assert list(out["decoded_kind"]) == ["video", "image"]
    assert list(out["decoded_frames"]) == [3, 1]
    assert out["decode_ok"].all()


# ------------------------------------------------------------ intra H.264


def test_h264_ipcm_roundtrip_bit_exact():
    """Intra-only H.264 (stages/h264.py): I_PCM macroblock streams
    reconstruct BIT-EXACTLY against the 4:2:0 conversion reference
    path (everything between — NAL escaping, SPS/PPS, slice headers,
    macroblock walk, cropping — is lossless by construction); smooth
    content survives chroma subsampling at high PSNR."""
    from crawler_ray.stages.h264 import (
        _from_420,
        _to_420,
        h264_decode,
        h264_encode,
    )

    rng = np.random.RandomState(11)
    # random bytes force 00 00 runs in PCM data → EBSP escaping is hot
    frames = rng.randint(0, 256, size=(3, 38, 54, 3), dtype=np.uint8)
    frames[0, :8, :8] = 0  # guaranteed zero runs
    sps, pps, aus = h264_encode(frames)
    dec = h264_decode([sps, pps] + aus)
    expected = np.stack([_from_420(*_to_420(f), 54, 38) for f in frames])
    assert dec.shape == (3, 38, 54, 3)
    assert (dec == expected).all()

    # smooth gradient: chroma subsampling is the only loss
    xx, yy = np.meshgrid(np.linspace(0, 255, 64), np.linspace(0, 255, 32))
    smooth = np.stack([xx, yy, (xx + yy) / 2], axis=-1).astype(np.uint8)[None]
    s, p, a = h264_encode(smooth)
    rec = h264_decode([s, p] + a)
    err = (rec.astype(float) - smooth.astype(float)) ** 2
    psnr = 10 * np.log10(255**2 / max(err.mean(), 1e-9))
    assert psnr > 38, psnr

    # 4:2:0 cropping units make odd display dims inexpressible
    with pytest.raises(ValueError, match="even"):
        h264_encode(rng.randint(0, 256, size=(1, 37, 53, 3), dtype=np.uint8))


def test_h264_named_gates():
    """Unsupported bitstream features are refused at the exact syntax
    element, by name: CABAC (PPS), inter slices (slice_type), and
    transform-coded intra macroblocks (mb_type) — the documented
    boundary of the keyframe-sampling decoder."""
    from crawler_ray.stages.h264 import (
        _BitWriter,
        _ebsp,
        _pps_rbsp,
        _sps_rbsp,
        _unebsp,
        h264_decode,
        h264_decode_frame,
        parse_pps,
        parse_sps,
    )

    sps = parse_sps(_sps_rbsp(32, 32))
    pps = parse_pps(_pps_rbsp(26))

    # CABAC: PPS entropy_coding_mode_flag = 1
    bw = _BitWriter()
    bw.ue(0); bw.ue(0); bw.u(1, 1)  # pps/sps id, CABAC
    bw.u(0, 1); bw.ue(0); bw.ue(0); bw.ue(0)
    bw.u(0, 1); bw.u(0, 2); bw.se(0); bw.se(0); bw.se(0)
    bw.u(1, 1); bw.u(0, 1); bw.u(0, 1); bw.trailing()
    with pytest.raises(NotImplementedError, match="CABAC"):
        parse_pps(bw.bytes())

    # inter slice: slice_type 0 (P) in a non-IDR NAL
    bw = _BitWriter()
    bw.ue(0); bw.ue(0)  # first_mb, slice_type P
    bw.ue(0); bw.u(0, 4)
    bw.trailing()
    with pytest.raises(NotImplementedError, match="inter"):
        h264_decode_frame(b"\x61" + _ebsp(bw.bytes()), sps, pps)

    # transform-coded intra macroblock: mb_type 1 (Intra_16x16)
    bw = _BitWriter()
    bw.ue(0); bw.ue(7); bw.ue(0); bw.u(0, 4); bw.ue(0)
    bw.u(0, 1); bw.u(0, 1); bw.se(0); bw.ue(1)
    bw.ue(1)  # mb_type Intra_16x16
    bw.trailing()
    with pytest.raises(NotImplementedError, match="CAVLC"):
        h264_decode_frame(b"\x65" + _ebsp(bw.bytes()), sps, pps)

    # EBSP escaping is reversible on adversarial zero runs
    probe = b"\x00\x00\x00\x00\x01\x00\x00\x02\x00\x00\x03\x03"
    assert _unebsp(_ebsp(probe)) == probe


def test_mp4_h264_roundtrip_and_stage(ray_session):
    """avc1-in-MP4: avcC configuration record parsed from the sample
    entry, length-prefixed NAL samples decode bit-exactly, and .mp4
    payloads flow through MediaDecoder as real video; truncation never
    escapes ValueError."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.codecs import mp4_decode, mp4_h264_encode, mp4_probe
    from crawler_ray.stages.h264 import _from_420, _to_420
    from crawler_ray.stages.media import MediaDecoder

    rng = np.random.RandomState(21)
    frames = rng.randint(0, 256, size=(4, 24, 32, 3), dtype=np.uint8)
    payload = mp4_h264_encode(frames, fps=12)
    tr = mp4_probe(payload)["tracks"][0]
    assert tr["codec"] == "avc1" and tr["avcC"] is not None
    assert (tr["width"], tr["height"], tr["n_samples"]) == (32, 24, 4)
    dec, fps = mp4_decode(payload)
    expected = np.stack([_from_420(*_to_420(f), 32, 24) for f in frames])
    assert (dec == expected).all()
    assert abs(fps - 12.0) < 0.1

    out = (
        rd.from_arrow(pa.table({"ref": ["kf.mp4"], "payload": [payload]}))
        .map_batches(MediaDecoder, batch_size=1, concurrency=1, batch_format="pyarrow")
        .to_pandas()
    )
    assert out["decode_ok"].all()
    assert list(out["decoded_kind"]) == ["video"]
    assert list(out["decoded_frames"]) == [4]

    for k in range(1, len(payload), 101):
        try:
            mp4_decode(payload[:k])
        except (ValueError, NotImplementedError):
            pass


def test_mp4_selective_decode_and_frame_sampler(ray_session):
    """mp4_decode(sample_indices=...) decodes exactly the selected
    intra samples (bit-equal to the same frames of a full decode, both
    MJPEG and avc1), and the FrameSampler stage demux→select→decode
    path emits true per-clip counts with decode_ok evidence; junk and
    truncation degrade, never escape."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.codecs import (
        mp4_decode,
        mp4_h264_encode,
        mp4_mjpeg_encode,
    )
    from crawler_ray.stages.media import FrameSampler

    rng = np.random.RandomState(5)
    vids = [rng.randint(0, 256, size=(n, 24, 32, 3), dtype=np.uint8) for n in (1, 3, 5)]
    payloads = [
        mp4_h264_encode(vids[0], fps=10),
        mp4_mjpeg_encode(vids[1], fps=10, quality=80),
        mp4_h264_encode(vids[2], fps=10),
        b"not a video at all",
    ]
    for p, v in zip(payloads[:3], vids):
        full, _ = mp4_decode(p)
        k = min(2, v.shape[0])
        sel = np.unique(np.linspace(0, v.shape[0] - 1, k, dtype=int))
        got, _ = mp4_decode(p, sample_indices=sel.tolist())
        assert (got == full[sel]).all()
    with pytest.raises(ValueError, match="out of range"):
        mp4_decode(payloads[0], sample_indices=[99])

    out = (
        rd.from_arrow(pa.table({"payload": payloads}))
        .map_batches(FrameSampler, fn_constructor_kwargs={"max_frames": 2},
                     batch_size=2, concurrency=1, batch_format="pyarrow")
        .to_pandas()
    )
    assert list(out["decode_ok"]) == [True, True, True, False]
    assert list(out["codec"]) == ["avc1", "jpeg", "avc1", "unknown"]
    assert list(out["n_samples"]) == [1, 3, 5, 0]
    assert list(out["n_sampled"]) == [1, 2, 2, 0]
    assert (out["mean_luma"][:3] > 0).all()

    # truncation at any cut degrades to decode_ok=False, never raises
    cut = payloads[2][: len(payloads[2]) // 2]
    out2 = (
        rd.from_arrow(pa.table({"payload": [cut]}))
        .map_batches(FrameSampler, batch_size=1, concurrency=1, batch_format="pyarrow")
        .to_pandas()
    )
    assert not out2["decode_ok"].any()


def test_h264_deblocking_on_header_is_exact():
    """A conformant stream may leave deblocking ON (idc != 1, alpha/
    beta offsets in the header): no filtering ever applies to all-
    I_PCM pictures (QpY=0 -> edge QP index <= 12 < 16 -> alpha 0), so
    the decoder consumes the offsets and reconstructs bit-exactly."""
    from crawler_ray.stages.h264 import (
        _BitWriter,
        _ebsp,
        _encode_frame_ipcm,
        _pps_rbsp,
        _sps_rbsp,
        _to_420,
        h264_decode_frame,
        parse_pps,
        parse_sps,
    )

    rng = np.random.RandomState(17)
    frame = rng.randint(0, 256, size=(32, 48, 3), dtype=np.uint8)
    y, cb, cr = _to_420(frame)
    sps = parse_sps(_sps_rbsp(48, 32))
    pps = parse_pps(_pps_rbsp(26))

    # rebuild the encoder's slice but with deblocking ON + max offsets
    bw = _BitWriter()
    bw.ue(0); bw.ue(7); bw.ue(0); bw.u(0, 4); bw.ue(0)
    bw.u(0, 1); bw.u(0, 1); bw.se(0)
    bw.ue(0)          # disable_deblocking_filter_idc = 0 (ON)
    bw.se(6); bw.se(6)  # max alpha/beta offsets
    for my in range(2):
        for mx in range(3):
            bw.ue(25)
            bw.align_zero()
            bw.raw_bytes(y[my*16:my*16+16, mx*16:mx*16+16].tobytes())
            bw.raw_bytes(cb[my*8:my*8+8, mx*8:mx*8+8].tobytes())
            bw.raw_bytes(cr[my*8:my*8+8, mx*8:mx*8+8].tobytes())
    bw.trailing()
    dec = h264_decode_frame(b"\x65" + _ebsp(bw.bytes()), sps, pps)

    # reference: the encoder's own (deblocking-off) slice
    ref = h264_decode_frame(b"\x65" + _ebsp(_encode_frame_ipcm(y, cb, cr)), sps, pps)
    assert (dec == ref).all()


def test_h264_corruption_never_escapes():
    """Truncating any NAL at any cut, or flipping any single byte of
    the stream, must either decode (PCM sample corruption is legal
    garbage) or raise ValueError/NotImplementedError — never an
    IndexError/OverflowError/MemoryError (a flipped SPS width field
    must NOT drive a giant frame allocation: parse_sps refuses >1024
    MBs per side)."""
    from crawler_ray.stages.h264 import h264_decode, h264_encode

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, size=(1, 16, 16, 3), dtype=np.uint8)
    sps, pps, aus = h264_encode(frames)
    nals = [sps, pps] + aus

    def attempt(mut):
        try:
            h264_decode(mut)
        except (ValueError, NotImplementedError):
            pass

    for i, nal in enumerate(nals):
        step = 1 if len(nal) < 64 else 3
        for k in range(1, len(nal), step):
            mut = list(nals)
            mut[i] = nal[:k]
            attempt(mut)
        ba = bytearray(nal)
        for pos in range(0, len(ba), step):
            orig = ba[pos]
            for flip in (0x01, 0x5A, 0xFF):
                ba[pos] = orig ^ flip
                mut = list(nals)
                mut[i] = bytes(ba)
                attempt(mut)
            ba[pos] = orig


def test_bmp_roundtrip_paddings_depths_orientation():
    """24-bit RGB at every 4-byte padding residue, 8-bit palette gray,
    bottom-up AND top-down — all byte-exact roundtrips."""
    import numpy as np

    from crawler_ray.stages.codecs import bmp_decode, bmp_encode

    rng = np.random.RandomState(11)
    for w in (1, 2, 3, 4, 5, 17):
        for h in (1, 3, 8):
            img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            assert np.array_equal(bmp_decode(bmp_encode(img)), img)
            assert np.array_equal(
                bmp_decode(bmp_encode(img, top_down=True)), img
            )
            g = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
            assert np.array_equal(
                bmp_decode(bmp_encode(g)), np.stack([g] * 3, axis=-1)
            )


def test_bmp_refusals_and_truncation_fuzz():
    """Every strict prefix raises ValueError; unsupported features are
    refused by name (RLE compression, 16-bit depth, core header)."""
    import struct

    import numpy as np
    import pytest

    from crawler_ray.stages.codecs import bmp_decode, bmp_encode

    full = bytearray(
        bmp_encode(np.random.RandomState(3).randint(
            0, 256, size=(5, 5, 3)).astype(np.uint8))
    )
    for cut in range(len(full)):
        with pytest.raises(ValueError):
            bmp_decode(bytes(full[:cut]))
    bmp_decode(bytes(full))  # the untouched stream still decodes

    rle = bytearray(full)
    struct.pack_into("<I", rle, 30, 1)  # biCompression = BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        bmp_decode(bytes(rle))
    b16 = bytearray(full)
    struct.pack_into("<H", b16, 28, 16)
    with pytest.raises(ValueError, match="depth"):
        bmp_decode(bytes(b16))
    core = bytearray(full)
    struct.pack_into("<I", core, 14, 12)  # BITMAPCOREHEADER
    with pytest.raises(ValueError, match="header"):
        bmp_decode(bytes(core))


def test_bmp_through_media_decoder_stage(ray_session):
    """BMP payloads flow through the MediaDecoder actor pool like any
    other container; a corrupt BMP degrades to decode_ok=False."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.codecs import bmp_encode
    from crawler_ray.stages.media import MediaDecoder

    img = np.random.RandomState(5).randint(0, 256, size=(9, 7, 3)).astype(np.uint8)
    good = bmp_encode(img)
    bad = good[: len(good) // 2]
    ds = rd.from_arrow(
        pa.table({"payload": pa.array([good, bad], type=pa.large_binary())})
    )
    out = ds.map_batches(
        MediaDecoder, batch_size=2, concurrency=1, batch_format="pyarrow"
    ).to_pandas()
    ok = out[out["decode_ok"]]
    assert len(ok) == 1
    assert ok.iloc[0]["decoded_kind"] == "image"
    assert ok.iloc[0]["decoded_width"] == 7 and ok.iloc[0]["decoded_height"] == 9
    assert (~out["decode_ok"]).sum() == 1


def test_tiff_roundtrip_orders_strips_packbits():
    """Both byte orders x strip heights x none/PackBits, RGB and gray,
    all byte-exact roundtrips (incl. single-pixel and tall-thin)."""
    import numpy as np

    from crawler_ray.stages.codecs import tiff_decode, tiff_encode

    rng = np.random.RandomState(21)
    for shape in ((1, 1, 3), (5, 7, 3), (12, 16, 3), (9, 4), (33, 2)):
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        for be in (False, True):
            for rps in (None, 1, 4):
                for pb in (False, True):
                    back = tiff_decode(
                        tiff_encode(img, big_endian=be,
                                    rows_per_strip=rps, packbits=pb)
                    )
                    assert np.array_equal(back, img), (shape, be, rps, pb)
    # PackBits actually compresses constant data
    from crawler_ray.stages.codecs import _packbits_encode

    flat = bytes(1000)
    assert len(_packbits_encode(flat)) < 20


def test_tiff_refusals_and_truncation_fuzz():
    """Every strict prefix of a multi-strip PackBits TIFF raises
    ValueError; LZW / planar=2 / 16-bit are refused by name."""
    import struct

    import numpy as np
    import pytest

    from crawler_ray.stages.codecs import tiff_decode, tiff_encode

    img = np.random.RandomState(5).randint(0, 256, size=(6, 5, 3)).astype(np.uint8)
    for be in (False, True):
        full = tiff_encode(img, big_endian=be, rows_per_strip=2, packbits=True)
        for cut in range(len(full)):
            with pytest.raises(ValueError):
                tiff_decode(full[:cut])
        assert np.array_equal(tiff_decode(full), img)

    # unsupported-feature refusals: patch the Compression tag to LZW (5)
    full = bytearray(tiff_encode(img))
    n_ent = struct.unpack_from("<H", full, 8)[0]
    patched = False
    for i in range(n_ent):
        base = 10 + 12 * i
        tag = struct.unpack_from("<H", full, base)[0]
        if tag == 259:
            struct.pack_into("<H", full, base + 8, 5)
            patched = True
    assert patched
    with pytest.raises(ValueError, match="compression"):
        tiff_decode(bytes(full))


def test_tiff_through_media_decoder_stage(ray_session):
    """TIFF payloads flow through the actor-pool MediaDecoder like any
    other container; a corrupt one degrades to decode_ok=False."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.codecs import tiff_encode
    from crawler_ray.stages.media import MediaDecoder

    rng = np.random.RandomState(8)
    payloads = []
    for i in range(6):
        img = rng.randint(0, 256, size=(8 + i, 9, 3)).astype(np.uint8)
        payloads.append(
            tiff_encode(img, big_endian=i % 2 == 1,
                        rows_per_strip=1 + i % 3, packbits=i % 2 == 0)
        )
    payloads.append(payloads[0][: len(payloads[0]) // 2])  # corrupt
    t = pa.table(
        {"doc_id": pa.array(range(len(payloads)), type=pa.int64()),
         "payload": pa.array(payloads, type=pa.large_binary())}
    )
    out = (
        rd.from_arrow(t)
        .map_batches(MediaDecoder, concurrency=1, batch_size=4,
                     batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["decode_ok"].tolist() == [True] * 6 + [False]
    assert (out.loc[out["decode_ok"], "decoded_kind"] == "image").all()
    assert (out.loc[out["decode_ok"], "decoded_frames"] == 1).all()
