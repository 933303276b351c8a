"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / resize / feature-extract / frame-sample as
actor-pool map_batches stages.

Decoding tiers (the container has no image/audio libraries):
  * REAL pure-numpy/stdlib codecs — PPM (P6) images, RIFF/PCM WAV
    audio (``wave`` is stdlib), and the COMPRESSED image formats via
    stages/codecs.py: PNG (zlib + all five scanline filters, lossless
    roundtrip) and baseline JPEG (Annex K DCT/Huffman, 4:4:4 and
    4:2:0), all encode+decode pairs with tests;
  * the deterministic FAKE wire format for fixture payloads;
  * VIDEO codecs (MP4/H.264) are the one remaining stub: probed behind
    an import-try (``PIL``/ffmpeg absent) with a clearly-marked
    NotImplementedError — swap in a codec lib in production.
Everything AROUND the decode — the Arrow schema, batch sizing for
large binary rows, the actor signature (codec state in ``__init__``),
and the output layout — is real and tested.

Schema:
    media(media_ref: string, kind: string ∈ {image,audio,video},
          payload: large_binary,
          meta: struct<width:int32, height:int32, frames:int32,
                       sample_rate:int32>)

Payload wire format (deterministic fake): b"FAKE" + kind byte +
width(u16) + height(u16) + frames(u16) + seed(u32) — the "pixels" are
a seeded deterministic array, so decode → features is reproducible.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

MEDIA_META = pa.struct(
    [
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("frames", pa.int32()),
        pa.field("sample_rate", pa.int32()),
    ]
)
MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("payload", pa.large_binary()),
        pa.field("meta", MEDIA_META),
    ]
)

_KIND_BYTE = {"image": 1, "audio": 2, "video": 3}
_BYTE_KIND = {v: k for k, v in _KIND_BYTE.items()}

try:  # pragma: no cover — not installed in this container
    from PIL import Image  # type: ignore

    HAVE_PIL = True
except ImportError:
    Image = None
    HAVE_PIL = False


def fake_payload(kind: str, width: int, height: int, frames: int, seed: int) -> bytes:
    return b"FAKE" + struct.pack("<BHHHI", _KIND_BYTE[kind], width, height, frames, seed)


def synth_media_table(media_refs: list[str], seed: int = 42) -> pa.Table:
    """Deterministic media assets for a list of media_ref URLs (the
    media spans of the synthetic graph): sizes/frames derived from the
    URL hash.  ``.png``/``.jpg``/``.jpeg`` refs get REAL compressed
    payloads (stages/codecs.py) so the decode stage runs the actual
    codecs; other refs get the fake wire format."""
    import hashlib

    rows = []
    for ref in media_refs:
        h = int.from_bytes(hashlib.blake2b(ref.encode(), digest_size=8).digest(), "little")
        kind = "video" if ref.endswith((".mp4", ".webm", ".avi")) else (
            "audio" if ref.endswith(".mp3") else "image"
        )
        w = 64 + (h % 192)
        ht = 64 + ((h >> 8) % 192)
        frames = 1 if kind == "image" else 8 + (h >> 16) % 24
        if ref.endswith((".png", ".jpg", ".jpeg", ".gif")):
            from .codecs import (
                gif_encode,
                jpeg_encode,
                jpeg_encode_progressive,
                png_encode,
            )

            rng = np.random.RandomState((h >> 32) & 0xFFFFFFFF)
            if ref.endswith(".gif"):  # GIF: ≤256 colors by construction
                pal = rng.randint(0, 256, size=(32, 3), dtype=np.uint8)
                img = pal[rng.randint(0, 32, size=(ht, w))]
                payload = gif_encode(img)
            else:
                img = rng.randint(0, 256, size=(ht, w, 3), dtype=np.uint8)
                if ref.endswith(".png"):
                    payload = png_encode(img)
                elif ref.endswith(".jpeg"):  # .jpeg refs get PROGRESSIVE
                    payload = jpeg_encode_progressive(img, 85)
                else:
                    payload = jpeg_encode(img, 85)
        elif ref.endswith((".avi", ".mp4")):
            from .codecs import avi_mjpeg_encode, mp4_h264_encode, mp4_mjpeg_encode

            rng = np.random.RandomState((h >> 32) & 0xFFFFFFFF)
            frames = min(frames, 8)  # keep synthetic payloads small
            if ref.endswith(".mp4") and (h >> 16) & 1:
                # half the .mp4 refs carry intra-only H.264 (avc1 +
                # avcC) instead of MJPEG, exercising the h264.py
                # keyframe path through the same stage; 4:2:0 crop
                # units can't express odd display dims, so evenize
                # (w parity tracks h parity, so a dim-parity gate
                # would never fire — gate on an independent hash bit)
                w, ht = w & ~1, ht & ~1
                vid = rng.randint(0, 256, size=(frames, ht, w, 3), dtype=np.uint8)
                rows.append({
                    "media_ref": ref, "kind": kind,
                    "payload": mp4_h264_encode(vid, fps=10),
                    "meta": {"width": w, "height": ht, "frames": frames,
                             "sample_rate": 0},
                })
                continue
            vid = rng.randint(0, 256, size=(frames, ht, w, 3), dtype=np.uint8)
            enc = avi_mjpeg_encode if ref.endswith(".avi") else mp4_mjpeg_encode
            payload = enc(vid, fps=10, quality=80)
        else:
            payload = fake_payload(kind, w, ht, frames, (h >> 32) & 0xFFFFFFFF)
        rows.append(
            {
                "media_ref": ref,
                "kind": kind,
                "payload": payload,
                "meta": {"width": w, "height": ht, "frames": frames, "sample_rate": 0},
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


# --- real uncompressed codecs (pure numpy / stdlib) -----------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 (maxval 255, no comments —
    the common subset every P6 writer emits)."""
    head, rest = payload.split(b"\n255\n", 1)
    magic, dims = head.split(b"\n", 1)
    assert magic == b"P6", "not a P6 PPM"
    w, h = (int(x) for x in dims.split())
    arr = np.frombuffer(rest, dtype=np.uint8, count=h * w * 3)
    return arr.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 PCM → RIFF/WAV via the stdlib ``wave`` module."""
    import io
    import wave

    assert samples.dtype == np.int16 and samples.ndim == 1
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV (16-bit mono PCM) → (samples int16, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        assert wf.getsampwidth() == 2 and wf.getnchannels() == 1
        rate = wf.getframerate()
        samples = np.frombuffer(wf.readframes(wf.getnframes()), dtype=np.int16)
    return samples, rate


class _FakeCodec:
    """Magic-byte dispatch: real PPM/PNG/JPEG/WAV decoders, the
    deterministic fake wire format for fixtures, and a clearly-marked
    NotImplementedError for the remaining stub (video).

    Returns (kind, arr): image/video arr is (frames, h, w, 3) uint8;
    audio arr is 1-D int16 samples."""

    @staticmethod
    def decode(payload: bytes) -> tuple[str, np.ndarray]:
        if payload.startswith(b"P6"):
            return "image", decode_ppm(payload)[None]
        if payload.startswith(b"\x89PNG\r\n\x1a\n"):
            from .codecs import apng_decode_frames, png_decode, png_is_animated

            if png_is_animated(payload):
                frames, _delays = apng_decode_frames(payload)
                kind = "video" if frames.shape[0] > 1 else "image"
                return kind, frames[:, :, :, :3]
            img = png_decode(payload)
            if img.ndim == 2:  # gray → 3-channel for the featurizers
                img = np.stack([img] * 3, axis=-1)
            return "image", img[:, :, :3][None]  # RGBA drops alpha
        if payload.startswith(b"\xff\xd8"):
            from .codecs import jpeg_decode

            return "image", jpeg_decode(payload)[None]
        if payload.startswith(b"BM") and len(payload) >= 54:
            from .codecs import bmp_decode

            return "image", bmp_decode(payload)[None]
        if payload.startswith((b"II*\x00", b"MM\x00*")):
            from .codecs import tiff_decode

            img = tiff_decode(payload)
            if img.ndim == 2:  # gray → 3-channel for the featurizers
                img = np.stack([img] * 3, axis=-1)
            return "image", img[None]
        if payload.startswith((b"GIF87a", b"GIF89a")):
            from .codecs import gif_decode_frames

            frames, _delays = gif_decode_frames(payload)
            return ("video" if frames.shape[0] > 1 else "image"), frames
        if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
            samples, _rate = decode_wav(payload)
            return "audio", samples
        if payload.startswith(b"RIFF") and payload[8:12] == b"AVI ":
            from .codecs import avi_mjpeg_decode

            frames, _fps = avi_mjpeg_decode(payload)
            return "video", frames
        if len(payload) >= 12 and payload[4:8] == b"ftyp":
            from .codecs import mp4_decode

            # real ISO BMFF demux; MJPEG and intra-only H.264 (avc1
            # I_PCM, stages/h264.py) samples decode; inter-frame
            # codecs (hev1/vp09/...) and non-intra H.264 features
            # raise NotImplementedError by name
            frames, _fps = mp4_decode(payload)
            return "video", frames
        if payload.startswith(b"FAKE"):
            kb, w, h, frames, seed = struct.unpack("<BHHHI", payload[4:15])
            rng = np.random.RandomState(seed)
            arr = rng.randint(0, 256, size=(frames, h, w, 3), dtype=np.uint8)
            return _BYTE_KIND[kb], arr
        raise NotImplementedError(
            "unrecognized media container; PPM/PNG/APNG/baseline-and-"
            "progressive-JPEG/GIF/BMP/TIFF images, AVI-MJPEG, MP4-MJPEG and "
            "intra-only H.264 (avc1 I_PCM) video (the MP4 demux is "
            "real; inter-frame bitstreams like HEVC/VP9 and non-intra "
            "H.264 stay gated — no ffmpeg), PCM WAV audio and the "
            "deterministic fake wire format all decode for real"
        )


class MediaDecoder:
    """Actor-pool stage: codec initialised ONCE per actor; per batch it
    decodes payloads → per-item frame arrays + validated meta.

    Use small ``batch_size`` — rows carry large binary payloads
    (SURVEY.md §7.5 wide-row guidance):

        ds.map_batches(MediaDecoder, batch_size=16, concurrency=4,
                       batch_format="pyarrow")
    """

    def __init__(self):
        self.codec = Image if HAVE_PIL else _FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds, widths, heights, frames_n, ok = [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                kind, arr = _FakeCodec.decode(payload)
                kinds.append(kind)
                if arr.ndim == 1:  # audio: width = sample count
                    frames_n.append(1)
                    heights.append(1)
                    widths.append(len(arr))
                else:
                    frames_n.append(arr.shape[0])
                    heights.append(arr.shape[1])
                    widths.append(arr.shape[2])
                ok.append(True)
            except (NotImplementedError, ValueError, zlib.error, struct.error):
                kinds.append("unknown")
                frames_n.append(0)
                heights.append(0)
                widths.append(0)
                ok.append(False)
        out = batch.append_column("decoded_kind", pa.array(kinds, type=pa.string()))
        out = out.append_column("decoded_width", pa.array(widths, type=pa.int32()))
        out = out.append_column("decoded_height", pa.array(heights, type=pa.int32()))
        out = out.append_column("decoded_frames", pa.array(frames_n, type=pa.int32()))
        return out.append_column("decode_ok", pa.array(ok, type=pa.bool_()))


class FrameSampler:
    """Actor-pool stage: SELECTIVE keyframe sampling over MP4 payloads
    — demux the sample table (``mp4_probe``), pick ≤ ``max_frames``
    evenly-spaced sample indices, and decode ONLY those samples
    (``mp4_decode(sample_indices=...)``).  Every supported MP4 sample
    is intra-coded (MJPEG / avc1 I_PCM), so each selected frame
    decodes standalone and the skipped majority costs no codec CPU —
    the dominant saving for video corpora at scale, where a pipeline
    needs 1–4 frames of evidence per clip, not the clip.  (Contrast
    MediaFeaturizer, which decodes everything THEN samples.)

    Emits per row: ``codec`` fourcc, ``n_samples`` (container total),
    ``n_sampled``, ``mean_luma`` over the sampled frames (pixel-level
    evidence the decode ran), ``decode_ok``.  Non-MP4 payloads and
    corrupt streams degrade to decode_ok=False.  Small batch_size —
    wide binary rows."""

    def __init__(self, max_frames: int = 2):
        self.max_frames = max(1, int(max_frames))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .codecs import mp4_decode, mp4_probe

        codecs_, n_samples, n_sampled, luma, ok = [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                if len(payload) < 12 or payload[4:8] != b"ftyp":
                    raise ValueError("not an ISO BMFF payload")
                video = [
                    t for t in mp4_probe(payload)["tracks"] if t["kind"] == "vide"
                ]
                if not video:
                    raise ValueError("MP4 holds no video track")
                tr = video[0]
                n = tr["n_samples"]
                sel = np.unique(
                    np.linspace(0, n - 1, min(self.max_frames, n), dtype=int)
                )
                frames, _fps = mp4_decode(payload, sample_indices=sel.tolist())
                y = (
                    0.299 * frames[..., 0].astype(np.float64)
                    + 0.587 * frames[..., 1]
                    + 0.114 * frames[..., 2]
                )
                codecs_.append(tr["codec"])
                n_samples.append(n)
                n_sampled.append(int(frames.shape[0]))
                luma.append(float(y.mean()))
                ok.append(True)
            except (NotImplementedError, ValueError, zlib.error, struct.error):
                codecs_.append("unknown")
                n_samples.append(0)
                n_sampled.append(0)
                luma.append(0.0)
                ok.append(False)
        out = batch.append_column("codec", pa.array(codecs_, type=pa.string()))
        out = out.append_column("n_samples", pa.array(n_samples, type=pa.int32()))
        out = out.append_column("n_sampled", pa.array(n_sampled, type=pa.int32()))
        out = out.append_column("mean_luma", pa.array(luma, type=pa.float64()))
        return out.append_column("decode_ok", pa.array(ok, type=pa.bool_()))


class MediaFeaturizer:
    """Actor-pool stage: decode → resize (mean-pool to ``target``²) →
    per-channel mean features; video payloads frame-sampled to
    ``n_frames`` evenly-spaced frames first.  The resize / pooling /
    sampling math is real vectorized numpy — only the codec is fake."""

    def __init__(self, target: int = 16, n_frames: int = 4):
        self.codec = _FakeCodec()
        self.target = target
        self.n_frames = n_frames

    def _resize(self, frame: np.ndarray) -> np.ndarray:
        # box-pool when downscaling, nearest-neighbour when upscaling:
        # every bin is guaranteed >=1 pixel (linspace edges collapse to
        # empty bins when target > source, which NaNs the mean)
        h, w, _ = frame.shape
        ys = (np.arange(self.target + 1) * h) // self.target
        xs = (np.arange(self.target + 1) * w) // self.target
        out = np.zeros((self.target, self.target, 3), dtype=np.float32)
        for i in range(self.target):
            y0 = min(int(ys[i]), h - 1)
            y1 = max(int(ys[i + 1]), y0 + 1)
            for j in range(self.target):
                x0 = min(int(xs[j]), w - 1)
                x1 = max(int(xs[j + 1]), x0 + 1)
                out[i, j] = frame[y0:y1, x0:x1].mean(axis=(0, 1))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            try:
                _kind, arr = self.codec.decode(payload)
            except (NotImplementedError, ValueError, zlib.error, struct.error):
                feats.append([0.0] * 6)
                continue
            if arr.ndim == 1:  # audio: amplitude stats, not pixel stats
                x = arr.astype(np.float64)
                zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                feats.append(
                    [
                        float(x.mean()),
                        float(x.std()),
                        float(np.sqrt((x * x).mean())),  # rms
                        zc / max(len(x) - 1, 1),  # zero-crossing rate
                        float(np.abs(x).max(initial=0.0)),  # peak
                        float(len(x)),
                    ]
                )
                continue
            # frame sampling: evenly spaced
            if arr.shape[0] > self.n_frames:
                sel = np.linspace(0, arr.shape[0] - 1, self.n_frames, dtype=int)
                arr = arr[sel]
            small = np.stack([self._resize(f) for f in arr])
            mean_rgb = small.mean(axis=(0, 1, 2))
            std_rgb = small.std(axis=(0, 1, 2))
            feats.append([*mean_rgb.tolist(), *std_rgb.tolist()])
        return batch.append_column(
            "media_features", pa.array(feats, type=pa.list_(pa.float64(), 6))
        )


def dhash64(frame: np.ndarray) -> int:
    """64-bit difference hash (dHash) of one RGB or grayscale frame:
    integer luma ((r*299 + g*587 + b*114) // 1000), a 9x8
    index-sampled grid, bit = left pixel > right pixel.  Every step is
    invariant under a uniform brightness shift (luma shifts by exactly
    the same constant, adjacent comparisons are unchanged) and under a
    lossless re-encode in ANY container — the perceptual property
    image_dhash_neardup relies on to catch dups that byte-level exact
    dedup cannot.  Pure integer arithmetic, platform-stable."""
    f = frame.astype(np.int64)
    if f.ndim == 3:
        gray = (f[..., 0] * 299 + f[..., 1] * 587 + f[..., 2] * 114) // 1000
    else:
        gray = f
    h, w = gray.shape
    rows = (np.arange(8, dtype=np.int64) * h) // 8
    cols = (np.arange(9, dtype=np.int64) * w) // 9
    g = gray[rows][:, cols]
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


def hamming64(a: int, b: int) -> int:
    """Bit distance between two 64-bit perceptual hashes."""
    return bin(a ^ b).count("1")


AFP_FRAME = 256          # samples per energy frame
AFP_FRAMES = 65          # 65 energies -> 64 adjacent comparisons
AFP_WINDOW = AFP_FRAME * AFP_FRAMES  # fixed 16,640-sample prefix


def afp64(samples: np.ndarray) -> int:
    """64-bit audio fingerprint over a FIXED 16,640-sample prefix
    (65 frames x 256 samples): frame energy E_i = sum(x^2) in exact
    int64, bit i = E_{i+1} > E_i.  Invariant under uniform integer
    gain (x -> g*x scales every E by exactly g^2, comparisons
    unchanged) and under any trailing content past the window
    (padding/truncation-at-source never reaches the prefix) — the
    perceptual property audio_fingerprint_dedup relies on.  Pure
    integer arithmetic, platform-stable.  Raises ValueError when the
    clip is shorter than the window (no fingerprint is better than an
    unstable one)."""
    if samples.ndim != 1 or len(samples) < AFP_WINDOW:
        raise ValueError("audio clip shorter than fingerprint window")
    x = samples[:AFP_WINDOW].astype(np.int64)
    e = (x * x).reshape(AFP_FRAMES, AFP_FRAME).sum(axis=1)
    bits = e[1:] > e[:-1]
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


class AudioFingerprinter:
    """Actor-pool stage: decode WAV payloads through the real RIFF
    reader and emit the 64-bit energy-contour fingerprint per row.
    Same wide-row guidance as ImageDHasher: small batch_size, state
    per actor.  Failed decodes, non-audio payloads, or clips shorter
    than the fingerprint window get hash_ok=False and afp=0."""

    def __init__(self):
        self.codec = _FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, ok = [], []
        for payload in batch["payload"].to_pylist():
            try:
                kind, arr = self.codec.decode(payload)
                if kind != "audio":
                    raise ValueError("not an audio payload")
                hashes.append(int(np.uint64(afp64(arr)).astype(np.int64)))
                ok.append(True)
            except (NotImplementedError, ValueError, zlib.error, struct.error):
                hashes.append(0)
                ok.append(False)
        out = batch.drop_columns(["payload"])
        out = out.append_column("afp", pa.array(hashes, type=pa.int64()))
        return out.append_column("hash_ok", pa.array(ok, type=pa.bool_()))


class ImageDHasher:
    """Actor-pool stage: decode image payloads through the REAL codecs
    (PNG/APNG/JPEG/GIF/PPM via stages/codecs.py) and emit a 64-bit
    perceptual dHash per row.  Same wide-row guidance as MediaDecoder:
    small batch_size, codec state per actor.  Failed decodes or
    non-image payloads get hash_ok=False and dhash=0."""

    def __init__(self):
        self.codec = _FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, ok = [], []
        for payload in batch["payload"].to_pylist():
            try:
                kind, arr = self.codec.decode(payload)
                if kind != "image":
                    raise ValueError("not an image payload")
                # int64 wraparound keeps the full 64 bits as a group key
                hashes.append(int(np.uint64(dhash64(arr[0])).astype(np.int64)))
                ok.append(True)
            except (NotImplementedError, ValueError, zlib.error, struct.error):
                hashes.append(0)
                ok.append(False)
        out = batch.drop_columns(["payload"])
        out = out.append_column("dhash", pa.array(hashes, type=pa.int64()))
        return out.append_column("hash_ok", pa.array(ok, type=pa.bool_()))


def media_refs_from_spans(documents: pa.Table) -> list[str]:
    """Distinct media_ref values of kind='media' spans — the join key
    between the documents table and the media asset table."""
    import pyarrow.compute as pc

    spans = documents.column("spans").combine_chunks()
    flat = pc.list_flatten(spans)
    kinds = flat.field("kind")
    refs = flat.field("media_ref").filter(pc.equal(kinds, "media"))
    return sorted(set(r for r in refs.to_pylist() if r))
