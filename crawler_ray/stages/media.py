"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / resize / feature-extract / frame-sample as
actor-pool map_batches stages.

The container has no image/audio libraries, so DECODING is stubbed
(FIXTURES spirit: deterministic fake payloads with a parseable header;
``PIL``/real codecs are probed behind an import-try and raise a
clearly-marked NotImplementedError for real payloads).  Everything
AROUND the decode — the Arrow schema, batch sizing for large binary
rows, the actor signature (codec state in ``__init__``), and the
output layout — is real and tested.

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
    URL hash, payload = fake wire format."""
    import hashlib

    rows = []
    for ref in media_refs:
        h = int.from_bytes(hashlib.blake2b(ref.encode(), digest_size=8).digest(), "little")
        kind = "video" if ref.endswith((".mp4", ".webm")) else (
            "audio" if ref.endswith(".mp3") else "image"
        )
        w = 64 + (h % 192)
        ht = 64 + ((h >> 8) % 192)
        frames = 1 if kind == "image" else 8 + (h >> 16) % 24
        rows.append(
            {
                "media_ref": ref,
                "kind": kind,
                "payload": fake_payload(kind, w, ht, frames, (h >> 32) & 0xFFFFFFFF),
                "meta": {"width": w, "height": ht, "frames": frames, "sample_rate": 0},
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class _FakeCodec:
    """Decodes the deterministic fake wire format into numpy frames."""

    @staticmethod
    def decode(payload: bytes) -> tuple[str, np.ndarray]:
        if not payload.startswith(b"FAKE"):
            raise NotImplementedError(
                "real media decoding is NOT implemented in this sandbox "
                "(no PIL/ffmpeg); only the deterministic fake wire format "
                "is decodable — swap _FakeCodec for a real codec in "
                "production"
            )
        kb, w, h, frames, seed = struct.unpack("<BHHHI", payload[4:15])
        rng = np.random.RandomState(seed)
        arr = rng.randint(0, 256, size=(frames, h, w, 3), dtype=np.uint8)
        return _BYTE_KIND[kb], arr


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
                frames_n.append(arr.shape[0])
                heights.append(arr.shape[1])
                widths.append(arr.shape[2])
                ok.append(True)
            except NotImplementedError:
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
        h, w, _ = frame.shape
        ys = np.linspace(0, h, self.target + 1, dtype=int)
        xs = np.linspace(0, w, self.target + 1, dtype=int)
        out = np.zeros((self.target, self.target, 3), dtype=np.float32)
        for i in range(self.target):
            for j in range(self.target):
                out[i, j] = frame[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean(axis=(0, 1))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            try:
                _kind, arr = self.codec.decode(payload)
            except NotImplementedError:
                feats.append([0.0] * 6)
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


def media_refs_from_spans(documents: pa.Table) -> list[str]:
    """Distinct media_ref values of kind='media' spans — the join key
    between the documents table and the media asset table."""
    import pyarrow.compute as pc

    spans = documents.column("spans").combine_chunks()
    flat = pc.list_flatten(spans)
    kinds = flat.field("kind")
    refs = flat.field("media_ref").filter(pc.equal(kinds, "media"))
    return sorted(set(r for r in refs.to_pylist() if r))
