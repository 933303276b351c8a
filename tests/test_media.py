"""Multimodal plumbing: schema, actor-pool decode/featurize stages,
frame sampling, deterministic outputs, stubbed real-codec path."""

import numpy as np
import pyarrow as pa
import pytest

from crawler_ray import synth
from crawler_ray.stages import media
from crawler_ray.stages.extract import extract_spans_batch


def _media_table():
    pages = synth.generate_site_graph(num_hosts=2, base_pages=24, seed=6)
    docs = extract_spans_batch(pages.select(["doc_id", "html"]).rename_columns(["doc_id", "html"]))
    refs = media.media_refs_from_spans(docs)
    assert refs, "graph should contain media spans"
    return media.synth_media_table(refs)


def test_media_schema_and_determinism():
    t = _media_table()
    assert t.schema.equals(media.MEDIA_SCHEMA)
    t2 = _media_table()
    assert t.equals(t2)
    kinds = set(t.column("kind").to_pylist())
    assert "image" in kinds


def test_decode_stage_actor_pool(ray_session):
    import ray.data as rd

    t = _media_table()
    out = (
        rd.from_arrow(t)
        .map_batches(media.MediaDecoder, batch_size=8, concurrency=2, batch_format="pyarrow")
        .to_pandas()
    )
    assert out["decode_ok"].all()
    # decoded dims must match the typed metadata
    meta = t.column("meta").to_pylist()
    assert list(out["decoded_width"]) == [m["width"] for m in meta]
    assert list(out["decoded_height"]) == [m["height"] for m in meta]


def test_featurizer_and_frame_sampling(ray_session):
    import ray.data as rd

    t = _media_table()
    out = (
        rd.from_arrow(t)
        .map_batches(
            media.MediaFeaturizer, batch_size=8, concurrency=2, batch_format="pyarrow"
        )
        .to_pandas()
    )
    feats = np.array(out["media_features"].to_list())
    assert feats.shape[1] == 6
    assert (feats[:, :3] > 0).all()  # mean RGB of random pixels ≈ 127
    # deterministic across runs
    out2 = (
        rd.from_arrow(t)
        .map_batches(media.MediaFeaturizer, batch_size=8, concurrency=2, batch_format="pyarrow")
        .to_pandas()
    )
    assert np.allclose(feats, np.array(out2["media_features"].to_list()))


def test_real_payload_raises_clearly():
    # truncated MP4: the demux is real, so this is a corrupt stream
    with pytest.raises(ValueError):
        media._FakeCodec.decode(b"\x00\x00\x00\x18ftypmp42notavideo")
    # inter-frame bitstream (hev1/HEVC): the remaining gate, refused
    # by codec name while the container demux still works (avc1 now
    # decodes through the intra-only H.264 codec, test_codecs)
    import numpy as np

    from crawler_ray.stages.codecs import mp4_mjpeg_encode, mp4_probe

    vid = np.zeros((2, 16, 16, 3), dtype=np.uint8)
    hev = mp4_mjpeg_encode(vid, fps=10)
    i = hev.rindex(b"jpeg")  # the stsd sample-entry fourcc
    hev = hev[:i] + b"hev1" + hev[i + 4 :]
    assert mp4_probe(hev)["tracks"][0]["codec"] == "hev1"  # demux still real
    with pytest.raises(NotImplementedError, match="hev1"):
        media._FakeCodec.decode(hev)
    # an avc1 entry WITHOUT its avcC configuration record is corrupt
    avc = hev[:i] + b"avc1" + hev[i + 4 :]
    with pytest.raises(ValueError, match="avcC"):
        media._FakeCodec.decode(avc)
    # a CORRUPT compressed payload raises ValueError from the codec...
    with pytest.raises(ValueError):
        media._FakeCodec.decode(b"\x89PNG\r\n\x1a\nnotapng")
    # ...and the stage degrades to decode_ok=False instead of crashing
    bad = pa.table(
        {
            "media_ref": ["x", "y"],
            "kind": ["image", "video"],
            "payload": pa.array(
                [b"\x89PNG\r\n\x1a\njunk", b"\x00\x00\x00\x18ftypmp42"],
                type=pa.large_binary(),
            ),
            "meta": pa.array(
                [{"width": 0, "height": 0, "frames": 0, "sample_rate": 0}] * 2,
                type=media.MEDIA_META,
            ),
        }
    )
    out = media.MediaDecoder()(bad)
    assert out.column("decode_ok").to_pylist() == [False, False]


def test_ppm_roundtrip_byte_exact():
    import numpy as np

    from crawler_ray.stages.media import decode_ppm, encode_ppm

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_wav_roundtrip_byte_exact():
    import numpy as np

    from crawler_ray.stages.media import decode_wav, encode_wav

    rng = np.random.default_rng(6)
    samples = rng.integers(-32768, 32767, size=4410, dtype=np.int16)
    got, rate = decode_wav(encode_wav(samples, 44100))
    assert rate == 44100 and np.array_equal(got, samples)


def test_decoder_pool_handles_real_fake_and_unknown(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.media import (
        MEDIA_SCHEMA,
        MediaDecoder,
        MediaFeaturizer,
        encode_ppm,
        encode_wav,
        fake_payload,
    )

    img = np.full((8, 12, 3), 200, dtype=np.uint8)  # constant color
    wav = (np.sin(np.linspace(0, 40 * np.pi, 2000)) * 20000).astype(np.int16)
    rows = [
        {"media_ref": "a.ppm", "kind": "image", "payload": encode_ppm(img),
         "meta": {"width": 12, "height": 8, "frames": 1, "sample_rate": 0}},
        {"media_ref": "b.wav", "kind": "audio", "payload": encode_wav(wav, 16000),
         "meta": {"width": 0, "height": 0, "frames": 0, "sample_rate": 16000}},
        {"media_ref": "c.gif", "kind": "image", "payload": fake_payload("image", 10, 6, 1, 7),
         "meta": {"width": 10, "height": 6, "frames": 1, "sample_rate": 0}},
        {"media_ref": "d.jpg", "kind": "image", "payload": b"\xff\xd8\xff\xe0 truncated",
         "meta": {"width": 0, "height": 0, "frames": 0, "sample_rate": 0}},
        {"media_ref": "e.mp4", "kind": "video", "payload": b"\x00\x00\x00\x18ftypmp42",
         "meta": {"width": 0, "height": 0, "frames": 0, "sample_rate": 0}},
    ]
    t = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
    ds = rd.from_arrow(t)
    dec = ds.map_batches(MediaDecoder, batch_size=2, concurrency=1,
                         batch_format="pyarrow").to_pandas().set_index("media_ref")
    assert dec.loc["a.ppm", "decode_ok"] and dec.loc["a.ppm", "decoded_width"] == 12
    assert dec.loc["b.wav", "decode_ok"] and dec.loc["b.wav", "decoded_width"] == 2000
    assert dec.loc["c.gif", "decode_ok"]
    assert not dec.loc["d.jpg", "decode_ok"]  # corrupt stream: degrade, don't crash
    assert not dec.loc["e.mp4", "decode_ok"]  # video: the honest stub

    feats = ds.map_batches(MediaFeaturizer, batch_size=2, concurrency=1,
                           batch_format="pyarrow").to_pandas().set_index("media_ref")
    f_img = feats.loc["a.ppm", "media_features"]
    assert all(abs(v - 200.0) < 1e-9 for v in f_img[:3])  # constant color mean
    assert all(abs(v) < 1e-9 for v in f_img[3:])          # zero variance
    f_wav = feats.loc["b.wav", "media_features"]
    assert f_wav[5] == 2000.0                              # duration in samples
    assert 0.0 < f_wav[3] < 0.1                            # sine ZCR ≈ 20/1999
    assert list(feats.loc["d.jpg", "media_features"]) == [0.0] * 6


def test_multimodal_end_to_end_features_to_ann(ray_session):
    """The multimodal composite: media assets (real PPM payloads) →
    actor-pool decode+featurize → feature vectors → ANN top-k.  A
    planted near-identical image pair must be each other's nearest
    neighbour by feature cosine."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.ann import brute_force_topk
    from crawler_ray.stages.media import MEDIA_SCHEMA, MediaFeaturizer, encode_ppm

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8) for _ in range(12)]
    twin = imgs[3].copy()
    twin[0, 0] = (twin[0, 0] + 1) % 256  # near-identical to image 3
    imgs.append(twin)
    rows = [
        {
            "media_ref": f"img{i}.ppm",
            "kind": "image",
            "payload": encode_ppm(im),
            "meta": {"width": 16, "height": 16, "frames": 1, "sample_rate": 0},
        }
        for i, im in enumerate(imgs)
    ]
    t = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
    feats = (
        rd.from_arrow(t)
        .map_batches(MediaFeaturizer, batch_size=4, concurrency=1, batch_format="pyarrow")
        .to_pandas()
    )
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(feats)), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, f)) for f in feats["media_features"]],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    )
    q = np.array([list(map(float, feats["media_features"].iloc[12]))])
    top = brute_force_topk(emb, q, k=2)
    got = top.to_pandas() if hasattr(top, "to_pandas") else top
    ids = got.sort_values("rank")["vec_id"].tolist()
    assert ids[0] == 12 and ids[1] == 3  # self, then its twin


def test_dhash_brightness_and_container_invariance():
    """dhash64 must be identical across uniform brightness shifts and
    across lossless containers (PNG vs GIF) — the property
    image_dhash_neardup's oracle arithmetic relies on; and the 48
    synth seed groups must hash pairwise-distinct so hash-grouping ==
    seed-grouping at every scale."""
    import numpy as np

    from crawler_ray.stages.codecs import gif_encode, png_decode, png_encode, gif_decode
    from crawler_ray.stages.media import dhash64, hamming64

    hashes = []
    for grp in range(48):
        rng = np.random.RandomState(grp)
        h, w = 24 + grp % 8, 32 + grp % 12
        base = rng.randint(0, 224, size=(h, w)).astype(np.uint8)
        img0 = np.stack([base] * 3, axis=-1)
        img16 = np.stack([base + np.uint8(16)] * 3, axis=-1)
        h0 = dhash64(img0)
        assert dhash64(img16) == h0  # brightness invariance
        assert dhash64(png_decode(png_encode(img0))) == h0
        assert dhash64(gif_decode(gif_encode(img16))) == h0
        hashes.append(h0)
    assert len(set(hashes)) == 48  # pairwise distinct
    # distinct images are far apart, same image is distance 0
    assert hamming64(hashes[0], hashes[0]) == 0
    assert hamming64(hashes[0], hashes[1]) > 8


def test_dhash_survives_lossy_jpeg():
    """On a structured (strong-edge) image, dHash must be robust to a
    real lossy JPEG roundtrip — the perceptual-near-dup use case."""
    import numpy as np

    from crawler_ray.stages.codecs import jpeg_decode, jpeg_encode
    from crawler_ray.stages.media import dhash64, hamming64

    # 8x9 block grid (8x8-pixel blocks, matching the dHash sample
    # grid): levels cycle a 3-step ladder so horizontally adjacent
    # samples always differ by 88 luma — far above JPEG q85 noise
    ladder = np.array([24, 112, 200], dtype=np.uint8)
    levels = np.empty((8, 9), dtype=np.uint8)
    for r in range(8):
        levels[r] = ladder[(np.arange(9) + r) % 3]
    img = np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)
    rgb = np.stack([img] * 3, axis=-1)
    h0 = dhash64(rgb)
    h1 = dhash64(jpeg_decode(jpeg_encode(rgb, 85)))
    assert hamming64(h0, h1) <= 4, (h0, h1)


def test_afp64_invariances_and_base_distinctness():
    """The 40 base fingerprints are pairwise distinct; gain x2/x4 and
    trailing silence leave the fingerprint bit-identical; a clip
    shorter than the window refuses to fingerprint."""
    import numpy as np
    import pytest

    from crawler_ray.stages.media import AFP_WINDOW, afp64, decode_wav, encode_wav

    fps = []
    for grp in range(40):
        rng = np.random.RandomState(grp)
        base = rng.randint(-8191, 8192, size=AFP_WINDOW).astype(np.int64)
        fp = afp64(base.astype(np.int16))
        # gain invariance (exact integer scaling, headroom by construction)
        assert afp64((base * 2).astype(np.int16)) == fp
        assert afp64((base * 4).astype(np.int16)) == fp
        # trailing-content invariance
        padded = np.concatenate(
            (base.astype(np.int16), np.full(4096, 123, dtype=np.int16))
        )
        assert afp64(padded) == fp
        # WAV roundtrip preserves the fingerprint
        dec, rate = decode_wav(encode_wav(base.astype(np.int16), 16000))
        assert rate == 16000 and afp64(dec) == fp
        fps.append(fp)
    assert len(set(fps)) == 40
    with pytest.raises(ValueError):
        afp64(np.zeros(AFP_WINDOW - 1, dtype=np.int16))


def test_audio_fingerprinter_stage_marks_bad_payloads(ray_session):
    """Corrupt/short/non-audio payloads get hash_ok=False, never an
    exception out of the actor pool."""
    import numpy as np
    import pyarrow as pa

    from crawler_ray.stages.media import (
        AFP_WINDOW,
        AudioFingerprinter,
        encode_wav,
    )

    good = encode_wav(
        np.random.RandomState(0)
        .randint(-8191, 8192, size=AFP_WINDOW)
        .astype(np.int16),
        16000,
    )
    short = encode_wav(np.zeros(100, dtype=np.int16), 16000)
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "payload": pa.array(
                [good, short, b"RIFFgarbage", b"not audio at all"],
                type=pa.large_binary(),
            ),
        }
    )
    out = AudioFingerprinter()(batch)
    ok = out["hash_ok"].to_pylist()
    assert ok == [True, False, False, False]
    assert out["afp"].to_pylist()[1:] == [0, 0, 0]
