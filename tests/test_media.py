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
    with pytest.raises(NotImplementedError, match="NOT implemented"):
        media._FakeCodec.decode(b"\x89PNG\r\n\x1a\nnotfake")
    # and the stage degrades to decode_ok=False instead of crashing
    bad = pa.table(
        {
            "media_ref": ["x"],
            "kind": ["image"],
            "payload": pa.array([b"\x89PNGjunk"], type=pa.large_binary()),
            "meta": pa.array(
                [{"width": 0, "height": 0, "frames": 0, "sample_rate": 0}],
                type=media.MEDIA_META,
            ),
        }
    )
    out = media.MediaDecoder()(bad)
    assert out.column("decode_ok").to_pylist() == [False]
