"""interleaved_span_stats: the input_hint nested payload under the gate.

Pins (a) the zero-copy construction — span text children share the
batch's utf8 values buffer, no character copied; (b) the non-ASCII /
non-tiling fallback produces IDENTICAL spans; (c) the spans column is
exactly schemas.SPAN_STRUCT; (d) hand-computed span sequences for a
crafted doc (kind/text/media_ref/offset, order).
"""

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from crawler_ray.queries import _build_span_column  # noqa: E402
from crawler_ray.schemas import SPAN_STRUCT  # noqa: E402


def _doc_table(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def test_schema_is_span_struct():
    t = _doc_table(["hello world " * 10])
    out = _build_span_column(t)
    assert out.schema.field("spans").type == pa.list_(SPAN_STRUCT)


def test_zero_copy_text_children():
    # ASCII tiling input -> the text child's values buffer IS the
    # input column's values buffer (same address, nothing copied).
    t = _doc_table(["abcdef" * 40, "x" * 100])
    out = _build_span_column(t)
    src = t["text"].chunk(0)
    flat = out["spans"].chunk(0).flatten()  # flatten/.values share buffers
    assert flat.field("text").buffers()[2].address == src.buffers()[2].address


def test_crafted_doc_span_sequence():
    # doc_id=0: (0*31 + j) % 5 == 0 at j=0 and j=5; text 130 chars ->
    # 3 text spans (64, 64, 2 chars), media only after j=0
    # (kind image since (0+0)%3==0), offset = end of text span 0 = 64.
    txt = "".join(chr(ord("a") + i % 26) for i in range(130))
    out = _build_span_column(_doc_table([txt], ids=[0]))
    spans = out["spans"][0].as_py()
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "image", "text", "text"]
    assert [s["offset"] for s in spans] == [0, 64, 64, 128]
    assert spans[0]["text"] == txt[:64]
    assert spans[2]["text"] == txt[64:128]
    assert spans[3]["text"] == txt[128:]
    assert spans[1]["text"] == "" and spans[1]["media_ref"] == "media://0/0"
    assert all(s["media_ref"] == "" for s in spans if s["kind"] == "text")


def test_media_kind_cycle_and_condition():
    # doc_id=7: media after j where (7*31 + j) % 5 == 0 -> j ≡ 3 (mod 5);
    # kind = [image,audio,video][(7+j)%3].
    txt = "z" * (64 * 9 + 5)  # 10 text spans, media after j=3 and j=8
    out = _build_span_column(_doc_table([txt], ids=[7]))
    spans = out["spans"][0].as_py()
    media = [s for s in spans if s["kind"] != "text"]
    assert [m["media_ref"] for m in media] == ["media://7/3", "media://7/8"]
    assert [m["kind"] for m in media] == ["audio", "image"]  # (7+3)%3=1, (7+8)%3=0
    assert [m["offset"] for m in media] == [64 * 4, 64 * 9]


def test_non_ascii_fallback_identical():
    # Multi-byte chars force the fallback; spans must be char-exact.
    txt_uni = ("héllo wörld – ünïcodé " * 12)[:130]
    out = _build_span_column(_doc_table([txt_uni], ids=[0]))
    spans = out["spans"][0].as_py()
    text_spans = [s for s in spans if s["kind"] == "text"]
    assert [s["text"] for s in text_spans] == [
        txt_uni[0:64],
        txt_uni[64:128],
        txt_uni[128:130],
    ]
    # Same doc, ASCII twin of the same length: identical structure.
    txt_ascii = "a" * 130
    out2 = _build_span_column(_doc_table([txt_ascii], ids=[0]))
    s2 = out2["spans"][0].as_py()
    assert [s["kind"] for s in spans] == [s["kind"] for s in s2]
    assert [s["offset"] for s in spans] == [s["offset"] for s in s2]
    assert [s["media_ref"] for s in spans] == [s["media_ref"] for s in s2]


def test_empty_and_zero_char_docs():
    out = _build_span_column(_doc_table([], ids=[]))
    assert out.num_rows == 0
    out2 = _build_span_column(_doc_table(["", "ab"], ids=[6, 6]))
    assert out2["spans"][0].as_py() == []
    s = out2["spans"][1].as_py()
    assert [x["kind"] for x in s] == ["text"]  # 6*31 % 5 == 1 -> no media


def test_zero_char_doc_media_rule_exact():
    # doc_id=5: 5*31 % 5 == 0 -> media after j=0; (5+0)%3=2 -> video.
    out = _build_span_column(_doc_table(["ab"], ids=[5]))
    s = out["spans"][0].as_py()
    assert [x["kind"] for x in s] == ["text", "video"]
    assert s[1]["offset"] == 2  # min(64, n_chars)


def test_flatten_roundtrip_counts():
    rng = np.random.default_rng(7)
    texts = [
        "".join(chr(ord("a") + c) for c in rng.integers(0, 26, int(m)))
        for m in rng.integers(0, 300, 50)
    ]
    t = _doc_table(texts)
    out = _build_span_column(t)
    spans = out["spans"].combine_chunks()
    flat = spans.flatten()
    n = np.array([len(x) for x in texts], dtype=np.int64)
    k = (n + 63) // 64
    doc = np.arange(50, dtype=np.int64)
    m = sum(
        int(((d * 31 + np.arange(kk)) % 5 == 0).sum())
        for d, kk in zip(doc, k)
    )
    assert len(flat) == int(k.sum()) + m
    # total text chars across spans == total corpus chars
    import pyarrow.compute as pc

    assert pc.sum(pc.utf8_length(flat.field("text"))).as_py() == int(n.sum())
