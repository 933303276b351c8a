"""WARC interchange (sources/warc.py): record encoding, member splitting,
corruption refusal, and the Ray Dataset write→read roundtrip."""

import gzip
import os

import pyarrow as pa
import pytest

from crawler_ray.sources import warc


RECS = [
    ("http://a.example/1", b"hello world"),
    ("http://a.example/2", "multibyte é中文 body".encode("utf-8")),
    ("http://b.example/", b""),  # empty payload is a legal record
]


def test_record_roundtrip_single():
    raw = warc.warc_record_bytes("http://x/", b"payload", status=404)
    rec = warc.parse_warc_record(raw)
    assert rec["url"] == "http://x/"
    assert rec["type"] == "response"
    assert rec["status"] == 404
    assert rec["payload"] == b"payload"


def test_file_roundtrip_gzip(tmp_path):
    path = str(tmp_path / "a.warc.gz")
    assert warc.write_warc(RECS, path) == 3
    back = warc.read_warc(path)
    assert [(r["url"], r["payload"]) for r in back] == RECS
    assert all(r["status"] == 200 for r in back)


def test_file_roundtrip_uncompressed(tmp_path):
    # same records as one concatenated uncompressed stream
    data = b"".join(warc.warc_record_bytes(u, p) for u, p in RECS)
    path = str(tmp_path / "a.warc")
    with open(path, "wb") as f:
        f.write(data)
    back = warc.read_warc(path)
    assert [(r["url"], r["payload"]) for r in back] == RECS


def test_write_is_deterministic(tmp_path):
    p1, p2 = str(tmp_path / "1.warc.gz"), str(tmp_path / "2.warc.gz")
    warc.write_warc(RECS, p1)
    warc.write_warc(RECS, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_extra_headers_roundtrip():
    raw = warc.warc_record_bytes(
        "http://x/", b"p", extra_headers={"WARC-Identified-Content-Language": "deu"}
    )
    rec = warc.parse_warc_record(raw)
    assert rec["headers"]["WARC-Identified-Content-Language"] == "deu"


@pytest.mark.parametrize("cut", [1, 10, 40])
def test_truncated_gzip_member_refused(tmp_path, cut):
    path = str(tmp_path / "t.warc.gz")
    warc.write_warc(RECS, path)
    data = open(path, "rb").read()
    with pytest.raises(ValueError):
        warc.split_records(data[:-cut])


def test_truncated_content_block_refused():
    raw = warc.warc_record_bytes("http://x/", b"0123456789")
    with pytest.raises(ValueError):
        warc.parse_warc_record(raw[:-6])  # cuts into the payload


def test_malformed_header_refused():
    raw = warc.warc_record_bytes("http://x/", b"p")
    bad = raw.replace(b"WARC-Type: response", b"WARC-Type response", 1)
    with pytest.raises(ValueError):
        warc.parse_warc_record(bad)


def test_missing_content_length_refused():
    raw = warc.warc_record_bytes("http://x/", b"p")
    bad = raw.replace(b"Content-Length", b"X-Content-Length")
    with pytest.raises(ValueError):
        warc.parse_warc_record(bad)


def test_wrong_version_refused():
    raw = warc.warc_record_bytes("http://x/", b"p")
    with pytest.raises(ValueError):
        warc.parse_warc_record(b"WARC/9.9" + raw[len(b"WARC/1.0"):])


def test_split_auto_detects_compression():
    raw = warc.warc_record_bytes("http://x/", b"p")
    assert warc.split_records(raw) == [raw]
    assert warc.split_records(gzip.compress(raw, mtime=0)) == [raw]


def test_dataset_roundtrip(ray_session, tmp_path):
    import ray.data

    out = str(tmp_path / "corpus")
    os.makedirs(out)
    t = pa.table(
        {
            "url": pa.array([u for u, _ in RECS] * 4, type=pa.string()),
            "payload": pa.array([p for _, p in RECS] * 4, type=pa.large_binary()),
            "lang": pa.array(["eng", "fra", "deu"] * 4, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    stats = warc.write_warc_corpus(ds, out, lang_col="lang").to_pandas()
    assert stats["n_records"].sum() == 12
    files = sorted(os.listdir(out))
    assert files == sorted(stats["warc_file"])
    assert all(f.endswith(".warc.gz") and not f.endswith(".tmp") for f in files)

    back = warc.read_warc_dataset(out).to_pandas().sort_values(
        ["url", "lang"]
    )
    assert len(back) == 12
    src = t.to_pandas().sort_values(["url", "lang"])
    assert list(back["url"]) == list(src["url"])
    assert [bytes(x) for x in back["payload"]] == [bytes(x) for x in src["payload"]]
    assert list(back["lang"]) == list(src["lang"])

    # idempotent re-run: content-hashed names, identical file set
    warc.write_warc_corpus(ds, out, lang_col="lang").materialize()
    assert sorted(os.listdir(out)) == files


def test_conversion_record_roundtrip():
    # WET convention: bare text block, no HTTP envelope
    raw = warc.warc_record_bytes("http://x/", "été text".encode(), warc_type="conversion")
    rec = warc.parse_warc_record(raw)
    assert rec["type"] == "conversion"
    assert rec["status"] == 0  # no HTTP envelope
    assert rec["payload"] == "été text".encode()
    assert rec["headers"]["Content-Type"] == "text/plain"


def test_cli_corpus_warc_roundtrip(ray_session, tmp_path):
    """crawl checkpoint -> corpus-to-warc (WET conversion records) ->
    warc-to-corpus: per-URL extracted text survives both hops."""
    from crawler_ray import cli, synth
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl
    from crawler_ray.state.checkpoint import CheckpointStore

    pages = synth.generate_site_graph(num_hosts=2, base_pages=16, seed=7)
    ck = str(tmp_path / "ck")
    crawl(pages, synth.seeds_for(pages), CrawlConfig(checkpoint_dir=ck))

    out = str(tmp_path / "out")
    assert cli.main(["corpus-to-warc", "--checkpoint-dir", ck, "--out", out]) == 0
    wet_dir = os.path.join(out, "wet")
    assert any(f.endswith(".warc.gz") for f in os.listdir(wet_dir))

    out2 = str(tmp_path / "out2")
    assert cli.main(["warc-to-corpus", "--warc-dir", wet_dir, "--out", out2]) == 0

    import ray.data

    corpus = CheckpointStore(ck).corpus_table()
    want = {
        r["url"]: "\n".join(s["text"] for s in r["spans"] if s["kind"] == "text")
        for r in corpus.select(["url", "spans"]).to_pylist()
    }
    back = ray.data.read_parquet(os.path.join(out2, "documents")).to_pandas()
    got = {
        r["doc_id"]: r["spans"][0]["text"] for _, r in back.iterrows()
    }
    assert got == want
