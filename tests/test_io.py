"""lance-or-parquet storage shim: atomic writes, append mode, round-trip."""

import pyarrow as pa

from crawler_ray import schemas
from crawler_ray.sources import io as cio


def _docs(n=5, tag=""):
    return pa.Table.from_pylist(
        [
            {"doc_id": f"http://h/{tag}{i}", "spans": [
                {"kind": "text", "text": f"t{i}", "media_ref": "", "offset": 0}
            ]}
            for i in range(n)
        ],
        schema=schemas.DOCUMENTS,
    )


def test_write_read_roundtrip(tmp_path):
    uri = cio.table_uri(str(tmp_path), "documents")
    t = _docs(5)
    cio.write_table(t, uri)
    back = cio.read_table(uri)
    assert back.equals(t)


def test_append_and_overwrite(tmp_path):
    uri = cio.table_uri(str(tmp_path), "corpus")
    cio.write_table(_docs(3, "a"), uri)
    cio.write_table(_docs(2, "b"), uri, mode="append")
    assert cio.read_table(uri).num_rows == 5
    cio.write_table(_docs(1, "c"), uri, mode="overwrite")
    back = cio.read_table(uri)
    assert back.num_rows == 1 and back.column("doc_id")[0].as_py() == "http://h/c0"


def test_ray_dataset_reader(ray_session, tmp_path):
    uri = cio.table_uri(str(tmp_path), "documents")
    cio.write_table(_docs(7), uri)
    ds = cio.read_dataset(uri)
    assert ds.count() == 7
    assert set(ds.schema().names) == {"doc_id", "spans"}


def test_compact_dir_merges_fragments_and_preserves_rows(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.compact import compact_dir

    frag = tmp_path / "frag"
    frag.mkdir()
    # 40 tiny parts, 25 rows each (the crawl-round write pattern)
    for i in range(40):
        t = pa.table(
            {
                "doc_id": pa.array(range(i * 25, i * 25 + 25), type=pa.int64()),
                "v": pa.array([i] * 25, type=pa.int64()),
            }
        )
        pq.write_table(t, str(frag / f"part-{i:04d}.parquet"))
    out = str(tmp_path / "compacted")
    stats = compact_dir(str(frag), out, target_rows_per_file=500)
    assert stats == {"rows": 1000, "files_before": 40, "files_after": stats["files_after"]}
    assert stats["files_after"] <= 4  # ~2 target blocks, never 40
    # content preserved exactly (order-insensitive)
    got = pq.read_table(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(1000))
    assert got["v"].sum() == sum(i * 25 for i in range(40))
    # .tmp staging dir must not survive the publish
    assert not os.path.exists(out + ".tmp")


def test_compact_dir_self_heals_parked_output(ray_session, tmp_path):
    """ADVICE r4: a crash between the two publish renames leaves
    out_dir absent with the previous output parked at <out_dir>.old;
    the next compact_dir run restores the parked copy on entry (so the
    window is self-healing, not an operator task)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.compact import compact_dir

    frag = tmp_path / "frag"
    frag.mkdir()
    for i in range(4):
        t = pa.table({"doc_id": pa.array(range(i * 10, i * 10 + 10), type=pa.int64())})
        pq.write_table(t, str(frag / f"part-{i}.parquet"))
    out = str(tmp_path / "compacted")
    compact_dir(str(frag), out, target_rows_per_file=20)

    # simulate the crash window: out_dir renamed away, .old left behind
    os.rename(out, out + ".old")
    assert not os.path.isdir(out)
    stats = compact_dir(str(frag), out, target_rows_per_file=20)
    assert stats["rows"] == 40
    assert os.path.isdir(out)
    assert not os.path.isdir(out + ".old")
    got = pq.read_table(out).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == list(range(40))
