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
