"""Fetcher edge cases (redirect loops) + the standalone link-explosion
batch stage."""

import pyarrow as pa

from crawler_ray import schemas
from crawler_ray.stages.extract import explode_links_batch, extract_spans_batch
from crawler_ray.stages.fetch import Fetcher


def _page(url, html="", redirect_to=""):
    return {
        "doc_id": url, "host": "h.test", "html": html, "spans": [],
        "is_leaf": False, "disallowed": False, "redirect_to": redirect_to,
    }


def _frontier(urls):
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "host": pa.array(["h.test"] * len(urls)),
            "depth": pa.array([0] * len(urls), type=pa.int32()),
            "discovery_seq": pa.array(range(len(urls)), type=pa.int64()),
            "src_url": pa.array([""] * len(urls)),
            "src_xpath": pa.array([[] for _ in urls], type=pa.list_(pa.string())),
        }
    )


def test_fetcher_redirect_loop_and_chain(ray_session):
    import ray

    pages = pa.Table.from_pylist(
        [
            _page("http://h.test/a", redirect_to="http://h.test/b"),
            _page("http://h.test/b", redirect_to="http://h.test/a"),  # loop
            _page("http://h.test/c", redirect_to="http://h.test/d"),
            _page("http://h.test/d", "<html>\n<body>\n<p>ok</p>\n</body>\n</html>"),
        ],
        schema=schemas.SITE_PAGES,
    )
    f = Fetcher(ray.put(pages))
    out = f(_frontier(["http://h.test/a", "http://h.test/c", "http://h.test/x"]))
    st = out.column("status").to_pylist()
    assert st == ["redirect_loop", "redirect", "missing"]
    # chain fetch resolves to the final body; loop/missing yield none
    bodies = out.column("body").to_pylist()
    assert bodies[0] == "" and "ok" in bodies[1] and bodies[2] == ""
    # the chain's hops are all reported (→ URL-seen aliases)
    assert out.column("redirects")[1].as_py() == ["http://h.test/c", "http://h.test/d"]


def test_explode_links_batch():
    html = """<html>
<body>
<a class="post-link" href="/t/1">thread</a>
<a class="page-next" href="/index?page=2">2</a>
<a href="javascript:void(0)">x</a>
</body>
</html>"""
    batch = pa.table(
        {
            "url": ["http://h.test/"],
            "body": pa.array([html], type=pa.large_string()),
            "depth": pa.array([1], type=pa.int32()),
            "src_xpath": pa.array([["//root/a"]], type=pa.list_(pa.string())),
        }
    )
    out = explode_links_batch(batch)
    assert out.num_rows == 2  # javascript dropped
    assert out.column("url").to_pylist() == [
        "http://h.test/t/1", "http://h.test/index?page=2",
    ]
    assert out.column("is_pagination").to_pylist() == [False, True]
    assert out.column("src_depth").to_pylist() == [1, 1]


def test_extract_spans_batch_empty_body():
    batch = pa.table(
        {
            "url": ["http://h.test/x"],
            "body": pa.array([""], type=pa.large_string()),
        }
    )
    out = extract_spans_batch(batch)
    assert out.column("spans").to_pylist() == [[]]
