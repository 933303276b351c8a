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


def test_fetcher_lru_cache(ray_session):
    """Bounded per-actor document LRU (utils.clj:210-227 memoized cache
    made bounded): hit on repeat, evict oldest at capacity, aliases
    share the final-url entry; bodies identical with cache on/off."""
    import pyarrow as pa

    from crawler_ray import synth
    from crawler_ray.stages.fetch import Fetcher

    pages = synth.generate_site_graph(num_hosts=2, base_pages=20, seed=3)
    urls = [u for u in pages.column("doc_id").to_pylist()][:6]

    def batch(us):
        return pa.Table.from_pylist(
            [{"url": u, "host": "", "depth": 0, "discovery_seq": i,
              "src_url": "", "src_xpath": []} for i, u in enumerate(us)]
        )

    f = Fetcher(pages, cache_size=4)
    out1 = f(batch(urls))
    info = f.cache_info()
    assert info["hits"] == 0 and info["misses"] >= len(urls) - 1
    assert info["size"] <= 4 and info["evictions"] >= 1
    # refetch the most recent urls → hits
    out2 = f(batch(urls[-2:]))
    assert f.cache_info()["hits"] >= 2
    # bodies identical to an uncached fetcher
    f0 = Fetcher(pages, cache_size=0)
    out0 = f0(batch(urls))
    assert out1.column("body").to_pylist() == out0.column("body").to_pylist()


def test_extract_above_average_richest():
    from crawler_ray.extractor import extract_above_average_richest, state_action

    links = (
        [{"url": f"/a/{i}", "text": "x", "xpath": "//div/a"} for i in range(8)]
        + [{"url": f"/b/{i}", "text": "x", "xpath": "//ul/li/a"} for i in range(4)]
        + [{"url": "/c/0", "text": "x", "xpath": "//p/a"}]
    )
    sa = state_action(links)
    kept = extract_above_average_richest(sa)
    # mean score = (8+4+1)/3 ≈ 4.33 → only the 8-link group survives
    assert [g["xpath"] for g in kept] == ["//div/a"]
    assert extract_above_average_richest({"total_nav_info": 0, "xpath_nav_info": []}) == []


def test_http_transport_loopback():
    """HTTPTransport (the live-web transport) against a loopback
    http.server: ok / redirect-chain / missing / server-error statuses
    and bodies match the SyntheticTransport contract, and the Fetcher
    consumes the transport object directly (pluggable network)."""
    import http.server
    import threading

    import pyarrow as pa

    from crawler_ray.stages.fetch import Fetcher, HTTPTransport

    PAGES = {
        "/index.html": "<html><body><a href='/leaf.html'>leaf</a></body></html>",
        "/leaf.html": "<html><body><p>leafy</p></body></html>",
    }

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path in PAGES:
                body = PAGES[self.path].encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/alias":
                self.send_response(302)
                self.send_header("Location", "/hop2")
                self.end_headers()
            elif self.path == "/hop2":
                self.send_response(301)
                self.send_header("Location", "/leaf.html")
                self.end_headers()
            elif self.path == "/boom":
                self.send_error(500)
            else:
                self.send_error(404)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        tr = HTTPTransport(timeout=5.0)
        st, final, hops = tr.resolve(f"{base}/index.html", [f"{base}/index.html"])
        assert (st, final) == ("ok", f"{base}/index.html")
        assert tr.body(final) == PAGES["/index.html"]

        st, final, hops = tr.resolve(f"{base}/alias", [f"{base}/alias"])
        assert st == "redirect" and final == f"{base}/leaf.html"
        assert hops == [f"{base}/alias", f"{base}/hop2", f"{base}/leaf.html"]
        assert tr.body(final) == PAGES["/leaf.html"]

        assert tr.resolve(f"{base}/nope", [f"{base}/nope"])[0] == "missing"
        assert tr.resolve(f"{base}/boom", [f"{base}/boom"])[0] == "http_500"
        # connection refused → error status, not an exception
        assert HTTPTransport(timeout=0.5).resolve(
            "http://127.0.0.1:1/x", ["http://127.0.0.1:1/x"]
        )[0] == "error"

        # the Fetcher consumes a transport object in place of the graph
        f = Fetcher(tr)
        out = f(pa.table({"url": [f"{base}/index.html", f"{base}/alias", f"{base}/gone"]}))
        assert out.column("status").to_pylist() == ["ok", "redirect", "missing"]
        assert out.column("body").to_pylist()[0] == PAGES["/index.html"]
        assert out.column("redirects").to_pylist()[1][-1] == f"{base}/leaf.html"
    finally:
        srv.shutdown()
        srv.server_close()


def test_full_crawl_over_live_http(ray_session):
    """The BSP crawl runs over a REAL network (loopback http.server)
    via CrawlConfig.transport_factory, and produces the identical
    trace/corpus as the same site crawled through SyntheticTransport —
    transports are interchangeable below the whole pipeline."""
    import http.server
    import threading

    import pyarrow as pa

    from crawler_ray.pipelines.crawl import CrawlConfig, crawl
    from crawler_ray.stages.fetch import HTTPTransport

    # a small site: index → 3 posts, one redirect alias, one robots-denied
    def page(links, title):
        body = "".join(
            f'<div class="content"><a class="post" href="{u}">{t}</a></div>'
            for u, t in links
        )
        return f"<html><body><h1>{title}</h1>{body}</body></html>"

    srv_holder = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            site = srv_holder["site"]
            if self.path == "/robots.txt":
                # the LIVE leg obeys this real robots.txt (the synthetic
                # leg's /private convention must match it)
                body = b"User-agent: *\nDisallow: /private/\n"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path in site["redirects"]:
                self.send_response(302)
                self.send_header("Location", site["redirects"][self.path])
                self.end_headers()
            elif self.path in site["pages"]:
                body = site["pages"][self.path].encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    base = f"http://127.0.0.1:{port}"
    pages_by_path = {
        "/index.html": page(
            [(f"{base}/post{i}.html", f"post {i}") for i in range(3)]
            + [(f"{base}/alias.html", "alias"), (f"{base}/private/x.html", "private")],
            "index",
        ),
        "/post0.html": page([(f"{base}/post1.html", "next")], "p0"),
        "/post1.html": page([], "p1"),
        "/post2.html": page([], "p2"),
    }
    srv_holder["site"] = {
        "pages": pages_by_path,
        "redirects": {"/alias.html": "/post2.html"},
    }
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        # equivalent graph table for the synthetic leg
        rows = [
            {"doc_id": f"{base}{p}", "html": html, "redirect_to": ""}
            for p, html in pages_by_path.items()
        ] + [{"doc_id": f"{base}/alias.html", "html": "", "redirect_to": f"{base}/post2.html"}]
        graph = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows]),
                "html": pa.array([r["html"] for r in rows], type=pa.large_string()),
                "redirect_to": pa.array([r["redirect_to"] for r in rows]),
            }
        )
        seeds = [f"{base}/index.html"]
        cfg = dict(wave_size=None, fetch_concurrency=2, n_seen_shards=2)
        synth_res = crawl(graph, seeds, CrawlConfig(**cfg))
        http_res = crawl(
            None, seeds, CrawlConfig(**cfg, transport_factory=HTTPTransport)
        )
        key = lambda r: sorted((t["url"], t["status"]) for t in r.trace)
        assert key(http_res) == key(synth_res)
        assert len(http_res.trace) == len(pages_by_path) + 1 + 1  # +alias +denied
        statuses = {t["url"]: t["status"] for t in http_res.trace}
        assert statuses[f"{base}/alias.html"] == "redirect"
        assert statuses[f"{base}/private/x.html"] == "robots_denied"
        assert http_res.metrics["fetched"] == synth_res.metrics["fetched"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_robots_cache_live_fetch():
    """RobotsCache over a live transport fetches and obeys the REAL
    /robots.txt (urllib.robotparser); hosts without one allow all."""
    import http.server
    import threading

    from crawler_ray.stages.fetch import HTTPTransport, RobotsCache

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/robots.txt":
                body = b"User-agent: *\nDisallow: /secret/\nDisallow: /tmp\n"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        rc = RobotsCache(transport=HTTPTransport(timeout=5.0))
        assert rc.disallowed(f"{base}/secret/a.html")
        assert rc.disallowed(f"{base}/tmp.html")
        assert not rc.disallowed(f"{base}/public/a.html")
        # second host: connection works but no robots.txt → allow all —
        # exercised by pointing at a path the 404 handler covers
        rc2 = RobotsCache(transport=HTTPTransport(timeout=5.0))
        srv2 = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), type("H2", (http.server.BaseHTTPRequestHandler,), {
                "do_GET": lambda s: s.send_error(404),
                "log_message": lambda s, *a: None,
            })
        )
        threading.Thread(target=srv2.serve_forever, daemon=True).start()
        base2 = f"http://127.0.0.1:{srv2.server_address[1]}"
        try:
            assert not rc2.disallowed(f"{base2}/anything/goes.html")
        finally:
            srv2.shutdown()
            srv2.server_close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_transport_cookie_session():
    """download-with-cookie for real: a Set-Cookie from /login persists
    in the transport's jar, and a gated page serves its content only to
    a transport holding the session."""
    import http.server
    import threading

    from crawler_ray.stages.fetch import HTTPTransport

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/login":
                body = b"<html><body>logged in</body></html>"
                self.send_response(200)
                self.send_header("Set-Cookie", "session=tok42; Path=/")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/account":
                authed = "session=tok42" in (self.headers.get("Cookie") or "")
                body = b"<html><body>secret</body></html>" if authed else b"<html><body>wall</body></html>"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        fresh = HTTPTransport(timeout=5.0)
        assert "wall" in fresh.body(f"{base}/account")  # no session yet
        fresh.resolve(f"{base}/login", [f"{base}/login"])  # sets the cookie
        assert any(c.name == "session" for c in fresh.cookies)
        assert "secret" in fresh.body(f"{base}/account")  # session carried
        # a different transport instance has its own (empty) jar
        assert "wall" in HTTPTransport(timeout=5.0).body(f"{base}/account")
    finally:
        srv.shutdown()
        srv.server_close()


def test_crawl_delay_honored(ray_session):
    """robots Crawl-delay drives the politeness spacing on live
    transports: with Crawl-delay: 1 (and a 0ms configured floor), two
    sequential fetch batches to one host space out by ≥ the delay."""
    import http.server
    import threading
    import time as _time

    import pyarrow as pa
    import ray

    from crawler_ray.stages.fetch import Fetcher, HTTPTransport, PolitenessClock

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/robots.txt":
                body = b"User-agent: *\nCrawl-delay: 1\n"
            else:
                body = b"<html><body>p</body></html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        clock = [PolitenessClock.remote(0)]  # configured floor: none
        f = Fetcher(HTTPTransport(timeout=5.0), politeness=clock)

        def batch(us):
            return pa.table({"url": pa.array(us)})

        t0 = _time.monotonic()
        f(batch([f"{base}/a.html", f"{base}/b.html"]))
        f(batch([f"{base}/c.html"]))
        elapsed = _time.monotonic() - t0
        # 3 fetches at ≥1s spacing → the third starts ≥2s after t0
        assert elapsed >= 1.9, elapsed
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_transport_content_encoding():
    """HTTPTransport advertises Accept-Encoding and transparently
    decompresses gzip / deflate (zlib-wrapped AND raw-deflate) bodies;
    a corrupt compressed stream degrades to an error status row, never
    an exception."""
    import gzip as _gzip
    import http.server
    import threading
    import zlib as _zlib

    from crawler_ray.stages.fetch import HTTPTransport

    html = "<html><body>" + "compressed page " * 50 + "</body></html>"

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            ae = self.headers.get("Accept-Encoding") or ""
            if self.path == "/gz":
                assert "gzip" in ae
                body, enc = _gzip.compress(html.encode()), "gzip"
            elif self.path == "/zl":
                body, enc = _zlib.compress(html.encode()), "deflate"
            elif self.path == "/raw":
                co = _zlib.compressobj(wbits=-_zlib.MAX_WBITS)
                body, enc = co.compress(html.encode()) + co.flush(), "deflate"
            elif self.path == "/bad":
                body, enc = b"\x1f\x8b not really gzip", "gzip"
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Encoding", enc)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        t = HTTPTransport(timeout=5.0)
        for path in ("/gz", "/zl", "/raw"):
            st, final, _ = t.resolve(f"{base}{path}", [f"{base}{path}"])
            assert st == "ok", (path, st)
            assert t.body(final) == html, path
        st, _, _ = t.resolve(f"{base}/bad", [f"{base}/bad"])
        assert st == "error"
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_transport_bogus_charset():
    """ADVICE r4: a server-supplied unknown charset token
    (Content-Type: ...; charset=bogus — common in the wild) must fall
    back to utf-8, not escape as LookupError and kill the worker."""
    import http.server
    import threading

    from crawler_ray.stages.fetch import HTTPTransport

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = "<html><body>café</body></html>".encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=bogus-charset-token")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        tr = HTTPTransport(timeout=5.0)
        st, final, _ = tr.resolve(f"{base}/x", [f"{base}/x"])
        assert st == "ok"
        assert "café" in tr.body(final)
    finally:
        srv.shutdown()
        srv.server_close()
