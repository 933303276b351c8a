"""Sitemap-driven seed discovery (sources/sitemap.py): unit parsing +
end-to-end over a loopback http.server, incl. a live crawl seeded from
the discovered list."""

import http.server
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from crawler_ray.sources.sitemap import (
    discover_seeds,
    parse_sitemap,
    sitemaps_from_robots,
)

_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_parse_sitemap_variants():
    pages, kids = parse_sitemap(
        f'<urlset {_NS}><url><loc> http://a.com/1 </loc><lastmod>x</lastmod></url>'
        f'<url><loc>http://a.com/2</loc></url></urlset>'
    )
    assert pages == ["http://a.com/1", "http://a.com/2"] and kids == []

    pages, kids = parse_sitemap(
        f'<sitemapindex {_NS}><sitemap><loc>http://a.com/sm1.xml</loc></sitemap>'
        f'<sitemap><loc>http://a.com/sm2.xml</loc></sitemap></sitemapindex>'
    )
    assert pages == [] and kids == ["http://a.com/sm1.xml", "http://a.com/sm2.xml"]

    # tag soup degrades to the <loc> scan; plain text reads URL lines
    pages, kids = parse_sitemap("<urlset><url><loc>http://a.com/x</loc></urlset>")
    assert pages == ["http://a.com/x"]
    pages, kids = parse_sitemap("http://a.com/t1\n# junk\nhttp://a.com/t2\n")
    assert pages == ["http://a.com/t1", "http://a.com/t2"]
    assert parse_sitemap("") == ([], [])

    assert sitemaps_from_robots(
        "User-agent: *\nDisallow: /private\nSitemap: http://a.com/s.xml\nSITEMAP: http://a.com/s2.txt\n"
    ) == ["http://a.com/s.xml", "http://a.com/s2.txt"]


def _serve(pages: dict):
    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path in pages:
                body, ctype = pages[self.path]
                data = body.encode()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_discover_seeds_loopback_and_crawl(ray_session):
    from crawler_ray.stages.fetch import HTTPTransport

    srv = base = None
    pages = {}

    def page(path, links=()):
        body = "<html><body>" + "".join(
            f"<a href='{l}'>x</a>" for l in links
        ) + f"<p>content of {path}</p></body></html>"
        pages[path] = (body, "text/html; charset=utf-8")

    page("/p/1", links=["/p/2"])
    page("/p/2")
    page("/p/3")
    page("/other")  # never in a sitemap: reachable only by link from /p/1? no — isolated
    srv, base = _serve(pages)
    try:
        pages["/robots.txt"] = (
            f"User-agent: *\nSitemap: {base}/smi.xml\n", "text/plain")
        pages["/smi.xml"] = (
            f'<sitemapindex {_NS}><sitemap><loc>{base}/sm1.xml</loc></sitemap>'
            f'<sitemap><loc>{base}/sm2.txt</loc></sitemap></sitemapindex>',
            "application/xml")
        pages["/sm1.xml"] = (
            f'<urlset {_NS}><url><loc>{base}/p/1</loc></url>'
            f'<url><loc>{base}/p/2#frag</loc></url>'
            f'<url><loc>http://elsewhere.example/offsite</loc></url></urlset>',
            "application/xml")
        pages["/sm2.txt"] = (f"{base}/p/3\n{base}/p/1\n", "text/plain")

        tr = HTTPTransport(timeout=5.0)
        seeds = discover_seeds(base, tr)
        # canonicalized (fragment stripped), off-site dropped, ordered,
        # deduped across sitemaps
        assert seeds == [f"{base}/p/1", f"{base}/p/2", f"{base}/p/3"]

        # fallback path: no robots -> /sitemap.xml
        del pages["/robots.txt"]
        pages["/sitemap.xml"] = pages["/sm1.xml"]
        assert discover_seeds(base, HTTPTransport(timeout=5.0))[:2] == [
            f"{base}/p/1", f"{base}/p/2"]

        # end-to-end: live BSP crawl seeded from the discovered list
        pages["/robots.txt"] = (f"User-agent: *\nSitemap: {base}/smi.xml\n", "text/plain")
        from crawler_ray.pipelines.crawl import CrawlConfig, crawl

        cfg = CrawlConfig(n_seen_shards=2, fetch_concurrency=2,
                          transport_factory=HTTPTransport)
        res = crawl(None, seeds, cfg)
        assert res.metrics["fetched"] >= 3  # all sitemap seeds fetched
    finally:
        srv.shutdown()


def test_discover_seeds_bounded_against_hostile_feeds():
    """A cyclic/self-referential sitemapindex and an over-long urlset
    stay bounded by max_sitemaps / max_urls."""

    class FakeTransport:
        def __init__(self):
            self.fetches = 0

        def resolve(self, url, hops):
            self.fetches += 1
            return "ok", url, hops

        def body(self, url):
            if url.endswith("/robots.txt"):
                return "Sitemap: http://h.com/a.xml\n"
            if url.endswith("/a.xml"):  # cycle: a -> b -> a
                return (f'<sitemapindex><sitemap><loc>http://h.com/b.xml</loc>'
                        f'</sitemap><sitemap><loc>http://h.com/a.xml</loc>'
                        f'</sitemap></sitemapindex>')
            if url.endswith("/b.xml"):
                urls = "".join(
                    f"<url><loc>http://h.com/p/{i}</loc></url>" for i in range(500))
                return f"<urlset>{urls}</urlset>"
            return ""

    tr = FakeTransport()
    seeds = discover_seeds("http://h.com/", tr, max_sitemaps=10, max_urls=100)
    assert len(seeds) == 100  # capped
    assert tr.fetches <= 11  # robots + bounded sitemap fetches, cycle broken
