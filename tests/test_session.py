"""Cookie-store / session semantics (SURVEY.md §2.4, utils.clj:197
global cookie jar + utils/download-with-cookie): session continuity
must CHANGE fetch outcomes — /account pages serve the login wall until
some fetcher in the pool visits /login, after which the shared
CookieStore makes every fetcher see the real bodies."""

import pyarrow as pa
import pytest
import ray

from crawler_ray import synth
from crawler_ray.pipelines.crawl import CrawlConfig, crawl
from crawler_ray.pipelines.oracle import crawl_bfs_oracle
from crawler_ray.stages.fetch import SYNTH_LOGIN_WALL, CookieStore, Fetcher


def _batch(urls):
    return pa.table({"url": pa.array(urls, type=pa.string())})


@pytest.fixture(scope="module")
def session_graph():
    return synth.generate_site_graph(
        num_hosts=2, base_pages=14, seed=5, session_gated_per_host=2
    )


def test_shared_cookie_store_spans_fetchers(ray_session, session_graph):
    """Login via fetcher B unlocks /account for fetcher A — the shared
    jar is pool-global like the reference's cookie atom."""
    graph_ref = ray.put(session_graph)
    shards = [CookieStore.options(num_cpus=0).remote() for _ in range(2)]
    fa = Fetcher(graph_ref, cookie_shards=shards)
    fb = Fetcher(graph_ref, cookie_shards=shards)
    acct = "http://h00.example.com/account/0"
    login = "http://h00.example.com/login"

    wall = fa(_batch([acct])).column("body")[0].as_py()
    assert wall == SYNTH_LOGIN_WALL
    fb(_batch([login]))  # a DIFFERENT fetcher logs in
    real = fa(_batch([acct])).column("body")[0].as_py()
    assert real != SYNTH_LOGIN_WALL
    assert "account dashboard" in real


def test_session_is_per_host(ray_session, session_graph):
    """h00's login must not unlock h01's account pages."""
    graph_ref = ray.put(session_graph)
    shards = [CookieStore.options(num_cpus=0).remote() for _ in range(2)]
    f = Fetcher(graph_ref, cookie_shards=shards)
    f(_batch(["http://h00.example.com/login"]))
    other = f(_batch(["http://h01.example.com/account/0"])).column("body")[0].as_py()
    assert other == SYNTH_LOGIN_WALL


def test_local_jar_fallback(ray_session, session_graph):
    """No shared shards → per-fetcher jar: continuity works within one
    fetcher and does NOT leak to another."""
    graph_ref = ray.put(session_graph)
    fa = Fetcher(graph_ref)
    fb = Fetcher(graph_ref)
    acct = "http://h00.example.com/account/1"
    fa(_batch(["http://h00.example.com/login"]))
    assert "account dashboard" in fa(_batch([acct])).column("body")[0].as_py()
    assert fb(_batch([acct])).column("body")[0].as_py() == SYNTH_LOGIN_WALL


def test_in_batch_login_order(ray_session, session_graph):
    """A login earlier in the SAME batch unlocks gated URLs later in
    that batch (the sequential reference would see exactly this)."""
    graph_ref = ray.put(session_graph)
    f = Fetcher(graph_ref, cookie_shards=[CookieStore.options(num_cpus=0).remote()])
    out = f(
        _batch(["http://h01.example.com/login", "http://h01.example.com/account/0"])
    )
    assert "account dashboard" in out.column("body")[1].as_py()


def test_redirect_to_gated_page_sees_live_session(ray_session):
    """A batch with NO session-prefixed frontier URL skips the cookie
    pre-pass; if a redirect then resolves to a gated /account page, the
    jar entry must be fetched lazily — a live session serves the real
    body, not the login wall (ADVICE r3: the fallback used to check an
    always-empty overlay)."""
    pages = pa.table(
        {
            "doc_id": pa.array(
                [
                    "http://hx.example.com/login",
                    "http://hx.example.com/account/0",
                    "http://hx.example.com/promo",
                ]
            ),
            "html": pa.array(
                ["<html><body>login ok</body></html>",
                 "<html><body>account dashboard 0</body></html>",
                 ""]
            ),
            "redirect_to": pa.array(["", "", "http://hx.example.com/account/0"]),
        }
    )
    graph_ref = ray.put(pages)
    shards = [CookieStore.options(num_cpus=0).remote() for _ in range(2)]
    fa = Fetcher(graph_ref, cookie_shards=shards)
    fb = Fetcher(graph_ref, cookie_shards=shards)
    promo = "http://hx.example.com/promo"

    # no session yet: the aliased gated page serves the wall
    assert fb(_batch([promo])).column("body")[0].as_py() == SYNTH_LOGIN_WALL
    fa(_batch(["http://hx.example.com/login"]))  # session established
    # a DIFFERENT fetcher, batch contains only the alias (no /login or
    # /account URL) — the lazy jar fetch must surface the session
    body = fb(_batch([promo])).column("body")[0].as_py()
    assert body != SYNTH_LOGIN_WALL
    assert "account dashboard" in body


def test_wave_parallel_sessions_match_sequential(ray_session, session_graph):
    """The deterministic gated-visibility rule (stages/fetch.py
    wave_ctx): a WAVE-PARALLEL crawl over a session-gated graph serves
    the same per-URL outcomes as the sequential jar — login earlier in
    key order unlocks, later walls — at any parallelism / fetch timing.
    (Round-2 left this racy by design; the login-key rule fixes it.)"""
    pages = session_graph
    seeds = synth.seeds_for(pages)
    oracle = crawl_bfs_oracle(pages, seeds)
    want = {t["url"]: (t["status"], t["n_links"], t["is_leaf"]) for t in oracle.trace}
    for cfg in (
        CrawlConfig(wave_size=None, n_seen_shards=3, fetch_concurrency=3),
        CrawlConfig(wave_size=5, n_seen_shards=2, fetch_concurrency=2),
        CrawlConfig(  # politeness mode pops host-partitioned waves
            wave_size=None, n_seen_shards=2, fetch_concurrency=2, politeness_ms=1
        ),
    ):
        res = crawl(pages, seeds, cfg)
        got = {t["url"]: (t["status"], t["n_links"], t["is_leaf"]) for t in res.trace}
        assert got == want, cfg


def test_session_state_survives_kill_and_resume(ray_session, session_graph):
    """The cookie jar rides in the round manifest (state/checkpoint.py):
    a crawl killed AFTER the logins but BEFORE the gated pages must
    serve real bodies on resume — without jar restore the resumed run
    would re-wall every /account page."""
    import shutil
    import tempfile

    pages = session_graph
    seeds = synth.seeds_for(pages)
    tmp = tempfile.mkdtemp(prefix="ckpt_sess_")
    try:
        base = dict(wave_size=None, snapshot_every=1, n_seen_shards=2)
        full = crawl(pages, seeds, CrawlConfig(**base))
        want = {t["url"]: (t["status"], t["n_links"], t["is_leaf"]) for t in full.trace}
        # kill after every round boundary in turn: some seam lands
        # between the /login fetch and its gated pages
        n_rounds = full.metrics["rounds"]
        assert n_rounds >= 3
        for cut in range(1, n_rounds):
            shutil.rmtree(tmp, ignore_errors=True)
            part = crawl(
                pages, seeds, CrawlConfig(**base, checkpoint_dir=tmp, max_rounds=cut)
            )
            cont = crawl(
                pages, seeds, CrawlConfig(**base, checkpoint_dir=tmp), resume=True
            )
            got = {
                t["url"]: (t["status"], t["n_links"], t["is_leaf"])
                for t in list(part.trace) + list(cont.trace)
            }
            assert got == want, f"cut after round {cut}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_crawl_conformance_with_sessions(ray_session, session_graph):
    """wave=1 crawl over a session-gated graph reproduces the
    sequential oracle exactly; the gated pages really were served their
    real bodies (n_links=0 content pages, not the 1-link wall)."""
    pages = session_graph
    seeds = synth.seeds_for(pages)
    oracle = crawl_bfs_oracle(pages, seeds)
    res = crawl(pages, seeds, CrawlConfig(wave_size=1, n_seen_shards=2))
    got = [(t["url"], t["status"], t["n_links"], t["is_leaf"]) for t in res.trace]
    want = [(t["url"], t["status"], t["n_links"], t["is_leaf"]) for t in oracle.trace]
    assert got == want
    acct = [t for t in res.trace if "/account/" in t["url"]]
    assert acct and all(t["n_links"] == 0 for t in acct)


def test_live_cookie_continuity_across_workers(ray_session):
    """Cross-worker session continuity on LIVE crawls: a real
    Set-Cookie captured by worker A's HTTPTransport jar travels through
    the CookieStore shards and is PRESENTED by worker B's transport —
    the server (not the synthetic overlay) decides gated visibility."""
    import http.server
    import threading

    from crawler_ray.stages.fetch import HTTPTransport

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/robots.txt":
                self.send_error(404)
                return
            if self.path == "/login":
                body = b"<html><body>logged in</body></html>"
                self.send_response(200)
                self.send_header("Set-Cookie", "session=tok99; Path=/")
            elif self.path == "/account":
                authed = "session=tok99" in (self.headers.get("Cookie") or "")
                body = (b"<html><body>secret</body></html>" if authed
                        else b"<html><body>wall</body></html>")
                self.send_response(200)
            else:
                self.send_error(404)
                return
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        shards = [CookieStore.options(num_cpus=0).remote() for _ in range(2)]
        worker_a = Fetcher(HTTPTransport(timeout=5.0), cookie_shards=shards)
        worker_b = Fetcher(HTTPTransport(timeout=5.0), cookie_shards=shards)

        # B first: no session anywhere → a wall (the server's, or the
        # synthetic overlay's for the /account convention)
        out0 = worker_b(pa.table({"url": [f"{base}/account"]}))
        assert "secret" not in out0["body"][0].as_py()

        # A logs in (Set-Cookie lands in A's jar, post-pass pushes it)
        out1 = worker_a(pa.table({"url": [f"{base}/login"]}))
        assert out1["status"][0].as_py() == "ok"

        # B's NEXT batch pre-pass installs the shard cookie → secret
        out2 = worker_b(pa.table({"url": [f"{base}/account"]}))
        assert "secret" in out2["body"][0].as_py()

        # a worker OUTSIDE the shard pool still has no session
        worker_c = Fetcher(HTTPTransport(timeout=5.0), cookie_shards=None)
        out3 = worker_c(pa.table({"url": [f"{base}/account"]}))
        assert "wall" in out3["body"][0].as_py() or out3["body"][0].as_py() == SYNTH_LOGIN_WALL
    finally:
        srv.shutdown()
        srv.server_close()


def test_cookie_store_dump_restore_shapes(ray_session):
    """CookieStore checkpoints BOTH jars (synthetic + live Set-Cookie)
    and restores legacy flat manifests from older rounds."""
    s = CookieStore.options(num_cpus=0).remote()
    ray.get(s.set_many.remote({"h1.test": "session"}, 3))
    ray.get(s.merge_http.remote({
        "h2.test": [{"name": "sid", "value": "a", "path": "/", "domain": "h2.test"}],
    }))
    # (name, path) replaces — Set-Cookie semantics, not first-wins
    ray.get(s.merge_http.remote({
        "h2.test": [{"name": "sid", "value": "b", "path": "/", "domain": "h2.test"}],
    }))
    d = ray.get(s.dump.remote())
    assert d["synth"] == {"h1.test": ("session", 3)}
    assert d["http"]["h2.test"][0]["value"] == "b"

    # roundtrip through JSON (the manifest) and back
    import json

    s2 = CookieStore.options(num_cpus=0).remote()
    ray.get(s2.restore.remote(json.loads(json.dumps(d))))
    assert ray.get(s2.get_many.remote(["h1.test"])) == {"h1.test": ("session", 3)}
    assert ray.get(s2.get_http.remote(["h2.test"]))["h2.test"][0]["value"] == "b"

    # legacy flat manifest (pre-live-jar rounds) still restores
    s3 = CookieStore.options(num_cpus=0).remote()
    ray.get(s3.restore.remote({"old.test": ["session", 1]}))
    assert ray.get(s3.get_many.remote(["old.test"])) == {"old.test": ("session", 1)}
    assert ray.get(s3.get_http.remote(["old.test"])) == {}


def test_domain_attribute_cookie_crosses_workers(ray_session):
    """ADVICE r4: http.cookiejar stores Domain=-attribute cookies with
    a leading dot ('.127.0.0.1'), while the pre-batch install pass
    queries shards by the portless host — the export key must be
    normalized or the common login-cookie form silently never
    propagates cross-worker."""
    import http.server
    import threading

    from crawler_ray.stages.fetch import HTTPTransport, _cookie_lookup_keys

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/login":
                body = b"<html><body>logged in</body></html>"
                self.send_response(200)
                # Domain attribute → jar stores '.127.0.0.1'
                self.send_header(
                    "Set-Cookie", "session=tok42; Path=/; Domain=127.0.0.1"
                )
            elif self.path == "/account":
                authed = "session=tok42" in (self.headers.get("Cookie") or "")
                body = (b"<html><body>secret</body></html>" if authed
                        else b"<html><body>wall</body></html>")
                self.send_response(200)
            else:
                self.send_error(404)
                return
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        shards = [CookieStore.options(num_cpus=0).remote() for _ in range(2)]
        worker_a = Fetcher(HTTPTransport(timeout=5.0), cookie_shards=shards)
        worker_b = Fetcher(HTTPTransport(timeout=5.0), cookie_shards=shards)

        out1 = worker_a(_batch([f"{base}/login"]))
        assert out1["status"][0].as_py() == "ok"
        # export key is the dot-normalized host, not '.127.0.0.1'
        exported = worker_a.transport.export_cookies()
        assert list(exported) == ["127.0.0.1"], exported

        # worker B's pre-pass finds the cookie under the host key
        out2 = worker_b(_batch([f"{base}/account"]))
        assert "secret" in out2["body"][0].as_py()
    finally:
        srv.shutdown()
        srv.server_close()


def test_cookie_lookup_keys_parent_domains():
    """Domain=.example.com cookies are exported under 'example.com';
    a worker fetching 'sub.example.com' must query that parent key.
    IP hosts have no domain hierarchy."""
    from crawler_ray.stages.fetch import _cookie_lookup_keys

    assert _cookie_lookup_keys("a.b.example.com") == [
        "a.b.example.com", "b.example.com", "example.com",
    ]
    assert _cookie_lookup_keys("example.com") == ["example.com"]
    assert _cookie_lookup_keys("127.0.0.1") == ["127.0.0.1"]
    assert _cookie_lookup_keys("localhost") == ["localhost"]
