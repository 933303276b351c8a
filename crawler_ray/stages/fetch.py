"""Fetch stage: actor pool resolving frontier URLs against the page
store, with per-host politeness, robots caching and redirect-alias
semantics.

Reference behavior reproduced (SURVEY.md §2.1, §2.11):
  * ``utils/download-with-cookie`` + global sleeps → per-host token
    bucket (PolitenessClock shards) instead of global Thread/sleep
    (crawl.clj:83,333; utils.clj:25 min-wait floor)
  * redirect caching under every hop URL (utils.clj:210-227): fetch of
    an alias returns the target body and reports the full alias chain,
    which the crawl inserts into URL-seen (crawl.clj:743-745)
  * robots: the reference declares clj-robots but never calls it
    (project.clj:12); the north_rule requires it, so fetches consult a
    per-host robots cache (fetched once per host, cached in-actor)
  * fetch errors become ``status`` rows, never silent drops
    (crawl.clj:93-94 silently nils — made explicit here)

In this sandbox "fetching" is a row lookup in the synthetic site graph
(FIXTURES.md: the graph table is the web).  The graph is put in the
object store ONCE (``ray.put``) and each Fetcher actor builds its
url→row index in ``__init__`` — zero-copy read, one index build per
actor, never per batch.

The network is PLUGGABLE: Fetcher takes either a SITE_PAGES table/ref
(wrapped in SyntheticTransport) or any transport object exposing
``resolve(url, hops)`` + ``body(final_url)``.  HTTPTransport is the
real-web implementation (stdlib urllib, manual redirect hops so the
alias-chain contract matches the synthetic transport; utils.clj:205-208
is the reference's live fetch) — exercised against a loopback
http.server in tests, since this sandbox has no outbound network.
"""
from __future__ import annotations

import time

import pyarrow as pa
import ray

from ..functions.urlnorm import host_hash, url_host

# The synthetic web's robots payload: every host disallows /private/.
SYNTH_ROBOTS_DISALLOW = ("/private",)

# Session/cookie convention of the synthetic web (utils.clj:197 global
# cookie jar, utils/download-with-cookie): fetching /login sets the
# host's session cookie; /account/* pages serve their real body only to
# a fetcher presenting that cookie — otherwise they serve the login
# wall below.  Session continuity therefore CHANGES fetch outcomes,
# which is what makes the cookie store testable in-sandbox.
SYNTH_LOGIN_PATH = "/login"
SYNTH_SESSION_PREFIX = "/account"
SYNTH_LOGIN_WALL = (
    "<html>\n<body>\n"
    '<a class="login-link" href="/login">Log in</a>\n'
    "</body>\n</html>"
)


def _portless(host: str) -> str:
    """Cookie domains carry no port — normalize host:port → host so
    jar keys and shard routing agree with http.cookiejar's domains."""
    if ":" in host and host.rsplit(":", 1)[1].isdigit():
        return host.rsplit(":", 1)[0]
    return host


def _cookie_lookup_keys(host: str) -> list[str]:
    """Shard-map keys under which a cookie applying to `host` may have
    been exported: the host itself plus each parent domain with ≥2
    labels (a Domain=.example.com cookie is exported under
    'example.com' but must reach a worker fetching 'sub.example.com').
    IP hosts have no parent domains."""
    keys = [host]
    labels = host.split(".")
    if all(p.isdigit() for p in labels):  # IPv4 — no domain hierarchy
        return keys
    for i in range(1, len(labels) - 1):
        keys.append(".".join(labels[i:]))
    return keys


def _cookie_sig(cookies: list[dict]) -> tuple:
    """Order-insensitive signature of a host's serialized cookie set
    (skip shard RPCs when nothing changed)."""
    return tuple(sorted((c["name"], c.get("path") or "/", c["value"]) for c in cookies))


@ray.remote
class CookieStore:
    """One shard of the shared cookie jar (host-hash sharded like the
    politeness clocks): the distributed replacement for the reference's
    single global cookie atom (utils.clj:197).  Fetchers read/write a
    whole batch's hosts in ONE RPC per shard."""

    def __init__(self):
        # host → (cookie value, wave index the session was established
        # in; -1 = outside any wave).  First-wins: sessions don't
        # expire, and the earliest wave stamp is what the deterministic
        # gated-visibility rule needs (Fetcher.__call__).
        self.jar: dict[str, tuple[str, int]] = {}
        # LIVE-crawl jar: host (no port) → {(name, path): cookie dict}.
        # Real Set-Cookie semantics — a later cookie with the same
        # (name, path) REPLACES (unlike the synthetic first-wins jar):
        # this is how HTTPTransport workers share sessions across the
        # pool (the reference's single global cookie atom, utils.clj:197,
        # at actor-pool parallelism).
        self.http: dict[str, dict[tuple, dict]] = {}

    def get_many(self, hosts: list[str]) -> dict:
        return {h: self.jar[h] for h in hosts if h in self.jar}

    def set_many(self, kv: dict, wave: int = -1) -> None:
        for h, v in kv.items():
            self.jar.setdefault(h, (v, wave))

    def get_http(self, hosts: list[str]) -> dict:
        """host → list of serialized cookies, for the hosts that have any."""
        return {h: list(self.http[h].values()) for h in hosts if h in self.http}

    def merge_http(self, kv: dict) -> None:
        """Merge serialized cookies per host; (name, path) replaces."""
        for h, cookies in kv.items():
            slot = self.http.setdefault(h, {})
            for c in cookies:
                slot[(c["name"], c.get("path") or "/")] = c

    def dump(self) -> dict:
        """Checkpoint view of this shard's jars (tiny: one entry per
        logged-in host) — goes into the round manifest so resume
        restores session continuity exactly."""
        return {
            "synth": dict(self.jar),
            "http": {h: list(v.values()) for h, v in self.http.items()},
        }

    def restore(self, jar: dict) -> None:
        # accepts both the current {"synth": ..., "http": ...} shape and
        # the legacy flat host→(value, wave) map of older manifests;
        # JSON round-trips tuples as lists — normalize back
        if "synth" in jar or "http" in jar:
            self.jar = {h: (v[0], int(v[1])) for h, v in jar.get("synth", {}).items()}
            self.http = {}
            self.merge_http(jar.get("http", {}))
        else:
            self.jar = {h: (v[0], int(v[1])) for h, v in jar.items()}
            self.http = {}

# The reference's politeness budget constants, preserved for
# conformance-mode runs (BASELINE.md):
POLITENESS_CRAWL_MS = 1000     # crawl.clj:83, 333, 670, 777
POLITENESS_SAMPLING_MS = 2000  # crawl.clj:573, template_removal.clj:46
POLITENESS_MIN_WAIT_MS = 3000  # core.clj:20-21, utils.clj:25, gplus 3s


@ray.remote
class PolitenessClock:
    """Sharded per-host token bucket: ``reserve(host, n)`` books n fetch
    slots at ``interval_ms`` spacing and returns the wall-clock start
    time.  One RPC per (host, batch), never per URL."""

    def __init__(self, interval_ms: int):
        self.interval = interval_ms / 1000.0
        self.next_free: dict[str, float] = {}

    def reserve(self, host: str, n: int, interval_s: float | None = None) -> float:
        """``interval_s`` overrides the configured spacing for this host
        (robots.txt Crawl-delay on live crawls, never below the
        configured floor)."""
        now = time.monotonic()
        spacing = max(self.interval, interval_s or 0.0)
        start = max(now, self.next_free.get(host, 0.0))
        self.next_free[host] = start + n * spacing
        return start


class RobotsCache:
    """Per-actor robots.txt cache: one fetch per host, cached for the
    actor's lifetime (a TTL would refresh it live).

    With a live transport (HTTPTransport) the REAL ``/robots.txt`` is
    fetched and parsed via stdlib ``urllib.robotparser``; a missing or
    unreachable robots file allows everything (the web convention).
    Without a transport the synthetic convention applies (every host
    disallows /private)."""

    def __init__(self, transport=None, user_agent: str = "crawler-ray"):
        self.rules: dict[str, object] = {}
        self.transport = transport
        self.user_agent = user_agent

    def _fetch_parser(self, scheme_host: str):
        import urllib.robotparser

        rp = urllib.robotparser.RobotFileParser()
        body = self.transport.body(f"{scheme_host}/robots.txt")
        rp.parse(body.splitlines() if body else ["User-agent: *", "Allow: /"])
        return rp

    def disallowed(self, url: str) -> bool:
        host = url_host(url)
        if host not in self.rules:
            if self.transport is not None:
                scheme = url.split("://", 1)[0] if "://" in url else "http"
                self.rules[host] = self._fetch_parser(f"{scheme}://{host}")
            else:
                self.rules[host] = SYNTH_ROBOTS_DISALLOW  # synthetic fetch
        rule = self.rules[host]
        if isinstance(rule, tuple):
            path = url.split(host, 1)[-1] if host else url
            return any(path.startswith(p) for p in rule)
        return not rule.can_fetch(self.user_agent, url)

    def crawl_delay_s(self, url: str) -> float | None:
        """robots.txt Crawl-delay for this host (live transports only;
        None when absent or in synthetic mode).  Fetches/caches the
        robots file as a side effect, like disallowed()."""
        if self.transport is None:
            return None
        self.disallowed(url)  # ensure the host's parser is cached
        rule = self.rules[url_host(url)]
        if isinstance(rule, tuple):
            return None
        d = rule.crawl_delay(self.user_agent)
        return float(d) if d else None


class SyntheticTransport:
    """The in-sandbox 'network': URL → row lookup in the SITE_PAGES
    table, redirect chains via the ``redirect_to`` column.  One index
    build per actor (zero-copy plasma read), never per batch."""

    def __init__(self, table: pa.Table):
        urls = table.column("doc_id").to_pylist()
        self.idx = {u: i for i, u in enumerate(urls)}
        self.bodies = table.column("html").to_pylist()
        self.redirect = table.column("redirect_to").to_pylist()

    def resolve(self, url: str, hops: list[str]) -> tuple[str, str, list[str]]:
        cur = url
        for _ in range(5):
            i = self.idx.get(cur)
            if i is None:
                return "missing", cur, hops
            tgt = self.redirect[i]
            if not tgt:
                return ("redirect" if hops[1:] else "ok"), cur, hops
            hops.append(tgt)
            cur = tgt
        return "redirect_loop", cur, hops

    def body(self, final_url: str) -> str:
        i = self.idx.get(final_url)
        return self.bodies[i] if i is not None else ""


class HTTPTransport:
    """Live-web transport (utils.clj:205-208 is the reference's real
    fetch): stdlib urllib GET with MANUAL redirect hops so the alias
    chain matches SyntheticTransport's contract, errors surfaced as
    status rows (get-and-log, never silent drops).  The final hop's
    payload is kept so ``body(final)`` after ``resolve`` costs no
    second request.  Tested against a loopback http.server (this
    sandbox has no outbound network); per-host politeness/robots stay
    Fetcher-level concerns."""

    MAX_HOPS = 5

    def __init__(self, timeout: float = 10.0, headers: dict | None = None, max_body_bytes: int = 4 << 20):
        self.timeout = timeout
        self.headers = {"User-Agent": "crawler-ray/0.4"} | (headers or {})
        self.max_body_bytes = max_body_bytes
        self._last: tuple[str, str] | None = None  # (final_url, body)
        import http.cookiejar as _cj
        import urllib.request as _ur

        class _NoRedirect(_ur.HTTPRedirectHandler):
            def redirect_request(self, *a, **k):  # surface 3xx to us
                return None

        # per-transport cookie jar (download-with-cookie,
        # utils.clj:197-208): Set-Cookie responses persist for the
        # transport's (= the worker actor's) lifetime, so login-gated
        # pages fetched later by the same worker carry the session.
        # Cross-worker continuity is the CookieStore shards' job.
        self.cookies = _cj.CookieJar()
        self._opener = _ur.build_opener(_NoRedirect, _ur.HTTPCookieProcessor(self.cookies))

    def _get(self, url: str):
        import urllib.error as _ue
        import urllib.request as _ur
        import zlib as _zlib

        req = _ur.Request(
            url, headers=self.headers | {"Accept-Encoding": "gzip, deflate"}
        )
        try:
            with self._opener.open(req, timeout=self.timeout) as r:
                raw = r.read(self.max_body_bytes)
                enc = (r.headers.get("Content-Encoding") or "").lower()
                try:
                    if enc == "gzip":
                        # bounded decompress (zip-bomb guard: the body
                        # cap applies to the DECOMPRESSED size too)
                        d = _zlib.decompressobj(16 + _zlib.MAX_WBITS)
                        raw = d.decompress(raw, self.max_body_bytes)
                    elif enc == "deflate":
                        try:  # zlib-wrapped (the spec) …
                            raw = _zlib.decompressobj().decompress(raw, self.max_body_bytes)
                        except _zlib.error:  # … or raw-deflate (the wild)
                            d = _zlib.decompressobj(-_zlib.MAX_WBITS)
                            raw = d.decompress(raw, self.max_body_bytes)
                except _zlib.error as e:
                    return None, None, f"ContentDecodingError: {e}"
                ctype = r.headers.get_content_charset() or "utf-8"
                try:
                    return r.status, None, raw.decode(ctype, errors="replace")
                except LookupError:
                    # server sent an unknown charset token (charset=bogus
                    # is common in the wild) — fall back to utf-8 rather
                    # than letting LookupError kill the worker
                    return r.status, None, raw.decode("utf-8", errors="replace")
        except _ue.HTTPError as e:
            loc = e.headers.get("Location") if e.headers else None
            return e.code, loc, ""
        except (_ue.URLError, TimeoutError, OSError) as e:
            return None, None, f"{type(e).__name__}: {e}"

    def resolve(self, url: str, hops: list[str]) -> tuple[str, str, list[str]]:
        from urllib.parse import urljoin

        cur = url
        for _ in range(self.MAX_HOPS):
            code, loc, payload = self._get(cur)
            if code is None:
                return "error", cur, hops  # network/DNS/timeout
            if code in (301, 302, 303, 307, 308) and loc:
                cur = urljoin(cur, loc)
                hops.append(cur)
                continue
            if code == 200:
                self._last = (cur, payload)
                return ("redirect" if hops[1:] else "ok"), cur, hops
            if code == 404:
                return "missing", cur, hops
            return f"http_{code}", cur, hops
        return "redirect_loop", cur, hops

    def body(self, final_url: str) -> str:
        if self._last and self._last[0] == final_url:
            return self._last[1]
        code, _, payload = self._get(final_url)
        return payload if code == 200 else ""

    # --- cross-worker session continuity (CookieStore sync) ---------
    # Each worker's jar is process-local; the Fetcher pushes serialized
    # cookies to the host's CookieStore shard after a batch and installs
    # the shard's cookies before the next, so a login on worker A gates
    # pages open for worker B — the live-crawl equivalent of the
    # synthetic convention's shared jar.

    _COOKIE_FIELDS = ("version", "name", "value", "port", "domain", "path",
                      "secure", "expires", "discard", "comment", "comment_url")

    def export_cookies(self) -> dict[str, list[dict]]:
        """Serialize the jar → {host (cookie domain, no port, no leading
        dot): [cookie dicts]} for shipping through a CookieStore shard.

        http.cookiejar stores Domain=-attribute cookies with a leading
        dot ('.example.com'); the pre-batch install pass queries shards
        by _portless(url_host(u)) which never has one — normalize the
        shard-map key here (the cookie dict itself keeps the dotted
        domain so jar semantics survive the round trip)."""
        out: dict[str, list[dict]] = {}
        for c in self.cookies:
            d = {f: getattr(c, f) for f in self._COOKIE_FIELDS}
            out.setdefault(c.domain.lstrip("."), []).append(d)
        return out

    def install_cookies(self, by_host: dict[str, list[dict]]) -> None:
        """Inverse of export_cookies: merge shard cookies into the live
        jar (set_cookie replaces by (domain, path, name))."""
        import http.cookiejar as _cj

        for lst in by_host.values():
            for d in lst:
                self.cookies.set_cookie(_cj.Cookie(
                    version=d.get("version") or 0,
                    name=d["name"], value=d["value"],
                    port=d.get("port"), port_specified=bool(d.get("port")),
                    domain=d["domain"], domain_specified=bool(d["domain"]),
                    domain_initial_dot=str(d["domain"]).startswith("."),
                    path=d.get("path") or "/", path_specified=True,
                    secure=bool(d.get("secure")), expires=d.get("expires"),
                    discard=bool(d.get("discard", True)),
                    comment=d.get("comment"), comment_url=d.get("comment_url"),
                    rest={},
                ))


class Fetcher:
    """map_batches actor: frontier batch → PAGES-schema batch.

    ``graph_ref``: ray.put() ref of the SITE_PAGES arrow table.
    ``politeness``: list of PolitenessClock handles (host-hash sharded),
    empty → no rate limiting (bench mode)."""

    def __init__(self, graph_ref, politeness=None, interval_ms: int = 0, cache_size: int = 0, cookie_shards=None):
        # a ref when constructed via map_batches fn_constructor_args (Ray
        # Data pickles it through); already-dereferenced when passed as a
        # plain actor constructor arg (Ray auto-resolves ObjectRefs).
        # Anything exposing resolve/body is used as the transport as-is.
        if hasattr(graph_ref, "resolve") and hasattr(graph_ref, "body"):
            self.transport = graph_ref
        else:
            table: pa.Table = (
                ray.get(graph_ref) if isinstance(graph_ref, ray.ObjectRef) else graph_ref
            )
            self.transport = SyntheticTransport(table)
        # live transports get REAL robots.txt (fetched + robotparser);
        # the synthetic graph keeps its /private convention
        self.robots = RobotsCache(
            transport=None
            if isinstance(self.transport, SyntheticTransport)
            else self.transport
        )
        self.politeness = politeness or []
        self.interval_ms = interval_ms
        # shared cookie jar shards (None → per-actor jar: each fetcher
        # keeps its own sessions, the documented single-process fallback)
        self.cookie_shards = cookie_shards or []
        self._local_jar: dict[str, tuple[str, int]] = {}
        # live-transport cookie sync state: host → signature of the last
        # cookie set exchanged with its CookieStore shard (skip the RPC
        # when nothing changed)
        self._http_synced: dict[str, tuple] = {}
        # wave context, set by the crawl loop's worker per chunk:
        # {"wave": wave index, "login_keys": {host: min packed
        # (depth, seq) key of the host's /login rows in THIS wave}}.
        # With it, gated-page visibility is the deterministic rule
        # "session committed in a PRIOR wave, or this wave's login key
        # < row key" — exactly the sequential jar semantics at any wave
        # parallelism (no dependence on fetch timing across workers).
        # None → legacy jar-presence semantics (bare Fetcher use).
        self.wave_ctx: dict | None = None
        # bounded per-actor document LRU (utils.clj:210-227's memoized
        # download cache, made bounded): keyed by FINAL url so every
        # redirect alias shares one entry.  In-sandbox the "network" is
        # an index lookup, so the cache is off (cache_size=0) unless a
        # production-shaped run turns it on; hit/miss/eviction metrics
        # are kept either way.
        from collections import OrderedDict

        self.cache_size = cache_size
        self._lru: OrderedDict[str, str] = OrderedDict()
        self.cache_hits = 0
        self.cache_misses = 0
        self.cache_evictions = 0

    def _body_for(self, final_url: str) -> str:
        """Body fetch through the LRU (the slot where a real fetcher
        does network I/O on miss)."""
        if self.cache_size > 0:
            b = self._lru.get(final_url)
            if b is not None:
                self.cache_hits += 1
                self._lru.move_to_end(final_url)
                return b
        self.cache_misses += 1
        b = self.transport.body(final_url)  # "network" fetch
        if self.cache_size > 0:
            self._lru[final_url] = b
            if len(self._lru) > self.cache_size:
                self._lru.popitem(last=False)
                self.cache_evictions += 1
        return b

    def cache_info(self) -> dict:
        return {
            "size": len(self._lru),
            "capacity": self.cache_size,
            "hits": self.cache_hits,
            "misses": self.cache_misses,
            "evictions": self.cache_evictions,
        }

    def _resolve(self, url: str, hops: list[str]) -> tuple[str, str, list[str]]:
        """Follow redirect chain; returns (status, final_url, chain)."""
        return self.transport.resolve(url, hops)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        if self.politeness and urls:
            # one reserve per distinct host in the batch
            hosts: dict[str, int] = {}
            sample: dict[str, str] = {}
            for u in urls:
                h = url_host(u)
                hosts[h] = hosts.get(h, 0) + 1
                sample.setdefault(h, u)
            starts = ray.get(
                [
                    # stable host→shard routing (NOT the salted builtin hash);
                    # live crawls honor robots Crawl-delay per host
                    self.politeness[host_hash(h, len(self.politeness))].reserve.remote(
                        h, n, self.robots.crawl_delay_s(sample[h])
                    )
                    for h, n in hosts.items()
                ]
            )
            wait = max(starts) - time.monotonic()
            if wait > 0:
                time.sleep(wait)
        # live-transport cookie pre-pass: install the batch hosts'
        # shard-held cookies into this worker's jar so sessions opened
        # by OTHER workers apply here (one get_http RPC per owning
        # shard; skipped entirely for synthetic transports)
        live_sync = bool(self.cookie_shards) and hasattr(self.transport, "install_cookies")
        if live_sync and urls:
            # query the batch hosts AND their parent domains so
            # Domain=-attribute cookies (exported under the registrable
            # domain, no leading dot) reach subdomain fetches
            hosts_np = sorted(
                {k for u in urls for k in _cookie_lookup_keys(_portless(url_host(u)))}
            )
            by_shard: dict[int, list[str]] = {}
            for h in hosts_np:
                by_shard.setdefault(host_hash(h, len(self.cookie_shards)), []).append(h)
            merged: dict[str, list[dict]] = {}
            for g in ray.get(
                [self.cookie_shards[s].get_http.remote(hs) for s, hs in by_shard.items()]
            ):
                merged.update(g)
            if merged:
                self.transport.install_cookies(merged)
                for h, lst in merged.items():
                    self._http_synced[h] = _cookie_sig(lst)

        # session pre-pass: pull the batch's host cookies in one RPC per
        # shard, but ONLY when the batch actually touches session pages
        # (zero overhead on session-free graphs)
        def _path(u: str) -> str:
            h = url_host(u)
            return u.split(h, 1)[-1] if h else u

        overlay: dict[str, tuple[str, int]] = {}
        pending_sets: dict[str, str] = {}
        jar_queried: set[str] = set()  # hosts whose shard was consulted
        wc = self.wave_ctx
        rkeys = None
        if any(_path(u).startswith((SYNTH_LOGIN_PATH, SYNTH_SESSION_PREFIX)) for u in urls):
            hosts = sorted({url_host(u) for u in urls})
            jar_queried.update(hosts)
            if self.cookie_shards:
                gets = ray.get(
                    [
                        self.cookie_shards[host_hash(h, len(self.cookie_shards))].get_many.remote([h])
                        for h in hosts
                    ]
                )
                for g in gets:
                    overlay.update(g)
            else:
                overlay.update({h: self._local_jar[h] for h in hosts if h in self._local_jar})
            if wc is not None and {"depth", "discovery_seq"} <= set(batch.column_names):
                from .seen import pack_keys

                rkeys = pack_keys(
                    batch["depth"].to_numpy(zero_copy_only=False),
                    batch["discovery_seq"].to_numpy(zero_copy_only=False),
                )
            else:
                wc = None  # bare batches (tests/bench): legacy semantics

        if rkeys is None:
            # a redirect may still land on a gated page even when the
            # frontier batch shows no session URLs (stages/seen.py's
            # wave scan never sees aliased session URLs): fall back to
            # legacy jar-presence semantics for those rows, with the
            # jar entry fetched LAZILY below when such a row appears
            wc = None

        def jar_entry(h: str):
            # lazy single-host jar fetch: a redirect can resolve to a
            # gated page for a host the pre-pass never covered (no
            # session URL in the raw batch, or a cross-host redirect)
            if h not in overlay and h not in jar_queried:
                jar_queried.add(h)
                if self.cookie_shards:
                    overlay.update(
                        ray.get(
                            self.cookie_shards[
                                host_hash(h, len(self.cookie_shards))
                            ].get_many.remote([h])
                        )
                    )
                elif h in self._local_jar:
                    overlay[h] = self._local_jar[h]
            return overlay.get(h)

        status, redirects, bodies = [], [], []
        for ri, u in enumerate(urls):
            if self.robots.disallowed(u):
                status.append("robots_denied")
                redirects.append([u])
                bodies.append("")
                continue
            st, final, chain = self._resolve(u, [u])
            status.append(st)
            redirects.append(chain)
            body = self._body_for(final) if st in ("ok", "redirect") else ""
            if body:
                fpath = _path(final)
                fhost = url_host(final)
                if fpath == SYNTH_LOGIN_PATH:
                    # login sets the session cookie (in-batch overlay so
                    # a later gated URL in the same batch sees it under
                    # legacy semantics; under wave_ctx the login-key
                    # rule decides, so batch order is irrelevant)
                    pending_sets[fhost] = "session"
                    overlay.setdefault(
                        fhost, ("session", wc["wave"] if wc is not None else -1)
                    )
                elif fpath.startswith(SYNTH_SESSION_PREFIX):
                    if wc is not None:
                        # deterministic rule: session visible iff it was
                        # committed in a PRIOR wave, or this wave holds a
                        # login for the host with a smaller (depth, seq)
                        # key than this row — ≡ the sequential jar at
                        # any wave parallelism / fetch timing
                        ent = jar_entry(fhost)
                        visible = ent is not None and ent[1] < wc["wave"]
                        if not visible:
                            lk = wc["login_keys"].get(fhost)
                            visible = lk is not None and lk < int(rkeys[ri])
                    else:
                        visible = jar_entry(fhost) is not None
                    if not visible:
                        body = SYNTH_LOGIN_WALL  # no session → login wall
            bodies.append(body)
        if pending_sets:
            wv = wc["wave"] if wc is not None else -1
            if self.cookie_shards:
                ray.get(
                    [
                        self.cookie_shards[host_hash(h, len(self.cookie_shards))].set_many.remote({h: v}, wv)
                        for h, v in pending_sets.items()
                    ]
                )
            else:
                for h, v in pending_sets.items():
                    self._local_jar.setdefault(h, (v, wv))
        # live-transport cookie post-pass: push hosts whose jar changed
        # this batch (Set-Cookie responses) to their CookieStore shard
        if live_sync:
            exported = self.transport.export_cookies()
            changed = {
                h: lst for h, lst in exported.items()
                if self._http_synced.get(h) != _cookie_sig(lst)
            }
            if changed:
                by_shard2: dict[int, dict] = {}
                for h, lst in changed.items():
                    by_shard2.setdefault(host_hash(h, len(self.cookie_shards)), {})[h] = lst
                ray.get(
                    [
                        self.cookie_shards[s].merge_http.remote(kv)
                        for s, kv in by_shard2.items()
                    ]
                )
                for h, lst in changed.items():
                    self._http_synced[h] = _cookie_sig(lst)
        out = batch.drop_columns([c for c in ("status", "redirects", "body") if c in batch.column_names])
        out = out.append_column("status", pa.array(status, type=pa.string()))
        out = out.append_column("redirects", pa.array(redirects, type=pa.list_(pa.string())))
        out = out.append_column("body", pa.array(bodies, type=pa.large_string()))
        return out
