"""EDN reader for the reference's golden crawl artifacts (.model/.state).

The reference dumps crawl state and learned models as pretty-printed
Clojure EDN (main.clj:43-80 ``dump-state-model-corpus``; read back via
model.clj:14-17 ``read-model``).  This module parses the EDN subset
those artifacts use — maps, lists, vectors, sets, strings, keywords,
numbers, nil/true/false — and converts the shipped artifact shapes
into crawler_ray's model/state dicts (pipelines/model.py:8-16):

  * raw frequencies map ``{(xpath ...) count, ...}`` — the per-site
    ``models/*/*.model`` and ``www.*/*.model`` files (the
    ``(frequencies leaf-paths)`` model, crawl.clj);
  * estimated model ``{:action-seq freqs :pagination {path|nil xpath}}``
    (``resources/blog.shriphani.com-true.model``,
    discussion_forum.clj:28-46 ``estimate-model``) and the fixed form
    ``{:fixed true :actions [...] :pagination {...}}`` (main.clj:181-196);
  * crawl state ``{:url-queue ({:url :path :src-url}...) :visited #{}
    :lookahead n :leaf-paths (...) :leaf-limit n}`` — ``*.state``.

Two representation differences are normalized on import:

  * reference paths are LEAF-FIRST (crawl.clj:32 ``(cons xpath
    src-path)``); crawler_ray action_seq/path lists are root-first →
    reversed here;
  * reference xpaths print as ``Tag[contains(@class, 'cls')]`` (tag
    case preserved, space after the comma); dom.py:312 path_to_xpath
    emits ``tag[contains(@class,'cls')]`` → re-normalized component by
    component (tags lowercased, classes re-passed through format_attr,
    which is idempotent on reference output).
"""
from __future__ import annotations

import re

from ..dom import format_attr

# ------------------------------------------------------------------ parser


class Keyword(str):
    """A Clojure keyword; repr includes the leading ':'.

    Subclassing str keeps dict lookups trivial: Keyword(":url-queue")
    == ":url-queue"."""

    __slots__ = ()


class Symbol(str):
    """A bare EDN symbol that is not nil/true/false."""

    __slots__ = ()


_NUM_RE = re.compile(r"[-+]?(\d+\.\d*(?:[eE][-+]?\d+)?|\d+[eE][-+]?\d+|\d+N?|\d*\.\d+)")
_SYM_RE = re.compile(r"[^\s,()\[\]{}\";]+")
_WS = " \t\r\n,"


class _Reader:
    def __init__(self, text: str):
        self.s = text
        self.i = 0
        self.n = len(text)

    def error(self, msg: str):
        line = self.s.count("\n", 0, self.i) + 1
        raise ValueError(f"EDN parse error at line {line} (offset {self.i}): {msg}")

    def skip_ws(self):
        s, n = self.s, self.n
        while self.i < n:
            c = s[self.i]
            if c in _WS:
                self.i += 1
            elif c == ";":  # comment to end of line
                j = s.find("\n", self.i)
                self.i = n if j < 0 else j + 1
            else:
                return

    def read(self):
        self.skip_ws()
        if self.i >= self.n:
            self.error("unexpected end of input")
        c = self.s[self.i]
        if c == "{":
            return self._read_map()
        if c == "(" or c == "[":
            return self._read_seq(")" if c == "(" else "]")
        if c == "#":
            if self.s.startswith("#{", self.i):
                return self._read_set()
            self.error("unsupported dispatch form (only #{...} sets occur in artifacts)")
        if c == '"':
            return self._read_string()
        if c == ":":
            self.i += 1
            m = _SYM_RE.match(self.s, self.i)
            if not m:
                self.error("bad keyword")
            self.i = m.end()
            return Keyword(":" + m.group(0))
        m = _NUM_RE.match(self.s, self.i)
        if m and (m.end() >= self.n or self.s[m.end()] in _WS + ")]};"):
            tok = m.group(0)
            self.i = m.end()
            if tok.endswith("N"):
                return int(tok[:-1])
            return float(tok) if ("." in tok or "e" in tok or "E" in tok) else int(tok)
        m = _SYM_RE.match(self.s, self.i)
        if not m:
            self.error(f"unexpected character {c!r}")
        tok = m.group(0)
        self.i = m.end()
        if tok == "nil":
            return None
        if tok == "true":
            return True
        if tok == "false":
            return False
        return Symbol(tok)

    def _read_seq(self, close: str) -> tuple:
        self.i += 1  # opening bracket
        out = []
        while True:
            self.skip_ws()
            if self.i >= self.n:
                self.error(f"unterminated sequence (expected {close!r})")
            if self.s[self.i] == close:
                self.i += 1
                return tuple(out)
            out.append(self.read())

    def _read_map(self) -> dict:
        self.i += 1
        out = {}
        while True:
            self.skip_ws()
            if self.i >= self.n:
                self.error("unterminated map")
            if self.s[self.i] == "}":
                self.i += 1
                return out
            k = self.read()
            self.skip_ws()
            if self.i < self.n and self.s[self.i] == "}":
                self.error("map has odd number of forms")
            v = self.read()
            out[k] = v

    def _read_set(self) -> set:
        self.i += 2  # '#{'
        out = set()
        while True:
            self.skip_ws()
            if self.i >= self.n:
                self.error("unterminated set")
            if self.s[self.i] == "}":
                self.i += 1
                return out
            out.add(self.read())

    def _read_string(self) -> str:
        s = self.s
        i = self.i + 1
        parts = []
        while i < self.n:
            c = s[i]
            if c == '"':
                self.i = i + 1
                return "".join(parts)
            if c == "\\":
                i += 1
                if i >= self.n:
                    break
                e = s[i]
                parts.append(
                    {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}.get(e, e)
                )
                i += 1
            else:
                # bulk-copy plain runs (the .state files are ~2.5 MB of strings)
                j = i
                while j < self.n and s[j] != '"' and s[j] != "\\":
                    j += 1
                parts.append(s[i:j])
                i = j
        self.error("unterminated string")


def loads(text: str):
    """Parse one EDN form from ``text`` (artifacts hold exactly one)."""
    r = _Reader(text)
    v = r.read()
    r.skip_ws()
    if r.i < r.n:
        r.error("trailing content after the top-level form")
    return v


def read_edn(path: str):
    with open(path, "r", encoding="utf-8") as f:
        return loads(f.read())


# -------------------------------------------------------- xpath normalizing

_COMPONENT_RE = re.compile(
    r"(?P<tag>[A-Za-z][A-Za-z0-9]*)"
    r"(?:\[contains\(@class, ?'(?P<cls>[^']*)'\)\])?"
    r"(?:\[(?P<pos>\d+)\])?$"
)


def normalize_xpath(xp: str) -> str:
    """Reference xpath string → this repo's path_to_xpath formatting.

    Lowercases tags (the stdlib/lexbor parsers lowercase; HtmlCleaner
    preserved source case, e.g. ``//HTML`` in the nabble models) and
    re-emits class predicates without the space, re-applying
    format_attr (idempotent on already-normalized reference classes)."""
    if not xp.startswith("//"):
        raise ValueError(f"not an anchored xpath: {xp!r}")
    comps = []
    for seg in xp[2:].split("/"):
        m = _COMPONENT_RE.match(seg)
        if not m:
            raise ValueError(f"unrecognized xpath component {seg!r} in {xp!r}")
        comp = m.group("tag").lower()
        cls = m.group("cls")
        if cls is not None:
            comp += f"[contains(@class,'{format_attr(cls)}')]"
        if m.group("pos") is not None:
            comp += f"[{m.group('pos')}]"
        comps.append(comp)
    return "//" + "/".join(comps)


def _norm_path(path, *, reverse: bool = True) -> list[str]:
    """Reference path (leaf-first tuple/list or single xpath string) →
    root-first normalized list."""
    if path is None:
        return []
    if isinstance(path, str):
        return [normalize_xpath(path)]
    seq = [normalize_xpath(x) for x in path]
    return seq[::-1] if reverse else seq


# -------------------------------------------------------- artifact converts


def _seq_key(seq: list[str]) -> str:  # mirror of pipelines/model.py:45
    return "␟".join(seq)


def model_from_edn(obj) -> dict:
    """Parsed EDN model artifact → crawler_ray model dict
    ``{"actions": [{"action_seq", "count", "yield", "refined"}...],
    "pagination": {"paging_actions": {...}, "refine": {}}}``.

    Accepts the three shapes the reference ships (module docstring);
    actions are ordered by plan-model (execute.clj:10-17): ascending
    path length, then descending frequency — identical to
    pipelines/model.py:310's (len, -yield) sort with yield=count."""
    if not isinstance(obj, dict):
        raise ValueError("model artifact must be an EDN map")

    def from_freqs(freqs: dict) -> list[dict]:
        actions = []
        for path, cnt in freqs.items():
            if not isinstance(cnt, int):
                raise ValueError(f"frequencies value is not an int: {cnt!r}")
            actions.append(
                {
                    "action_seq": _norm_path(path),
                    "count": cnt,
                    "yield": float(cnt),
                    "refined": {},
                }
            )
        actions.sort(key=lambda a: (len(a["action_seq"]), -a["yield"]))
        return actions

    keyword_keys = any(isinstance(k, Keyword) for k in obj)
    if not keyword_keys:  # raw (frequencies leaf-paths) map
        return {
            "actions": from_freqs(obj),
            "pagination": {"paging_actions": {}, "refine": {}},
        }

    if ":action-seq" in obj:  # estimate-model form
        actions = from_freqs(obj[":action-seq"])
    elif ":actions" in obj:  # fixed form: [{:actions (paths) :refined {...}} ...]
        actions = []
        for a in obj[":actions"]:
            if isinstance(a, dict):
                seq = _norm_path(a.get(":actions"))
                y = a.get(":yield", 1)
                # reference refinements key off DOM positions of a specific
                # crawl; they don't transfer to synthetic replays → dropped.
                actions.append(
                    {"action_seq": seq, "count": int(y), "yield": float(y), "refined": {}}
                )
            else:
                actions.append(
                    {"action_seq": _norm_path(a), "count": 1, "yield": 1.0, "refined": {}}
                )
        actions.sort(key=lambda a: (len(a["action_seq"]), -a["yield"]))
    else:
        raise ValueError(f"unrecognized model artifact keys: {list(obj)[:4]}")

    paging_actions = {}
    pag = obj.get(":pagination") or {}
    if isinstance(pag, dict):
        items = pag.items()
        if ":paging-actions" in pag:  # defensive: already-nested form
            items = (pag[":paging-actions"] or {}).items()
        for src_path, xp in items:
            if isinstance(xp, str):
                paging_actions[_seq_key(_norm_path(src_path))] = normalize_xpath(xp)
    return {
        "actions": actions,
        "pagination": {"paging_actions": paging_actions, "refine": {}},
    }


def state_from_edn(obj) -> dict:
    """Parsed EDN ``.state`` artifact → dict with root-first paths:
    ``{"url_queue": [{"url","path","src_url"}...], "visited": set,
    "leaf_paths": [list[str]...], "lookahead": int, "leaf_limit": int}``."""
    if not isinstance(obj, dict) or ":url-queue" not in obj:
        raise ValueError("state artifact must be an EDN map with :url-queue")
    queue = []
    for e in obj[":url-queue"] or ():
        queue.append(
            {
                "url": e[":url"],
                "path": _norm_path(e.get(":path")),
                "src_url": e.get(":src-url"),
            }
        )
    return {
        "url_queue": queue,
        "visited": set(obj.get(":visited") or ()),
        "leaf_paths": [_norm_path(p) for p in (obj.get(":leaf-paths") or ())],
        "lookahead": obj.get(":lookahead"),
        "leaf_limit": obj.get(":leaf-limit"),
    }


def read_model_file(path: str) -> dict:
    return model_from_edn(read_edn(path))


def read_state_file(path: str) -> dict:
    return state_from_edn(read_edn(path))


# ---------------------------------------------------------------- writer


def dumps(obj, _indent: int = 0) -> str:
    """Serialize the artifact-relevant Python subset back to EDN
    (Clojure-readable): dict/tuple/list/set/str/int/float/bool/None/
    Keyword.  Dict keys print inline; collections one element per line
    at depth ≥ 1 (matching the reference's pprint-ish layout enough for
    read, which ignores whitespace)."""
    pad = " " * _indent
    if obj is None:
        return "nil"
    if obj is True:
        return "true"
    if obj is False:
        return "false"
    if isinstance(obj, Keyword):
        return str(obj)
    if isinstance(obj, str):
        return '"' + obj.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(obj, (int, float)):
        return repr(obj)
    if isinstance(obj, dict):
        items = [
            f"{dumps(k, _indent + 1)} {dumps(v, _indent + 1)}" for k, v in obj.items()
        ]
        return "{" + ("\n " + pad).join(items) + "}"
    if isinstance(obj, (tuple, list)):
        return "(" + ("\n " + pad).join(dumps(v, _indent + 1) for v in obj) + ")"
    if isinstance(obj, (set, frozenset)):
        return "#{" + ("\n  " + pad).join(dumps(v, _indent + 1) for v in sorted(obj)) + "}"
    raise TypeError(f"cannot serialize {type(obj).__name__} to EDN")


def reference_format_xpath(xp: str) -> str:
    """Inverse of normalize_xpath's spacing: this repo's
    ``contains(@class,'x')`` → the reference's ``contains(@class, 'x')``
    so exported artifacts byte-match the reference's own printer."""
    return xp.replace("[contains(@class,'", "[contains(@class, '")


def model_to_edn(model: dict) -> str:
    """crawler_ray model dict → EDN text in the reference's FIXED model
    shape (main.clj:181-196 writes ``{:fixed true :actions [...]
    :pagination {...}}``; execute-model-crawler reads it back), so a
    model learned HERE is loadable by the reference's own
    ``crawler.model/read-model``.  Paths are re-reversed to the
    reference's leaf-first order and xpath spacing restored."""
    actions = tuple(
        {
            Keyword(":actions"): tuple(
                reference_format_xpath(x) for x in reversed(a["action_seq"])
            ),
            Keyword(":yield"): a.get("yield", a.get("count", 1)),
        }
        for a in model["actions"]
    )
    pagination = {}
    for key, xp in model["pagination"]["paging_actions"].items():
        src = tuple(reference_format_xpath(x) for x in reversed(key.split("␟"))) if key else None
        pagination[src] = reference_format_xpath(xp)
    return dumps(
        {
            Keyword(":fixed"): True,
            Keyword(":actions"): actions,
            Keyword(":pagination"): pagination,
        }
    )


def write_model_file(model: dict, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(model_to_edn(model) + "\n")
