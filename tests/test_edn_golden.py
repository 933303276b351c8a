"""Golden-artifact conformance (VERDICT r3 item 8).

The reference repo ships REAL learned models and crawl-state snapshots
(EDN dumped by main.clj:43-80; models are ``(frequencies leaf-paths)``
maps, crawl.clj, or discussion_forum.clj:28-46 estimate-model output).
These tests consume those artifacts directly:

  * every shipped .model/.state parses through sources/edn.py;
  * the bit-exact cross-artifact invariant holds: the model equals the
    frequency table of its paired state's :leaf-paths (the reference
    computed one from the other — reproducing it proves the parser AND
    the leaf-first → root-first path conversion);
  * a reference-learned model replays end-to-end through
    pipelines/replay.py over a site synthesized from the model's own
    xpaths, with exact harvest-set, action-path and pagination-pick
    agreement.
"""

import os
from collections import Counter

import pytest

from crawler_ray.functions.urlnorm import url_host
from crawler_ray.pipelines.replay import replay_parallel, replay_sequential
from crawler_ray.sources import edn
from crawler_ray.synth.golden import site_from_model

REF = "/root/reference"

MODEL_STATE_PAIRS = [
    f"{REF}/models/grails.1312388.n4.nabble.com/grails.1312388.n4.nabble.com-26-3-2014-18-15",
    f"{REF}/models/osgeo-org.1560.x6.nabble.com/osgeo-org.1560.x6.nabble.com-26-3-2014-18-57",
    f"{REF}/models/postgresql.1045698.n5.nabble.com/postgresql.1045698.n5.nabble.com-26-3-2014-18-19",
    f"{REF}/www.kidneyspace.com/28-3-2014-15-58",
    f"{REF}/www.theverge.com/28-3-2014-17-58",
]
BLOG_MODEL = f"{REF}/resources/blog.shriphani.com-true.model"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not present"
)


# ------------------------------------------------------------------ parser


def test_edn_parser_forms():
    v = edn.loads('{:a (1 2) :b [3.5 -4] :c #{"x" nil} :d "q\\"\\n", :e true}')
    assert v[":a"] == (1, 2)
    assert v[":b"] == (3.5, -4)
    assert v[":c"] == {"x", None}
    assert v[":d"] == 'q"\n'
    assert v[":e"] is True
    assert isinstance(list(v)[0], edn.Keyword)
    # comments + commas are whitespace; list keys hash as tuples
    assert edn.loads('{("a" "b") 3} ; trailing comment') == {("a", "b"): 3}
    with pytest.raises(ValueError):
        edn.loads("{:a 1} extra")
    with pytest.raises(ValueError):
        edn.loads('("unterminated')


def test_normalize_xpath():
    assert (
        edn.normalize_xpath("//HTML/body/div[contains(@class, 'nabble')]/a[contains(@class, 'post')]")
        == "//html/body/div[contains(@class,'nabble')]/a[contains(@class,'post')]"
    )
    # format_attr is idempotent on reference-normalized classes
    assert edn.normalize_xpath("//html/body/a") == "//html/body/a"
    with pytest.raises(ValueError):
        edn.normalize_xpath("relative/a")


# ------------------------------------------------------- artifact parsing


@pytest.mark.parametrize("base", MODEL_STATE_PAIRS, ids=lambda b: b.rsplit("/", 1)[-1])
def test_reference_artifacts_parse(base):
    m = edn.read_model_file(base + ".model")
    s = edn.read_state_file(base + ".state")
    assert m["actions"] and all(a["count"] > 0 for a in m["actions"])
    assert all(
        x.startswith("//html/") for a in m["actions"] for x in a["action_seq"]
    )
    # plan-model ordering (execute.clj:10-17): ascending length, then count desc
    keys = [(len(a["action_seq"]), -a["count"]) for a in m["actions"]]
    assert keys == sorted(keys)
    assert s["url_queue"] and len(s["visited"]) > 0 and s["lookahead"] == 1
    host = url_host(s["url_queue"][0]["url"])
    for e in s["url_queue"]:
        assert e["url"] and e["src_url"]
        assert url_host(e["url"]) == host == url_host(e["src_url"])


@pytest.mark.parametrize("base", MODEL_STATE_PAIRS, ids=lambda b: b.rsplit("/", 1)[-1])
def test_model_is_frequencies_of_state_leaf_paths(base):
    """The reference's model IS (frequencies leaf-paths) of its state —
    reproduce that equality bit-exactly from the parsed artifacts."""
    m = edn.read_model_file(base + ".model")
    s = edn.read_state_file(base + ".state")
    assert Counter(tuple(p) for p in s["leaf_paths"]) == {
        tuple(a["action_seq"]): a["count"] for a in m["actions"]
    }


# -------------------------------------------------------- golden replays


def test_blog_model_replay_with_pagination():
    """Replay the shipped blog.shriphani.com estimated model (the only
    artifact with a learned :pagination) over a site synthesized from
    its own xpaths: exact harvest set, action-path agreement, and the
    pagination chain followed in ascending numeric order."""
    m = edn.read_model_file(BLOG_MODEL)
    assert m["pagination"]["paging_actions"], "blog model carries pagination"
    pages, exp = site_from_model(m, fanout=3, n_pagination=2)
    res = replay_sequential(pages, [exp["entry"]], m)

    assert set(res.harvested) == exp["leaf_urls"]
    seqs = {tuple(a["action_seq"]) for a in m["actions"]}
    for t in res.trace:
        if t["is_leaf"]:
            assert tuple(t["path"]) in seqs
        assert t["path"] == exp["paths"][t["url"]]
    # the whole synthetic site is reachable through the model
    assert res.visited == set(pages.column("doc_id").to_pylist())
    # pagination-pick agreement: chain visited in ascending page order
    order = [t["url"] for t in res.trace]
    pag_idx = [order.index(u) for u in exp["pagination_urls"]]
    assert pag_idx == sorted(pag_idx) and len(pag_idx) == 2
    # parallel replay reproduces the sequential total order at wave=1
    par = replay_parallel(pages, [exp["entry"]], m, wave_size=1)
    assert [t["url"] for t in par.trace] == order
    assert par.harvested == res.harvested


@pytest.mark.parametrize(
    "model_path",
    [f"{b}.model" for b in MODEL_STATE_PAIRS] + [BLOG_MODEL],
    ids=lambda p: p.rsplit("/", 1)[-1].split("-")[0][:24],
)
def test_every_reference_model_replays_exactly(model_path):
    """EVERY shipped reference model (raw frequencies maps over SMF /
    nabble / theverge markup + the blog estimated model) drives an
    exact-harvest replay over a site synthesized from its own xpaths."""
    m = edn.read_model_file(model_path)
    pages, exp = site_from_model(m, fanout=2)
    res = replay_sequential(pages, [exp["entry"]], m)
    assert set(res.harvested) == exp["leaf_urls"]
    seqs = {tuple(a["action_seq"]) for a in m["actions"]}
    assert all(tuple(t["path"]) in seqs for t in res.trace if t["is_leaf"])
    par = replay_parallel(pages, [exp["entry"]], m, wave_size=None)
    assert set(par.harvested) == set(res.harvested)
    assert par.visited == res.visited


def test_model_export_roundtrip(ray_session):
    """Interop closure: a model LEARNED HERE exports as reference-shape
    EDN (fixed-model form, leaf-first paths, reference xpath spacing)
    and reads back equal through the same reader that parses the
    reference's own artifacts."""
    import tempfile

    from crawler_ray import synth
    from crawler_ray.pipelines.model import learn_model
    from crawler_ray.pipelines.oracle import crawl_bfs_oracle

    pages = synth.generate_site_graph(num_hosts=2, base_pages=30, seed=11)
    seeds = synth.seeds_for(pages)
    oracle = crawl_bfs_oracle(pages, seeds)
    model = learn_model(oracle.trace, pages)

    with tempfile.NamedTemporaryFile(suffix=".model", mode="w", delete=False) as f:
        path = f.name
    edn.write_model_file(model, path)
    text = open(path).read()
    assert text.startswith("{:fixed true") and "contains(@class, '" in text
    back = edn.read_model_file(path)
    assert [a["action_seq"] for a in back["actions"]] == [
        a["action_seq"] for a in model["actions"]
    ]
    assert (
        back["pagination"]["paging_actions"] == model["pagination"]["paging_actions"]
    )
    # exported yields survive the roundtrip (plan ordering preserved)
    assert [a["yield"] for a in back["actions"]] == [
        float(a["yield"]) for a in model["actions"]
    ]
    # and the raw EDN parses as a plain form too (Clojure-readable)
    form = edn.loads(text)
    assert form[":fixed"] is True and len(form[":actions"]) == len(model["actions"])


def test_edn_dumps_loads_roundtrip_property():
    """Property: dumps∘loads is identity over the EDN value space the
    artifacts use (nested maps/tuples/sets/strings/numbers/keywords)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    atoms = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**40), max_value=2**40),
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20
        ),
        st.builds(
            edn.Keyword,
            st.text(alphabet="abcdefghij-?", min_size=2, max_size=8).map(
                lambda s: ":" + s.strip("-") if not s.startswith(":") else s
            ).filter(lambda s: len(s) > 1),
        ),
    )
    values = st.recursive(
        atoms,
        lambda children: st.one_of(
            st.lists(children, max_size=4).map(tuple),
            st.dictionaries(
                st.one_of(
                    st.integers(min_value=0, max_value=99),
                    st.text(alphabet="abc", max_size=4),
                    st.lists(st.text(alphabet="xy", max_size=3), max_size=3).map(tuple),
                ),
                children,
                max_size=4,
            ),
            st.sets(st.integers(min_value=0, max_value=99), max_size=4),
        ),
        max_leaves=12,
    )

    @settings(max_examples=150, deadline=None)
    @given(values)
    def check(v):
        assert edn.loads(edn.dumps(v)) == v

    check()
