"""Property-based tests (hypothesis) over random Hiccup trees and
patterns drawn from the working v1 grammar (SURVEY §5.2 layer 5)."""

from hypothesis import given, settings, strategies as st

from cuphic_spark.kernel.match import get_bindings, matches
from cuphic_spark.kernel.reader import dumps, parse
from cuphic_spark.kernel.scan import iterate_nodes, scan
from cuphic_spark.kernel.template import apply_bindings
from cuphic_spark.kernel.values import Keyword, Symbol

TAGS = [Keyword(t) for t in ["p", "div", "span", "a", "li"]]
ATTR_KEYS = [Keyword(k) for k in ["id", "ref", "type", "href"]]
WORDS = ["alpha", "beta", "gamma", "", " x "]


@st.composite
def hiccup_trees(draw, depth=3):
    tag = draw(st.sampled_from(TAGS))
    attrs = draw(st.dictionaries(st.sampled_from(ATTR_KEYS),
                                 st.sampled_from(WORDS), max_size=3))
    n_children = draw(st.integers(0, 3)) if depth > 0 else 0
    children = []
    for _ in range(n_children):
        if draw(st.booleans()) and depth > 0:
            children.append(draw(hiccup_trees(depth=depth - 1)))
        else:
            children.append(draw(st.sampled_from(WORDS[:4])))
    return [tag, attrs, *children]


@given(hiccup_trees())
@settings(max_examples=200, deadline=None)
def test_catch_all_matches_every_element(tree):
    # [_ ???] matches every element node; scan count == element count
    pat = parse("[_ ???]")
    n_elements = sum(1 for _ in iterate_nodes(tree))
    rows = list(scan(tree, pat))
    assert len(rows) == n_elements


@given(hiccup_trees())
@settings(max_examples=200, deadline=None)
def test_matches_consistent_with_get_bindings(tree):
    pat = parse("[tag {:id id} ???]")
    b = get_bindings(pat, tree)
    m = matches(pat, tree)
    assert (b is None) == (m is None)
    if b is not None:
        assert b[Symbol("tag")] == tree[0]
        assert b[Symbol("id")] == tree[1].get(Keyword("id"))


@given(hiccup_trees())
@settings(max_examples=200, deadline=None)
def test_reader_roundtrip(tree):
    assert parse(dumps(tree)) == tree


@given(hiccup_trees(depth=2))
@settings(max_examples=200, deadline=None)
def test_identity_template_roundtrip(tree):
    """Match a fully-variable head pattern, re-instantiate the same
    pattern -> reconstructs the node (for nodes the pattern matches)."""
    pat_from = parse("[tag {} x]")
    b = get_bindings(pat_from, tree)
    if b is not None and b.get(Symbol("x")) is not None and tree[1] == {}:
        # (x binds nil on zero children — the nil-bind quirk — and nil
        # bindings never substitute; {} attrs are OPEN-WORLD so identity
        # additionally needs the node's attrs to actually be empty)
        out = apply_bindings(b, parse("[tag {} x]"))
        assert out == tree


@given(st.lists(st.sampled_from(WORDS[:4]), min_size=0, max_size=6))
@settings(max_examples=200, deadline=None)
def test_repetition_capture_then_expand(children):
    tree = [Keyword("l"), {}, *children]
    b = get_bindings(parse("[:l (??? x)]"), tree)
    assert b is not None
    got = b.get(Symbol("x"), [])
    assert list(got) == children
    if children:  # expansion reproduces the children in order
        out = apply_bindings(b, parse("[:l {} (??? x)]"))
        assert out == tree


@given(hiccup_trees())
@settings(max_examples=200, deadline=None)
def test_matcher_equals_get_bindings(tree):
    """The precompiled Matcher must be extensionally identical to
    get_bindings on every pattern shape x random tree."""
    from cuphic_spark.kernel.match import Matcher

    for src in ("[_ ???]", "[tag {:id id} ???]", "[:p {} ???]",
                "[:div {} x]", "[tag (??? c)]", "[:span {:ref ?r} a b]"):
        pat = parse(src)
        assert Matcher(pat).match(tree) == get_bindings(pat, tree), src


@given(hiccup_trees())
@settings(max_examples=100, deadline=None)
def test_scan_equals_per_node_match(tree):
    pat = parse("[:p {} ???]")
    per_node = [nid for nid, node in iterate_nodes(tree)
                if get_bindings(pat, node) is not None]
    via_scan = [nid for nid, _n, res in scan(tree, pat)
                if res[0] is not None]
    assert per_node == via_scan


# ---------------------------------------------------------------------------
# urlnorm: column expressions == urllib twin over a randomized href space
# (the supported grammar — dot-segments/protocol-relative route to the
# pandas fallback by design and are excluded here)
# ---------------------------------------------------------------------------

_SEG = st.text(alphabet="abc09-_", min_size=1, max_size=5)
_HOST = st.builds(lambda a, b: f"{a}.{b}",
                  st.sampled_from(["host0", "Host1", "EXAMPLE", "a-b"]),
                  st.sampled_from(["example", "test", "ORG"]))


@st.composite
def _hrefs(draw):
    kind = draw(st.sampled_from(["abs", "rooted", "rel"]))
    path = "/".join(draw(st.lists(_SEG, min_size=0, max_size=3)))
    frag = draw(st.sampled_from(["", "#f", "#s1"]))
    query = draw(st.sampled_from(["", "?q=1", "?a=b&c=d"]))
    if kind == "abs":
        scheme = draw(st.sampled_from(["http", "HTTPS", "https"]))
        port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
        return f"{scheme}://{draw(_HOST)}{port}/{path}{query}{frag}"
    if kind == "rooted":
        return f"/{path}{query}{frag}"
    return f"{path or 'x'}{query}{frag}"


@st.composite
def _bases(draw):
    host = draw(_HOST)
    has_path = draw(st.booleans())
    path = "/" + "/".join(draw(st.lists(_SEG, min_size=1, max_size=3))) \
        if has_path else ""
    return f"https://{host}{path}"


@given(pairs=st.lists(st.tuples(_hrefs(), _bases()),
                      min_size=1, max_size=24))
@settings(max_examples=30, deadline=None)
def test_urlnorm_columns_equal_urllib_twin(spark, pairs):
    from pyspark.sql import functions as F

    from cuphic_spark.frontier.urlnorm import canonicalize_cols
    from cuphic_spark.frontier.urlnorm_py import canonicalize_py

    df = spark.createDataFrame(pairs, "href string, base string")
    got = df.select("href", "base",
                    canonicalize_cols(F.col("href"),
                                      F.col("base")).alias("c")).collect()
    for r in got:
        assert r.c == canonicalize_py(r.href, r.base), (r.href, r.base)


# ---------------------------------------------------------------------------
# cuckoo filter: no false negatives under random insert/delete mixes
# ---------------------------------------------------------------------------

@given(st.lists(st.tuples(st.booleans(), st.integers(0, 400)),
                min_size=1, max_size=300),
       st.integers(3, 200))
@settings(max_examples=60, deadline=None)
def test_cuckoo_insert_delete_no_false_negative(ops, requested):
    import numpy as np

    from cuphic_spark.frontier.seen import CuckooFilter

    cf = CuckooFilter(requested)
    live: dict[int, int] = {}  # key -> live copy count
    for is_delete, key in ops:
        h = np.uint64(key * 0x9E3779B97F4A7C15 % (1 << 64))
        if is_delete:
            if cf.delete_hash(h):
                if live.get(key, 0) > 0:
                    live[key] -= 1
        else:
            if cf.insert_hash(h):
                live[key] = live.get(key, 0) + 1
    for key, n in live.items():
        if n > 0:
            h = np.uint64(key * 0x9E3779B97F4A7C15 % (1 << 64))
            assert cf.contains_hash(h), (key, requested, cf.n_buckets)
