"""apply-bindings / transform / rewrite tests: README round-trips
(README.md:54-110, translated to v1 syntax where needed), repetition
template expansion (cuphic.cljc:259-307), and rewrite stage semantics
(cuphic.cljc:331-379)."""

from cuphic_spark.kernel.match import get_bindings
from cuphic_spark.kernel.reader import parse as p
from cuphic_spark.kernel.template import (
    apply_bindings,
    apply_stage,
    make_transformer,
    rewrite,
    transform,
)
from cuphic_spark.kernel.values import Keyword, Symbol

S = Symbol
K = Keyword


# --- README round-trips (v1: bare symbols are variables) ---------------

def test_readme_bindings():
    b = get_bindings(p('[?tag {:id ?id} "some text"]'),
                     p('[:div {:id "my-id"} "some text"]'))
    assert b == {S("?tag"): K("div"), S("?id"): "my-id"}


def test_readme_apply_bindings():
    out = apply_bindings({S("?tag"): K("p"), S("?id"): "my-id"},
                         p('[:p {:id ?id} "some other text"]'))
    assert out == p('[:p {:id "my-id"} "some other text"]')


def test_readme_transform():
    out = transform(p('[?tag {:id ?id} "some text"]'),
                    p('[:p {:id ?id} "some other text"]'),
                    p('[:div {:id "my-id"} "some text"]'))
    assert out == p('[:p {:id "my-id"} "some other text"]')


def test_transform_non_match_returns_none():
    assert transform(p('[:span {} ???]'), p('[:p {} "x"]'),
                     p('[:div {} "y"]')) is None


def test_transform_from_fn_escape_hatch():
    # README.md:83-96
    def from_fn(hiccup):
        attrs = hiccup[1] if len(hiccup) > 1 and isinstance(hiccup[1], dict) else {}
        if K("id") in attrs and hiccup[-1] == "some text":
            return {S("?id"): attrs[K("id")]}
        return None

    out = transform(from_fn, p('[:p {:id ?id} "some other text"]'),
                    p('[:div {:id "my-id"} "some text"]'))
    assert out == p('[:p {:id "my-id"} "some other text"]')


def test_transform_to_fn_escape_hatch():
    # README.md:98-108
    out = transform(p('[?tag {:id ?id} "some text"]'),
                    lambda b: p('[:p {} "x"]') + [b[S("?id")]],
                    p('[:div {:id "my-id"} "some text"]'))
    assert out == [K("p"), {}, "x", "my-id"]


def test_unbound_symbols_stay_literal():
    out = apply_bindings({}, p('[:p {:id ?id} x]'))
    assert out == [K("p"), {K("id"): S("?id")}, S("x")]


def test_nil_and_false_bindings_never_substitute():
    # if-let, cuphic.cljc:305
    out = apply_bindings({S("x"): None, S("y"): False}, p("[:p {} x y]"))
    assert out == [K("p"), {}, S("x"), S("y")]


def test_substitution_inside_attr_maps():
    # vector-map-zip zips maps too (zip.cljc:5-15)
    out = apply_bindings({S("v"): "1", S("k"): K("data-x")},
                         p("[:p {k v} ???]"))
    assert out[1] == {K("data-x"): "1"}


# --- repetition templates ----------------------------------------------

def test_repetition_template_expansion():
    b = get_bindings(p("[:dl (... k v)]"),
                     p('[:dl {} "k1" "v1" "k2" "v2"]'))
    out = apply_bindings(b, p("[:ul {} (... [:li {} k v])]"))
    assert out == p('[:ul {} [:li {} "k1" "v1"] [:li {} "k2" "v2"]]')


def test_repetition_template_scalar_repeats():
    # scalars repeat as-is alongside quantified vars (cuphic.cljc:271-280)
    b = {S("sep"): "|", S("x"): ["a", "b"]}
    out = apply_bindings(b, p("[:p {} (... x sep)]"))
    assert out == p('[:p {} "a" "|" "b" "|"]')


def test_repetition_template_shortest_collection_wins():
    b = {S("x"): ["a", "b", "c"], S("y"): ["1", "2"]}
    out = apply_bindings(b, p("[:p {} (... x y)]"))
    # :done? flips when a collection reaches <=1 remaining after a pop:
    # iteration 1 pops to (2,1) remaining; iteration 2 pops y to 0 ->
    # done -> stop after 2 iterations.
    assert out == p('[:p {} "a" "1" "b" "2"]')


def test_repetition_round_trip():
    # match then re-instantiate the same shape
    hiccup = p('[:list {} [:li {} "a"] [:li {} "b"] [:li {} "c"]]')
    b = get_bindings(p("[:list (... item)]"), hiccup)
    out = apply_bindings(b, p("[:list {} (... item)]"))
    assert out == hiccup


def test_quirk_scalar_vector_binding_is_treated_as_quantified():
    # coll? is true for a variable bound to a single element node ->
    # inside a repetition template it pops that node's ELEMENTS
    # (cuphic.cljc:272-280; deliberate fidelity)
    b = {S("x"): p('[:b {} "t"]')}
    out = apply_bindings(b, p("[:p {} (... x)]"))
    assert out == [K("p"), {}, K("b"), {}, "t"]


# --- transformer / rewrite ----------------------------------------------

def test_make_transformer():
    t = make_transformer(p("[:b {} x]"), p("[:strong {} x]"))
    assert t(p('[:b {} "hi"]')) == p('[:strong {} "hi"]')
    assert t(p('[:i {} "hi"]')) is None


def test_rewrite_single_stage():
    t = make_transformer(p("[:b {} x]"), p("[:strong {} x]"))
    out = rewrite(p('[:div {} [:b {} "a"] [:i {} [:b {} "b"]]]'),
                  {"transformers": [t]})
    assert out == p('[:div {} [:strong {} "a"] [:i {} [:strong {} "b"]]]')


def test_rewrite_first_transformer_wins():
    t1 = make_transformer(p("[:b {} x]"), p("[:one {} x]"))
    t2 = make_transformer(p("[:b {} x]"), p("[:two {} x]"))
    out = rewrite(p('[:div {} [:b {} "a"]]'), {"transformers": [t1, t2]})
    assert out == p('[:div {} [:one {} "a"]]')


def test_rewrite_stages_chain():
    t1 = make_transformer(p("[:b {} x]"), p("[:i {} x]"))
    t2 = make_transformer(p("[:i {} x]"), p("[:em {} x]"))
    out = rewrite(p('[:div {} [:b {} "a"]]'),
                  {"transformers": [t1]}, {"transformers": [t2]})
    assert out == p('[:div {} [:em {} "a"]]')


def test_rewrite_single_stage_descends_into_replacement():
    # traversal continues INTO replaced nodes (zip/next semantics), so
    # a node carried over inside a replacement is itself rewritten in
    # the same stage. (A transformer whose output re-matches itself
    # loops forever — in the reference too.)
    t = make_transformer(p("[:b {} x]"), p("[:i {} x]"))
    out = rewrite(p('[:p {} [:b {} [:b {} "a"]]]'), {"transformers": [t]})
    assert out == p('[:p {} [:i {} [:i {} "a"]]]')


def test_rewrite_seq_result_splices():
    # a transformer returning a tuple (Clojure seq) splices
    def split(node):
        if isinstance(node, list) and node and node[0] == K("pair"):
            return tuple(node[2:])
        return None

    out = rewrite(p('[:div {} [:pair {} "a" "b"] "c"]'),
                  {"transformers": [split]})
    assert out == p('[:div {} "a" "b" "c"]')


def test_rewrite_wrapper_and_default():
    t = make_transformer(p("[:b {} x]"), p("[:i {} x]"))
    calls = []

    def wrapper(old, new):
        calls.append((old, new))
        return new

    def default(n):
        return n

    out = rewrite(p('[:p {} [:b {} "a"]]'),
                  {"transformers": [t], "wrapper": wrapper, "default": default})
    assert out == p('[:p {} [:i {} "a"]]')
    assert calls == [(p('[:b {} "a"]'), p('[:i {} "a"]'))]


def test_apply_stage_default_applies_to_every_node():
    stage = {"transformers": [],
             "default": lambda n: n.upper() if isinstance(n, str) else n}
    assert apply_stage("text", stage) == "TEXT"
