"""get-bindings unit cases: the reference's own table
(cuphic_test.cljc:230-244), README round-trips (as far as they exist
in v1 syntax), and pins for every v1 quirk catalogued in SURVEY §2.A/B."""

from cuphic_spark.kernel.match import get_bindings
from cuphic_spark.kernel.reader import parse as p
from cuphic_spark.kernel.values import Keyword, Symbol

S = Symbol
K = Keyword


def gb(pattern: str, hiccup: str):
    return get_bindings(p(pattern), p(hiccup))


# --- reference unit cases (cuphic_test.cljc:230-244) -----------------

def test_catch_all():
    assert gb("[_ {} ???]", '[:p {} "text here"]') == {}


def test_shortened_catch_all():
    assert gb("[_ ???]", '[:p {} "text here"]') == {}


# --- basic binding behaviour -----------------------------------------

def test_tag_variable_binds_keyword():
    assert gb("[tag ???]", '[:p {} "x"]') == {S("tag"): K("p")}


def test_literal_tag_mismatch():
    assert gb('[:div {} "x"]', '[:p {} "x"]') is None


def test_string_node_never_matches():
    assert get_bindings(p("[_ ???]"), "just a string") is None


def test_exact_child_variable():
    b = gb("[:p {} content]", '[:p {} "hello"]')
    assert b == {S("content"): "hello"}


def test_child_count_fixed_vs_arbitrary_sections():
    # Trailing variables in a TERMINAL arbitrary section bind nil when
    # the hiccup runs out (the Clojure loop destructures nil children
    # with no length check, cuphic.cljc:147-168) ...
    assert gb("[:p {} a b]", '[:p {} "one"]') == {S("a"): "one", S("b"): None}
    # ... but surplus hiccup nodes still fail (cuphic.cljc:181)
    assert gb("[:p {} a]", '[:p {} "one" "two"]') is None
    # ... and FIXED sections (here: the ?x makes it :other) length-check
    assert gb("[:p {} ?x ?y]", '[:p {} "one"]') is None


def test_nested_vector_patterns_recurse():
    b = gb("[:div {} [:span {} x]]", '[:div {} [:span {} "inner"]]')
    assert b == {S("x"): "inner"}


def test_meta_source():
    b = gb("[_ ???]", '[:p {} "x"]')
    assert b.meta["source"] == p('[:p {} "x"]')


# --- attr semantics ----------------------------------------------------

def test_attr_variable_required():
    assert gb("[:rs {:type type} ???]", '[:rs {:type "org"} "x"]') == {S("type"): "org"}
    assert gb("[:rs {:type type} ???]", '[:rs {} "x"]') is None


def test_attr_optional_variable():
    assert gb("[:p {:xml/id ?id} ???]", '[:p {:xml/id "p1"} "x"]') == {S("?id"): "p1"}
    assert gb("[:p {:xml/id ?id} ???]", '[:p {} "x"]') == {}


def test_attr_wildcard():
    assert gb("[:p {:id _} ???]", '[:p {:id "whatever"} "x"]') == {}
    assert gb("[:p {:id _} ???]", '[:p {} "x"]') is None  # wildcard attr is required


def test_attrs_open_world():
    # extra hiccup attrs are fine (attr-other-bindings, cuphic.cljc:26-42)
    assert gb("[:p {:a \"1\"} ???]", '[:p {:a "1" :b "2"} "x"]') == {}
    # literal attr value mismatch fails
    assert gb("[:p {:a \"1\"} ???]", '[:p {:a "2"} "x"]') is None
    # missing literal key fails
    assert gb("[:p {:a \"1\"} ???]", '[:p {:b "2"} "x"]') is None


def test_attr_count_shortcircuit():
    # len(hattr) >= len(cattr) on the slot-stripped maps (cuphic.cljc:34)
    assert gb('[:p {:a "1" :b "2"} ???]', '[:p {:a "1"} "x"]') is None


def test_nested_attr_values_match_recursively():
    # attr-other-bindings delegates values to node-bindings (cuphic.cljc:37)
    b = gb('[:p {:data {:k v}} ???]', '[:p {:data {:k "1"}} "x"]')
    assert b == {S("v"): "1"}


# --- v1 quirk pins (SURVEY §2.A/§2.B) ---------------------------------

def test_quirk_bare_optional_is_dead_in_child_position():
    # '?' falls through every dispatch -> match failure (SURVEY §2.A)
    assert gb("[:p {} ?]", '[:p {} "x"]') is None
    assert gb("[:p {} ?]", "[:p {}]") is None


def test_quirk_bare_definite_omission_is_dead_in_child_position():
    # '...' classified :other, no node-bindings case -> always fails
    assert gb("[:p {} ...]", '[:p {} "x"]') is None
    assert gb("[:p {} ... a]", '[:p {} "x" "y"]') is None


def test_quirk_optional_variable_required_in_child_position():
    # ?var in child position binds like a required variable
    # (cuphic.cljc:65-66; symbols.cljc:42-46 excludes it from arbitrary?)
    assert gb("[:p {} ?x]", '[:p {} "v"]') == {S("?x"): "v"}
    assert gb("[:p {} ?x]", "[:p {}]") is None  # NOT optional


def test_quirk_non_unifying_variables_last_wins():
    # duplicate var: plain merge, no equality constraint (cuphic.cljc:82-86)
    assert gb("[:p {} x x]", '[:p {} "a" "b"]') == {S("x"): "b"}


def test_quirk_attr_of_bound_var_and_child_var_merge():
    b = gb("[:p {:id x} x]", '[:p {:id "i"} "c"]')
    assert b == {S("x"): "c"}  # child section merges after attrs


# --- omission / gap matching -------------------------------------------

def test_optional_omission_matches_zero():
    assert gb("[:p {} ???]", "[:p {}]") == {}


def test_optional_omission_matches_many():
    assert gb("[:p {} ???]", '[:p {} "a" [:b {}] "c"]') == {}


def test_gap_then_fixed():
    b = gb('[:p {} ??? [:b {} x]]', '[:p {} "a" "b" [:b {} "last"]]')
    assert b == {S("x"): "last"}


def test_gap_matches_minimally_before_fixed():
    # section-search finds the FIRST occurrence (cuphic.cljc:88-99);
    # trailing nodes after it then fail the overall match.
    assert gb('[:p {} ??? [:b {} x]]',
              '[:p {} [:b {} "1"] [:b {} "2"]]') is None


def test_variable_then_gap():
    b = gb("[:p {} first ???]", '[:p {} "a" "b" "c"]')
    assert b == {S("first"): "a"}


def test_gap_then_variable():
    # arbitrary section [??? v]: quantifier captures, then v pops from
    # the right => v binds the LAST node.
    b = gb("[:p {} ??? v]", '[:p {} "a" "b" "c"]')
    assert b == {S("v"): "c"}


def test_wildcard_consumes_exactly_one():
    assert gb("[:p {} _ x]", '[:p {} "a" "b"]') == {S("x"): "b"}
    # exhaustion in a terminal arbitrary section binds nil (see above)
    assert gb("[:p {} _ x]", '[:p {} "a"]') == {S("x"): None}


# --- repetition ---------------------------------------------------------

def test_definite_repetition_capture():
    b = gb("[:list (... item)]", '[:list {} "a" "b" "c"]')
    assert b == {S("item"): ["a", "b", "c"]}


def test_definite_repetition_requires_one():
    assert gb("[:list (... item)]", "[:list {}]") is None


def test_optional_repetition_allows_zero():
    assert gb("[:list (??? item)]", "[:list {}]") == {S("item"): []} or \
           gb("[:list (??? item)]", "[:list {}]") == {}


def test_repetition_multi_var_chunks():
    b = gb("[:dl (... k v)]", '[:dl {} "k1" "v1" "k2" "v2"]')
    assert b == {S("k"): ["k1", "k2"], S("v"): ["v1", "v2"]}


def test_repetition_with_literal_is_repeated_section():
    # (... 0 a b) contains a literal -> :repeated section handled at
    # cuphic.cljc:236-239 (the README:136-141 alignment example, v1 form)
    b = gb("[:p x (... 0 a b) y ???]",
           "[:p {} 1 0 10 20 0 30 40 7 8 9]")
    assert b[S("x")] == 1
    assert b[S("a")] == [10, 30]
    assert b[S("b")] == [20, 40]
    # after the repetition stops matching, y takes the next node
    assert b[S("y")] == 7


def test_quirk_repetition_trailing_partial_chunk_dropped():
    # partition drops the trailing incomplete chunk (cuphic.cljc:130)
    # => [k v] chunking of 5 nodes leaves 1 unconsumed -> overall fail
    assert gb("[:dl (... k v)]", '[:dl {} "a" "b" "c" "d" "e"]') is None


def test_quirk_failed_middle_chunk_dropped_shrinks_to():
    # chunk (0 x): chunks are ("0" a)("1" b)("0" c); middle fails and is
    # DROPPED; :to = 2*2 = 4 so the last chunk's nodes stay unconsumed
    # -> remaining nodes -> overall nil (cuphic.cljc:128-137)
    assert gb('[:l (... "0" x)]', '[:l {} "0" "a" "1" "b" "0" "c"]') is None


def test_gap_plus_all_arbitrary_repetition_fails():
    # ??? and (... x) are BOTH arbitrary -> same section; the second
    # quantifier clobbers the first's stack capture and the definite
    # repetition then sees an empty stack -> nil (cuphic.cljc:170-193).
    assert gb("[:l ??? (... x)]", '[:l {} "a" "b"]') is None


def test_gap_before_repeated_section_matches_minimally():
    # A repetition containing a literal is a :repeated section; the
    # preceding gap's lookahead target is (rest next-section) = [] which
    # matches at :from 0 -> the gap takes ZERO nodes and the repetition
    # must start immediately (cuphic.cljc:220-222; section-search of []).
    b = gb('[:l ??? (... "0" x)]', '[:l {} "0" "a" "0" "b"]')
    assert b == {S("x"): ["a", "b"]}
    # consequence: the gap cannot absorb a non-matching prefix
    assert gb('[:l ??? (... "0" x)]', '[:l {} "junk" "0" "a"]') is None


def test_arbitrary_all_arbitrary_repetition_in_arbitrary_section():
    # (... x) is all-arbitrary -> lands in the :arbitrary branch
    # (section-type tests arbitrary? first, cuphic.cljc:204-207)
    b = gb("[:l head (... x)]", '[:l {} "h" "a" "b"]')
    assert b[S("head")] == "h"
    assert b[S("x")] == ["a", "b"]


def test_readme_style_alignment_v1():
    # The README:136-141 example translated to working v1 syntax:
    # [:p ?x *between ?y [:<> 0 ?a ?b] +remainder] becomes
    # [:p x ??? y (... 0 a b) ???] — with gap/repetition quirks applied.
    b = gb("[:p x _ _ _ _ y (... 0 a b) ???]",
           "[:p {} 1 2 3 4 5 6 0 1 2 0 1 2 7 8 9]")
    assert b[S("x")] == 1
    assert b[S("y")] == 6
    assert b[S("a")] == [1, 1]
    assert b[S("b")] == [2, 2]


def test_matches_predicate():
    from cuphic_spark.kernel.match import matches
    h = p('[:p {} "x"]')
    assert matches(p("[:p {} ???]"), h) == h
    assert matches(p("[:div {} ???]"), h) is None
