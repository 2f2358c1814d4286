"""Tree scanning / scraping — the reference's "query" surface.

Reimplements scan / select-all / select-one / scrape from
/root/reference/src/dk/cst/cuphic.cljc:381-457.

The traversal contract (hickory hiccup-zip + iterate-zipper,
zip.cljc:17-20): every loc is visited in preorder; branch nodes are
vectors, children are ``rest(node)`` — so attrs maps and strings are
visited as leaf locs but can never match (get-bindings requires a
vector, cuphic.cljc:200-201). Golden pin: ``[tag ???]`` over the TEI
test letter yields exactly 123 matches = its element count
(cuphic_test.cljc:186).
"""

from __future__ import annotations

from .match import Matcher, get_bindings
from .values import Bindings, Keyword, is_vector


def head_tag_of(matcher: Matcher):
    """The matcher's LITERAL head tag (a Keyword), or None when the
    tag position is a variable/wildcard (or anything non-Keyword).
    A literal-Keyword-headed pattern can only ever match nodes whose
    tag equals it: the normalised pattern's first fixed section pins
    pattern[0] against node[0] (section_bindings -> node_bindings
    equality), so gating on it changes no result."""
    head = matcher.pattern[0]
    return head if isinstance(head, Keyword) else None


def iterate_nodes(root):
    """Preorder ELEMENT stream with stable ids.

    Yields (node_id, node) for every vector node, numbered by element
    preorder rank — the same numbering the Spark `nodes` table uses,
    making "first in document order" an ORDER BY node_id and letting
    kernel-path and relational-path matches join/compare on node_id.

    The reference's zipper also visits strings and attr maps, but
    those can never match (get-bindings requires a vector,
    cuphic.cljc:200-201), so skipping them changes no observable
    result (golden pin: 123 matches of [tag ???] on test-1307).

    Explicit stack, NOT recursion: web documents nest arbitrarily
    deep, and the crawl's fused fetch+scan stage runs this on every
    page — a recursive generator both hits Python's recursion limit
    near depth 1000 and pays O(depth) per yield through the
    ``yield from`` chain.
    """
    counter = 0
    stack = [root]
    while stack:
        node = stack.pop()
        if not is_vector(node):
            continue
        yield counter, node
        counter += 1
        stack.extend(reversed(node[1:]))


def scan(hiccup, *patterns):
    """Lazy preorder scan — cuphic.cljc:387-406.

    Yields rows ``(node_id, node, [bindings_or_None, ...])`` for
    every node where at least one pattern matches. Patterns are
    precompiled once (Matcher) — the per-node hot loop never
    re-derives normalisation/sections.

    Head-tag gate (the reference's documented performance lever:
    "Performant Cuphic should be written to be as specific as
    possible with the outer head", README.md:130-131,144): matchers
    with a LITERAL Keyword head are indexed by tag and only run on
    nodes bearing that tag — a dict probe per node replaces a full
    match attempt per pattern. Variable/wildcard-headed matchers
    always run. Results are identical by construction (see
    head_tag_of); parity is pinned by the golden suite, which runs
    both this scan and direct get_bindings."""
    matchers = [p if isinstance(p, Matcher) else Matcher(p)
                for p in patterns]
    n = len(matchers)
    by_tag: dict[Keyword, list[int]] = {}
    generic: list[int] = []
    for ix, m in enumerate(matchers):
        tag = head_tag_of(m)
        if tag is None:
            generic.append(ix)
        else:
            by_tag.setdefault(tag, []).append(ix)
    if not by_tag:  # no literal heads: original dense loop
        for node_id, node in iterate_nodes(hiccup):
            results = [m.match(node) for m in matchers]
            if any(r is not None for r in results):
                yield node_id, node, results
        return
    for node_id, node in iterate_nodes(hiccup):
        tag = node[0] if node else None
        candidates = generic
        tagged = by_tag.get(tag) if isinstance(tag, Keyword) else None
        if tagged is not None:
            candidates = generic + tagged if generic else tagged
        hit = False
        results = [None] * n
        for ix in candidates:
            r = matchers[ix].match(node)
            if r is not None:
                results[ix] = r
                hit = True
        if hit:
            yield node_id, node, results


def select_all(hiccup, pattern):
    """All nodes matching ``pattern``, document order — cuphic.cljc:408-413."""
    return [node for _, node, results in scan(hiccup, pattern)
            if results[0] is not None]


def select_one(hiccup, pattern):
    """First matching node in document order — cuphic.cljc:415-418."""
    for _, node, results in scan(hiccup, pattern):
        if results[0] is not None:
            return node
    return None


def scrape(hiccup, key_to_pattern: dict) -> dict:
    """k->pattern scrape — cuphic.cljc:420-457.

    Returns {k: [bindings, ...]} in scan order; keys with zero
    matches are ABSENT (cuphic_test.cljc:226-227). Each bindings map
    carries meta {'node_id': preorder rank} (the relational stand-in
    for the reference's {:loc zipper-loc}).
    """
    keys = list(key_to_pattern.keys())
    patterns = [key_to_pattern[k] for k in keys]
    out: dict = {}
    for node_id, _node, results in scan(hiccup, *patterns):
        for k, b in zip(keys, results):
            if b is not None:
                if isinstance(b, Bindings):
                    b.meta = dict(b.meta, node_id=node_id)
                out.setdefault(k, []).append(b)
    return out
