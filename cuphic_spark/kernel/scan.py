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
from .values import Bindings, is_vector


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
    re-derives normalisation/sections."""
    matchers = [p if isinstance(p, Matcher) else Matcher(p)
                for p in patterns]
    for node_id, node in iterate_nodes(hiccup):
        results = [m.match(node) for m in matchers]
        if any(r is not None for r in results):
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
