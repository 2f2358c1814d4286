"""Template instantiation and tree rewriting.

Reimplements apply-bindings / transform / ->transformer / rewrite from
/root/reference/src/dk/cst/cuphic.cljc:259-379 plus the zipper helpers
it relies on (/root/reference/src/dk/cst/cuphic/zip.cljc).

Semantics preserved:

* substitution walks vectors AND maps (attr keys/values substitute
  too — vector-map-zip, zip.cljc:5-15);
* nil/false bindings never substitute (``if-let``, cuphic.cljc:305);
  unbound symbols stay literal;
* repetition templates ``(... p...)`` re-instantiate the sub-pattern
  while popping collection-valued bindings until the shortest is
  exhausted, splicing results in place (cuphic.cljc:259-304);
  a binding whose value is any collection is treated as quantified
  (Clojure ``coll?`` — this includes a variable bound to a single
  element node, replicated deliberately);
* transform accepts fn escape hatches on either side
  (cuphic.cljc:316-320);
* rewrite applies stages as full preorder passes; within a stage the
  first successful transformer wins; seq (here: tuple/generator)
  results splice; traversal descends into replacements, and spliced
  right-siblings are re-processed (zip/next semantics,
  cuphic.cljc:331-379).
"""

from __future__ import annotations

from collections.abc import Iterator

from . import symbols as syms
from .values import Symbol, is_coll, is_map, is_vector, truthy


class _RepetitionBindings:
    """Stateful view over a bindings map — cuphic.cljc:259-280.

    Acts as lookup; collection values return their first item while
    swapping in the rest. ``(':done?')`` -> a collection was
    exhausted; ``(':quantified?')`` -> a collection was seen.
    """

    def __init__(self, bindings):
        if callable(bindings):
            # Nested repetitions are undefined behaviour in the
            # reference (author TODO, cuphic.cljc:122) — reject loudly.
            raise ValueError("nested repetition templates are not supported")
        self._state = dict(bindings)
        self.done = False
        self.quantified = False

    def __call__(self, k):
        if k == ":done?":
            return self.done
        if k == ":quantified?":
            return self.quantified
        v = self._state.get(k) if isinstance(k, Symbol) else None
        if is_coll(v):
            self.quantified = True
            seq = list(v.items()) if is_map(v) else list(v)
            if len(seq) <= 1:
                self.done = True
            self._state[k] = seq[1:]
            return seq[0] if seq else None
        return v


def _lookup_fn(bindings):
    if callable(bindings):
        return bindings
    return lambda k: bindings.get(k) if isinstance(k, Symbol) else None


def apply_bindings(bindings, pattern):
    """Apply ``bindings`` to a Cuphic ``pattern`` — cuphic.cljc:284-307.

    ``bindings`` is a mapping (or the stateful repetition view). The
    result is the instantiated tree.
    """
    lookup = _lookup_fn(bindings)
    out = _subst_splice(pattern, bindings, lookup)
    # At the root a repetition would splice into its (absent) parent;
    # mirror multi-replace-at-root by returning the single node when
    # possible, else the node list.
    if len(out) == 1:
        return out[0]
    return out


def _subst_splice(node, bindings, lookup) -> list:
    """Return the list of nodes that replace ``node`` in its parent."""
    if syms.is_repetition(node):
        return _expand_repetition(node, bindings)
    replacement = lookup(node)
    if truthy(replacement):
        node = replacement
        # zip/replace + zip/next: the replacement's own root is not
        # re-examined, but its children are walked (and, for document
        # values, contain no symbols so this is a no-op).
    if is_vector(node):
        rebuilt = []
        for child in node:
            rebuilt.extend(_subst_splice(child, bindings, lookup))
        return [rebuilt]
    if is_map(node):
        rebuilt = {}
        for k, v in node.items():
            nk = _subst_one(k, bindings, lookup)
            rebuilt[nk] = _subst_one(v, bindings, lookup)
        return [rebuilt]
    return [node]


def _subst_one(node, bindings, lookup):
    out = _subst_splice(node, bindings, lookup)
    return out[0] if len(out) == 1 else out


def _expand_repetition(pnode, bindings) -> list:
    """Expand ``(... p...)`` / ``(??? p...)`` — cuphic.cljc:293-304."""
    view = _RepetitionBindings(
        bindings._state if isinstance(bindings, _RepetitionBindings) else bindings
    )
    sub_pattern = list(pnode[1:])
    if not sub_pattern:
        raise ValueError("repetition template must have a non-empty body")
    nodes: list = []
    while True:
        if view(":done?"):
            return nodes
        inst = apply_bindings(view, sub_pattern)
        # (into nodes result): the instantiated sub-pattern vector's
        # ELEMENTS are spliced.
        nodes.extend(inst if isinstance(inst, list) else [inst])
        if not view(":quantified?"):
            return nodes


def transform(from_pattern, to_pattern, hiccup):
    """from/to transformation with fn escape hatches —
    cuphic.cljc:309-321. Returns None on non-match."""
    from .match import get_bindings

    if callable(from_pattern):
        bindings = from_pattern(hiccup)
    else:
        bindings = get_bindings(from_pattern, hiccup)
    if bindings is None:
        return None
    if callable(to_pattern):
        return to_pattern(bindings)
    return apply_bindings(bindings, to_pattern)


def make_transformer(from_pattern, to_pattern):
    """->transformer — cuphic.cljc:323-329."""
    return lambda hiccup: transform(from_pattern, to_pattern, hiccup)


def _is_seq(x) -> bool:
    # Clojure seq? — true for lists/lazy seqs, false for vectors.
    return isinstance(x, (tuple, Iterator))


def apply_stage(node, stage: dict):
    """Apply one stage to one node — cuphic.cljc:331-346.
    Stage keys: 'transformers', 'wrapper', 'default'."""
    default = stage.get("default") or (lambda n: n)
    wrapper = stage.get("wrapper")
    new_node = None
    for t in stage.get("transformers", ()):
        result = t(node)
        if result is not None:
            # Clojure (first (remove nil? ...)): the first non-nil
            # result wins even if it is false — and a false result
            # then fails the if-let, leaving the node unchanged.
            new_node = result
            break
    if truthy(new_node):
        if wrapper:
            new_node = wrapper(node, new_node)
        return default(new_node)
    return default(node)


def rewrite(hiccup, *stages):
    """Multi-stage tree rewrite — cuphic.cljc:359-379. Each stage is
    one full preorder pass over the (possibly already rewritten) tree."""
    for stage in stages:
        out = _rewrite_node(hiccup, stage)
        if len(out) != 1:
            raise ValueError("root rewrite cannot splice at the root")
        hiccup = out[0]
    return hiccup


def _rewrite_node(node, stage) -> list:
    """Visit ``node``: apply the stage, then walk the result's
    children. Returns the splice list replacing node in its parent."""
    new = apply_stage(node, stage)
    if new != node and _is_seq(new):
        new = list(new)
        out: list = []
        for i, n in enumerate(new):
            if i == 0:
                # multi-replace leaves the loc AT the first spliced
                # node; zip/next then walks its children only.
                out.append(_rewrite_children(n, stage))
            else:
                # right-siblings are reached later by the traversal
                # and processed in full.
                out.extend(_rewrite_node(n, stage))
        if not new:
            out.append(None)  # multi-replace of () replaces with nil
        return out
    return [_rewrite_children(new, stage)]


def _rewrite_children(node, stage):
    # hiccup-zip: branch? = vector?, children = rest (attrs map and
    # strings are visited as leaf locs; they can't match patterns but
    # fn transformers do see them — same observable contract as the
    # reference, SURVEY §2.F).
    if not is_vector(node):
        return node
    rebuilt = [node[0]] if node else []
    for child in node[1:]:
        rebuilt.extend(_rewrite_node(child, stage))
    return rebuilt
