"""The Cuphic matching kernel: pattern -> bindings extraction.

Faithful reimplementation of the v1 matcher in
/root/reference/src/dk/cst/cuphic.cljc (get-bindings and helpers,
lines 11-257). This module is pure Python with zero Spark
dependencies — it runs inside Arrow-batched pandas UDFs on executors
and standalone in unit tests.

Deliberately replicated v1 quirks (each pinned by tests):

* variables do NOT unify — a symbol bound twice keeps the last value
  (plain ``merge``, cuphic.cljc:82-86);
* ``?`` and ``...`` are dead in child position (fall through every
  dispatch -> match failure, SURVEY §2.A);
* ``?var`` in child position binds like a required variable
  (cuphic.cljc:65-66);
* attr maps are open-world with a count shortcircuit
  (cuphic.cljc:34);
* a gap (``???``) immediately before a repetition section drops the
  repetition pnode from its lookahead target (cuphic.cljc:220-222),
  so the gap matches minimally;
* repetition chunking maps over ALL complete chunks and silently
  drops failed ones; the trailing partial chunk is dropped
  (cuphic.cljc:128-137);
* Clojure truthiness: a literal ``false``/``nil`` node terminates the
  node walk as if exhausted (``(when (not node) ...)``).
"""

from __future__ import annotations

from . import symbols as syms
from .values import Bindings, Symbol, is_clj_list, is_map, is_vector, truthy


def _first(seq):
    """Clojure (first coll) — nil on empty."""
    return seq[0] if seq else None


def attr_root_bindings(cattr: dict, hattr: dict):
    """Symbol-valued attr slots at the root level — cuphic.cljc:11-24.

    Present key: wildcard ignores, variable binds. Absent key: match
    fails unless the slot is an optional variable.
    """
    m = Bindings()
    for k, sym in cattr.items():
        v = hattr.get(k)
        if truthy(v):
            if syms.is_wildcard(sym):
                continue
            m[sym] = v
        else:
            if syms.is_optional_variable(sym):
                continue
            return None
    return m


def attr_other_bindings(cattr: dict, hattr: dict):
    """Literal-keyed attr pairs, open-world with recursion —
    cuphic.cljc:26-42."""
    if not (len(hattr) >= len(cattr)):  # shortcircuit, cuphic.cljc:34
        return None
    m = Bindings()
    for k, cv in cattr.items():
        hv = hattr.get(k)
        if not truthy(hv):
            return None
        delta = node_bindings(cv, hv)
        if delta is None:
            return None
        m.update(delta)
    return m


def attr_bindings(cattr: dict, hattr: dict):
    """Split cattr into slot-valued vs literal-valued keys and match
    both halves — cuphic.cljc:44-53."""
    k_to_sym = {k: v for k, v in cattr.items() if syms.is_slot(v)}
    other_cattr = {k: v for k, v in cattr.items() if k not in k_to_sym}
    other_hattr = {k: v for k, v in hattr.items() if k not in k_to_sym}
    rem = attr_other_bindings(other_cattr, other_hattr)
    if rem is None:
        return None
    sym_b = attr_root_bindings(k_to_sym, hattr)
    if sym_b is None:
        return None
    out = Bindings(rem)
    out.update(sym_b)
    return out


def node_bindings(pnode, node):
    """Single-node dispatch — cuphic.cljc:55-72. None = no match."""
    if pnode == node:
        return Bindings()
    if syms.is_wildcard(pnode):
        return Bindings()
    if syms.is_variable(pnode) or syms.is_optional_variable(pnode):
        b = Bindings()
        b[pnode] = node
        return b
    if is_map(pnode) and is_map(node):
        return attr_bindings(pnode, node)
    if is_vector(pnode) and is_vector(node):
        return get_bindings(pnode, node)
    return None


def section_bindings(pnodes, nodes):
    """Fixed-length positional zip-match — cuphic.cljc:74-86.
    Non-unifying: duplicate vars last-wins via dict.update."""
    if len(pnodes) != len(nodes):
        return None
    m = Bindings()
    for pnode, node in zip(pnodes, nodes):
        delta = node_bindings(pnode, node)
        if delta is None:
            return None
        m.update(delta)
    return m


def section_search(pnodes, nodes):
    """First occurrence of the fixed pattern in nodes (sliding window,
    O(n*m)) — cuphic.cljc:88-99. Meta: {'from': i, 'to': i+n}."""
    n = len(pnodes)
    i = 0
    while True:
        window = nodes[i:i + n]
        if len(window) < n:
            return None
        delta = section_bindings(pnodes, window)
        if delta is not None:
            return delta.with_meta({"from": i, "to": i + n})
        i += 1


def min_size(pnodes) -> int:
    """Lower bound of nodes a section needs — cuphic.cljc:101-103."""
    return sum(1 for p in pnodes if not syms.is_optional_quantification(p))


def concat_deltas(deltas):
    """Merge per-repetition binding maps into var -> vector —
    cuphic.cljc:106-111."""
    m = Bindings()
    for delta in deltas:
        for k, v in delta.items():
            m.setdefault(k, []).append(v)
    return m


def normalise(coll):
    """Insert {} attrs when the second element isn't a map —
    cuphic.cljc:113-117. (Memoization is unnecessary here: callers
    normalise once per pattern at compile time / once per node.)"""
    if len(coll) > 1 and is_map(coll[1]):
        return coll
    return [_first(coll), {}] + list(coll[1:])


def repetition_bindings(pnode, nodes):
    """Chunked repetition match — cuphic.cljc:123-137.

    Chunks ``nodes`` into groups of len(inner pattern) (trailing
    partial chunk dropped, as Clojure ``partition``), matches each
    chunk independently, DROPS failed chunks, requires >=1 success for
    definite repetition. Meta 'to' = size * successful chunk count.
    """
    pattern = list(pnode[1:])
    size = len(pattern)
    if size == 0:
        # Clojure (partition 0 ...) never terminates; an empty
        # repetition pattern is rejected outright instead.
        raise ValueError("repetition pattern must have a non-empty body")
    parts = [nodes[i:i + size] for i in range(0, len(nodes) - size + 1, size)]
    deltas = [d for d in (section_bindings(pattern, p) for p in parts)
              if d is not None]
    if syms.is_definite_repetition(pnode) and not deltas:
        return None
    return concat_deltas(deltas).with_meta({"from": 0, "to": size * len(deltas)})


def arbitrary_bindings(pnodes, nodes):
    """Match one arbitrary section (wildcards/variables/optional
    quantifiers) against an exactly-bounded node window —
    cuphic.cljc:139-194.

    One quantifier per section: on reaching it, the remaining window
    is swallowed into a stack (first element = LAST node) and matching
    continues in reverse from the right end, popping the stack.
    """
    pnodes = list(pnodes)
    nodes = list(nodes)
    qnode = None
    bindings = Bindings()
    while True:
        pnode = _first(pnodes)
        node = _first(nodes)
        rest_p = pnodes[1:]
        rest_n = nodes[1:]
        if truthy(pnode):
            if syms.is_wildcard(pnode):
                if qnode is not None:
                    stack = bindings.get(qnode) or []
                    bindings[qnode] = stack[1:]
                pnodes, nodes = rest_p, rest_n
                continue
            if syms.is_variable(pnode):
                if qnode is not None:
                    stack = bindings.get(qnode) or []
                    bindings[pnode] = _first(stack)
                    bindings[qnode] = stack[1:]
                else:
                    bindings[pnode] = node
                pnodes, nodes = rest_p, rest_n
                continue
            if syms.is_quantification(pnode):
                # capture remaining nodes reversed: (into (node) nodes)
                if truthy(node):
                    bindings[pnode] = list(reversed(nodes))
                else:
                    bindings[pnode] = None
                qnode = pnode
                pnodes = list(reversed(rest_p))
                nodes = []
                continue
            # Any other pnode in an arbitrary section cannot occur by
            # construction of section-type; Clojure cond would return
            # nil (loop falls through with no recur => nil).
            return None
        # pattern exhausted (or hit literal nil/false — Clojure falsey)
        if truthy(node):
            return None
        if qnode is None:
            return bindings
        if syms.is_omission(qnode):
            stack = bindings.get(qnode)
            if syms.is_optional_quantification(qnode):
                bindings.pop(qnode, None)
                return bindings
            if stack:  # definite omission needs a non-empty stack
                bindings.pop(qnode, None)
                return bindings
            return None
        # repetition quantifier: replay the stack in document order
        stack = bindings.get(qnode) or []
        delta = repetition_bindings(qnode, list(reversed(stack)))
        if delta is not None and delta.meta.get("to") == len(stack):
            bindings.pop(qnode, None)
            bindings.update(delta)
            return bindings
        return None


def _section_type(pnode) -> str:
    # cuphic.cljc:204-207 — arbitrary? tested BEFORE repetition?, so an
    # all-arbitrary repetition like (... x) lands in :arbitrary.
    if syms.is_arbitrary(pnode):
        return "arbitrary"
    if syms.is_repetition(pnode):
        return "repeated"
    return "other"


def _partition_by(f, coll):
    out = []
    cur = []
    cur_key = object()
    for x in coll:
        k = f(x)
        if cur and k == cur_key:
            cur.append(x)
        else:
            if cur:
                out.append(cur)
            cur = [x]
            cur_key = k
    if cur:
        out.append(cur)
    return out


def get_bindings(pattern, hiccup):
    """THE matcher — cuphic.cljc:197-251.

    Returns a :class:`Bindings` (with meta {'source': hiccup}) on a
    match, else None. Only vectors can match (string nodes skipped).
    """
    if not is_vector(hiccup):
        return None
    pattern = normalise(pattern)
    hiccup = normalise(hiccup)
    sections = _partition_by(_section_type, pattern)
    nodes = list(hiccup)
    bindings = Bindings()
    si = 0
    while True:
        pnodes = sections[si] if si < len(sections) else None
        if pnodes is not None:
            head = _first(pnodes)
            if syms.is_arbitrary(head):
                next_section = sections[si + 1] if si + 1 < len(sections) else None
                if next_section is not None:
                    # Gap-before-repetition quirk: drop the repetition
                    # pnode from the lookahead target (cuphic.cljc:220-222).
                    if syms.is_repetition(_first(next_section)):
                        target = next_section[1:]
                    else:
                        target = next_section
                    skip = min_size(pnodes)
                    next_nodes = nodes[skip:]
                    next_delta = section_search(target, next_nodes)
                    if next_delta is None:
                        return None
                    n = skip + next_delta.meta["from"]
                    delta = arbitrary_bindings(pnodes, nodes[:n])
                    if delta is None:
                        return None
                    bindings.update(delta)
                    nodes = nodes[n:]
                    si += 1
                    continue
                delta = arbitrary_bindings(pnodes, nodes)
                if delta is None:
                    return None
                bindings.update(delta)
                nodes = []
                si += 1
                continue
            if syms.is_repetition(head):
                # Only the FIRST pnode of a repeated section is
                # consumed (cuphic.cljc:237) — an adjacent second
                # repetition pnode is silently ignored.
                delta = repetition_bindings(head, nodes)
                if delta is None:
                    return None
                to = delta.meta["to"]
                bindings.update(delta)
                nodes = nodes[to:]
                si += 1
                continue
            n = len(pnodes)
            delta = section_bindings(pnodes, nodes[:n])
            if delta is None:
                return None
            bindings.update(delta)
            nodes = nodes[n:]
            si += 1
            continue
        # sections exhausted: nodes must be too (Clojure falsey first)
        if truthy(_first(nodes)):
            return None
        bindings.pop(syms.OMISSION, None)
        bindings.pop(syms.OPTIONAL_OMISSION, None)
        return bindings.with_meta({"source": hiccup})


def matches(pattern, hiccup):
    """Predicate wrapper — cuphic.cljc:253-257. Returns hiccup or None."""
    if get_bindings(pattern, hiccup) is not None:
        return hiccup
    return None


_EMPTY_DELTA: dict = {}  # shared no-bindings success marker — callers
# only read it / update() FROM it, never mutate it


def _compile_pnode(pnode):
    """Per-pnode matcher closure for FIXED sections (round-8 hot-loop
    specialization): f(node) -> bindings dict | None, semantically
    identical to ``node_bindings(pnode, node)`` (same dispatch order,
    including the equality short-circuit BEFORE slot/attr handling).
    The win: attr patterns pre-split their slot/literal keys once per
    pattern instead of rebuilding three dicts per node."""
    if isinstance(pnode, Symbol):
        if syms.is_wildcard(pnode):
            # equality first in node_bindings, but both branches yield
            # empty bindings — collapse
            return lambda node: _EMPTY_DELTA
        if syms.is_variable(pnode) or syms.is_optional_variable(pnode):
            def var_match(node, pnode=pnode):
                if pnode == node:  # same-symbol node: no binding
                    return _EMPTY_DELTA
                return {pnode: node}
            return var_match
        # reserved non-matching symbols (? / ... in fixed position):
        # only the equality case can succeed
        return lambda node, pnode=pnode: (
            _EMPTY_DELTA if pnode == node else None)
    if is_map(pnode):
        k_to_sym = [(k, v) for k, v in pnode.items() if syms.is_slot(v)]
        slot_keys = {k for k, _v in k_to_sym}
        other_cattr = [(k, v) for k, v in pnode.items()
                       if k not in slot_keys]
        slot_plan = []  # (key, sym, optional, wildcard)
        for k, sym in k_to_sym:
            slot_plan.append((k, sym, syms.is_optional_variable(sym),
                              syms.is_wildcard(sym)))
        n_other = len(other_cattr)

        def attr_match(node, pnode=pnode):
            if pnode == node:  # dict equality short-circuit first
                return _EMPTY_DELTA
            if not is_map(node):
                return None
            # open-world count shortcircuit on the literal half
            # (len(other_hattr) >= len(other_cattr)) without building
            # the filtered dicts
            if n_other:
                present = 0
                for k in slot_keys:
                    if k in node:
                        present += 1
                if len(node) - present < n_other:
                    return None
            out = {}
            for k, cv in other_cattr:
                hv = node.get(k)
                if hv is None or hv is False:
                    return None
                delta = node_bindings(cv, hv)
                if delta is None:
                    return None
                out.update(delta)
            for k, sym, optional, wildcard in slot_plan:
                v = node.get(k)
                if v is None or v is False:
                    if optional:
                        continue
                    return None
                if wildcard:
                    continue
                out[sym] = v
            return out
        return attr_match
    if is_vector(pnode):
        nested = Matcher(pnode)

        def vec_match(node, pnode=pnode, nested=nested):
            if pnode == node:
                return _EMPTY_DELTA
            if is_vector(node):
                return nested.match(node)
            return None
        return vec_match
    # literal (Keyword, str, number, bool, None): equality only
    return lambda node, pnode=pnode: (
        _EMPTY_DELTA if pnode == node else None)


class Matcher:
    """Precompiled matcher: normalisation + section decomposition done
    ONCE per pattern instead of per node (the hot-loop equivalent of
    the reference's memoized ``normalise``, cuphic.cljc:113-117), and
    — round 8 — fixed sections compiled to per-pnode closures (see
    ``_compile_pnode``) plus a trailing-``???`` fast path.
    ``match(hiccup)`` is semantically identical to
    ``get_bindings(pattern, hiccup)`` — pinned by the golden and
    property suites, which run both paths."""

    __slots__ = ("pattern", "sections", "section_kinds", "min_sizes",
                 "_nested", "_fixed_fns", "_tail_opt_omission")

    def __init__(self, pattern):
        self.pattern = normalise(pattern)
        self.sections = _partition_by(_section_type, self.pattern)
        self.section_kinds = [_section_type(s[0]) for s in self.sections]
        self.min_sizes = [min_size(s) for s in self.sections]
        self._nested: dict[int, Matcher] = {}
        self._fixed_fns = [
            [_compile_pnode(p) for p in sec] if kind == "other" else None
            for sec, kind in zip(self.sections, self.section_kinds)]
        # a LAST section that is exactly [???]: arbitrary_bindings
        # returns {} for ANY remainder (capture then optional-omission
        # pop) — match() can just consume the rest
        self._tail_opt_omission = [
            kind == "arbitrary" and len(sec) == 1
            and syms.is_optional_omission(sec[0])
            for sec, kind in zip(self.sections, self.section_kinds)]

    def match(self, hiccup):
        if not is_vector(hiccup):
            return None
        hiccup = normalise(hiccup)
        sections = self.sections
        kinds = self.section_kinds
        nodes = list(hiccup)
        bindings = Bindings()
        n_sections = len(sections)
        si = 0
        while si < n_sections:
            pnodes = sections[si]
            kind = kinds[si]
            if kind == "arbitrary":
                if si + 1 == n_sections and self._tail_opt_omission[si]:
                    # trailing [???]: matches any remainder, binds
                    # nothing (capture + optional-omission pop in
                    # arbitrary_bindings always nets {})
                    nodes = []
                    si += 1
                    continue
                if si + 1 < n_sections:
                    next_section = sections[si + 1]
                    if kinds[si + 1] == "repeated":
                        target = next_section[1:]
                    else:
                        target = next_section
                    skip = self.min_sizes[si]
                    next_delta = section_search(target, nodes[skip:])
                    if next_delta is None:
                        return None
                    n = skip + next_delta.meta["from"]
                    delta = arbitrary_bindings(pnodes, nodes[:n])
                    if delta is None:
                        return None
                    bindings.update(delta)
                    nodes = nodes[n:]
                    si += 1
                    continue
                delta = arbitrary_bindings(pnodes, nodes)
                if delta is None:
                    return None
                bindings.update(delta)
                nodes = []
                si += 1
                continue
            if kind == "repeated":
                delta = repetition_bindings(pnodes[0], nodes)
                if delta is None:
                    return None
                nodes = nodes[delta.meta["to"]:]
                bindings.update(delta)
                si += 1
                continue
            fns = self._fixed_fns[si]
            n = len(fns)
            if len(nodes) < n:
                return None
            failed = False
            for f, node in zip(fns, nodes):
                delta = f(node)
                if delta is None:
                    failed = True
                    break
                if delta:
                    bindings.update(delta)
            if failed:
                return None
            nodes = nodes[n:]
            si += 1
        if nodes and truthy(nodes[0]):
            return None
        bindings.pop(syms.OMISSION, None)
        bindings.pop(syms.OPTIONAL_OMISSION, None)
        return bindings.with_meta({"source": hiccup})
