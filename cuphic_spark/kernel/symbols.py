"""Special-symbol taxonomy of the Cuphic pattern grammar.

Faithful reimplementation of the classifiers in
/root/reference/src/dk/cst/cuphic/symbols.cljc (v1 semantics — the
docstring at symbols.cljc:1-11 is the authoritative grammar; the
README describes an older syntax that does not exist in v1):

    ?      optional node (dead in v1 child position — see SURVEY §2.A)
    _      wildcard (any 1 node)
    ???    omission of 0+ nodes
    ...    omission of 1+ nodes (dead in v1 child position)
    (???)  repetition of 0+ nodes
    (...)  repetition of 1+ nodes
    var    variable (binds 1 node)
    ?var   optional variable
"""

from __future__ import annotations

from .values import Symbol, is_clj_list

WILDCARD = Symbol("_")           # symbols.cljc:14-16
OPTIONAL = Symbol("?")           # symbols.cljc:18-20
OMISSION = Symbol("...")         # symbols.cljc:22-24
OPTIONAL_OMISSION = Symbol("???")  # symbols.cljc:26-28

_RESERVED = (WILDCARD, OPTIONAL, OMISSION, OPTIONAL_OMISSION)


def _prefixed_with(sym: Symbol, prefix: str) -> bool:
    # symbols.cljc:30-32 — uses (name sym): the local part only.
    return sym.local.startswith(prefix)


def is_wildcard(pnode) -> bool:
    return pnode == WILDCARD


def is_optional(pnode) -> bool:
    return pnode == OPTIONAL


def is_variable(pnode) -> bool:
    # symbols.cljc:42-46
    return (
        isinstance(pnode, Symbol)
        and pnode not in _RESERVED
        and not _prefixed_with(pnode, "?")
    )


def is_optional_variable(pnode) -> bool:
    # symbols.cljc:48-52
    return (
        isinstance(pnode, Symbol)
        and pnode != OPTIONAL
        and pnode != OPTIONAL_OMISSION
        and _prefixed_with(pnode, "?")
    )


def is_slot(pnode) -> bool:
    # symbols.cljc:54-56 — any symbol.
    return isinstance(pnode, Symbol)


def is_optional_omission(pnode) -> bool:
    return pnode == OPTIONAL_OMISSION


def is_definite_omission(pnode) -> bool:
    return pnode == OMISSION


def is_omission(pnode) -> bool:
    # symbols.cljc:66-70
    return is_definite_omission(pnode) or is_optional_omission(pnode)


def is_optional_repetition(pnode) -> bool:
    # symbols.cljc:72-75 — a Clojure list starting with ???
    return is_clj_list(pnode) and len(pnode) > 0 and pnode[0] == OPTIONAL_OMISSION


def is_definite_repetition(pnode) -> bool:
    # symbols.cljc:77-80
    return is_clj_list(pnode) and len(pnode) > 0 and pnode[0] == OMISSION


def is_repetition(pnode) -> bool:
    # symbols.cljc:82-86
    return is_definite_repetition(pnode) or is_optional_repetition(pnode)


def is_quantification(pnode) -> bool:
    # symbols.cljc:88-92
    return is_omission(pnode) or is_repetition(pnode)


def is_optional_quantification(pnode) -> bool:
    # symbols.cljc:94-99 — can be satisfied by 0 nodes.
    return is_optional_omission(pnode) or is_optional_repetition(pnode)


def is_arbitrary(pnode) -> bool:
    # symbols.cljc:101-108
    return (
        is_wildcard(pnode)
        or is_variable(pnode)
        or is_optional_quantification(pnode)
        or (is_repetition(pnode) and all(is_arbitrary(p) for p in pnode[1:]))
    )


def slot_type(pnode) -> str | None:
    """Pure classifier — symbols.cljc:110-122 / symbols_test.cljc:5-19.

    Returns one of 'definite-repetition', 'optional-repetition',
    'optional', 'wildcard', 'optional-omission', 'definite-omission',
    'optional-variable', 'variable', or None.
    """
    if is_clj_list(pnode):
        head = pnode[0] if pnode else None
        if head == OMISSION:
            return "definite-repetition"
        if head == OPTIONAL_OMISSION:
            return "optional-repetition"
        raise ValueError(f"no matching clause for list head {head!r}")  # condp throws
    if is_optional(pnode):
        return "optional"
    if is_wildcard(pnode):
        return "wildcard"
    if is_optional_omission(pnode):
        return "optional-omission"
    if is_definite_omission(pnode):
        return "definite-omission"
    if is_optional_variable(pnode):
        return "optional-variable"
    if is_variable(pnode):
        return "variable"
    return None
