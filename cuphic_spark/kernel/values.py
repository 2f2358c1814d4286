"""Value types for the Hiccup data model.

The reference (kuhumcst/cuphic) represents HTML/XML as Hiccup: nested
Clojure vectors ``[tag attrs? child...]`` where ``tag`` is a keyword,
``attrs`` a map, text children are strings, and pattern trees add
symbols with special meanings (see ``symbols.py``).

Python mapping (chosen so the four Clojure collection/atom kinds that
carry semantics stay distinguishable):

=================  =======================
Clojure            Python
=================  =======================
vector (element)   ``list``
list (repetition)  ``tuple``
map (attrs)        ``dict``
keyword            :class:`Keyword`
symbol             :class:`Symbol`
string/num/bool    ``str``/``int``/``float``/``bool``
nil                ``None``
=================  =======================

Reference files: /root/reference/src/dk/cst/cuphic.cljc,
/root/reference/src/dk/cst/cuphic/symbols.cljc.
"""

from __future__ import annotations


class Keyword:
    """A Clojure-style keyword, e.g. ``:p`` or ``:xml/id``.

    ``name`` holds the full qualified name in Clojure spelling
    (``"xml/id"`` — the XML parser converts ``xml:id`` to this form,
    mirroring ``keywordize`` at xml.cljc:26-32).
    """

    __slots__ = ("name", "_hash")

    def __init__(self, name: str):
        self.name = name
        # cached at construction: Keywords are dict keys (attrs maps)
        # and tag-gate probes in the per-page hot loops — the old
        # hash(("kw", name)) built a tuple per call (round-8 profile:
        # ~0.25M hash calls per 8k pages). XOR keeps Keyword("x") and
        # Symbol("x") hashes distinct, mirroring the old tuple tag.
        self._hash = hash(name) ^ 0x6B77  # "kw"

    def __eq__(self, other):
        return self is other or (isinstance(other, Keyword)
                                 and other.name == self.name)

    def __hash__(self):
        return self._hash

    def __reduce__(self):
        # hash(str) is per-process (randomized): a pickled _hash from
        # the driver would be inconsistent with executor-local hashes.
        # Reconstruct through __init__ so _hash is always local.
        return (Keyword, (self.name,))

    def __repr__(self):
        return f":{self.name}"

    @property
    def namespace(self) -> str | None:
        ns, sep, _ = self.name.partition("/")
        return ns if sep else None

    @property
    def local(self) -> str:
        _, sep, local = self.name.partition("/")
        return local if sep else self.name


class Symbol:
    """A Clojure-style symbol, e.g. ``tag``, ``?id``, ``term/type``,
    ``_``, ``...``, ``???``.

    ``local`` mirrors Clojure ``(name sym)`` — the part after the
    namespace separator — which is what the reference's prefix checks
    use (symbols.cljc:30-32).
    """

    __slots__ = ("name", "_hash")

    def __init__(self, name: str):
        self.name = name
        self._hash = hash(name) ^ 0x736D  # "sm" — see Keyword._hash

    def __eq__(self, other):
        return self is other or (isinstance(other, Symbol)
                                 and other.name == self.name)

    def __hash__(self):
        return self._hash

    def __reduce__(self):
        return (Symbol, (self.name,))  # see Keyword.__reduce__

    def __repr__(self):
        return self.name

    @property
    def namespace(self) -> str | None:
        ns, sep, _ = self.name.partition("/")
        return ns if sep else None

    @property
    def local(self) -> str:
        _, sep, local = self.name.partition("/")
        return local if sep else self.name


def truthy(x) -> bool:
    """Clojure truthiness: everything except nil and false."""
    return x is not None and x is not False


def is_vector(x) -> bool:
    return isinstance(x, list)


def is_clj_list(x) -> bool:
    return isinstance(x, tuple)


def is_map(x) -> bool:
    return isinstance(x, dict)


def is_coll(x) -> bool:
    """Clojure ``coll?``: lists, vectors, maps (and sets — unused here)."""
    return isinstance(x, (list, tuple, dict, set, frozenset))


class Bindings(dict):
    """A bindings map (symbol -> captured value) with Clojure-style
    metadata carried out-of-band (``{:source hiccup}`` on get-bindings
    results, cuphic.cljc:250-251; ``{:from :to}`` on section search /
    repetition results, cuphic.cljc:96-98,135-137)."""

    __slots__ = ("meta",)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.meta = {}

    def with_meta(self, meta: dict) -> "Bindings":
        self.meta = meta
        return self
