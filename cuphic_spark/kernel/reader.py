"""Minimal EDN-subset reader/writer for Hiccup trees and Cuphic patterns.

Lets patterns be written in the reference's own surface syntax, e.g.::

    parse_pattern("[:persName {:ref ref :type ?type} full-name]")

Supported forms: vectors ``[...]``, maps ``{...}``, lists ``(...)``
(repetition patterns -> Python tuples), keywords ``:foo`` / ``:ns/foo``,
symbols (including ``_ ? ... ???`` and ``?var`` / ``ns/var``), strings
with standard escapes, integers/floats, ``true``/``false``/``nil``.
Commas are whitespace. This is a reader for *our own* test/pattern
surface — not a general EDN implementation.
"""

from __future__ import annotations

from .values import Keyword, Symbol

_WS = set(" \t\n\r,")
_DELIM = set("[](){}\"")
_STR_ESC = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}


class ReaderError(ValueError):
    pass


def parse(text: str):
    """Parse a single EDN form from ``text``."""
    val, pos = _read(text, _skip_ws(text, 0))
    pos = _skip_ws(text, pos)
    if pos != len(text):
        raise ReaderError(f"trailing content at {pos}: {text[pos:pos + 20]!r}")
    return val


parse_pattern = parse
parse_hiccup = parse


def _skip_ws(t: str, i: int) -> int:
    n = len(t)
    while i < n:
        c = t[i]
        if c in _WS:
            i += 1
        elif c == ";":  # comment to end of line
            while i < n and t[i] != "\n":
                i += 1
        else:
            break
    return i


def _read(t: str, i: int):
    if i >= len(t):
        raise ReaderError("unexpected EOF")
    c = t[i]
    if c == "[":
        return _read_seq(t, i + 1, "]", list)
    if c == "(":
        return _read_seq(t, i + 1, ")", tuple)
    if c == "{":
        return _read_map(t, i + 1)
    if c == '"':
        return _read_string(t, i + 1)
    if c in ")]}":
        raise ReaderError(f"unmatched {c!r} at {i}")
    return _read_atom(t, i)


def _read_seq(t: str, i: int, closer: str, ctor):
    out = []
    while True:
        i = _skip_ws(t, i)
        if i >= len(t):
            raise ReaderError(f"unterminated sequence, expected {closer!r}")
        if t[i] == closer:
            return ctor(out), i + 1
        val, i = _read(t, i)
        out.append(val)


def _read_map(t: str, i: int):
    items = []
    while True:
        i = _skip_ws(t, i)
        if i >= len(t):
            raise ReaderError("unterminated map")
        if t[i] == "}":
            if len(items) % 2:
                raise ReaderError("map with odd number of forms")
            return dict(zip(items[::2], items[1::2])), i + 1
        val, i = _read(t, i)
        items.append(val)


def _read_string(t: str, i: int):
    out = []
    while i < len(t):
        c = t[i]
        if c == '"':
            return "".join(out), i + 1
        if c == "\\":
            i += 1
            if i >= len(t):
                break
            e = t[i]
            if e == "u":
                out.append(chr(int(t[i + 1:i + 5], 16)))
                i += 4
            else:
                out.append(_STR_ESC.get(e, e))
        else:
            out.append(c)
        i += 1
    raise ReaderError("unterminated string")


def _read_atom(t: str, i: int):
    j = i
    n = len(t)
    while j < n and t[j] not in _WS and t[j] not in _DELIM and t[j] != ";":
        j += 1
    tok = t[i:j]
    if not tok:
        raise ReaderError(f"empty token at {i}")
    if tok == "true":
        return True, j
    if tok == "false":
        return False, j
    if tok == "nil":
        return None, j
    if tok.startswith(":"):
        return Keyword(tok[1:]), j
    num = _try_number(tok)
    if num is not None:
        return num, j
    return Symbol(tok), j


def _try_number(tok: str):
    try:
        return int(tok)
    except ValueError:
        pass
    # '...' etc. must stay symbols; float() accepts 'nan'/'inf' — exclude
    if any(ch.isdigit() for ch in tok):
        try:
            return float(tok)
        except ValueError:
            pass
    return None


def dumps(x) -> str:
    """Serialize a value back to the EDN-subset text form (stable,
    round-trippable through :func:`parse`). Used as the tagged string
    encoding for non-string binding values in Spark columns.

    Explicit work stack, NOT recursion: the subtree assist serializes
    whole page subtrees through this, and web documents nest past
    Python's recursion limit (advisor round-2)."""
    out: list[str] = []
    stack: list[tuple[str, object]] = [("v", x)]
    while stack:
        kind, v = stack.pop()
        if kind == "s":
            out.append(v)  # pre-rendered token
            continue
        if v is None:
            out.append("nil")
        elif v is True:
            out.append("true")
        elif v is False:
            out.append("false")
        elif isinstance(v, Keyword):
            out.append(f":{v.name}")
        elif isinstance(v, Symbol):
            out.append(v.name)
        elif isinstance(v, str):
            out.append('"' + v.replace("\\", "\\\\").replace('"', '\\"')
                       + '"')
        elif isinstance(v, (int, float)):
            out.append(repr(v))
        elif isinstance(v, (list, tuple)):
            open_c, close_c = ("[", "]") if isinstance(v, list) else ("(", ")")
            out.append(open_c)
            items: list[tuple[str, object]] = []
            for i, e in enumerate(v):
                if i:
                    items.append(("s", " "))
                items.append(("v", e))
            stack.append(("s", close_c))
            stack.extend(reversed(items))
        elif isinstance(v, dict):
            out.append("{")
            items = []
            for i, (k, val) in enumerate(v.items()):
                if i:
                    items.append(("s", " "))
                items.append(("v", k))
                items.append(("s", " "))
                items.append(("v", val))
            stack.append(("s", "}"))
            stack.extend(reversed(items))
        else:
            raise TypeError(f"cannot serialize {type(v)}")
    return "".join(out)
