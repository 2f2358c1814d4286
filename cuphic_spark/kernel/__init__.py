"""Pure-Python Cuphic kernel: values, reader, matcher, templates,
scan/scrape, XML parsing. Zero Spark dependencies — this package runs
inside Arrow-batched pandas UDFs on executors and standalone in unit
tests."""

from .values import Keyword, Symbol, Bindings, truthy  # noqa: F401
from .reader import parse_pattern, parse_hiccup, dumps  # noqa: F401
from .match import get_bindings, matches  # noqa: F401
from .template import apply_bindings, transform, make_transformer, rewrite  # noqa: F401
from .scan import scan, select_all, select_one, scrape, iterate_nodes  # noqa: F401
from .xmlparse import parse as parse_xml, extract_text  # noqa: F401
from .xmlparse import (  # noqa: F401
    BOILERPLATE_TAGS,
    extract_content,
    extract_content_streaming,
)
