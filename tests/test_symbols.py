"""Port of /root/reference/test/dk/cst/cuphic/symbols_test.cljc:5-19
(the 12-case slot-type classification table) plus classifier pins."""

import pytest

from cuphic_spark.kernel import symbols as syms
from cuphic_spark.kernel.reader import parse


@pytest.mark.parametrize(
    "pnode, expected",
    [
        ("variable", "variable"),
        ("variable?", "variable"),
        ("variable???", "variable"),
        ("...variable", "variable"),
        ("?optional-variable", "optional-variable"),
        ("???optional-variable", "optional-variable"),
        ("(??? pnode k z)", "optional-repetition"),
        ("(... pnode k z)", "definite-repetition"),
        ("...", "definite-omission"),
        ("???", "optional-omission"),
        ("_", "wildcard"),
        ("?", "optional"),
    ],
)
def test_slot_type(pnode, expected):
    assert syms.slot_type(parse(pnode)) == expected


def test_namespaced_symbols_use_local_name_for_prefix_check():
    # symbols.cljc:30-32 — prefixed-with? uses (name sym) only.
    assert syms.is_variable(parse("term/type"))
    assert syms.is_optional_variable(parse("term/?type"))


def test_arbitrary_classification():
    # symbols.cljc:101-108
    assert syms.is_arbitrary(parse("_"))
    assert syms.is_arbitrary(parse("x"))
    assert syms.is_arbitrary(parse("???"))
    assert syms.is_arbitrary(parse("(??? x)"))
    assert syms.is_arbitrary(parse("(... x y)"))       # all-arbitrary repetition
    assert not syms.is_arbitrary(parse("(... 0 a b)"))  # contains a literal
    assert not syms.is_arbitrary(parse("..."))          # bare definite omission
    assert not syms.is_arbitrary(parse("?"))            # optional is not arbitrary
    assert not syms.is_arbitrary(parse("?x"))           # optional-variable is not arbitrary


def test_quantification_classes():
    assert syms.is_quantification(parse("..."))
    assert syms.is_quantification(parse("???"))
    assert syms.is_quantification(parse("(... x)"))
    assert syms.is_optional_quantification(parse("???"))
    assert syms.is_optional_quantification(parse("(??? x)"))
    assert not syms.is_optional_quantification(parse("..."))
    assert not syms.is_optional_quantification(parse("(... x)"))
