"""Property-based tests for the logical-type lattice (SURVEY §1.2).

The reference's coercion rules (src/types_v2/types.rs:80-200) form a
lattice; these properties must hold for any implementation of it.
"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from sqlrs_spark.functions.types import (
    _NUMERIC_ORDER,
    can_implicit_cast,
    combine_numeric_types,
    max_logical_type,
)

numerics = st.sampled_from(_NUMERIC_ORDER)
all_types = st.sampled_from(
    _NUMERIC_ORDER + ["sqlnull", "boolean", "varchar", "date"]
)


@given(numerics, numerics)
def test_combine_commutative(a, b):
    assert combine_numeric_types(a, b) == combine_numeric_types(b, a)


@given(numerics, numerics)
def test_combine_result_absorbs_both(a, b):
    c = combine_numeric_types(a, b)
    assert can_implicit_cast(a, c) or a == c
    assert can_implicit_cast(b, c) or b == c


@given(numerics)
def test_combine_idempotent(a):
    assert combine_numeric_types(a, a) == a


@given(numerics, numerics, numerics)
def test_implicit_cast_transitive(a, b, c):
    if can_implicit_cast(a, b) and can_implicit_cast(b, c):
        assert can_implicit_cast(a, c)


@given(numerics, numerics)
def test_implicit_cast_antisymmetric(a, b):
    # widening-only: no two distinct types cast both ways
    if a != b:
        assert not (can_implicit_cast(a, b) and can_implicit_cast(b, a))


@given(all_types)
def test_sqlnull_is_bottom(a):
    assert max_logical_type("sqlnull", a) == a
    assert max_logical_type(a, "sqlnull") == a


@given(all_types, all_types)
def test_max_logical_type_commutative_or_both_error(a, b):
    try:
        r1 = max_logical_type(a, b)
    except TypeError:
        r1 = TypeError
    try:
        r2 = max_logical_type(b, a)
    except TypeError:
        r2 = TypeError
    assert r1 == r2
