"""Type system parity (SURVEY §1.2-§1.3).

The reference defines a LogicalType enum decoupled from Arrow physical
types (src/types_v2/types.rs:9-26) with DuckDB-style coercion:
`max_logical_type` common-supertype resolution (types.rs:80-100),
signed×unsigned combination (types.rs:102-136), and a widening-only
implicit-cast lattice (types.rs:138-200).

Spark has no unsigned integers, so unsigned types map to the next wider
signed type (documented deviation, SURVEY §1.3): utinyint→short,
usmallint→int, uinteger→long, ubigint→decimal(20,0).
"""

from __future__ import annotations

from pyspark.sql import types as T

# LogicalType name → Spark DataType (types.rs:9-26 → SURVEY §1.3 table)
LOGICAL_TO_SPARK: dict[str, T.DataType] = {
    "sqlnull": T.NullType(),
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "utinyint": T.ShortType(),  # deviation: no unsigned in Spark
    "smallint": T.ShortType(),
    "usmallint": T.IntegerType(),  # deviation
    "integer": T.IntegerType(),
    "uinteger": T.LongType(),  # deviation
    "bigint": T.LongType(),
    "ubigint": T.DecimalType(20, 0),  # deviation
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "varchar": T.StringType(),
    "date": T.DateType(),
    "interval_year_month": T.YearMonthIntervalType(),
    "interval_day_time": T.DayTimeIntervalType(),
}

# widening order for the numeric lattice (can_implicit_cast, types.rs:138-200)
_NUMERIC_ORDER = [
    "tinyint",
    "utinyint",
    "smallint",
    "usmallint",
    "integer",
    "uinteger",
    "bigint",
    "ubigint",
    "float",
    "double",
]

_SIGNED = {"tinyint", "smallint", "integer", "bigint"}
_UNSIGNED = {"utinyint", "usmallint", "uinteger", "ubigint"}


def can_implicit_cast(src: str, dst: str) -> bool:
    """Widening-only implicit casts (types.rs:138-200): numerics widen along
    the lattice; SqlNull casts to anything; no varchar/date/bool implicit
    casts."""
    src, dst = src.lower(), dst.lower()
    if src == "sqlnull":
        return True
    if src == dst:
        return True
    if src in _NUMERIC_ORDER and dst in _NUMERIC_ORDER:
        si, di = _NUMERIC_ORDER.index(src), _NUMERIC_ORDER.index(dst)
        if di <= si:
            return False
        # unsigned cannot implicitly narrow into the same-width signed type:
        # utinyint→smallint ok (wider signed), utinyint→tinyint not
        if src in _UNSIGNED and dst in _SIGNED:
            return _width(dst) > _width(src)
        if src in _SIGNED and dst in _UNSIGNED:
            return False  # signed never implicitly casts to unsigned
        return True
    return False


def _width(t: str) -> int:
    return {
        "tinyint": 1,
        "utinyint": 1,
        "smallint": 2,
        "usmallint": 2,
        "integer": 4,
        "uinteger": 4,
        "bigint": 8,
        "ubigint": 8,
        "float": 4,
        "double": 8,
    }[t]


def combine_numeric_types(left: str, right: str) -> str:
    """Signed×unsigned combination (types.rs:102-136): the common supertype
    of a signed and an unsigned type is the narrowest signed type that can
    represent both (Int + UInt → Bigint, etc.)."""
    left, right = left.lower(), right.lower()
    if can_implicit_cast(left, right):
        return right
    if can_implicit_cast(right, left):
        return left
    # mixed signedness at the same or conflicting width: widen to the
    # narrowest signed type strictly wider than both
    for cand in _NUMERIC_ORDER:
        if cand in _SIGNED or cand in ("float", "double"):
            if can_implicit_cast(left, cand) and can_implicit_cast(right, cand):
                return cand
    return "double"


def max_logical_type(left: str, right: str) -> str:
    """Common supertype (types.rs:80-100): SqlNull casts to anything;
    numerics combine; otherwise the types must match."""
    left, right = left.lower(), right.lower()
    if left == "sqlnull":
        return right
    if right == "sqlnull":
        return left
    if left == right:
        return left
    if left in _NUMERIC_ORDER and right in _NUMERIC_ORDER:
        return combine_numeric_types(left, right)
    raise TypeError(f"no common supertype for {left} and {right}")


def spark_type_for(logical: str) -> T.DataType:
    return LOGICAL_TO_SPARK[logical.lower()]
