"""Type-system parity tests (SURVEY §1.2-§1.3).

The reference's LogicalType lattice: src/types_v2/types.rs —
`max_logical_type` (:80-100), `combine_numeric_types` (:102-136),
`can_implicit_cast` (:138-200). Unsigned DDL syntax from
tests/slt/create_table.slt:20.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from sqlrs_spark.functions.types import (
    can_implicit_cast,
    combine_numeric_types,
    max_logical_type,
    spark_type_for,
)


# -- can_implicit_cast (types.rs:138-200: widening-only lattice) -------------

def test_implicit_cast_widening_chain():
    chain = ["tinyint", "smallint", "integer", "bigint", "double"]
    for i, src in enumerate(chain):
        for dst in chain[i + 1:]:
            assert can_implicit_cast(src, dst), f"{src}->{dst}"
        for dst in chain[:i]:
            assert not can_implicit_cast(dst, src) or True  # widening ok
            assert not can_implicit_cast(src, dst), f"{src}->{dst} must not narrow"


def test_implicit_cast_float_to_double():
    assert can_implicit_cast("float", "double")
    assert not can_implicit_cast("double", "float")


def test_sqlnull_casts_to_anything():
    for dst in ("boolean", "varchar", "date", "bigint", "double"):
        assert can_implicit_cast("sqlnull", dst)


def test_no_varchar_date_bool_implicit_casts():
    assert not can_implicit_cast("varchar", "integer")
    assert not can_implicit_cast("integer", "varchar")
    assert not can_implicit_cast("boolean", "integer")
    assert not can_implicit_cast("date", "varchar")


def test_signed_never_implicitly_unsigned():
    assert not can_implicit_cast("integer", "uinteger")
    assert not can_implicit_cast("tinyint", "utinyint")


def test_unsigned_widens_to_strictly_wider_signed():
    assert can_implicit_cast("utinyint", "smallint")
    assert not can_implicit_cast("utinyint", "tinyint")
    assert can_implicit_cast("uinteger", "bigint")
    assert not can_implicit_cast("uinteger", "integer")


# -- combine_numeric_types (types.rs:102-136) --------------------------------

@pytest.mark.parametrize(
    "l, r, want",
    [
        ("integer", "uinteger", "bigint"),
        ("tinyint", "utinyint", "smallint"),
        ("smallint", "usmallint", "integer"),
        ("integer", "bigint", "bigint"),
        ("bigint", "double", "double"),
        ("float", "double", "double"),
    ],
)
def test_combine_numeric_types(l, r, want):
    assert combine_numeric_types(l, r) == want
    assert combine_numeric_types(r, l) == want


# -- max_logical_type (types.rs:80-100) --------------------------------------

def test_max_logical_type_null_absorbs():
    assert max_logical_type("sqlnull", "varchar") == "varchar"
    assert max_logical_type("date", "sqlnull") == "date"


def test_max_logical_type_identity_and_error():
    assert max_logical_type("varchar", "varchar") == "varchar"
    with pytest.raises(TypeError):
        max_logical_type("varchar", "integer")


# -- Spark mapping (SURVEY §1.3 deviation table) -----------------------------

def test_unsigned_spark_mapping():
    assert spark_type_for("utinyint") == T.ShortType()
    assert spark_type_for("usmallint") == T.IntegerType()
    assert spark_type_for("uinteger") == T.LongType()
    assert spark_type_for("ubigint") == T.DecimalType(20, 0)


# -- DDL integration: create_table.slt:20 ------------------------------------

def test_unsigned_ddl_roundtrip(spark):
    from sqlrs_spark.session import Session

    s = Session(spark)
    s.sql("drop table if exists t3_unsigned")
    s.sql(
        "create table t3_unsigned(v1 boolean, v2 tinyint unsigned, "
        "v3 smallint unsigned, v4 int unsigned, v5 bigint unsigned, "
        "v6 float, v7 double, v8 varchar)"
    )
    schema = {f.name: f.dataType for f in spark.table("t3_unsigned").schema}
    assert schema["v2"] == T.ShortType()
    assert schema["v3"] == T.IntegerType()
    assert schema["v4"] == T.LongType()
    assert schema["v5"] == T.DecimalType(20, 0)
    s.sql("insert into t3_unsigned values (true, 255, 65535, 4294967295, "
          "18446744073709551615, 1.5, 2.5, 'x')")
    row = spark.table("t3_unsigned").collect()[0]
    assert row.v4 == 4294967295
    assert int(row.v5) == 18446744073709551615
    s.sql("drop table if exists t3_unsigned")
