"""Reference CSV fixtures ported verbatim (FIXTURES.md §1) — they pin down
edge semantics the synthetic star schema doesn't isolate: NULL keys in
joins, empty-string→NULL, quoted CSV commas, duplicate join keys."""

from __future__ import annotations

from pyspark.sql import SparkSession, types as T

EMPLOYEE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("job_title", T.StringType()),
        T.StructField("salary", T.LongType()),
        T.StructField("department_id", T.LongType()),
    ]
)

EMPLOYEE_ROWS = [
    (1, "Bill", "Hopkins", "CA", "Manager, Software", 12000, 1),
    (2, "Gregg", "Langford", "CO", "Driver", 10000, 2),
    (3, "John", "Travis", "CO", "Driver", 11500, 4),
    (4, "Von", "Mill", None, "Defensive End", None, None),
]

DEPARTMENT_ROWS = [(1, "IT"), (2, "Marketing"), (3, "Finance"), (4, "Engineering")]
DEPARTMENT_SCHEMA = "id long, department_name string"

T1_ROWS = [(0, 4, 7), (1, 5, 8), (2, 7, 9), (2, 8, 1)]
T2_ROWS = [(10, 2, 7), (20, 2, 5), (30, 3, 6), (40, 4, 6)]
TBL_SCHEMA = "a long, b long, c long"

INTEGERS_ROWS = [(1, 1), (2, 2), (3, 3), (None, None)]
INTEGERS_SCHEMA = "i int, j int"


def register_fixtures(spark: SparkSession) -> None:
    spark.createDataFrame(EMPLOYEE_ROWS, EMPLOYEE_SCHEMA).createOrReplaceTempView(
        "employee"
    )
    spark.createDataFrame(DEPARTMENT_ROWS, DEPARTMENT_SCHEMA).createOrReplaceTempView(
        "department"
    )
    spark.createDataFrame(T1_ROWS, TBL_SCHEMA).createOrReplaceTempView("t1")
    spark.createDataFrame(T2_ROWS, TBL_SCHEMA).createOrReplaceTempView("t2")
    spark.createDataFrame(INTEGERS_ROWS, INTEGERS_SCHEMA).createOrReplaceTempView(
        "integers"
    )
