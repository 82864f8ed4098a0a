"""Skew-mitigation utilities: salted joins for hot keys.

At 100 TB a handful of hot join keys (the TPC-H "Brand#1" problem, or a
null-heavy foreign key) can put 10% of a fact table into one shuffle
partition.  AQE's skew-join splitting (enabled in session.build_spark)
handles most cases at runtime; explicit salting is the plan-level tool for
the pathological ones — e.g. when the skewed side feeds a stateful
downstream operator AQE can't re-split.

``salted_join`` is semantics-preserving: it returns exactly the rows the
plain join would.  The fact side gets a deterministic salt derived from a
non-key column hash (never rand() — retries and speculative tasks must
agree); the dimension side is replicated ``salt`` times so every
(key, salt) bucket finds its match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted into ``salt`` sub-keys.

    The shuffle key becomes (join_key, salt_bucket), spreading each hot
    key over ``salt`` partitions; the dimension is exploded ``salt``× (it
    is the small side — that is why it is the replicated one).

    Only fact-preserving join types are valid: an outer-preserved dim side
    would emit its unmatched rows once per salt bucket.
    """
    if how not in ("inner", "left", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports fact-preserving joins only, got {how!r}")
    fact_salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt)).cast("int"),
    )
    dim_exploded = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = fact_salted.join(
        dim_exploded,
        (F.col(fact_key) == F.col(dim_key)) & (fact_salted["__salt"] == dim_exploded["__salt"]),
        how,
    )
    return joined.drop("__salt")
