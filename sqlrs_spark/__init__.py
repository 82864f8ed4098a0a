"""sqlrs_spark — a PySpark-native analytics engine.

Re-implements the capability surface of the reference engine (Fedomn/sqlrs,
an embedded Arrow/Rust OLAP engine — see SURVEY.md) as an idiomatic Spark
library: the logical plan is declared with the DataFrame / Spark SQL API and
Catalyst + Tungsten pick the physical strategy. On top of the reference's
relational surface it adds the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, multimodal
plumbing), all designed for 100 TB / multi-executor scale.
"""

from sqlrs_spark.client_context import ClientContext
from sqlrs_spark.session import Session, build_spark

__all__ = ["ClientContext", "Session", "build_spark"]
__version__ = "0.1.0"
