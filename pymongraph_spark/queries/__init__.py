"""Query registry: every operator from SURVEY.md §2 that the driver's
correctness gate checks gets (a) a Spark callable and (b) an equivalent
DuckDB oracle SQL string (or None for genuinely non-SQL-expressible ops).

Importing this package populates the registry.
"""

from pymongraph_spark.queries.registry import QUERIES, ORACLES, query

# Side-effect imports: each module registers its queries.
from pymongraph_spark.queries import relational  # noqa: F401
from pymongraph_spark.queries import graph  # noqa: F401
from pymongraph_spark.queries import llm  # noqa: F401
from pymongraph_spark.queries import streaming  # noqa: F401

__all__ = ["QUERIES", "ORACLES", "query"]
