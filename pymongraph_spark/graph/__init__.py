from pymongraph_spark.graph.model import (
    EDGE_FIELDS,
    TYPE_DEPENDENCY,
    VERTEX_FIELDS,
    PropertyGraph,
    edge_id,
    vertex_id,
)
from pymongraph_spark.graph import writes, traversal  # noqa: F401

__all__ = [
    "PropertyGraph",
    "TYPE_DEPENDENCY",
    "VERTEX_FIELDS",
    "EDGE_FIELDS",
    "vertex_id",
    "edge_id",
    "writes",
    "traversal",
]
