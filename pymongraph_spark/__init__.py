"""sparkgraph — a PySpark-native analytics engine with the query and
data-processing capabilities of peacook/pymongraph (reference:
/root/reference/mongraph.py, /root/reference/graph_importer.py), rebuilt
from scratch on DataFrames/Catalyst.

Top-level surface:
    - session.get_spark          — tuned local SparkSession
    - catalog.load_tables        — the driver's parquet tables as DataFrames
    - graph.PropertyGraph        — the labeled property digraph (SURVEY.md §1)
    - ingest.GraphImporter       — nested threat-intel JSON → graph ETL (§2.10)
    - operators / functions      — relational + LLM-pipeline operator surface (§2.13)
"""

from pymongraph_spark.session import get_spark
from pymongraph_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_tables", "register_views"]

__version__ = "0.1.0"
