from pymongraph_spark.ingest.importer import (
    STAGING_SCHEMA,
    build_graph_tables,
    flatten_report,
    import_from_json,
    staging_frame,
)

__all__ = [
    "STAGING_SCHEMA",
    "flatten_report",
    "staging_frame",
    "build_graph_tables",
    "import_from_json",
]
