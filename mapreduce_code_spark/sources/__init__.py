"""Sources & sinks: schema-checked readers for the test star schema plus
the reference's native text formats (transactions, labeled points)."""

from mapreduce_code_spark.sources.io import (
    TABLES,
    load_table,
    load_tables,
    read_labeled_points_text,
    read_transactions_text,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_transactions_text",
    "read_labeled_points_text",
]
