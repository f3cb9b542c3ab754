from bulkfhirloader_spark.sources.corpus import read_jsonl, write_jsonl
from bulkfhirloader_spark.sources.tables import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views", "read_jsonl", "write_jsonl"]
