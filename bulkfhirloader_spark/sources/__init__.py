from bulkfhirloader_spark.sources.tables import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
