"""Oracle-checked query registry driving __spark_entry__.py."""

from bulkfhirloader_spark.queries.registry import REGISTRY, entry_query  # noqa: F401
