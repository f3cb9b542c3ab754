"""Relational/document sinks (K1-K5)."""

from bulkfhirloader_spark.sinks.facts import (
    drop_collections,
    write_facts,
    write_facts_jdbc,
)

__all__ = ["drop_collections", "write_facts", "write_facts_jdbc"]
